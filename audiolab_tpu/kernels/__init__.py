from audiolab_tpu.kernels.stft import stft, istft, spectrogram, frame_signal
from audiolab_tpu.kernels.mel import mel_filterbank, mel_spectrogram, log_mel
from audiolab_tpu.kernels.resample import resample, resample_poly_np

__all__ = [
    "stft",
    "istft",
    "spectrogram",
    "frame_signal",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel",
    "resample",
    "resample_poly_np",
]
