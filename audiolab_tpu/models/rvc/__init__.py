from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn, SynthesizerConfig

__all__ = ["SynthesizerTrn", "SynthesizerConfig"]
