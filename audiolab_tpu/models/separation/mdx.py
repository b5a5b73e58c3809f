"""MDX-style TFC-TDF U-Net separator in flax.

The reference runs MDX-NET/MDX23C checkpoints through onnxruntime
(modules/separator/stem_separator.py:110-123, SURVEY §2.5 — no ORT on TPU,
so the architecture is re-implemented natively).  Topology follows the
TFC-TDF v3 family used by MDX23C:

  stereo STFT magnitude+phase as channels -> conv stem
  -> U-Net of TFC (time-freq 3x3 convs) + TDF (freq-bottleneck MLP) blocks
     with freq-downsampling between scales
  -> conv head -> complex mask -> iSTFT

All convs NHWC (time=H, freq=W); GroupNorm + GELU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiolab_tpu.kernels.stft import istft, stft


@dataclass(frozen=True)
class MDXConfig:
    n_fft: int = 6144
    hop: int = 1024
    dim_f: int = 2560          # retained freq bins (< n_fft//2+1)
    channels: int = 2          # stereo
    g: int = 32                # base conv width
    depth: int = 4             # U-Net scales
    tfc_layers: int = 2        # convs per TFC block
    bn: int = 8                # TDF bottleneck factor
    stems: Sequence[str] = ("vocals", "other")


class TFC_TDF(nn.Module):
    """One block: tfc_layers (GN+GELU+Conv3x3) + freq MLP residual."""

    ch: int
    dim_f: int
    tfc_layers: int
    bn: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.tfc_layers):
            y = nn.GroupNorm(num_groups=4, name=f"gn_{i}")(x)
            y = nn.gelu(y)
            y = nn.Conv(self.ch, (3, 3), padding="SAME", name=f"conv_{i}")(y)
            x = y if x.shape[-1] != self.ch and i == 0 else x + y
        # TDF: bottleneck MLP over the freq axis
        z = nn.GroupNorm(num_groups=4, name="gn_tdf")(x)
        z = nn.gelu(z)
        z = jnp.swapaxes(z, -1, -2)  # (b, t, ch, f)
        z = nn.Dense(self.dim_f // self.bn, name="tdf1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim_f, name="tdf2")(z)
        z = jnp.swapaxes(z, -1, -2)
        return x + z


class MDXNet(nn.Module):
    cfg: MDXConfig = MDXConfig()

    @nn.compact
    def __call__(self, audio):
        """audio (b, channels, n) -> dict stem -> (b, channels, n)."""
        c = self.cfg
        b, ch, n = audio.shape
        real, imag = stft(audio, n_fft=c.n_fft, hop=c.hop)
        n_bins = c.n_fft // 2 + 1
        t_frames = real.shape[-2]
        # (b, t, f, ch*2) with only dim_f bins fed to the net
        spec = jnp.stack([real, imag], axis=-1)  # (b, ch, t, bins, 2)
        spec = spec.transpose(0, 2, 3, 1, 4).reshape(b, t_frames, n_bins, ch * 2)
        x = spec[:, :, : c.dim_f, :]

        x = nn.Conv(c.g, (1, 1), name="stem")(x)
        skips = []
        chs = c.g
        dim_f = c.dim_f
        for i in range(c.depth):
            x = TFC_TDF(chs, dim_f, c.tfc_layers, c.bn, name=f"enc_{i}")(x)
            skips.append(x)
            chs += c.g
            dim_f //= 2
            x = nn.Conv(chs, (2, 2), strides=(2, 2), name=f"down_{i}")(x)
        x = TFC_TDF(chs, dim_f, c.tfc_layers, c.bn, name="mid")(x)
        for i in range(c.depth - 1, -1, -1):
            chs -= c.g
            dim_f *= 2
            x = nn.ConvTranspose(chs, (2, 2), strides=(2, 2), name=f"up_{i}")(x)
            x = x[:, : skips[i].shape[1], : skips[i].shape[2], :]
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = TFC_TDF(chs, dim_f, c.tfc_layers, c.bn, name=f"dec_{i}")(x)

        out = {}
        for stem in c.stems:
            # MDX23C-style direct complex spectrum estimate per stem
            m = nn.Conv(ch * 2, (1, 1), name=f"head_{stem}")(x)  # (b,t,dim_f,ch*2)
            est = jnp.pad(m, ((0, 0), (0, 0), (0, n_bins - c.dim_f), (0, 0)))
            est = est.reshape(b, t_frames, n_bins, ch, 2).transpose(0, 3, 1, 2, 4)
            wav = istft(est[..., 0], est[..., 1], n_fft=c.n_fft, hop=c.hop, length=n)
            out[stem] = wav
        return out


class MDXOnnxSeparator:
    """A REAL MDX-NET .onnx checkpoint as an ensemble member.

    The reference feeds these through onnxruntime
    (stem_separator.py:110-123); here the graph runs through the in-repo
    ONNX importer/executor (utils/onnx.py) with the exact ConvTDFNetTrim
    framing around it (modules/rvc/infer/modules/uvr5/mdxnet.py:40-76):

      stereo chunk (b, 2, hop*(dim_t-1))
        -> torch-stft layout (b, 4, dim_f, dim_t)  [ch0_re ch0_im ch1_re..]
        -> onnx graph (the published net predicts the target stem spec)
        -> zero-pad bins back to n_fft//2+1 -> istft
      complement stem = mix - target (UVR convention).

    Long inputs follow demix_base's trim-margin windowing
    (mdxnet.py:143-187): windows of the model chunk length stride by
    gen_size = chunk - 2*trim with trim = n_fft//2, the input is
    zero-padded by trim at both ends, and only each window's middle
    gen_size samples are kept — so every output sample sits away from the
    window's tapered edges and chunk seams are artifact-free.  All
    windows run as one device batch (the reference loops them serially).
    """

    def __init__(self, graph_or_path, dim_f: int = 3072, dim_t: int = 256,
                 n_fft: int = 7680, hop: int = 1024,
                 target: str = "vocals"):
        import jax

        from audiolab_tpu.utils.onnx import OnnxRunner, load_onnx

        g = (load_onnx(graph_or_path) if isinstance(graph_or_path, str)
             else graph_or_path)
        self.runner = OnnxRunner(g)
        self.input_name = next(n for n in g.inputs
                               if n not in g.initializers)
        self.dim_f, self.dim_t = dim_f, dim_t
        self.n_fft, self.hop = n_fft, hop
        self.target = target
        self.chunk = hop * (dim_t - 1)
        self._run = jax.jit(self._forward)

    def _spec(self, audio):
        """(b, 2, chunk) -> (b, 4, dim_f, dim_t), torch channel packing."""
        re, im = stft(audio, n_fft=self.n_fft, hop=self.hop)  # (b,2,T,bins)
        x = jnp.stack([re, im], axis=2)          # (b, 2, 2, T, bins)
        b = x.shape[0]
        x = x.reshape(b, 4, x.shape[3], x.shape[4])
        x = jnp.swapaxes(x, 2, 3)                # (b, 4, bins, T)
        return x[:, :, : self.dim_f, : self.dim_t]

    def _unspec(self, spec, length):
        """(b, 4, dim_f, dim_t) -> (b, 2, length)."""
        n_bins = self.n_fft // 2 + 1
        b = spec.shape[0]
        x = jnp.pad(spec, ((0, 0), (0, 0), (0, n_bins - self.dim_f),
                           (0, 0)))
        x = jnp.swapaxes(x, 2, 3)                # (b, 4, T, bins)
        x = x.reshape(b, 2, 2, x.shape[2], n_bins)
        return istft(x[:, :, 0], x[:, :, 1], n_fft=self.n_fft,
                     hop=self.hop, length=length)

    def _forward(self, audio):
        spec = self._spec(audio)
        (est,) = self.runner(**{self.input_name: spec})
        return self._unspec(est, audio.shape[-1])

    def __call__(self, audio):
        """(b, 2, n) -> {target: (b,2,n), complement: (b,2,n)} — the
        EnsembleMember apply_fn contract (pipelines/separate.py)."""
        b, ch, n = audio.shape
        trim = self.n_fft // 2
        gen = self.chunk - 2 * trim
        assert gen > 0, "model chunk shorter than 2*trim"
        pad = (-n) % gen
        x = jnp.pad(audio, ((0, 0), (0, 0), (trim, pad + trim)))
        k = (n + pad) // gen
        # overlapped windows: length chunk, stride gen (demix_base framing)
        idx = jnp.arange(k)[:, None] * gen + jnp.arange(self.chunk)[None]
        xw = x[:, :, idx]                        # (b, ch, k, chunk)
        xw = xw.transpose(0, 2, 1, 3).reshape(b * k, ch, self.chunk)
        y = self._run(xw)
        y = y.reshape(b, k, ch, self.chunk)[..., trim:-trim]
        y = y.transpose(0, 2, 1, 3).reshape(b, ch, -1)[..., :n]
        comp = "instrumental" if self.target == "vocals" else "vocals"
        return {self.target: y, comp: audio - y}
