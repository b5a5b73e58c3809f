"""Codec stack tests: SEANet round-trip shapes, RVQ encode/decode
consistency, DAC decoder, Vocos iSTFT head vs scipy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.codecs import (
    CodecConfig,
    DACConfig,
    DACDecoder,
    ResidualVQ,
    SEANetConfig,
    SoundStreamCodec,
    Vocos,
    VocosConfig,
    istft,
)
from audiolab_tpu.kernels.stft import stft


def test_soundstream_roundtrip_shapes():
    cfg = CodecConfig(
        sr=16000,
        seanet=SEANetConfig(dim=32, n_filters=4, ratios=(4, 2), n_res=1),
        n_q=4,
        codebook_size=64,
    )
    codec = SoundStreamCodec(cfg)
    hop = cfg.seanet.hop
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, hop * 25)), jnp.float32)
    params = codec.init(jax.random.PRNGKey(0), x)["params"]

    codes = codec.apply({"params": params}, x, method=SoundStreamCodec.encode)
    assert codes.shape == (2, 4, 25)
    assert codes.dtype == jnp.int32
    y = codec.apply({"params": params}, codes, method=SoundStreamCodec.decode)
    assert y.shape[0] == 2 and abs(y.shape[1] - x.shape[1]) <= hop


def test_rvq_decode_of_encode_reduces_error():
    rvq = ResidualVQ(n_q=8, codebook_size=256, dim=16)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 50, 16)), jnp.float32)
    params = rvq.init(jax.random.PRNGKey(1), z)["params"]
    c1 = rvq.apply({"params": params}, z, 1, method=ResidualVQ.encode)
    c8 = rvq.apply({"params": params}, z, method=ResidualVQ.encode)
    e1 = float(jnp.mean((rvq.apply({"params": params}, c1, method=ResidualVQ.decode) - z) ** 2))
    e8 = float(jnp.mean((rvq.apply({"params": params}, c8, method=ResidualVQ.decode) - z) ** 2))
    assert e8 < e1  # more residual stages -> lower quantization error


def test_dac_decoder_shapes():
    cfg = DACConfig(dim=32, rates=(4, 2), n_q=3, codebook_size=32, codebook_dim=4)
    dec = DACDecoder(cfg)
    codes = jnp.asarray(np.random.default_rng(2).integers(0, 32, (2, 3, 10)), jnp.int32)
    params = dec.init(jax.random.PRNGKey(2), codes)["params"]
    y = dec.apply({"params": params}, codes)
    assert y.shape == (2, 10 * cfg.hop)
    assert np.isfinite(np.asarray(y)).all()


def test_istft_inverts_stft():
    n_fft, hop = 512, 128
    rng = np.random.default_rng(3)
    x = rng.standard_normal(hop * 40).astype(np.float32)
    real, imag = stft(jnp.asarray(x)[None], n_fft=n_fft, hop=hop, center=True)
    y = np.asarray(istft(real, imag, n_fft, hop))[0]
    n = min(len(x), len(y))
    # interior must match tightly (edges lose window overlap)
    err = np.abs(y[hop:n - hop] - x[hop:n - hop]).max()
    assert err < 1e-3, err


def test_vocos_output_shape():
    cfg = VocosConfig(dim=32, n_layers=2, n_fft=256, hop=64)
    v = Vocos(cfg)
    z = jnp.asarray(np.random.default_rng(4).standard_normal((1, 12, 8)), jnp.float32)
    params = v.init(jax.random.PRNGKey(4), z)["params"]
    y = v.apply({"params": params}, z)
    assert y.shape == (1, (12 - 1) * 64 + 256 - 256)  # t*hop after center crop
    assert np.isfinite(np.asarray(y)).all()
