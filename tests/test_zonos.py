"""Zonos model tests: backbone prefill/step state equivalence, delay
pattern round-trip, end-to-end tiny generation -> DAC decode."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.codecs import DACConfig, DACDecoder
from audiolab_tpu.models.zonos import (
    SpeakerEncoder,
    ZonosConfig,
    ZonosModel,
    delay_pattern,
    generate,
    tokenize_text,
    undelay_pattern,
)


def tiny_cfg():
    return ZonosConfig(
        dim=32, n_layers=3, attn_every=3, n_heads=4, d_state=4, d_conv=4,
        expand=2, n_codebooks=3, codebook_size=18, max_seq_len=64,
        vocab_text=256, spk_dim=8,
    )


def test_delay_pattern_roundtrip():
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 16, (2, 3, 10)))
    d = delay_pattern(codes, masked_id=17)
    assert d.shape == (2, 3, 13)
    assert int(d[0, 2, 0]) == 17 and int(d[0, 2, 1]) == 17
    back = undelay_pattern(d, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


def test_prefill_step_consistency():
    """Stepping tokens after prefill must match a longer full forward."""
    cfg = tiny_cfg()
    model = ZonosModel(cfg)
    b = 1
    text = jnp.asarray(tokenize_text("hi"))[None]
    spk = jnp.ones((b, cfg.spk_dim)) * 0.1
    em = jnp.ones((b, 8)) * 0.1
    ra = jnp.full((b, 1), 15.0)
    pi = jnp.full((b, 1), 20.0)
    bos = jnp.full((b, cfg.n_codebooks, 1), cfg.masked_id, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), text, spk, em, ra, pi, bos,
                        method=ZonosModel.prefill)["params"]

    logits1, states, plen = model.apply(
        {"params": params}, text, spk, em, ra, pi, bos, method=ZonosModel.prefill
    )
    # step two frames
    c1 = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits2, states = model.apply(
        {"params": params}, c1, jnp.asarray([plen]), states,
        method=ZonosModel.decode_step,
    )

    # equivalent full forward: prefix + bos + frame c1, compare final logits
    def full(codes_list):
        x_prefix = model.apply(
            {"params": params}, text, spk, em, ra, pi, method=ZonosModel.prefix
        )
        embs = [
            model.apply({"params": params}, cc, method=ZonosModel.embed_codes)
            for cc in codes_list
        ]
        x = jnp.concatenate([x_prefix] + embs, axis=1)
        pos = jnp.arange(x.shape[1])

        def fwd(mdl):
            h = mdl.backbone(x, pos)
            return mdl.logits9(h[:, -1])

        return nn_apply(fwd, model, params)

    import flax.linen as nn

    def nn_apply(fn, mdl, params):
        return mdl.apply({"params": params}, method=lambda m: fn(m))

    l_full = full([bos, c1[:, :, None]])
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(l_full), rtol=2e-3, atol=2e-3
    )


def test_generate_and_decode():
    cfg = tiny_cfg()
    model = ZonosModel(cfg)
    text = jnp.asarray(tokenize_text("hello world"))[None]
    spk = jnp.ones((1, cfg.spk_dim)) * 0.1
    bos = jnp.full((1, cfg.n_codebooks, 1), cfg.masked_id, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), text, spk, jnp.ones((1, 8)), jnp.ones((1, 1)),
        jnp.ones((1, 1)), bos, method=ZonosModel.prefill
    )["params"]
    codes = generate(model, params, text, spk, max_frames=6,
                     rng=jax.random.PRNGKey(1))
    assert codes.shape == (1, cfg.n_codebooks, 6)
    assert np.asarray(codes).max() < cfg.codebook_size

    dac = DACDecoder(DACConfig(dim=16, rates=(4, 2), n_q=cfg.n_codebooks,
                               codebook_size=cfg.codebook_size, codebook_dim=4))
    clipped = jnp.clip(codes, 0, cfg.codebook_size - 1)
    dp = dac.init(jax.random.PRNGKey(2), clipped)["params"]
    audio = dac.apply({"params": dp}, clipped)
    assert audio.shape == (1, 6 * 8)
    assert np.isfinite(np.asarray(audio)).all()


def test_speaker_encoder_normalized():
    se = SpeakerEncoder(out_dim=16)
    mel = jnp.asarray(np.random.default_rng(5).standard_normal((2, 40, 8)), jnp.float32)
    p = se.init(jax.random.PRNGKey(5), mel)["params"]
    e = se.apply({"params": p}, mel)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-4)


def test_generate_embedded_prefix_bank():
    """Checkpoint prefix bank -> generate_embedded: deterministic codes,
    sensitive to the conditioning prefix."""
    import numpy as np

    from audiolab_tpu.models.zonos import (
        CondSpec,
        ZonosConfig,
        ZonosModel,
        ZonosPrefixConditioner,
        generate_embedded,
        tokenize_phonemes_np,
    )

    cfg = ZonosConfig(dim=32, n_layers=2, n_heads=2, n_codebooks=9,
                      codebook_size=64, spk_dim=8)
    model = ZonosModel(cfg)
    b = 1
    text = jnp.asarray(np.random.default_rng(0).integers(1, 50, (b, 6)))
    params = model.init(
        jax.random.PRNGKey(0), text, jnp.zeros((b, 8)),
        jnp.full((b, 8), 0.125), jnp.full((b, 1), 15.0),
        jnp.full((b, 1), 20.0),
        jnp.full((b, 9, 1), cfg.masked_id, jnp.int32), None,
        method=ZonosModel.prefill)["params"]
    specs = (CondSpec("EspeakPhonemeConditioner", "espeak"),
             CondSpec("FourierConditioner", "pitch_std", min_val=0.0,
                      max_val=400.0, uncond_type="learned"))
    bank = ZonosPrefixConditioner(cfg.dim, specs)
    toks = jnp.asarray(tokenize_phonemes_np(["həlˈoʊ"]))
    cond = {"espeak": toks, "pitch_std": jnp.full((1, 1, 1), 20.0)}
    bparams = bank.init(jax.random.PRNGKey(1), cond)["params"]
    p_c = bank.apply({"params": bparams}, cond)
    p_u = bank.apply({"params": bparams}, {"espeak": jnp.zeros_like(toks)})
    x2 = jnp.concatenate([p_c, p_u], axis=0)
    codes = generate_embedded(model, params, x2, max_frames=6)
    assert codes.shape == (b, 9, 6)
    assert int(codes.max()) < cfg.codebook_size and int(codes.min()) >= 0
    codes_b = generate_embedded(model, params, x2, max_frames=6)
    assert bool(jnp.all(codes == codes_b))
    p_c2 = bank.apply({"params": bparams},
                      {"espeak": toks,
                       "pitch_std": jnp.full((1, 1, 1), 350.0)})
    codes_c = generate_embedded(
        model, params, jnp.concatenate([p_c2, p_u], axis=0), max_frames=6)
    assert not bool(jnp.all(codes_c == codes))


def test_sample9_min_p_and_repetition_penalty():
    """Published-sampler semantics (modules/zonos/model.py:202,
    sampling.py:83-109): min_p keeps only tokens with prob >= min_p * max;
    the window-2 repetition penalty divides positive logits (multiplies
    non-positive) by rp^occurrences."""
    from audiolab_tpu.models.zonos import ZonosConfig, ZonosModel, _make_sample9

    cfg = ZonosConfig(dim=32, n_layers=1, n_heads=2, n_codebooks=2,
                      codebook_size=8, max_seq_len=64)
    model = ZonosModel(cfg)
    max_frames = 4
    sample9, init_window = _make_sample9(
        model, max_frames, cfg_scale=1.0, temperature=1e-6, top_k=0,
        min_p=0.2, repetition_penalty=3.0)

    b, nq, v = 1, cfg.n_codebooks, cfg.codebook_size
    # token 3 dominant everywhere; CFG double batch (cond, uncond equal)
    logits = jnp.full((b, nq, v), -5.0).at[:, :, 3].set(5.0)
    logits2 = jnp.concatenate([logits, logits], axis=0)
    key = jax.random.PRNGKey(0)

    win = init_window(b)
    toks, win = sample9(logits2, key, jnp.asarray(0), win)
    assert int(toks[0, 0]) == 3  # near-greedy at tiny temperature
    # window records the emission
    assert int(win[0, 0, -1]) == 3

    # after emitting 3 twice, penalty 3^2 = 9 drops its positive logit
    # below a runner-up at 1.0 -> the runner-up wins
    logits_rep = jnp.full((b, nq, v), -5.0)
    logits_rep = logits_rep.at[:, :, 3].set(5.0).at[:, :, 5].set(1.0)
    l2 = jnp.concatenate([logits_rep, logits_rep], axis=0)
    win2 = jnp.full((b, nq, 2), 3, jnp.int32)
    toks2, _ = sample9(l2, key, jnp.asarray(1), win2)
    assert int(toks2[0, 0]) == 5  # 5/9 < 1.0

    # min_p: with temperature ~0 the max dominates; at temperature 1 a
    # token whose prob < min_p*max is masked even with noise-free sampling
    sample9b, initb = _make_sample9(model, max_frames, cfg_scale=1.0,
                                    temperature=1.0, top_k=0, min_p=0.9,
                                    repetition_penalty=1.0)
    near = jnp.full((b, nq, v), 0.0).at[:, :, 3].set(3.0)
    l3 = jnp.concatenate([near, near], axis=0)
    counts = []
    for s in range(16):
        t3, _ = sample9b(l3, jax.random.PRNGKey(s), jnp.asarray(0), initb(b))
        counts.append(int(t3[0, 0]))
    assert set(counts) == {3}  # everything below 0.9*max masked out
