"""WeSpeaker ResNet34 r-vector parity vs a seeded torch replica with the
published checkpoint's key names (pyannote/wespeaker-voxceleb-resnet34-LM
— the embedding stage of speaker-diarization-3.1, reference
modules/cloning/speaker_separation.py:39-45)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _snap_f32(model):
    """fp64 values must be f32-representable for exact converter parity."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.float().double())
        for b in model.buffers():
            if b.dtype.is_floating_point:
                b.copy_(b.float().double())


@pytest.mark.parametrize("two_emb", [False, True])
def test_wespeaker_parity(two_emb):
    from tests.torch_wespeaker_replica import ResNet34, randomize_running_stats

    from audiolab_tpu.models.wespeaker import WeSpeakerConfig, WeSpeakerResNet
    from audiolab_tpu.utils.convert import convert_wespeaker

    torch.manual_seed(3)
    # reduced widths keep fp64 CPU runtime sane; layer/stride topology,
    # pooling, and key names are the published ones
    t_model = ResNet34(feat_dim=16, embed_dim=24, m_channels=8,
                       num_blocks=(2, 2, 2, 2),
                       two_emb_layer=two_emb).double().eval()
    randomize_running_stats(t_model, seed=7)
    _snap_f32(t_model)

    cfg = WeSpeakerConfig(feat_dim=16, embed_dim=24, m_channels=8,
                          num_blocks=(2, 2, 2, 2), two_emb_layer=two_emb)
    f_model = WeSpeakerResNet(cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        fb = rng.standard_normal((2, 57, 16))  # odd T exercises pad edges
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 57, 16)))["params"])
        sd = {k: v.detach().numpy()
              for k, v in t_model.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        params = convert_wespeaker(sd, template, strict=True)
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(fb)).numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(fb)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_wespeaker_full_size_fill():
    """The published-scale tree (ResNet34, 80 mels, 256-d) fills from a
    checkpoint-key state dict without shape errors."""
    from audiolab_tpu.models.wespeaker import WeSpeakerConfig, WeSpeakerResNet
    from audiolab_tpu.utils.convert import convert_wespeaker, wespeaker_mapping

    cfg = WeSpeakerConfig()
    model = WeSpeakerResNet(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 200, 80)))["params"])
    mapping = wespeaker_mapping(template)

    # synthesize a state dict with the exact published key names/shapes
    rng = np.random.default_rng(0)
    sd = {}
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    chans = {1: 32, 2: 64, 3: 128, 4: 256}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = rng.standard_normal((32, 1, 3, 3)).astype(np.float32)
    bn("bn1", 32)
    prev = 32
    for li, nb in blocks.items():
        c = chans[li]
        for bi in range(nb):
            base = f"layer{li}.{bi}"
            cin = prev if bi == 0 else c
            sd[f"{base}.conv1.weight"] = rng.standard_normal(
                (c, cin, 3, 3)).astype(np.float32)
            bn(f"{base}.bn1", c)
            sd[f"{base}.conv2.weight"] = rng.standard_normal(
                (c, c, 3, 3)).astype(np.float32)
            bn(f"{base}.bn2", c)
            if bi == 0 and (li > 1 or cin != c):
                sd[f"{base}.shortcut.0.weight"] = rng.standard_normal(
                    (c, cin, 1, 1)).astype(np.float32)
                bn(f"{base}.shortcut.1", c)
        prev = c
    sd["seg_1.weight"] = rng.standard_normal((256, 5120)).astype(np.float32)
    sd["seg_1.bias"] = rng.standard_normal(256).astype(np.float32)

    params = convert_wespeaker(sd, template, strict=True)
    out = model.apply({"params": params}, jnp.zeros((1, 198, 80)))
    assert out.shape == (1, 256)
    # every template leaf is covered by the mapping
    flat = jax.tree_util.tree_leaves_with_path(template)
    paths = {"/".join(str(k.key) for k in p) for p, _ in flat}
    assert paths == set(mapping), paths ^ set(mapping)


def test_wespeaker_embed_and_diarizer_wiring():
    """wespeaker_embed L2-norms, and NeuralDiarizer accepts the backend."""
    from audiolab_tpu.models.diarize import DiarizeConfig, NeuralDiarizer
    from audiolab_tpu.models.wespeaker import (WeSpeakerConfig,
                                               WeSpeakerResNet,
                                               wespeaker_embed)

    cfg = WeSpeakerConfig(feat_dim=16, embed_dim=8, m_channels=4,
                          num_blocks=(1, 1, 1, 1))
    model = WeSpeakerResNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 50, 16)))["params"]
    wav = np.random.default_rng(0).standard_normal((2, 8000)).astype(
        np.float32) * 0.1
    e = np.asarray(wespeaker_embed(model, params, wav))
    assert e.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)

    dia = NeuralDiarizer(DiarizeConfig(max_speakers=2, chunk_s=2.0,
                                       chunk_hop_s=1.0),
                         wespeaker=(model, params))
    turns = dia.diarize(np.concatenate([wav[0], wav[1]]), 16000)
    assert isinstance(turns, list)
