"""T5 encoder parity vs the INSTALLED transformers package (the oracle the
reference effectively uses: stable_audio_tools' T5Conditioner instantiates
transformers T5EncoderModel — wheel conditioners.py:286-368), plus the
stable-audio NumberEmbedder vs the stable_audio_tools wheel."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _t5_case(gated: bool, seed: int):
    """Build a tiny transformers T5EncoderModel + matching flax config."""
    from audiolab_tpu.models.t5 import T5Config, T5Encoder

    torch.manual_seed(seed)
    tcfg = tfm.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0)
    t_model = tfm.T5EncoderModel(tcfg).double().eval()
    fcfg = T5Config(vocab_size=64, dim=32, d_kv=8, d_ff=48, layers=3,
                    heads=4, rel_buckets=8, rel_max_distance=20,
                    gated=gated)
    return t_model, T5Encoder(fcfg)


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated):
    """convert_t5 on a real transformers state_dict; fp64 run.  atol 1e-5:
    transformers T5LayerNorm computes the variance through an internal
    fp32 cast (modeling_t5.T5LayerNorm), so fp32 reduce-order noise is the
    floor even in a double run — unlike the fully-double oracles elsewhere."""
    from audiolab_tpu.utils.convert import convert_t5

    t_model, f_model = _t5_case(gated, 311 + int(gated))
    jax.config.update("jax_enable_x64", True)
    try:
        ids = np.asarray([[5, 9, 20, 33, 1, 0, 0],
                          [40, 41, 2, 42, 43, 44, 1]])
        mask = np.asarray([[1, 1, 1, 1, 1, 0, 0],
                           [1, 1, 1, 1, 1, 1, 1]])
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 7), jnp.int32))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_t5(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(input_ids=torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask)
                          ).last_hidden_state.numpy()
        # the T5Conditioner multiplies by the mask (conditioners.py:372);
        # our encoder folds that in, so compare against masked reference
        ref = ref * mask[..., None]
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(ids), jnp.asarray(mask)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_t5_encoder_no_mask_matches_full_mask():
    from audiolab_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config(vocab_size=32, dim=16, d_kv=4, d_ff=32, layers=2,
                   heads=2, rel_buckets=8, rel_max_distance=10)
    m = T5Encoder(cfg)
    ids = jnp.asarray([[3, 4, 5, 6]])
    p = m.init(jax.random.PRNGKey(0), ids)["params"]
    a = m.apply({"params": p}, ids)
    b = m.apply({"params": p}, ids, jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


WHEEL = ("/root/reference/wheels/"
         "stable_audio_tools-0.0.20-py3-none-any.whl")


def test_number_embedder_parity(tmp_path):
    """stable_audio_tools adp.NumberEmbedder as oracle (checkpoint keys
    conditioner.conditioners.seconds_*.embedder; conditioners.py:58-91)."""
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", WHEEL,
                        str(tmp_path)], check=True, capture_output=True)
    except Exception:
        pytest.skip("stable_audio_tools wheel unavailable")
    sys.path.insert(0, str(tmp_path))
    # adp.py imports einops_exts (not installed); NumberEmbedder doesn't
    # use it, so satisfy the import with an einops-backed shim
    if "einops_exts" not in sys.modules:
        import types

        from einops import rearrange

        shim = types.ModuleType("einops_exts")
        shim.rearrange_many = lambda xs, *a, **k: [
            rearrange(x, *a, **k) for x in xs]
        sys.modules["einops_exts"] = shim
    try:
        from stable_audio_tools.models.adp import NumberEmbedder as TorchNE
    except Exception as e:
        sys.path.remove(str(tmp_path))
        pytest.skip(f"stable_audio_tools import failed: {e}")
    try:
        from audiolab_tpu.models.stable_audio import NumberEmbedder
        from audiolab_tpu.utils.convert import convert_sao_number

        torch.manual_seed(77)
        t_ne = TorchNE(features=24, dim=16).double().eval()
        f_ne = NumberEmbedder(features=24, dim=16)
        jax.config.update("jax_enable_x64", True)
        try:
            x = np.asarray([0.0, 0.25, 0.5, 1.0])
            template = jax.eval_shape(
                lambda: f_ne.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1,)))["params"])
            sd = {("embedder." + k): v.detach().numpy()
                  for k, v in t_ne.state_dict().items()}
            params = convert_sao_number(sd, template, "seconds_start")
            params = jax.tree.map(lambda a: a.astype(np.float64), params)
            with torch.no_grad():
                ref = t_ne(torch.from_numpy(x)).numpy()
            out = np.asarray(f_ne.apply({"params": params}, jnp.asarray(x)))
            np.testing.assert_allclose(out, ref, atol=1e-10)
        finally:
            jax.config.update("jax_enable_x64", False)
    finally:
        sys.path.remove(str(tmp_path))


def test_t5_prompt_tokenizer(tmp_path):
    """T5Conditioner packing semantics: truncation to max_length with an
    </s> terminator, pad-to-max with pad_id, boolean mask
    (conditioners.py:349-358)."""
    from audiolab_tpu.pipelines.music import T5PromptTokenizer
    from audiolab_tpu.utils.spm import build_model_proto

    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁", -2.0, 1), ("▁a", -1.0, 1),
              ("▁b", -1.5, 1), ("a", -2.5, 1), ("b", -2.5, 1)]
    model = tmp_path / "t5.model"
    # t5 id convention: <pad>=0, </s>=1, <unk>=2, no bos
    model.write_bytes(build_model_proto(pieces, model_type=1, unk_id=2,
                                        bos_id=-1, eos_id=1, pad_id=0))
    tok = T5PromptTokenizer(str(model), max_length=6)
    ids, mask = tok(["a b", "a a a a a a a a a"])
    assert ids.shape == (2, 6) and mask.shape == (2, 6)
    assert ids[0, : 3].tolist() == [4, 5, 1]       # _a _b </s>
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0]
    assert ids[0, 3:].tolist() == [0, 0, 0]        # padded
    assert ids[1, -1] == 1                          # truncated + </s>
    assert mask[1].sum() == 6


def test_umt5_encoder_parity():
    """UMT5 (per-layer relative bias, gated FFN) — ACE-Step's text encoder
    (pipeline_ace_step.py requires the umt5-base checkpoint dir); oracle =
    installed transformers UMT5EncoderModel."""
    from audiolab_tpu.models.t5 import T5Config, T5Encoder
    from audiolab_tpu.utils.convert import convert_t5

    torch.manual_seed(99)
    tcfg = tfm.UMT5Config(
        vocab_size=48, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    t_model = tfm.UMT5EncoderModel(tcfg).double().eval()
    fcfg = T5Config(vocab_size=48, dim=32, d_kv=8, d_ff=48, layers=3,
                    heads=4, rel_buckets=8, rel_max_distance=20,
                    gated=True, per_layer_bias=True)
    f_model = T5Encoder(fcfg)
    jax.config.update("jax_enable_x64", True)
    try:
        ids = np.asarray([[5, 9, 20, 33, 1, 0, 0]])
        mask = np.asarray([[1, 1, 1, 1, 1, 0, 0]])
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 7), jnp.int32))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_t5(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(input_ids=torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask)
                          ).last_hidden_state.numpy() * mask[..., None]
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)
