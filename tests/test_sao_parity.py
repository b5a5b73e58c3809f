"""Stable-Audio DiT parity against the ACTUAL stable_audio_tools package
(the wheel the reference ships at wheels/stable_audio_tools-0.0.20) as the
oracle — stronger than a replica: the converter consumes the real
upstream module's state_dict and the flax output must match."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")

WHEEL = ("/root/reference/wheels/"
         "stable_audio_tools-0.0.20-py3-none-any.whl")


@pytest.fixture(scope="module")
def sat(tmp_path_factory):
    d = tmp_path_factory.mktemp("sat_wheel")
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", WHEEL,
                        str(d)], check=True, capture_output=True)
    except Exception:
        pytest.skip("stable_audio_tools wheel unavailable")
    sys.path.insert(0, str(d))
    try:
        from stable_audio_tools.models.dit import DiffusionTransformer
    except Exception as e:  # pragma: no cover
        pytest.skip(f"stable_audio_tools import failed: {e}")
    yield DiffusionTransformer
    sys.path.remove(str(d))


def test_sao_dit_full_parity(sat):
    """Upstream DiffusionTransformer (oracle) -> convert_sao_dit -> flax
    StableAudioDiT: v-prediction parity.  dim_heads must be 64 (the
    upstream partial-rotary breaks below that — same constraint as the
    published model, which is 24 heads x 64)."""
    DiffusionTransformer = sat
    torch.manual_seed(71)
    t_model = DiffusionTransformer(
        io_channels=8, embed_dim=128, cond_token_dim=64,
        project_cond_tokens=False, global_cond_dim=48, depth=2,
        num_heads=2).double().eval()

    from audiolab_tpu.models.stable_audio_dit import (
        SAODiTConfig,
        StableAudioDiT,
    )
    from audiolab_tpu.utils.convert import convert_sao_dit

    cfg = SAODiTConfig(io_channels=8, embed_dim=128, depth=2, num_heads=2,
                       cond_token_dim=64, global_cond_dim=48,
                       dtype="float64")
    f_model = StableAudioDiT(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(72)
        x = rng.standard_normal((2, 8, 16))      # torch layout (b, c, t)
        tt = rng.uniform(0.1, 0.9, (2,))
        ctx = rng.standard_normal((2, 3, 64))
        glob = rng.standard_normal((2, 48))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 8), jnp.float64),
                                 jnp.zeros((1,), jnp.float64),
                                 jnp.zeros((1, 3, 64), jnp.float64),
                                 jnp.zeros((1, 48), jnp.float64)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_sao_dit(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref = t_model._forward(
                torch.from_numpy(x), torch.from_numpy(tt),
                cross_attn_cond=torch.from_numpy(ctx),
                global_embed=torch.from_numpy(glob),
                use_checkpointing=False).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(tt), jnp.asarray(ctx), jnp.asarray(glob)))
        out = out.transpose(0, 2, 1)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def sat_oobleck(sat):
    # reuse the wheel already on sys.path from the `sat` fixture;
    # autoencoders.py imports torchaudio at module top but OobleckDecoder
    # never touches it — stub it (torchaudio isn't in this image)
    import types

    if "torchaudio" not in sys.modules:
        import importlib.machinery

        ta = types.ModuleType("torchaudio")
        tt = types.ModuleType("torchaudio.transforms")
        tt.__getattr__ = lambda a: type(a, (), {})  # e.g. T.Resample
        ta.transforms = tt
        for mod in (ta, tt):
            mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tt
    if "alias_free_torch" not in sys.modules:
        aft = types.ModuleType("alias_free_torch")
        aft.Activation1d = object  # only used when antialias=True
        sys.modules["alias_free_torch"] = aft
    # transitive imports OobleckDecoder never touches (sampling/diffusion)
    for name in ("k_diffusion", "k_diffusion.sampling", "einops_exts"):
        if name not in sys.modules:
            import importlib.machinery

            stub = types.ModuleType(name)
            stub.__spec__ = importlib.machinery.ModuleSpec(name, None)
            stub.__getattr__ = lambda a: type(a, (), {})
            sys.modules[name] = stub
    try:
        from stable_audio_tools.models.autoencoders import OobleckDecoder
    except Exception as e:
        pytest.skip(f"autoencoders import failed: {e}")
    return OobleckDecoder


def test_oobleck_decoder_full_parity(sat_oobleck):
    """Upstream OobleckDecoder (snake) -> convert_oobleck -> flax."""
    torch.manual_seed(81)
    t_model = sat_oobleck(out_channels=2, channels=8, latent_dim=4,
                          c_mults=[1, 2], strides=[2, 4], use_snake=True,
                          final_tanh=False).double().eval()
    # randomize snake alphas so a swap shows up
    with torch.no_grad():
        for name, p in t_model.named_parameters():
            if name.endswith(("alpha", "beta")):
                p.normal_(0.0, 0.3)

    from audiolab_tpu.models.stable_audio_dit import (
        OobleckConfig,
        OobleckDecoder,
    )
    from audiolab_tpu.utils.convert import convert_oobleck

    cfg = OobleckConfig(out_channels=2, channels=8, latent_dim=4,
                        c_mults=(1, 2), strides=(2, 4), final_tanh=False)
    f_model = OobleckDecoder(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        z = np.random.default_rng(82).standard_normal((2, 4, 10)) * 0.5
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 6, 4), jnp.float64)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_oobleck(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(z)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(z.transpose(0, 2, 1))))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # SnakeBeta computes in float32 internally -> ~1e-7 floor
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------- XTTS HiFi decoder

@pytest.fixture(scope="module")
def coqui_hifigan():
    """HifiganGenerator from the ACTUAL coqui wheel the reference ships."""
    import types

    d = "/tmp/coqui_wheel_extract"
    wheel = "/root/reference/wheels/coqui_tts-0.26.0-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("coqui wheel unavailable")
    # hifigan_generator.py only imports torch + trainer.io (no TTS-package
    # imports), so load it standalone by path — importing the TTS package
    # itself would chain into coqpit etc. (absent in this image)
    if "trainer" not in sys.modules:
        tr = types.ModuleType("trainer")
        io = types.ModuleType("trainer.io")
        io.load_fsspec = lambda *a, **k: None
        tr.io = io
        sys.modules["trainer"] = tr
        sys.modules["trainer.io"] = io
    import importlib.util

    path = f"{d}/TTS/vocoder/models/hifigan_generator.py"
    spec = importlib.util.spec_from_file_location("coqui_hifigan_gen", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"coqui import failed: {e}")
    return mod.HifiganGenerator


def test_xtts_hifigan_decoder_parity(coqui_hifigan):
    """Upstream HifiganGenerator at the exact XTTS-v2 decoder config
    (hifigan_decoder.py:12-66) -> convert_xtts_hifigan -> flax."""
    torch.manual_seed(91)
    t_model = coqui_hifigan(
        16, 1, "1", [[1, 3, 5]] * 3, [3, 7, 11], [16, 16, 4, 4], 32,
        [8, 8, 2, 2], inference_padding=0, cond_channels=10,
        conv_pre_weight_norm=False, conv_post_weight_norm=False,
        conv_post_bias=False, cond_in_each_up_layer=True).double().eval()

    from audiolab_tpu.models.xtts import XttsHifiganDecoder
    from audiolab_tpu.utils.convert import convert_xtts_hifigan

    f_model = XttsHifiganDecoder(input_dim=16, cond_dim=10,
                                 initial_channel=32)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(92)
        lat = rng.standard_normal((2, 16, 9))     # torch layout (b, c, t)
        g = rng.standard_normal((2, 10, 1))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 16), jnp.float64),
                                 jnp.zeros((1, 10), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_xtts_hifigan(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(lat), g=torch.from_numpy(g)
                          ).numpy()[:, 0]
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(lat.transpose(0, 2, 1)),
            jnp.asarray(g[..., 0])))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # weight-norm folds round through the f32 template -> ~2e-9 floor
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def coqui_resnet():
    """ResNetSpeakerEncoder from the coqui wheel, loaded standalone
    (importing the TTS package would chain into coqpit etc.)."""
    import importlib.util
    import types

    d = "/tmp/coqui_wheel_extract"
    wheel = "/root/reference/wheels/coqui_tts-0.26.0-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("coqui wheel unavailable")
    stubs = {}
    for name, attrs in (
        ("torchaudio", {}),
        ("torchaudio.transforms", {"MelSpectrogram": object}),
        ("coqpit", {"Coqpit": object}),
        ("trainer", {}),
        ("trainer.generic_utils", {"set_partial_state_dict": lambda *a: None}),
        ("trainer.io", {"load_fsspec": lambda *a, **k: None}),
        ("TTS", {}), ("TTS.encoder", {}), ("TTS.encoder.models", {}),
        ("TTS.encoder.losses", {"AngleProtoLoss": object, "GE2ELoss": object,
                                "SoftmaxAngleProtoLoss": object}),
    ):
        if name not in sys.modules:
            import importlib.machinery

            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            stubs[name] = mod
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    try:
        for mod_name, rel in (
            ("TTS.encoder.models.base_encoder",
             "TTS/encoder/models/base_encoder.py"),
            ("TTS.encoder.models.resnet", "TTS/encoder/models/resnet.py"),
        ):
            spec = importlib.util.spec_from_file_location(mod_name,
                                                          f"{d}/{rel}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"coqui resnet import failed: {e}")
    return sys.modules["TTS.encoder.models.resnet"].ResNetSpeakerEncoder


def test_xtts_speaker_encoder_parity(coqui_resnet):
    """Upstream H/ASP ResNet-SE (mel input, use_torch_spec=False) ->
    convert_xtts_speaker -> flax XttsSpeakerEncoder, fp64."""
    torch.manual_seed(93)
    t_model = coqui_resnet(input_dim=16, proj_dim=24, layers=[1, 1, 1, 1],
                           num_filters=[8, 16, 32, 64], log_input=True,
                           use_torch_spec=False).double().eval()
    with torch.no_grad():  # randomize BN stats so a misroute shows up
        gen = torch.Generator().manual_seed(94)
        for mod in t_model.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean.normal_(0.0, 0.3, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
                mod.weight.data.copy_(
                    mod.weight.data.uniform_(0.5, 1.5, generator=gen
                                             ).float().double())
                mod.bias.data.copy_(
                    mod.bias.data.normal_(0.0, 0.3, generator=gen
                                          ).float().double())
                mod.running_mean.copy_(mod.running_mean.float().double())
                mod.running_var.copy_(mod.running_var.float().double())

    from audiolab_tpu.models.xtts import XttsSpeakerEncoder
    from audiolab_tpu.utils.convert import convert_xtts_speaker

    f_model = XttsSpeakerEncoder(input_dim=16, proj_dim=24,
                                 layers=(1, 1, 1, 1),
                                 num_filters=(8, 16, 32, 64))
    jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(95).random((2, 16, 40)) + 0.1
        variables = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 40, 16), jnp.float64)))
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        conv = convert_xtts_speaker(sd, variables, strict=True)
        conv = jax.tree.map(lambda a: a.astype(np.float64), conv)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel), l2_norm=True).numpy()
        out = np.asarray(f_model.apply(
            conv, jnp.asarray(mel.transpose(0, 2, 1)), l2_norm=True))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_xtts_gpt_parity():
    """XTTS GPT core vs the INSTALLED transformers GPT2Model (the exact
    class coqui wraps, gpt.py:132-151 / tortoise autoregressive.py:219-248
    with wpe nulled and wte unused) + torch embeddings/heads with the
    checkpoint key names."""
    tfm = pytest.importorskip("transformers")
    from torch import nn as tnn

    torch.manual_seed(97)
    layers, dim, heads = 2, 32, 2
    n_text, n_audio, tt, tm = 11, 13, 5, 7
    cfgt = tfm.GPT2Config(vocab_size=16, n_positions=64, n_ctx=64,
                          n_embd=dim, n_layer=layers, n_head=heads)
    gpt = tfm.GPT2Model(cfgt).double().eval()

    class _Shell(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gpt = gpt
            self.text_embedding = tnn.Embedding(n_text, dim)
            self.mel_embedding = tnn.Embedding(n_audio, dim)
            self.text_pos_embedding = tnn.Module()
            self.text_pos_embedding.emb = tnn.Embedding(8, dim)
            self.mel_pos_embedding = tnn.Module()
            self.mel_pos_embedding.emb = tnn.Embedding(9, dim)
            self.final_norm = tnn.LayerNorm(dim)
            self.text_head = tnn.Linear(dim, n_text)
            self.mel_head = tnn.Linear(dim, n_audio)

        def forward(self, text_ids, mel_ids, cond):
            te = self.text_embedding(text_ids) + self.text_pos_embedding.emb(
                torch.arange(text_ids.shape[1]))
            me = self.mel_embedding(mel_ids) + self.mel_pos_embedding.emb(
                torch.arange(mel_ids.shape[1]))
            x = torch.cat([cond, te, me], dim=1)
            # wpe nulled upstream -> cancel GPT2Model's built-in positions
            h = self.gpt(inputs_embeds=x,
                         position_ids=torch.zeros(x.shape[1],
                                                  dtype=torch.long)
                         ).last_hidden_state  # wpe row 0 zeroed below
            h = self.final_norm(h)
            tc = cond.shape[1]
            return (self.text_head(h[:, tc:tc + text_ids.shape[1]]),
                    self.mel_head(h[:, tc + text_ids.shape[1]:]))

    shell = _Shell().double().eval()
    with torch.no_grad():  # null the built-in wpe exactly like upstream
        shell.gpt.wpe.weight.zero_()

    from audiolab_tpu.models.xtts import XttsGPT2
    from audiolab_tpu.utils.convert import convert_xtts_gpt

    f_model = XttsGPT2(layers=layers, dim=dim, heads=heads, n_text=n_text,
                      n_audio=n_audio, max_text=8, max_mel=9)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(98)
        text = rng.integers(0, n_text, (2, tt))
        mel = rng.integers(0, n_audio, (2, tm))
        cond = rng.standard_normal((2, 3, dim)) * 0.5
        template = jax.eval_shape(
            lambda: f_model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, tt), jnp.int32),
                jnp.zeros((1, tm), jnp.int32),
                jnp.zeros((1, 3, dim), jnp.float64))["params"])
        sd = {("gpt." + k): v.detach().numpy()
              for k, v in shell.state_dict().items()}
        params = convert_xtts_gpt(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref_t, ref_m = shell(torch.from_numpy(text),
                                 torch.from_numpy(mel),
                                 torch.from_numpy(cond))
        out_t, out_m = f_model.apply(
            {"params": params}, jnp.asarray(text), jnp.asarray(mel),
            jnp.asarray(cond))
        np.testing.assert_allclose(np.asarray(out_t), ref_t.numpy(),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(out_m), ref_m.numpy(),
                                   atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def coqui_cond_modules():
    """ConditioningEncoder (tortoise autoregressive.py) + PerceiverResampler
    (xtts perceiver_encoder.py) from the coqui wheel, loaded standalone."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/coqui_wheel_extract"
    wheel = "/root/reference/wheels/coqui_tts-0.26.0-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("coqui wheel unavailable")

    def stub(name, **attrs):
        if name in sys.modules:
            return
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    stub("torchaudio")
    stub("fsspec", open=open)
    stub("TTS"), stub("TTS.tts"), stub("TTS.tts.layers")
    stub("TTS.tts.layers.tortoise")
    stub("TTS.tts.layers.xtts")
    stub("TTS.utils")
    stub("TTS.utils.generic_utils",
         is_pytorch_at_least_2_4=lambda: True,
         exists=lambda x: x is not None,
         default=lambda a, b: a if a is not None else b)
    stub("TTS.tts.layers.tortoise.xtransformers",
         ContinuousTransformerWrapper=object, RelativePositionBias=object)
    try:
        for mod_name, rel in (
            ("TTS.tts.layers.tortoise.arch_utils",
             "TTS/tts/layers/tortoise/arch_utils.py"),
            ("TTS.tts.layers.tortoise.transformer",
             "TTS/tts/layers/tortoise/transformer.py"),
            ("TTS.tts.layers.tortoise.autoregressive",
             "TTS/tts/layers/tortoise/autoregressive.py"),
            ("TTS.tts.layers.xtts.perceiver_encoder",
             "TTS/tts/layers/xtts/perceiver_encoder.py"),
        ):
            spec = importlib.util.spec_from_file_location(mod_name,
                                                          f"{d}/{rel}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"coqui conditioning import failed: {e}")
    return (sys.modules["TTS.tts.layers.tortoise.autoregressive"
                        ].ConditioningEncoder,
            sys.modules["TTS.tts.layers.xtts.perceiver_encoder"
                        ].PerceiverResampler)


def test_xtts_conditioning_encoder_parity(coqui_cond_modules):
    """Upstream ConditioningEncoder -> convert_xtts_conditioner -> flax,
    fp64 (GroupNorm32's fp32 hard-cast bypassed for the oracle; converted
    params round through the f32 template -> ~3e-8 floor)."""
    CondEnc, _ = coqui_cond_modules
    # GroupNorm32 hard-casts to fp32 (a mixed-precision-era artifact) which
    # breaks a double()'d oracle — run it as a plain GroupNorm for fp64
    au = sys.modules["TTS.tts.layers.tortoise.arch_utils"]
    au.GroupNorm32.forward = torch.nn.GroupNorm.forward
    torch.manual_seed(101)
    t_model = CondEnc(80, 32, attn_blocks=3, num_attn_heads=4
                      ).double().eval()
    with torch.no_grad():  # proj_out is zero-init upstream — randomize
        for name, p in t_model.named_parameters():
            if "proj_out" in name:
                p.normal_(0, 0.1)
                p.copy_(p.float().double())

    from audiolab_tpu.models.xtts import XttsConditioningEncoder
    from audiolab_tpu.utils.convert import convert_xtts_conditioner

    f_model = XttsConditioningEncoder(dim=32, heads=4, blocks=3)
    jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(102).standard_normal((2, 80, 12))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 80), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_xtts_conditioner(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel)).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel.transpose(0, 2, 1))))
        assert out.shape == tuple(np.transpose(ref, (0, 2, 1)).shape)
        np.testing.assert_allclose(out, ref.transpose(0, 2, 1), atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_xtts_perceiver_parity(coqui_cond_modules):
    """Upstream PerceiverResampler (cross_attn_include_queries) ->
    convert_xtts_perceiver -> flax, fp64."""
    _, Perceiver = coqui_cond_modules
    torch.manual_seed(103)
    t_model = Perceiver(dim=24, depth=2, dim_context=24, num_latents=5,
                        dim_head=6, heads=2, ff_mult=4).double().eval()
    with torch.no_grad():
        t_model.latents.copy_(t_model.latents.float().double())

    from audiolab_tpu.models.xtts import XttsPerceiverResampler
    from audiolab_tpu.utils.convert import convert_xtts_perceiver

    f_model = XttsPerceiverResampler(dim=24, depth=2, num_latents=5,
                                     heads=2, dim_head=6)
    jax.config.update("jax_enable_x64", True)
    try:
        x = np.random.default_rng(104).standard_normal((2, 7, 24)) * 0.5
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 7, 24), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_xtts_perceiver(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(x)).numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(x)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def coqui_dvae():
    """DiscreteVAE from the coqui wheel, loaded standalone."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/coqui_wheel_extract"
    wheel = "/root/reference/wheels/coqui_tts-0.26.0-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("coqui wheel unavailable")
    for name, attrs in (("torchaudio", {}),
                        ("TTS", {}), ("TTS.utils", {}),
                        ("TTS.utils.generic_utils",
                         {"is_pytorch_at_least_2_4": lambda: True})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "TTS.tts.layers.xtts.dvae", f"{d}/TTS/tts/layers/xtts/dvae.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        sys.modules["TTS.tts.layers.xtts.dvae"] = mod
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"dvae import failed: {e}")
    return mod.DiscreteVAE


def test_xtts_dvae_parity(coqui_dvae):
    """Upstream DiscreteVAE at the XTTS trainer config (scaled) ->
    convert_xtts_dvae -> flax: codes AND reconstruction parity, fp64."""
    torch.manual_seed(111)
    t_model = coqui_dvae(
        channels=12, normalization=None, positional_dims=1, num_tokens=20,
        codebook_dim=16, hidden_dim=8, num_resnet_blocks=2, kernel_size=3,
        num_layers=2, use_transposed_convs=False).double().eval()
    with torch.no_grad():  # EMA codebook starts randn — snap to f32 grid
        t_model.codebook.embed.copy_(t_model.codebook.embed.float().double())

    from audiolab_tpu.models.xtts import XttsDVAE
    from audiolab_tpu.utils.convert import convert_xtts_dvae

    f_model = XttsDVAE(channels=12, num_tokens=20, codebook_dim=16,
                       hidden_dim=8, num_layers=2, num_resnet_blocks=2)
    jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(112).standard_normal((2, 12, 16))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, 12), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_xtts_dvae(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref_codes = t_model.get_codebook_indices(
                torch.from_numpy(mel)).numpy()
            ref_mel = t_model.decode(torch.from_numpy(ref_codes))[0].numpy()
        codes = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel.transpose(0, 2, 1)),
            method=XttsDVAE.encode))
        np.testing.assert_array_equal(codes, ref_codes)
        rec = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(codes),
                                       method=XttsDVAE.decode))
        np.testing.assert_allclose(rec.transpose(0, 2, 1), ref_mel,
                                   atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_audiosr_vocoder_parity():
    """audiosr wheel's models_v2 Generator (48k config, scaled channels;
    incl. the odd stride-5 ConvTranspose) -> convert_audiosr_vocoder ->
    flax, fp64."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/audiosr_wheel_extract"
    wheel = "/root/reference/wheels/audiosr-0.0.9-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("audiosr wheel unavailable")
    spec = importlib.util.spec_from_file_location(
        "audiosr_hifigan_v2", f"{d}/audiosr/hifigan/models_v2.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"audiosr import failed: {e}")

    class H:  # AttrDict-style hparams, 48k shape scaled down
        resblock = "1"
        upsample_rates = [6, 5, 4, 2, 2]
        upsample_kernel_sizes = [12, 10, 8, 4, 4]
        upsample_initial_channel = 64
        resblock_kernel_sizes = [3, 7]
        resblock_dilation_sizes = [[1, 3, 5], [1, 3, 5]]

    torch.manual_seed(121)
    t_model = mod.Generator(H()).double().eval()

    from audiolab_tpu.models.audiosr_vocoder import AudioSRVocoder
    from audiolab_tpu.utils.convert import convert_audiosr_vocoder

    f_model = AudioSRVocoder(num_mels=256, initial_channel=64,
                             upsample_rates=(6, 5, 4, 2, 2),
                             resblock_kernels=(3, 7),
                             resblock_dilations=((1, 3, 5),) * 2)
    jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(122).standard_normal((2, 256, 5)) * 0.5
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 256), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_audiosr_vocoder(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel)).numpy()[:, 0]
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel.transpose(0, 2, 1))))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_audiosr_vae_parity():
    """audiosr wheel's AutoencoderKL Encoder/Decoder + quant convs ->
    convert_audiosr_vae -> flax, fp64 (mean-latent roundtrip)."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/audiosr_wheel_extract"
    wheel = "/root/reference/wheels/audiosr-0.0.9-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("audiosr wheel unavailable")
    # model.py imports diffusers' DiagonalGaussianDistribution (absent) —
    # stub it; the Encoder/Decoder under test never touch it
    for name, attrs in (
        ("diffusers", {}), ("diffusers.models", {}),
        ("diffusers.models.autoencoders", {}),
        ("diffusers.models.autoencoders.vae",
         {"DiagonalGaussianDistribution": object}),
        ("audiosr", {}), ("audiosr.latent_diffusion", {}),
        ("audiosr.latent_diffusion.modules", {}),
        ("audiosr.latent_diffusion.util",
         {"instantiate_from_config": lambda c: None}),
        ("audiosr.latent_diffusion.modules.attention",
         {"LinearAttention": torch.nn.Module}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "audiosr_ldm_model",
        f"{d}/audiosr/latent_diffusion/modules/diffusionmodules/model.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"audiosr model import failed: {e}")

    cfg = dict(ch=32, out_ch=1, ch_mult=(1, 2), num_res_blocks=1,
               attn_resolutions=[], dropout=0.0, in_channels=1,
               resolution=64, z_channels=4, double_z=True)
    torch.manual_seed(131)
    t_enc = mod.Encoder(**cfg).double().eval()
    t_dec = mod.Decoder(**cfg).double().eval()
    t_q = torch.nn.Conv2d(8, 8, 1).double()
    t_pq = torch.nn.Conv2d(4, 4, 1).double()

    from audiolab_tpu.models.audiosr_vae import AudioSRVAE
    from audiolab_tpu.utils.convert import convert_audiosr_vae

    f_model = AudioSRVAE(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=4, embed_dim=4)
    jax.config.update("jax_enable_x64", True)
    try:
        fbank = np.random.default_rng(132).standard_normal((2, 1, 8, 12))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, 12, 1),
                                           jnp.float64))["params"])
        sd = {("encoder." + k): v.detach().numpy()
              for k, v in t_enc.state_dict().items()}
        sd.update({("decoder." + k): v.detach().numpy()
                   for k, v in t_dec.state_dict().items()})
        sd.update({("quant_conv." + k): v.detach().numpy()
                   for k, v in t_q.state_dict().items()})
        sd.update({("post_quant_conv." + k): v.detach().numpy()
                   for k, v in t_pq.state_dict().items()})
        params = convert_audiosr_vae(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            x = torch.from_numpy(fbank)
            moments = t_q(t_enc(x))
            mean = moments[:, :4]
            ref = t_dec(t_pq(mean)).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(fbank.transpose(0, 2, 3, 1))))
        out = out.transpose(0, 3, 1, 2)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_audiosr_unet_parity():
    """audiosr wheel's UNetModel (basic-config shape scaled: self-attn
    SpatialTransformer pairs, v-prediction head) -> convert_audiosr_unet
    -> flax, fp64."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/audiosr_wheel_extract"
    wheel = "/root/reference/wheels/audiosr-0.0.9-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("audiosr wheel unavailable")
    # audiosr/__init__ chains into progressbar etc. — load the three
    # needed modules standalone under their dotted names instead
    for name in ("audiosr", "audiosr.latent_diffusion",
                 "audiosr.latent_diffusion.modules",
                 "audiosr.latent_diffusion.modules.diffusionmodules"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            spec = importlib.machinery.ModuleSpec(name, None,
                                                  is_package=True)
            mod.__spec__ = spec
            mod.__path__ = []
            sys.modules[name] = mod
    if "audiosr.latent_diffusion.util" not in sys.modules:
        mod = types.ModuleType("audiosr.latent_diffusion.util")
        mod.__spec__ = importlib.machinery.ModuleSpec(
            "audiosr.latent_diffusion.util", None)
        mod.instantiate_from_config = lambda c: None
        sys.modules["audiosr.latent_diffusion.util"] = mod
    try:
        for mod_name, rel in (
            ("audiosr.latent_diffusion.modules.diffusionmodules.util",
             "audiosr/latent_diffusion/modules/diffusionmodules/util.py"),
            ("audiosr.latent_diffusion.modules.attention",
             "audiosr/latent_diffusion/modules/attention.py"),
            ("audiosr.latent_diffusion.modules.diffusionmodules.openaimodel",
             "audiosr/latent_diffusion/modules/diffusionmodules/openaimodel.py"),
        ):
            spec = importlib.util.spec_from_file_location(mod_name,
                                                          f"{d}/{rel}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
        om = sys.modules[
            "audiosr.latent_diffusion.modules.diffusionmodules.openaimodel"]
        UNetModel = om.UNetModel
        # upstream timestep_embedding hardcodes fp32 — widen for the
        # double()'d oracle
        _orig_te = om.timestep_embedding
        om.timestep_embedding = (
            lambda *a, **k: _orig_te(*a, **k).double())
        # GroupNorm32 hard-casts to fp32 — run as plain GroupNorm for fp64
        ut = sys.modules[
            "audiosr.latent_diffusion.modules.diffusionmodules.util"]
        ut.GroupNorm32.forward = torch.nn.GroupNorm.forward
    except Exception as e:
        pytest.skip(f"audiosr unet import failed: {e}")

    torch.manual_seed(141)
    t_model = UNetModel(
        image_size=16, in_channels=6, out_channels=3, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, extra_sa_layer=True,
        use_spatial_transformer=True, transformer_depth=1,
        use_checkpoint=False).double().eval()
    t_model.dtype = torch.float64  # forward casts input to self.dtype

    from audiolab_tpu.models.audiosr_unet import (
        AudioSRUNet,
        AudioSRUNetConfig,
    )
    from audiolab_tpu.utils.convert import convert_audiosr_unet

    cfg = AudioSRUNetConfig(in_channels=6, model_channels=32,
                            out_channels=3, num_res_blocks=1,
                            attention_resolutions=(2,),
                            channel_mult=(1, 2), num_head_channels=16)
    f_model = AudioSRUNet(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        x = np.random.default_rng(142).standard_normal((2, 6, 8, 12)) * 0.5
        tt = np.asarray([3.0, 77.0])
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, 12, 6), jnp.float64),
                                 jnp.zeros((1,), jnp.float64))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_audiosr_unet(sd, template, cfg, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(x), torch.from_numpy(tt),
                          context_list=[], context_attn_mask_list=[]).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(tt)))
        out = out.transpose(0, 3, 1, 2)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_clap_text_branch_parity():
    """laion_clap roberta text path (model.py:505-514, 640) replicated
    with the INSTALLED transformers RobertaModel as oracle + the
    checkpoint's text_projection key names, fp64."""
    tfm = pytest.importorskip("transformers")
    from torch import nn as tnn

    torch.manual_seed(151)
    # roberta-base (what CLAP loads) uses layer_norm_eps 1e-5 — pin it
    # (RobertaConfig's DEFAULT is 1e-12, not what the checkpoint uses)
    rcfg = tfm.RobertaConfig(vocab_size=60, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=64,
                             max_position_embeddings=20, type_vocab_size=1,
                             pad_token_id=1, layer_norm_eps=1e-5)
    roberta = tfm.RobertaModel(rcfg).double().eval()
    proj = tnn.Sequential(tnn.Linear(32, 16), tnn.ReLU(),
                          tnn.Linear(16, 16)).double().eval()

    from audiolab_tpu.models.clap import ClapTextBranch, ClapTextConfig
    from audiolab_tpu.utils.convert import convert_clap_text

    cfg = ClapTextConfig(vocab_size=60, dim=32, layers=2, heads=2,
                         ffn_dim=64, max_positions=20, type_vocab=1,
                         pad_id=1, joint_dim=16)
    f_model = ClapTextBranch(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        ids = np.asarray([[0, 7, 9, 12, 2, 1, 1],
                          [0, 30, 31, 32, 33, 34, 2]])
        mask = (ids != 1).astype(np.int64)
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 7), jnp.int32),
                                 jnp.ones((1, 7), jnp.int32))["params"])
        sd = {("text_branch." + k): v.detach().numpy()
              for k, v in roberta.state_dict().items()}
        sd.update({("text_projection." + k): v.detach().numpy()
                   for k, v in proj.state_dict().items()})
        params = convert_clap_text(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            pooled = roberta(input_ids=torch.from_numpy(ids),
                             attention_mask=torch.from_numpy(mask)
                             )["pooler_output"]
            ref = proj(pooled).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(ids),
                                       jnp.asarray(mask)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_clap_audio_branch_parity():
    """laion_clap wheel's HTSAT swin (scaled config incl. shifted-window
    masks + patch merging) -> convert_clap_audio -> flax embedding path,
    fp64."""
    import importlib.machinery
    import importlib.util
    import types

    d = "/tmp/clap_wheel_extract"
    wheel = "/root/reference/wheels/laion_clap-1.1.5-py3-none-any.whl"
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", wheel, d],
                       check=True, capture_output=True)
    except Exception:
        pytest.skip("laion_clap wheel unavailable")

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    from torch import nn as tnn

    class _Dummy(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub("torchlibrosa")
    stub("torchlibrosa.stft", Spectrogram=_Dummy, LogmelFilterBank=_Dummy)
    stub("torchlibrosa.augmentation", SpecAugmentation=_Dummy)

    def _interpolate(x, ratio):  # PANN-style frame upsample (utils.py:211)
        b, t, c = x.shape
        return x[:, :, None, :].repeat(1, 1, ratio, 1).reshape(b, t * ratio,
                                                               c)

    for name in ("laion_clap", "laion_clap.clap_module"):
        mod = stub(name)
        mod.__path__ = []
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                      is_package=True)
    stub("laion_clap.clap_module.utils", interpolate=_interpolate,
         do_mixup=lambda x, lam: x)
    try:
        for mod_name, rel in (
            ("laion_clap.clap_module.feature_fusion",
             "laion_clap/clap_module/feature_fusion.py"),
            ("laion_clap.clap_module.htsat",
             "laion_clap/clap_module/htsat.py"),
        ):
            spec = importlib.util.spec_from_file_location(mod_name,
                                                          f"{d}/{rel}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
        HTSAT = sys.modules["laion_clap.clap_module.htsat"
                            ].HTSAT_Swin_Transformer
    except Exception as e:
        pytest.skip(f"laion_clap htsat import failed: {e}")

    class _Cfg:  # the audio_cfg namespace htsat reads
        window_size = 256
        hop_size = 64
        sample_rate = 16000
        mel_bins = 32
        fmin = 0
        fmax = 8000
        enable_tscam = False

    torch.manual_seed(161)
    t_model = HTSAT(spec_size=64, patch_size=4, patch_stride=(4, 4),
                    in_chans=1, num_classes=5, embed_dim=16,
                    depths=[2, 2, 2, 2], num_heads=[2, 2, 4, 4],
                    window_size=4, config=_Cfg()).double().eval()
    proj = torch.nn.Sequential(torch.nn.Linear(128, 24), torch.nn.ReLU(),
                               torch.nn.Linear(24, 24)).double().eval()

    from audiolab_tpu.models.clap import ClapAudioBranch, ClapAudioConfig
    from audiolab_tpu.utils.convert import convert_clap_audio

    cfg = ClapAudioConfig(spec_size=64, patch_size=4, patch_stride=4,
                          embed_dim=16, depths=(2, 2, 2, 2),
                          heads=(2, 2, 4, 4), window=4, joint_dim=24)
    f_model = ClapAudioBranch(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        img = np.random.default_rng(162).standard_normal((2, 1, 64, 64)) * 0.5
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 1),
                                           jnp.float64))["params"])
        sd = {("audio_branch." + k): v.detach().numpy()
              for k, v in t_model.state_dict().items()}
        sd.update({("audio_projection." + k): v.detach().numpy()
                   for k, v in proj.state_dict().items()})
        params = convert_clap_audio(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            emb = t_model.forward_features(torch.from_numpy(img))["embedding"]
            ref = proj(emb).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1))))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)
