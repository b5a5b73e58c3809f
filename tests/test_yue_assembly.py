"""load_yue_pipeline: one-call assembly of the YuE stack from checkpoint
layouts shaped like the published ones (stage-1/stage-2 HF LLaMA dirs as
infer.py:245 loads, xcodec final.pth, mm tokenizer.model)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_mm_vocab import _tiny_unigram_proto

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _write_llama_dir(d, *, shards: int = 1, seed: int = 0):
    """Tiny HF-LLaMA checkpoint dir: config.json + model.safetensors
    (optionally sharded with an index, the published multi-GB layout)."""
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    os.makedirs(d, exist_ok=True)
    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    model = LlamaForCausalLM(hf_cfg).eval()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    if shards == 1:
        save_file(sd, os.path.join(d, "model.safetensors"))
    else:
        keys = sorted(sd)
        per = -(-len(keys) // shards)
        weight_map = {}
        for si in range(shards):
            name = f"model-{si + 1:05d}-of-{shards:05d}.safetensors"
            part = {k: sd[k] for k in keys[si * per:(si + 1) * per]}
            save_file(part, os.path.join(d, name))
            weight_map.update({k: name for k in part})
        with open(os.path.join(d, "model.safetensors.index.json"), "w") as f:
            json.dump({"weight_map": weight_map}, f)
    return sd


def test_load_yue_pipeline_assembles(tmp_path):
    from tests.torch_ref_models import XCodecDecoderTorch

    from audiolab_tpu.models.codecs import XCodecConfig
    from audiolab_tpu.models.yue import YuEVocab
    from audiolab_tpu.utils.convert import load_yue_pipeline

    s1_dir = str(tmp_path / "stage1")
    s2_dir = str(tmp_path / "stage2")
    sd1 = _write_llama_dir(s1_dir, shards=1, seed=1)
    _write_llama_dir(s2_dir, shards=3, seed=2)  # sharded-index path

    torch.manual_seed(3)
    xt = XCodecDecoderTorch(n_q=2, bins=16, dim=12, acoustic=4,
                            dec_dim=16, rates=(2, 5)).eval()
    xcodec_path = str(tmp_path / "final.pth")
    torch.save({"codec_model": xt.state_dict()}, xcodec_path)

    tok_path = str(tmp_path / "tokenizer.model")
    with open(tok_path, "wb") as f:
        f.write(_tiny_unigram_proto())

    pipe = load_yue_pipeline(
        s1_dir, s2_dir, xcodec_path, tokenizer_model=tok_path,
        xcodec_cfg=XCodecConfig(n_q=2, codebook_size=16, dim=12,
                                acoustic_dim=4, decoder_dim=16,
                                rates=(2, 5)))

    # stage-1 weights really landed (embedding matches the saved file)
    emb = np.asarray(pipe.s1_params["tok_emb"]["embedding"])
    np.testing.assert_allclose(
        emb, sd1["model.embed_tokens.weight"].numpy(), atol=1e-6)
    assert pipe.cfg.stage1.n_kv_heads == 2  # GQA read from config.json
    assert pipe.tokenizer is not None
    assert pipe.tokenizer.tokenize("the fire")  # mm tokenizer functional

    # the checkpoint-faithful decode path is wired and runs
    codes = jnp.asarray(np.random.default_rng(4).integers(0, 16, (2, 2, 6)))
    audio = pipe.xcodec.apply({"params": pipe.xcodec_params}, codes)
    assert np.isfinite(np.asarray(audio)).all()
    assert audio.shape[-1] == 6 * 10  # rates (2,5) -> hop 10


def test_lm_config_from_hf_dir_defaults(tmp_path):
    from audiolab_tpu.utils.convert import lm_config_from_hf_dir

    d = str(tmp_path)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"vocab_size": 100, "hidden_size": 16,
                   "num_hidden_layers": 1, "num_attention_heads": 2,
                   "intermediate_size": 32}, f)
    cfg = lm_config_from_hf_dir(d)
    assert cfg.n_kv_heads == 2            # defaults to heads (no GQA key)
    assert cfg.rope_theta == 10000.0
    assert cfg.max_seq_len == 4096
