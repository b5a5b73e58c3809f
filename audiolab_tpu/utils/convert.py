"""Torch→flax weight converters.

The reference distributes pretrained torch checkpoints (RVC .pth voice
models at modules/rvc/infer/modules/vc/pipeline.py:360-433, fairseq HuBERT
at vc/utils.py:181-192).  These converters map them ONCE into the flax
param trees used here; all layouts become time-major NWC and weight-norm
is folded (models/layers.py note).

Layout rules:
  torch Conv1d  weight (out, in, k)      -> flax (k, in, out)
  torch ConvT1d weight (in, out, k)      -> flax (k, in, out)
  torch Linear  weight (out, in)         -> flax kernel (in, out)
  torch Embedding / LayerNorm            -> direct (gamma->scale)
  weight-norm  (weight_g, weight_v)      -> g * v / ||v||  folded

The mapping is a declarative table {flax_path: (kind, torch_key)} — one
source of truth for conversion AND for fabricating synthetic torch dicts in
tests (no real checkpoints are downloadable in this environment)."""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

# kinds: how a flax leaf derives from torch tensors
#   conv_w      kernel of plain Conv1d        <- key + ".weight"
#   convwn_w    kernel of weight-normed conv  <- key + ".weight_{g,v}" (or .weight)
#   convTwn_w   kernel of weight-normed ConvT <- same, transpose differs
#   dense_w     kernel of Linear              <- key + ".weight"
#   dense1x1_w  kernel of 1x1 conv as Dense   <- key + ".weight"
#   bias        bias                          <- key + ".bias"
#   direct      verbatim                      <- key
#   gamma/beta  LayerNorm scale/bias          <- key + ".gamma"/".beta"
#   w/b         generic .weight/.bias verbatim


def torch_load_weights(path: str) -> dict:
    """Load a torch checkpoint SAFELY (``weights_only=True``).

    Full pickle load (``weights_only=False``) is an arbitrary-code-execution
    primitive on untrusted files; every loader here goes through this
    helper.  Checkpoints whose payload is plain tensors + containers (RVC
    .pth from process_ckpt.py:13-56, plain state_dicts) load fine.  Fairseq
    HuBERT checkpoints embed fairseq config objects; we allowlist them via
    ``add_safe_globals`` when fairseq is importable, otherwise the file must
    be re-exported as a plain state_dict first.

    ``.npz`` / ``.safetensors`` paths load without torch entirely.
    """
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=False))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)

    import torch

    safe: list = []
    try:  # pragma: no cover - fairseq not in this image
        from fairseq.data.dictionary import Dictionary

        safe.append(Dictionary)
    except Exception:
        pass
    if safe:
        torch.serialization.add_safe_globals(safe)
    return torch.load(path, map_location="cpu", weights_only=True)


def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 0) -> np.ndarray:
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _get_wn(sd: dict, key: str) -> np.ndarray:
    if key + ".weight" in sd:
        return np.asarray(sd[key + ".weight"])
    if key + ".weight_g" in sd:
        return fold_weight_norm(np.asarray(sd[key + ".weight_g"]),
                                np.asarray(sd[key + ".weight_v"]), dim=0)
    # torch >= 2 parametrized weight_norm (original0 = g, original1 = v)
    return fold_weight_norm(
        np.asarray(sd[key + ".parametrizations.weight.original0"]),
        np.asarray(sd[key + ".parametrizations.weight.original1"]), dim=0)


def _get_wn2(sd: dict, key: str) -> np.ndarray:
    """Weight-norm fold over dim=2 (fairseq pos_conv: weight_g is (1,1,k))."""
    if key + ".weight" in sd:
        return np.asarray(sd[key + ".weight"])
    if key + ".weight_g" in sd:
        return fold_weight_norm(np.asarray(sd[key + ".weight_g"]),
                                np.asarray(sd[key + ".weight_v"]), dim=2)
    # torch >= 2 parametrized weight_norm (transformers wav2vec2 pos_conv)
    return fold_weight_norm(
        np.asarray(sd[key + ".parametrizations.weight.original0"]),
        np.asarray(sd[key + ".parametrizations.weight.original1"]), dim=2)


def extract(kind: str, key: str, sd: dict) -> np.ndarray:
    if kind == "conv_w":
        return np.transpose(np.asarray(sd[key + ".weight"]), (2, 1, 0))
    if kind == "convwn_w":
        return np.transpose(_get_wn(sd, key), (2, 1, 0))
    if kind == "convwn2_w":
        return np.transpose(_get_wn2(sd, key), (2, 1, 0))
    if kind == "convTwn_w":
        # torch ConvT weight (in, out, k) -> flax default ConvTranspose
        # kernel (k, in, out) WITH a spatial flip (validated against real
        # torch in tests/test_torch_parity.py)
        return np.transpose(_get_wn(sd, key), (2, 0, 1))[::-1].copy()
    if kind == "dense_w":
        return np.asarray(sd[key + ".weight"]).T
    if kind == "dense1x1_w":
        return np.asarray(sd[key + ".weight"])[:, :, 0].T
    if kind == "bias":
        return np.asarray(sd[key + ".bias"])
    if kind == "direct":
        return np.asarray(sd[key])
    if kind == "direct_t":
        return np.asarray(sd[key]).T
    if kind == "gamma":
        return np.asarray(sd[key + ".gamma"])
    if kind == "beta":
        return np.asarray(sd[key + ".beta"])
    if kind == "w":
        return np.asarray(sd[key + ".weight"])
    if kind == "b":
        return np.asarray(sd[key + ".bias"])
    if kind == "bnfold_w":
        # inference-folded BatchNorm: scale = w / sqrt(var + eps)
        rv = np.asarray(sd[key + ".running_var"], np.float64)
        return (np.asarray(sd[key + ".weight"], np.float64)
                / np.sqrt(rv + 1e-5))
    if kind == "bnfold_b":
        rv = np.asarray(sd[key + ".running_var"], np.float64)
        rm = np.asarray(sd[key + ".running_mean"], np.float64)
        w = np.asarray(sd[key + ".weight"], np.float64)
        b = np.asarray(sd[key + ".bias"], np.float64)
        return b - rm * w / np.sqrt(rv + 1e-5)
    if kind == "bnfoldna_w":
        # affine=False BatchNorm: pure running-stat normalisation
        rv = np.asarray(sd[key + ".running_var"], np.float64)
        return 1.0 / np.sqrt(rv + 1e-5)
    if kind == "bnfoldna_b":
        rv = np.asarray(sd[key + ".running_var"], np.float64)
        rm = np.asarray(sd[key + ".running_mean"], np.float64)
        return -rm / np.sqrt(rv + 1e-5)
    if kind == "conv2_w":
        # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
        return np.transpose(np.asarray(sd[key + ".weight"]), (2, 3, 1, 0))
    if kind == "convT2_w":
        # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
        # with a spatial flip (validated to 1e-14 vs torch k3/s2/p1/outpad1
        # with flax padding ((1,2),(1,2)) in tests/test_torch_parity_full)
        w = np.transpose(np.asarray(sd[key + ".weight"]), (2, 3, 0, 1))
        return w[::-1, ::-1].copy()
    if kind == "dg_qkv":
        # flax-style DenseGeneral (in, heads, hd) -> Dense kernel (in, h*d);
        # key format "torchkey|heads" (no transpose: DenseGeneral kernels
        # are already input-major, dia/layers.py:30-91)
        tk, h = key.rsplit("|", 1)
        w = np.asarray(sd[tk + ".weight"])
        return w.reshape(w.shape[0], -1)
    if kind == "dg_out":
        # DenseGeneral (heads, hd, out) -> Dense kernel (h*d, out)
        tk, h = key.rsplit("|", 1)
        w = np.asarray(sd[tk + ".weight"])
        return w.reshape(-1, w.shape[-1])
    if kind == "dg_w":
        # DenseGeneral (in, out): already flax kernel layout
        return np.asarray(sd[key + ".weight"])
    if kind == "fused0":
        return np.asarray(sd[key + ".weight"])[:, 0, :]
    if kind == "fused1":
        return np.asarray(sd[key + ".weight"])[:, 1, :]
    if kind == "logits_q":
        tk, q = key.rsplit("|", 1)
        return np.asarray(sd[tk + ".weight"])[:, int(q), :]
    if kind == "dwconv_w":
        # depthwise Conv1d (channels, 1, k) -> our (k, channels) param
        return np.asarray(sd[key + ".weight"])[:, 0, :].T
    if kind == "convwn2d_w":
        # weight-normed Conv2d (out,in,kh,kw) -> flax (kh,kw,in,out)
        if key + ".weight" in sd:
            w = np.asarray(sd[key + ".weight"])
        else:
            w = fold_weight_norm(np.asarray(sd[key + ".weight_g"]),
                                 np.asarray(sd[key + ".weight_v"]), dim=0)
        return np.transpose(w, (2, 3, 1, 0))
    if kind == "wslice":
        # key "torchkey|i|n": slice i of n equal row-blocks of .weight,
        # transposed to a flax Dense kernel (fused qkv / gated-mlp splits)
        tk, i, n = key.rsplit("|", 2)
        w = np.asarray(sd[tk + ".weight"])
        h = w.shape[0] // int(n)
        i = int(i)
        return w[i * h:(i + 1) * h].T
    if kind == "bslice":
        # key "torchkey|i|n": slice i of n equal blocks of .bias
        tk, i, n = key.rsplit("|", 2)
        b = np.asarray(sd[tk + ".bias"])
        h = b.shape[0] // int(n)
        i = int(i)
        return b[i * h:(i + 1) * h]
    if kind == "snake_a":
        # Snake1d alpha (1, ch, 1) -> flax (ch,)
        return np.asarray(sd[key + ".alpha"]).reshape(-1)
    if kind == "densewn1x1_w":
        # weight-normed 1x1 Conv1d as a Dense: fold then (out,in,1)->(in,out)
        return _get_wn(sd, key)[:, :, 0].T
    if kind == "patch_w":
        # key "torchkey|kh": Conv2d k=(kh,1) stride=(kh,1) over height==kh
        # == Dense over flattened (c, h) C-order: (O,I,kh,1) -> (I*kh, O)
        tk, kh = key.rsplit("|", 1)
        w = np.asarray(sd[tk + ".weight"])[:, :, :, 0]
        return w.reshape(w.shape[0], -1).T
    if kind == "conv2d1x1_w":
        # Conv2d 1x1 as a Dense: (O, I, 1, 1) -> (I, O)
        return np.asarray(sd[key + ".weight"])[:, :, 0, 0].T
    if kind.startswith("lstm_"):
        # key "{torch_lstm_prefix}.{l0|l0_reverse}|{i|f|g|o}"; torch packs
        # weight_ih_l{k} rows as [i, f, g, o] — the same gate set/order as
        # flax OptimizedLSTMCell's ii/if/ig/io + hi/hf/hg/ho
        base_sfx, gate = key.split("|")
        base, sfx = base_sfx.rsplit(".", 1)
        g = {"i": 0, "f": 1, "g": 2, "o": 3}[gate]
        if kind == "lstm_iw":
            w = np.asarray(sd[f"{base}.weight_ih_{sfx}"])
            h = w.shape[0] // 4
            return w[g * h:(g + 1) * h].T
        if kind == "lstm_hw":
            w = np.asarray(sd[f"{base}.weight_hh_{sfx}"])
            h = w.shape[0] // 4
            return w[g * h:(g + 1) * h].T
        if kind == "lstm_hb":
            # flax biases live on the hidden dense: fold b_ih + b_hh
            bi = np.asarray(sd[f"{base}.bias_ih_{sfx}"])
            bh = np.asarray(sd[f"{base}.bias_hh_{sfx}"])
            h = bi.shape[0] // 4
            return bi[g * h:(g + 1) * h] + bh[g * h:(g + 1) * h]
    if kind.startswith("gru_"):
        # key format "{torch_gru_prefix}.{l0|l0_reverse}|{r|z|n}"
        base_sfx, gate = key.split("|")
        base, sfx = base_sfx.rsplit(".", 1)
        g = {"r": 0, "z": 1, "n": 2}[gate]
        if kind == "gru_iw":
            w = np.asarray(sd[f"{base}.weight_ih_{sfx}"])
            h = w.shape[0] // 3
            return w[g * h:(g + 1) * h].T
        if kind == "gru_hw":
            w = np.asarray(sd[f"{base}.weight_hh_{sfx}"])
            h = w.shape[0] // 3
            return w[g * h:(g + 1) * h].T
        if kind == "gru_ib":
            bi = np.asarray(sd[f"{base}.bias_ih_{sfx}"])
            h = bi.shape[0] // 3
            if gate == "n":
                # torch: n = tanh(W_in x + b_in + r*(W_hn h + b_hn)); flax
                # keeps b_in on the input dense and b_hn on hn
                return bi[2 * h:3 * h]
            # r/z gates: flax has no hidden-side bias, so fold b_hh in
            bh = np.asarray(sd[f"{base}.bias_hh_{sfx}"])
            return bi[g * h:(g + 1) * h] + bh[g * h:(g + 1) * h]
        if kind == "gru_hb":
            bh = np.asarray(sd[f"{base}.bias_hh_{sfx}"])
            h = bh.shape[0] // 3
            return bh[2 * h:3 * h]
    raise ValueError(f"unknown kind {kind}")


def fabricate(kind: str, key: str, flax_shape: tuple, sd: dict, rng) -> None:
    """Inverse of ``extract`` for tests: put torch-layout arrays into sd."""
    def put(k, arr):
        sd.setdefault(k, np.asarray(arr, np.float32))

    if kind == "conv_w":
        put(key + ".weight", rng.standard_normal(
            (flax_shape[2], flax_shape[1], flax_shape[0])))
    elif kind == "convwn_w":
        v = rng.standard_normal((flax_shape[2], flax_shape[1], flax_shape[0]))
        put(key + ".weight_v", v)
        put(key + ".weight_g", np.abs(rng.standard_normal((v.shape[0], 1, 1))) + 0.5)
    elif kind == "convwn2_w":
        v = rng.standard_normal((flax_shape[2], flax_shape[1], flax_shape[0]))
        put(key + ".weight_v", v)
        put(key + ".weight_g", np.abs(rng.standard_normal((1, 1, v.shape[2]))) + 0.5)
    elif kind == "convTwn_w":
        # inverse of extract: torch layout (in, out, k)
        v = rng.standard_normal((flax_shape[1], flax_shape[2], flax_shape[0]))
        put(key + ".weight_v", v)
        put(key + ".weight_g", np.abs(rng.standard_normal((v.shape[0], 1, 1))) + 0.5)
    elif kind == "dense_w":
        put(key + ".weight", rng.standard_normal((flax_shape[1], flax_shape[0])))
    elif kind == "dense1x1_w":
        put(key + ".weight",
            rng.standard_normal((flax_shape[1], flax_shape[0], 1)))
    elif kind == "bias":
        put(key + ".bias", rng.standard_normal(flax_shape))
    elif kind == "direct":
        put(key, rng.standard_normal(flax_shape))
    elif kind == "direct_t":
        put(key, rng.standard_normal(flax_shape[::-1]))
    elif kind == "gamma":
        put(key + ".gamma", rng.standard_normal(flax_shape))
    elif kind == "beta":
        put(key + ".beta", rng.standard_normal(flax_shape))
    elif kind == "w":
        put(key + ".weight", rng.standard_normal(flax_shape))
    elif kind == "b":
        put(key + ".bias", rng.standard_normal(flax_shape))
    elif kind in ("bnfold_w", "bnfold_b"):
        put(key + ".weight", rng.standard_normal(flax_shape))
        put(key + ".bias", rng.standard_normal(flax_shape))
        put(key + ".running_mean", rng.standard_normal(flax_shape) * 0.1)
        put(key + ".running_var",
            np.abs(rng.standard_normal(flax_shape)) + 0.5)
    elif kind == "conv2_w":
        put(key + ".weight", rng.standard_normal(
            (flax_shape[3], flax_shape[2], flax_shape[0], flax_shape[1])))
    elif kind == "convT2_w":
        put(key + ".weight", rng.standard_normal(
            (flax_shape[2], flax_shape[3], flax_shape[0], flax_shape[1])))
    elif kind == "dg_qkv":
        tk, h = key.rsplit("|", 1)
        h = int(h)
        put(tk + ".weight", rng.standard_normal(
            (flax_shape[0], h, flax_shape[1] // h)))
    elif kind == "dg_out":
        tk, h = key.rsplit("|", 1)
        h = int(h)
        put(tk + ".weight", rng.standard_normal(
            (h, flax_shape[0] // h, flax_shape[1])))
    elif kind == "dg_w":
        put(key + ".weight", rng.standard_normal(flax_shape))
    elif kind in ("fused0", "fused1"):
        put(key + ".weight", rng.standard_normal(
            (flax_shape[0], 2, flax_shape[1])))
    elif kind == "logits_q":
        tk, _q = key.rsplit("|", 1)
        # created lazily at full size on first touch; q count unknown here,
        # so fabricate per-slice via a dict of columns is avoided: tests
        # use the torch replica for logits coverage instead
        pass
    elif kind == "dwconv_w":
        put(key + ".weight",
            rng.standard_normal((flax_shape[1], 1, flax_shape[0])))
    elif kind == "convwn2d_w":
        v = rng.standard_normal(
            (flax_shape[3], flax_shape[2], flax_shape[0], flax_shape[1]))
        put(key + ".weight_v", v)
        put(key + ".weight_g",
            np.abs(rng.standard_normal((v.shape[0], 1, 1, 1))) + 0.5)
    elif kind == "wslice":
        tk, _i, n = key.rsplit("|", 2)
        put(tk + ".weight",
            rng.standard_normal((int(n) * flax_shape[1], flax_shape[0])))
    elif kind == "snake_a":
        put(key + ".alpha", rng.standard_normal((1, flax_shape[0], 1)) * 0.1 + 1.0)
    elif kind == "patch_w":
        tk, kh = key.rsplit("|", 1)
        kh = int(kh)
        put(tk + ".weight", rng.standard_normal(
            (flax_shape[1], flax_shape[0] // kh, kh, 1)))
    elif kind == "conv2d1x1_w":
        put(key + ".weight", rng.standard_normal(
            (flax_shape[1], flax_shape[0], 1, 1)))
    elif kind == "densewn1x1_w":
        v = rng.standard_normal((flax_shape[1], flax_shape[0], 1))
        put(key + ".weight_v", v)
        put(key + ".weight_g", np.abs(rng.standard_normal((v.shape[0], 1, 1))) + 0.5)
    elif kind.startswith("gru_"):
        base_sfx, _gate = key.split("|")
        base, sfx = base_sfx.rsplit(".", 1)
        if kind in ("gru_iw", "gru_ib"):
            n_in, h = (flax_shape if kind == "gru_iw"
                       else (None, flax_shape[0]))
            if kind == "gru_iw":
                put(f"{base}.weight_ih_{sfx}", rng.standard_normal((3 * h, n_in)))
            put(f"{base}.bias_ih_{sfx}", rng.standard_normal((3 * h,)))
            put(f"{base}.bias_hh_{sfx}", rng.standard_normal((3 * h,)))
        else:  # gru_hw / gru_hb
            h = flax_shape[0] if kind == "gru_hb" else flax_shape[1]
            put(f"{base}.weight_hh_{sfx}", rng.standard_normal((3 * h, h)))
            put(f"{base}.bias_hh_{sfx}", rng.standard_normal((3 * h,)))
            put(f"{base}.bias_ih_{sfx}", rng.standard_normal((3 * h,)))


def tree_paths(template: dict, prefix: str = "") -> dict[str, tuple]:
    out = {}
    for k, v in template.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_paths(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def fill_tree(template: dict, mapping: dict[str, tuple[str, str]], sd: dict,
              strict: bool = True) -> dict:
    """mapping: {flax_path: (kind, torch_key)}; shape-checked fill."""
    problems = []

    def walk(node, path):
        out = {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                if p not in mapping:
                    problems.append(f"no mapping for {p}")
                    out[k] = np.asarray(v)
                    continue
                kind, key = mapping[p]
                try:
                    arr = extract(kind, key, sd).astype(np.float32)
                except KeyError as e:
                    problems.append(f"{p}: missing torch key {e}")
                    out[k] = np.asarray(v)
                    continue
                if arr.shape != v.shape:
                    problems.append(f"{p}: shape {arr.shape} != {v.shape}")
                out[k] = arr
        return out

    filled = walk(template, "")
    if problems and strict:
        raise ValueError("conversion failed:\n  " + "\n  ".join(problems[:25]))
    return filled


def synth_state_dict(template: dict, mapping: dict[str, tuple[str, str]],
                     seed: int = 0) -> dict:
    """Fabricate a torch-layout state dict covering the whole mapping."""
    rng = np.random.default_rng(seed)
    sd: dict = {}
    shapes = tree_paths(template)
    for path, (kind, key) in mapping.items():
        if path in shapes:
            fabricate(kind, key, shapes[path], sd, rng)
    return sd


# ------------------------------------------------------------------ RVC

def rvc_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax path -> (kind, torch key) for RVC SynthesizerTrn
    (reference names: infer_pack/models.py)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense1x1(path, key):
        m[f"{path}/kernel"] = ("dense1x1_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("gamma", key)
        m[f"{path}/bias"] = ("beta", key)

    dense("enc_p/emb_phone", "enc_p.emb_phone")
    m["enc_p/emb_pitch/embedding"] = ("w", "enc_p.emb_pitch")
    conv("enc_p/proj/Conv_0", "enc_p.proj")
    enc = template["enc_p"]["encoder"]
    for i in range(sum(1 for k in enc if k.startswith("attn_"))):
        b = "enc_p.encoder"
        for w in ("conv_q", "conv_k", "conv_v", "conv_o"):
            dense1x1(f"enc_p/encoder/attn_{i}/{w}", f"{b}.attn_layers.{i}.{w}")
        m[f"enc_p/encoder/attn_{i}/emb_rel_k"] = ("direct",
                                                  f"{b}.attn_layers.{i}.emb_rel_k")
        m[f"enc_p/encoder/attn_{i}/emb_rel_v"] = ("direct",
                                                  f"{b}.attn_layers.{i}.emb_rel_v")
        norm(f"enc_p/encoder/norm1_{i}", f"{b}.norm_layers_1.{i}")
        norm(f"enc_p/encoder/norm2_{i}", f"{b}.norm_layers_2.{i}")
        conv(f"enc_p/encoder/ffn_{i}/conv_1/Conv_0", f"{b}.ffn_layers.{i}.conv_1")
        conv(f"enc_p/encoder/ffn_{i}/conv_2/Conv_0", f"{b}.ffn_layers.{i}.conv_2")

    for fi in range(sum(1 for k in template["flow"] if k.startswith("flow_"))):
        t = 2 * fi  # odd torch indices are parameter-free Flips
        conv(f"flow/flow_{fi}/pre/Conv_0", f"flow.flows.{t}.pre")
        conv(f"flow/flow_{fi}/post/Conv_0", f"flow.flows.{t}.post")
        enc_f = template["flow"][f"flow_{fi}"]["enc"]
        for j in range(sum(1 for k in enc_f if k.startswith("in_layer_"))):
            wn(f"flow/flow_{fi}/enc/in_layer_{j}/Conv_0",
               f"flow.flows.{t}.enc.in_layers.{j}")
            wn(f"flow/flow_{fi}/enc/res_skip_{j}/Conv_0",
               f"flow.flows.{t}.enc.res_skip_layers.{j}")
        if "cond_layer" in enc_f:
            wn(f"flow/flow_{fi}/enc/cond_layer/Conv_0",
               f"flow.flows.{t}.enc.cond_layer")

    if "enc_q" in template:
        conv("enc_q/pre/Conv_0", "enc_q.pre")
        conv("enc_q/proj/Conv_0", "enc_q.proj")
        enc_q = template["enc_q"]["enc"]
        for j in range(sum(1 for k in enc_q if k.startswith("in_layer_"))):
            wn(f"enc_q/enc/in_layer_{j}/Conv_0", f"enc_q.enc.in_layers.{j}")
            wn(f"enc_q/enc/res_skip_{j}/Conv_0", f"enc_q.enc.res_skip_layers.{j}")
        if "cond_layer" in enc_q:
            wn("enc_q/enc/cond_layer/Conv_0", "enc_q.enc.cond_layer")

    conv("dec/conv_pre/Conv_0", "dec.conv_pre")
    conv("dec/cond/Conv_0", "dec.cond")
    m["dec/conv_post/Conv_0/kernel"] = ("convwn_w", "dec.conv_post")
    dense("dec/source_linear", "dec.m_source.l_linear")
    dec_t = template["dec"]
    n_kernels = 3
    for key in dec_t:
        if key.startswith("up_"):
            i = int(key.split("_")[1])
            m[f"dec/{key}/ConvTranspose_0/kernel"] = ("convTwn_w", f"dec.ups.{i}")
            m[f"dec/{key}/ConvTranspose_0/bias"] = ("bias", f"dec.ups.{i}")
        elif key.startswith("noise_conv_"):
            i = int(key.split("_")[2])
            conv(f"dec/{key}", f"dec.noise_convs.{i}")
        elif key.startswith("resblock_"):
            _, i, j = key.split("_")
            flat = int(i) * n_kernels + int(j)
            for cj in range(3):
                for ours, theirs in (("conv1", "convs1"), ("conv2", "convs2")):
                    wn(f"dec/{key}/{ours}_{cj}/Conv_0",
                       f"dec.resblocks.{flat}.{theirs}.{cj}")
    m["emb_g/embedding"] = ("w", "emb_g")
    return m


def convert_rvc(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, rvc_mapping(template), sd, strict)


def load_rvc_checkpoint(path: str):
    """Load a reference .pth (torch CPU; cpt = {"weight","config","sr",
    "f0","version"} per process_ckpt.py) -> (flax params, SynthesizerConfig)."""
    import torch

    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn, config_for

    cpt = torch_load_weights(path)
    sd = {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v,
                        np.float32) for k, v in cpt["weight"].items()}
    sr_tag = str(cpt.get("sr", "48k"))
    sr = {"32k": 32000, "40k": 40000, "48k": 48000}.get(sr_tag, 48000)
    cfg = config_for(sr, cpt.get("version", "v2"))
    model = SynthesizerTrn(cfg)
    t = 16
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, cfg.feat_channels)), jnp.full((1,), t, jnp.int32),
        jnp.ones((1, t), jnp.int32), jnp.full((1, t), 200.0),
        jnp.zeros((1,), jnp.int32), None, method=SynthesizerTrn.infer,
    )["params"]
    return convert_rvc(sd, template), cfg


# ------------------------------------------------------------------ HuBERT

def hubert_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """fairseq HubertModel names -> our flax tree (models/hubert.py)."""
    m: dict[str, tuple[str, str]] = {}
    hub = template["hubert"]

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    n_convs = sum(1 for k in hub["feature_extractor"] if k.startswith("conv_"))
    for i in range(n_convs):
        m[f"hubert/feature_extractor/conv_{i}/kernel"] = (
            "conv_w", f"feature_extractor.conv_layers.{i}.0")
    norm("hubert/feature_extractor/gn_0", "feature_extractor.conv_layers.0.2")
    dense("hubert/post_extract_proj", "post_extract_proj")
    norm("hubert/ln_post_extract", "layer_norm")
    norm("hubert/ln_pre", "encoder.layer_norm")
    # fairseq weight-norms pos_conv over dim=2 (weight_g shape (1,1,k))
    m["hubert/pos_conv/kernel"] = ("convwn2_w", "encoder.pos_conv.0")
    m["hubert/pos_conv/bias"] = ("bias", "encoder.pos_conv.0")

    i = 0
    while f"layer_{i}" in hub:
        b = f"encoder.layers.{i}"
        for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"hubert/layer_{i}/attn/{w}", f"{b}.self_attn.{w}")
        dense(f"hubert/layer_{i}/fc1", f"{b}.fc1")
        dense(f"hubert/layer_{i}/fc2", f"{b}.fc2")
        norm(f"hubert/layer_{i}/ln1", f"{b}.self_attn_layer_norm")
        norm(f"hubert/layer_{i}/ln2", f"{b}.final_layer_norm")
        i += 1
    if "final_proj" in hub:
        dense("hubert/final_proj", "final_proj")
    return m


def hubert_wrapper_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """Mapping for the HubertFeatureExtractor wrapper tree, whose v1 path
    adds a top-level final_proj Dense next to the inner ``hubert`` tree."""
    m = hubert_mapping(template)
    if "final_proj" in template:
        m["final_proj/kernel"] = ("dense_w", "final_proj")
        m["final_proj/bias"] = ("bias", "final_proj")
    return m


def convert_hubert(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, hubert_wrapper_mapping(template), sd, strict)


# ------------------------------------------------------------------ Whisper

def whisper_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """OpenAI whisper state-dict names -> our flax tree (models/whisper.py).

    torch names: encoder.conv1/conv2, encoder.blocks.N.attn.{query,key,
    value,out}, attn_ln, mlp.0/mlp.2, mlp_ln, encoder.ln_post,
    decoder.token_embedding, decoder.positional_embedding,
    decoder.blocks.N.{attn,cross_attn}.*, decoder.ln."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    enc = template["encoder"]
    conv("encoder/conv1", "encoder.conv1")
    conv("encoder/conv2", "encoder.conv2")
    norm("encoder/ln_post", "encoder.ln_post")
    for i in range(sum(1 for k in enc if k.startswith("block_"))):
        b = f"encoder.blocks.{i}"
        p = f"encoder/block_{i}"
        dense(f"{p}/wq", f"{b}.attn.query")
        dense(f"{p}/wk", f"{b}.attn.key", bias=False)
        dense(f"{p}/wv", f"{b}.attn.value")
        dense(f"{p}/wo", f"{b}.attn.out")
        norm(f"{p}/attn_ln", f"{b}.attn_ln")
        dense(f"{p}/fc1", f"{b}.mlp.0")
        dense(f"{p}/fc2", f"{b}.mlp.2")
        norm(f"{p}/mlp_ln", f"{b}.mlp_ln")

    dec = template["decoder"]
    m["decoder/emb/embedding"] = ("direct", "decoder.token_embedding.weight")
    m["decoder/pos"] = ("direct", "decoder.positional_embedding")
    norm("decoder/ln", "decoder.ln")
    for i in range(sum(1 for k in dec if k.startswith("block_"))):
        b = f"decoder.blocks.{i}"
        p = f"decoder/block_{i}"
        dense(f"{p}/wq", f"{b}.attn.query")
        dense(f"{p}/wk", f"{b}.attn.key", bias=False)
        dense(f"{p}/wv", f"{b}.attn.value")
        dense(f"{p}/wo", f"{b}.attn.out")
        norm(f"{p}/attn_ln", f"{b}.attn_ln")
        dense(f"{p}/cq", f"{b}.cross_attn.query")
        dense(f"{p}/ck", f"{b}.cross_attn.key", bias=False)
        dense(f"{p}/cv", f"{b}.cross_attn.value")
        dense(f"{p}/co", f"{b}.cross_attn.out")
        norm(f"{p}/cross_ln", f"{b}.cross_attn_ln")
        dense(f"{p}/fc1", f"{b}.mlp.0")
        dense(f"{p}/fc2", f"{b}.mlp.2")
        norm(f"{p}/mlp_ln", f"{b}.mlp_ln")
    return m


def convert_whisper(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, whisper_mapping(template), sd, strict)


# ------------------------------------------------------------------ RMVPE

def _rmvpe_block(m: dict, path: str, key: str, tpl: dict) -> None:
    """One ConvBlockRes: flax {conv1,bn1,conv2,bn2[,shortcut]} <-
    torch Sequential indices .conv.{0,1,3,4} (+ .shortcut)."""
    m[f"{path}/conv1/kernel"] = ("conv2_w", f"{key}.conv.0")
    m[f"{path}/bn1/scale"] = ("w", f"{key}.conv.1")
    m[f"{path}/bn1/bias"] = ("b", f"{key}.conv.1")
    m[f"{path}/conv2/kernel"] = ("conv2_w", f"{key}.conv.3")
    m[f"{path}/bn2/scale"] = ("w", f"{key}.conv.4")
    m[f"{path}/bn2/bias"] = ("b", f"{key}.conv.4")
    if "shortcut" in tpl:
        m[f"{path}/shortcut/kernel"] = ("conv2_w", f"{key}.shortcut")
        m[f"{path}/shortcut/bias"] = ("bias", f"{key}.shortcut")


def _rmvpe_gru(m: dict, path: str, base: str, sfx: str) -> None:
    for gate in "rzn":
        m[f"{path}/i{gate}/kernel"] = ("gru_iw", f"{base}.{sfx}|{gate}")
        m[f"{path}/i{gate}/bias"] = ("gru_ib", f"{base}.{sfx}|{gate}")
        m[f"{path}/h{gate}/kernel"] = ("gru_hw", f"{base}.{sfx}|{gate}")
    m[f"{path}/hn/bias"] = ("gru_hb", f"{base}.{sfx}|n")


def rmvpe_mapping(params: dict) -> dict[str, tuple[str, str]]:
    """flax params tree -> rmvpe.pt state-dict names (E2E(4,1,(2,2)),
    reference modules/rvc/infer/lib/rmvpe.py:430-473)."""
    m: dict[str, tuple[str, str]] = {}
    unet = params["unet"]
    m["unet/bn_in/scale"] = ("w", "unet.encoder.bn")
    m["unet/bn_in/bias"] = ("b", "unet.encoder.bn")
    for name, tpl in unet.items():
        if name.startswith("enc_") or name.startswith("inter_"):
            i = int(name.split("_")[1])
            tk = ("unet.encoder.layers" if name.startswith("enc_")
                  else "unet.intermediate.layers")
            for bname, btpl in tpl.items():
                j = int(bname.split("_")[1])
                _rmvpe_block(m, f"unet/{name}/{bname}", f"{tk}.{i}.conv.{j}",
                             btpl)
        elif name.startswith("dec_"):
            i = int(name.split("_")[1])
            tk = f"unet.decoder.layers.{i}"
            m[f"unet/{name}/convt/kernel"] = ("convT2_w", f"{tk}.conv1.0")
            m[f"unet/{name}/bn/scale"] = ("w", f"{tk}.conv1.1")
            m[f"unet/{name}/bn/bias"] = ("b", f"{tk}.conv1.1")
            for bname, btpl in tpl.items():
                if bname.startswith("block_"):
                    j = int(bname.split("_")[1])
                    _rmvpe_block(m, f"unet/{name}/{bname}",
                                 f"{tk}.conv2.{j}", btpl)
    m["cnn/kernel"] = ("conv2_w", "cnn")
    m["cnn/bias"] = ("bias", "cnn")
    _rmvpe_gru(m, "gru/GRUCell_0", "fc.0.gru", "l0")
    _rmvpe_gru(m, "gru/GRUCell_1", "fc.0.gru", "l0_reverse")
    m["fc/kernel"] = ("dense_w", "fc.1")
    m["fc/bias"] = ("bias", "fc.1")
    return m


def rmvpe_stats_mapping(stats: dict) -> dict[str, tuple[str, str]]:
    """batch_stats tree (mean/var) -> torch running_mean/running_var keys."""
    m: dict[str, tuple[str, str]] = {}

    def bn(path, key):
        m[f"{path}/mean"] = ("direct", f"{key}.running_mean")
        m[f"{path}/var"] = ("direct", f"{key}.running_var")

    unet = stats["unet"]
    bn("unet/bn_in", "unet.encoder.bn")
    for name, tpl in unet.items():
        if name.startswith("enc_") or name.startswith("inter_"):
            i = int(name.split("_")[1])
            tk = ("unet.encoder.layers" if name.startswith("enc_")
                  else "unet.intermediate.layers")
            for bname in tpl:
                j = int(bname.split("_")[1])
                bn(f"unet/{name}/{bname}/bn1", f"{tk}.{i}.conv.{j}.conv.1")
                bn(f"unet/{name}/{bname}/bn2", f"{tk}.{i}.conv.{j}.conv.4")
        elif name.startswith("dec_"):
            i = int(name.split("_")[1])
            tk = f"unet.decoder.layers.{i}"
            bn(f"unet/{name}/bn", f"{tk}.conv1.1")
            for bname in tpl:
                if bname.startswith("block_"):
                    j = int(bname.split("_")[1])
                    bn(f"unet/{name}/{bname}/bn1", f"{tk}.conv2.{j}.conv.1")
                    bn(f"unet/{name}/{bname}/bn2", f"{tk}.conv2.{j}.conv.4")
    return m


def convert_rmvpe(state_dict: dict, variables: dict,
                  strict: bool = True) -> dict:
    """torch rmvpe.pt state dict -> flax {"params", "batch_stats"}."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "params": fill_tree(variables["params"],
                            rmvpe_mapping(variables["params"]), sd, strict),
        "batch_stats": fill_tree(
            variables["batch_stats"],
            rmvpe_stats_mapping(variables["batch_stats"]), sd, strict),
    }


def load_rmvpe_checkpoint(path: str) -> dict:
    """rmvpe.pt -> flax variables for models/rmvpe.E2E (full-size)."""
    import jax

    from audiolab_tpu.models.rmvpe import RMVPE

    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    wrapper = RMVPE()
    template = wrapper.init(jax.random.PRNGKey(0), t_frames=32)
    return convert_rmvpe(sd, template)


# ------------------------------------------------------------ BS-RoFormer

def roformer_mapping(template: dict,
                     stems: tuple | list | None = None
                     ) -> dict[str, tuple[str, str]]:
    """flax BSRoformer tree -> lucidrains bs_roformer state-dict names (the
    format of the published viperx/ZFTurbo checkpoints the reference
    downloads, stem_separator.py:379-386)."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def transformer(path, tkey, tpl):
        inner = sum(1 for k in tpl if k.startswith("attn_"))
        for j in range(inner):
            a = f"{tkey}.layers.{j}.0"
            m[f"{path}/attn_{j}/norm/scale"] = ("gamma", f"{a}.norm")
            dense(f"{path}/attn_{j}/to_qkv", f"{a}.to_qkv", bias=False)
            dense(f"{path}/attn_{j}/to_gates", f"{a}.to_gates")
            dense(f"{path}/attn_{j}/to_out", f"{a}.to_out.0", bias=False)
            f = f"{tkey}.layers.{j}.1.net"
            m[f"{path}/ff_{j}/norm/scale"] = ("gamma", f"{f}.0")
            dense(f"{path}/ff_{j}/fc1", f"{f}.1")
            dense(f"{path}/ff_{j}/fc2", f"{f}.4")
        m[f"{path}/norm/scale"] = ("gamma", f"{tkey}.norm")

    n_bands = sum(1 for k in template["band_split"]
                  if k.startswith("norm_scale_"))
    for i in range(n_bands):
        m[f"band_split/norm_scale_{i}"] = ("gamma",
                                           f"band_split.to_features.{i}.0")
        m[f"band_split/proj_kernel_{i}"] = ("dense_w",
                                            f"band_split.to_features.{i}.1")
        m[f"band_split/proj_bias_{i}"] = ("bias",
                                          f"band_split.to_features.{i}.1")

    depth = sum(1 for k in template if k.startswith("time_"))
    for i in range(depth):
        transformer(f"time_{i}", f"layers.{i}.0", template[f"time_{i}"])
        transformer(f"freq_{i}", f"layers.{i}.1", template[f"freq_{i}"])
    m["final_norm/scale"] = ("gamma", "final_norm")

    if stems is None:
        stems = [k[len("mask_"):] for k in template if k.startswith("mask_")]
    for s, stem in enumerate(stems):
        tpl = template.get(f"mask_{stem}")
        if tpl is None:
            continue  # residual stem: no estimator in the checkpoint
        bands = sorted({int(k.split("_")[2]) for k in tpl
                        if k.startswith("mlp_kernel_")})
        for b in bands:
            ks = sorted(int(k.split("_")[3]) for k in tpl
                        if k.startswith(f"mlp_kernel_{b}_"))
            base = f"mask_estimators.{s}.to_freqs.{b}.0"
            for k in ks:
                m[f"mask_{stem}/mlp_kernel_{b}_{k}"] = ("dense_w",
                                                        f"{base}.{2 * k}")
                m[f"mask_{stem}/mlp_bias_{b}_{k}"] = ("bias",
                                                      f"{base}.{2 * k}")
            last = f"{base}.{2 * len(ks)}"
            m[f"mask_{stem}/out_kernel_{b}"] = ("dense_w", last)
            m[f"mask_{stem}/out_bias_{b}"] = ("bias", last)
    return m


def _roformer_unstack(template: dict) -> tuple[dict, int]:
    """Scan-stacked BSRoformer template (params['depth']['time'|'freq']
    leaves carry a leading depth axis) -> unrolled time_i/freq_i view for
    the per-layer checkpoint mapping."""
    import jax

    d = template["depth"]
    depth = next(iter(jax.tree_util.tree_leaves(d))).shape[0]
    out = {k: v for k, v in template.items() if k != "depth"}
    for i in range(depth):
        for axis in ("time", "freq"):
            out[f"{axis}_{i}"] = jax.tree_util.tree_map(
                lambda a: np.zeros(a.shape[1:], np.float32), d[axis])
    return out, depth


def _roformer_restack(filled: dict, depth: int) -> dict:
    import jax

    out = {k: v for k, v in filled.items()
           if not (k.startswith("time_") or k.startswith("freq_"))}
    out["depth"] = {
        axis: jax.tree_util.tree_map(
            lambda *xs: np.stack(xs),
            *[filled[f"{axis}_{i}"] for i in range(depth)])
        for axis in ("time", "freq")
    }
    return out


def convert_roformer(state_dict: dict, template: dict,
                     stems: tuple | list | None = None,
                     strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):  # lightning-style prefix on some ckpts
            k = k[len("model."):]
        sd[k] = np.asarray(v)
    stacked = "depth" in template
    if stacked:
        template, depth = _roformer_unstack(template)
    filled = fill_tree(template, roformer_mapping(template, stems), sd, strict)
    return _roformer_restack(filled, depth) if stacked else filled


def load_roformer_checkpoint(path: str, cfg) -> dict:
    """Published BS-RoFormer .ckpt -> flax params for models/separation.
    ``cfg`` is a RoformerConfig whose dims/bands match the checkpoint yaml
    (dim 512 depth 12 for the SDR-12.96 vocal model)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.separation.roformer import BSRoformer

    ckpt = torch_load_weights(path)
    sd = ckpt.get("state_dict", ckpt.get("state", ckpt))
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    model = BSRoformer(cfg)
    n = cfg.hop * 16
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.channels, n), jnp.float32))
    )["params"]
    return convert_roformer(sd, template, stems=tuple(cfg.stems))


# ------------------------------------------------------------------ CREPE

def crepe_mapping(params: dict) -> dict[str, tuple[str, str]]:
    """flax Crepe tree -> torchcrepe crepe.pth names (conv{i}/conv{i}_BN/
    classifier)."""
    m: dict[str, tuple[str, str]] = {}
    for i in range(1, 7):
        m[f"conv{i}/kernel"] = ("conv2_w", f"conv{i}")
        m[f"conv{i}/bias"] = ("bias", f"conv{i}")
        m[f"conv{i}_BN/scale"] = ("w", f"conv{i}_BN")
        m[f"conv{i}_BN/bias"] = ("b", f"conv{i}_BN")
    m["classifier/kernel"] = ("dense_w", "classifier")
    m["classifier/bias"] = ("bias", "classifier")
    return m


def crepe_stats_mapping(stats: dict) -> dict[str, tuple[str, str]]:
    m: dict[str, tuple[str, str]] = {}
    for i in range(1, 7):
        m[f"conv{i}_BN/mean"] = ("direct", f"conv{i}_BN.running_mean")
        m[f"conv{i}_BN/var"] = ("direct", f"conv{i}_BN.running_var")
    return m


def convert_crepe(state_dict: dict, variables: dict,
                  strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "params": fill_tree(variables["params"],
                            crepe_mapping(variables["params"]), sd, strict),
        "batch_stats": fill_tree(
            variables["batch_stats"],
            crepe_stats_mapping(variables["batch_stats"]), sd, strict),
    }


def load_crepe_checkpoint(path: str, model: str = "full") -> dict:
    """torchcrepe crepe.pth -> flax variables for models/crepe.Crepe."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.crepe import WINDOW, Crepe

    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    net = Crepe(model=model)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, WINDOW), jnp.float32)))
    return convert_crepe(sd, variables)


# -------------------------------------------------------------------- DAC

def dac_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax DACDecoder tree -> descript-audio-codec state-dict names
    (quantizer.quantizers.N / decoder.model.N), decode path only."""
    m: dict[str, tuple[str, str]] = {}

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    n_q = sum(1 for k in template if k.startswith("codebook_"))
    for i in range(n_q):
        m[f"codebook_{i}/embedding"] = (
            "direct", f"quantizer.quantizers.{i}.codebook.weight")
        m[f"out_proj_{i}/kernel"] = (
            "densewn1x1_w", f"quantizer.quantizers.{i}.out_proj")
        m[f"out_proj_{i}/bias"] = (
            "bias", f"quantizer.quantizers.{i}.out_proj")

    wn("conv_in", "decoder.model.0")
    n_rates = sum(1 for k in template if k.startswith("up_"))
    for i in range(n_rates):
        blk = f"decoder.model.{1 + i}.block"
        m[f"snake_{i}/alpha"] = ("snake_a", f"{blk}.0")
        m[f"up_{i}/kernel"] = ("convTwn_w", f"{blk}.1")
        m[f"up_{i}/bias"] = ("bias", f"{blk}.1")
        for j in range(3):
            res = f"{blk}.{2 + j}.block"
            m[f"res_{i}_{j}/s1/alpha"] = ("snake_a", f"{res}.0")
            wn(f"res_{i}_{j}/c1", f"{res}.1")
            m[f"res_{i}_{j}/s2/alpha"] = ("snake_a", f"{res}.2")
            wn(f"res_{i}_{j}/c2", f"{res}.3")
    m["snake_out/alpha"] = ("snake_a", f"decoder.model.{1 + n_rates}")
    wn("conv_out", f"decoder.model.{2 + n_rates}")
    return m


def convert_dac(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, dac_mapping(template), sd, strict)


def load_dac_checkpoint(path: str, cfg=None) -> tuple[dict, "object"]:
    """Published DAC weights.pth -> (flax params, DACConfig)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.codecs import DACConfig, DACDecoder

    ckpt = torch_load_weights(path)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    cfg = cfg or DACConfig(decoder_dim=1536)
    model = DACDecoder(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.n_q, 4), jnp.int32)))["params"]
    return convert_dac(sd, template), cfg


# ------------------------------------------------------------------ Vocos

def vocos_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax Vocos tree -> charactr/vocos state-dict names (backbone.embed,
    backbone.convnext.N.*, head.out) — the vocoder YuE upsamples with."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    conv("embed", "backbone.embed")
    norm("norm_in", "backbone.norm")
    for i in range(sum(1 for k in template if k.startswith("block_"))):
        b = f"backbone.convnext.{i}"
        conv(f"block_{i}/dwconv", f"{b}.dwconv")
        norm(f"block_{i}/norm", f"{b}.norm")
        dense(f"block_{i}/pw1", f"{b}.pwconv1")
        dense(f"block_{i}/pw2", f"{b}.pwconv2")
        m[f"block_{i}/gamma"] = ("direct", f"{b}.gamma")
    norm("norm_out", "backbone.final_layer_norm")
    dense("head", "head.out")
    return m


def convert_vocos(state_dict: dict, template: dict,
                  strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, vocos_mapping(template), sd, strict)


def load_vocos_checkpoint(path: str, cfg=None) -> tuple[dict, "object"]:
    """Published vocos pytorch_model.bin / .safetensors -> flax params."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.codecs import Vocos, VocosConfig

    sd = torch_load_weights(path)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    if cfg is None:
        in_dim = sd["backbone.embed.weight"].shape[1]
        dim = sd["backbone.embed.weight"].shape[0]
        n_layers = len({k.split(".")[2] for k in sd
                        if k.startswith("backbone.convnext.")})
        n_fft = sd["head.out.weight"].shape[0] - 2
        cfg = VocosConfig(dim=dim, n_layers=n_layers, n_fft=n_fft,
                          hop=n_fft // 4)
        model = Vocos(cfg)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, in_dim), jnp.float32))
        )["params"]
    else:
        model = Vocos(cfg)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, cfg.dim), jnp.float32))
        )["params"]
    return convert_vocos(sd, template), cfg


# ---------------------------------------------------------- LLaMA-arch LM

def llama_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax TransformerLM tree -> HF LLaMA state-dict names.  YuE's stage-1
    and stage-2 models are LLaMA-architecture HF checkpoints
    (modules/yue/inference/infer.py:245 AutoModelForCausalLM), so this one
    mapping makes both stages real-weight capable."""
    m: dict[str, tuple[str, str]] = {}
    if "tok_emb" in template:
        m["tok_emb/embedding"] = ("direct", "model.embed_tokens.weight")
    n = sum(1 for k in template if k.startswith("layer_"))
    for i in range(n):
        b = f"model.layers.{i}"
        p = f"layer_{i}"
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "o_proj")):
            m[f"{p}/attn/{ours}/kernel"] = ("dense_w",
                                            f"{b}.self_attn.{theirs}")
        m[f"{p}/attn_norm/weight"] = ("direct",
                                      f"{b}.input_layernorm.weight")
        m[f"{p}/mlp_norm/weight"] = ("direct",
                                     f"{b}.post_attention_layernorm.weight")
        for ours, theirs in (("w1", "gate_proj"), ("w3", "up_proj"),
                             ("w2", "down_proj")):
            m[f"{p}/mlp/{ours}/kernel"] = ("dense_w", f"{b}.mlp.{theirs}")
    m["final_norm/weight"] = ("direct", "model.norm.weight")
    if "lm_head" in template:
        m["lm_head/kernel"] = ("dense_w", "lm_head")
    return m


def convert_llama(state_dict: dict, template: dict,
                  strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k] = np.asarray(v)
        if k == "model.embed_tokens.weight" and "lm_head.weight" not in state_dict:
            sd["lm_head.weight"] = np.asarray(v)  # tied embeddings
    return fill_tree(template, llama_mapping(template), sd, strict)


def load_llama_checkpoint(path: str, cfg) -> dict:
    """HF LLaMA .safetensors/.bin -> flax params for models/lm.TransformerLM
    (used by YuE stage-1/2)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.lm import TransformerLM

    sd = torch_load_weights(path)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    model = TransformerLM(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32)))["params"]
    return convert_llama(sd, template)


# -------------------------------------------------------------------- Dia

def dia_mapping(template: dict, cfg) -> dict[str, tuple[str, str]]:
    """flax DiaModel tree -> nari-labs Dia state-dict names (the vendored
    reference source at modules/diatts/dia/layers.py defines the naming:
    encoder.layers.N.self_attention.{q,k,v,o}_proj, mlp.wi_fused/wo,
    decoder.embeddings.Q, decoder.logits_dense)."""
    m: dict[str, tuple[str, str]] = {}
    enc_heads = cfg.n_heads_enc or cfg.n_heads // 2
    kvh = cfg.kv_heads or cfg.n_heads

    def attn(path, key, h, kv):
        m[f"{path}/wq/kernel"] = ("dg_qkv", f"{key}.q_proj|{h}")
        m[f"{path}/wk/kernel"] = ("dg_qkv", f"{key}.k_proj|{kv}")
        m[f"{path}/wv/kernel"] = ("dg_qkv", f"{key}.v_proj|{kv}")
        m[f"{path}/wo/kernel"] = ("dg_out", f"{key}.o_proj|{h}")

    def mlp(path, key):
        m[f"{path}/w1/kernel"] = ("fused0", f"{key}.wi_fused")
        m[f"{path}/w3/kernel"] = ("fused1", f"{key}.wi_fused")
        m[f"{path}/w2/kernel"] = ("dg_w", f"{key}.wo")

    m["encoder/emb/embedding"] = ("direct", "encoder.embedding.weight")
    n_enc = sum(1 for k in template["encoder"] if k.startswith("attn_"))
    for i in range(n_enc):
        b = f"encoder.layers.{i}"
        attn(f"encoder/attn_{i}", f"{b}.self_attention", enc_heads, enc_heads)
        m[f"encoder/norm1_{i}/weight"] = ("direct", f"{b}.pre_sa_norm.weight")
        m[f"encoder/norm2_{i}/weight"] = ("direct", f"{b}.post_sa_norm.weight")
        mlp(f"encoder/ffn_{i}", f"{b}.mlp")
    m["encoder/final_norm/weight"] = ("direct", "encoder.norm.weight")

    m["decoder/code_emb/embedding"] = ("direct", "__dia_code_emb__")
    n_dec = sum(1 for k in template["decoder"] if k.startswith("self_"))
    for i in range(n_dec):
        b = f"decoder.layers.{i}"
        attn(f"decoder/self_{i}", f"{b}.self_attention", cfg.n_heads, kvh)
        attn(f"decoder/cross_{i}", f"{b}.cross_attention", cfg.n_heads,
             cfg.n_heads)
        m[f"decoder/n1_{i}/weight"] = ("direct", f"{b}.pre_sa_norm.weight")
        m[f"decoder/n2_{i}/weight"] = ("direct", f"{b}.pre_ca_norm.weight")
        m[f"decoder/n3_{i}/weight"] = ("direct", f"{b}.pre_mlp_norm.weight")
        mlp(f"decoder/ffn_{i}", f"{b}.mlp")
    m["decoder/final_norm/weight"] = ("direct", "decoder.norm.weight")
    for q in range(cfg.n_codebooks):
        m[f"decoder/head_{q}/kernel"] = ("logits_q",
                                         f"decoder.logits_dense|{q}")
    return m


def convert_dia(state_dict: dict, template: dict, cfg,
                strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # our decoder embeds with one offset table == the per-channel embedding
    # tables concatenated in channel order
    embs = [sd[f"decoder.embeddings.{q}.weight"]
            for q in range(cfg.n_codebooks)
            if f"decoder.embeddings.{q}.weight" in sd]
    if embs:
        sd["__dia_code_emb__"] = np.concatenate(embs, axis=0)
    return fill_tree(template, dia_mapping(template, cfg), sd, strict)


def load_dia_checkpoint(path: str, cfg) -> dict:
    """nari-labs Dia .pth/.safetensors -> flax params for models/dia."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.dia import DiaModel

    sd = torch_load_weights(path)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    model = DiaModel(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, cfg.n_codebooks, 4), jnp.int32))
    )["params"]
    return convert_dia(sd, template, cfg)


# ----------------------------------------------------------- Stable Audio

def sao_dit_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax StableAudioDiT tree -> stable_audio_tools DiffusionTransformer
    names (wheel source: stable_audio_tools/models/{dit,transformer}.py).
    Checkpoints prefix these with "model.model." — convert_sao_dit strips
    that."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    m["timestep_w"] = ("w", "timestep_features")
    dense("t1", "to_timestep_embed.0")
    dense("t2", "to_timestep_embed.2")
    dense("c1", "to_cond_embed.0", bias=False)
    dense("c2", "to_cond_embed.2", bias=False)
    dense("g1", "to_global_embed.0", bias=False)
    dense("g2", "to_global_embed.2", bias=False)
    m["preprocess_conv/kernel"] = ("dense1x1_w", "preprocess_conv")
    m["postprocess_conv/kernel"] = ("dense1x1_w", "postprocess_conv")
    dense("project_in", "transformer.project_in", bias=False)
    dense("project_out", "transformer.project_out", bias=False)
    n = sum(1 for k in template if k.startswith("layer_"))
    for i in range(n):
        b = f"transformer.layers.{i}"
        p = f"layer_{i}"
        m[f"{p}/pre_norm/ln/scale"] = ("gamma", f"{b}.pre_norm")
        dense(f"{p}/self_attn/to_qkv", f"{b}.self_attn.to_qkv", bias=False)
        dense(f"{p}/self_attn/to_out", f"{b}.self_attn.to_out", bias=False)
        m[f"{p}/cross_attend_norm/ln/scale"] = ("gamma",
                                                f"{b}.cross_attend_norm")
        dense(f"{p}/cross_attn/to_q", f"{b}.cross_attn.to_q", bias=False)
        dense(f"{p}/cross_attn/to_kv", f"{b}.cross_attn.to_kv", bias=False)
        dense(f"{p}/cross_attn/to_out", f"{b}.cross_attn.to_out", bias=False)
        m[f"{p}/ff_norm/ln/scale"] = ("gamma", f"{b}.ff_norm")
        dense(f"{p}/ff/proj", f"{b}.ff.ff.0.proj")
        dense(f"{p}/ff/out", f"{b}.ff.ff.2")
    return m


def convert_sao_dit(state_dict: dict, template: dict,
                    strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, sao_dit_mapping(template), sd, strict)


def load_sao_dit_checkpoint(path: str, cfg=None) -> dict:
    """stable-audio-open model.safetensors -> flax StableAudioDiT params."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.stable_audio_dit import (
        SAODiTConfig,
        StableAudioDiT,
    )

    sd = torch_load_weights(path)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    cfg = cfg or SAODiTConfig()
    model = StableAudioDiT(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, cfg.io_channels)),
                           jnp.zeros((1,)),
                           jnp.zeros((1, 4, cfg.cond_token_dim)),
                           jnp.zeros((1, cfg.global_cond_dim))))["params"]
    return convert_sao_dit(sd, template)


def oobleck_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax OobleckDecoder tree -> stable_audio_tools OobleckDecoder names
    (nn.Sequential indices: 0 conv-in, per block .layers.{0 snake, 1 convT,
    2-4 res units}, then snake + conv-out)."""
    m: dict[str, tuple[str, str]] = {}

    def wn(path, key, bias=True):
        m[f"{path}/kernel"] = ("convwn_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def snake(path, key):
        m[f"{path}/alpha"] = ("direct", f"{key}.alpha")
        m[f"{path}/beta"] = ("direct", f"{key}.beta")

    wn("conv_in", "layers.0")
    n_blocks = sum(1 for k in template if k.startswith("up_") and
                   not k.startswith("up_snake"))
    for bi in range(n_blocks):
        blk = f"layers.{1 + bi}.layers"
        snake(f"up_snake_{bi}", f"{blk}.0")
        m[f"up_{bi}/kernel"] = ("convTwn_w", f"{blk}.1")
        m[f"up_{bi}/bias"] = ("bias", f"{blk}.1")
        for j in range(3):
            res = f"{blk}.{2 + j}.layers"
            snake(f"res_{bi}_{j}/s1", f"{res}.0")
            wn(f"res_{bi}_{j}/c1", f"{res}.1")
            snake(f"res_{bi}_{j}/s2", f"{res}.2")
            wn(f"res_{bi}_{j}/c2", f"{res}.3")
    snake("snake_out", f"layers.{1 + n_blocks}")
    wn("conv_out", f"layers.{2 + n_blocks}", bias=False)
    return m


def convert_oobleck(state_dict: dict, template: dict,
                    strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("pretransform.model.decoder.", "decoder.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, oobleck_mapping(template), sd, strict)


# ----------------------------------------------------------- xcodec (YuE)

def xcodec_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax XCodecDecoder tree -> YuE xcodec checkpoint names (vendored at
    modules/yue/inference/xcodec_mini_infer: encodec-style RVQ
    quantizer.vq.layers.N._codebook.embed + dac2 decoder_2.model.N)."""
    m: dict[str, tuple[str, str]] = {}

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    n_q = sum(1 for k in template if k.startswith("codebook_"))
    for i in range(n_q):
        m[f"codebook_{i}/embedding"] = (
            "direct", f"quantizer.vq.layers.{i}._codebook.embed")
    m["fc_post2/kernel"] = ("dense_w", "fc_post2")
    m["fc_post2/bias"] = ("bias", "fc_post2")

    wn("conv_in", "decoder_2.model.0")
    n_rates = sum(1 for k in template if k.startswith("up_"))
    for i in range(n_rates):
        blk = f"decoder_2.model.{1 + i}.block"
        m[f"snake_{i}/alpha"] = ("snake_a", f"{blk}.0")
        m[f"up_{i}/conv/kernel"] = ("convTwn_w", f"{blk}.1")
        m[f"up_{i}/conv/bias"] = ("bias", f"{blk}.1")
        for j in range(3):
            res = f"{blk}.{2 + j}.block"
            m[f"res_{i}_{j}/s1/alpha"] = ("snake_a", f"{res}.0")
            wn(f"res_{i}_{j}/c1", f"{res}.1")
            m[f"res_{i}_{j}/s2/alpha"] = ("snake_a", f"{res}.2")
            wn(f"res_{i}_{j}/c2", f"{res}.3")
    m["snake_out/alpha"] = ("snake_a", f"decoder_2.model.{1 + n_rates}")
    wn("conv_out", f"decoder_2.model.{2 + n_rates}")
    return m


def convert_xcodec(state_dict: dict, template: dict,
                   strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("codec_model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, xcodec_mapping(template), sd, strict)


def load_xcodec_checkpoint(path: str, cfg=None) -> dict:
    """YuE xcodec ckpt -> flax params for models/codecs.XCodecDecoder."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.codecs import XCodecConfig, XCodecDecoder

    ckpt = torch_load_weights(path)
    sd = ckpt.get("codec_model", ckpt.get("state_dict", ckpt))
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    cfg = cfg or XCodecConfig()
    model = XCodecDecoder(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.n_q, 4), jnp.int32)))["params"]
    return convert_xcodec(sd, template)


# ------------------------------------------------------------------ Zonos

def zonos_mapping(template: dict, cfg) -> dict[str, tuple[str, str]]:
    """flax ZonosModel tree -> Zyphra Zonos state-dict names, TRANSFORMER
    variant (every backbone block is a mamba_ssm MHA + GatedMLP pair;
    backbone.py:11-51 builds them via create_block).  Covers the bulk of
    the weights: per-codebook embeddings (concatenated into our offset
    table), per-codebook heads, and the full backbone.  The hybrid
    variant's Mamba2 mixers and the espeak prefix conditioner remain
    weights-gated (no espeak in this environment — COVERAGE.md)."""
    m: dict[str, tuple[str, str]] = {}
    m["code_embs/embedding"] = ("direct", "__zonos_code_embs__")
    for q in range(cfg.n_codebooks):
        m[f"head_{q}/kernel"] = ("dense_w", f"heads.{q}")

    bk = template["backbone"]
    n_layers = sum(1 for k in bk if k.startswith("attn_")
                   or k.startswith("mamba_"))
    for i in range(n_layers):
        b = f"backbone.layers.{i}"
        if f"mamba_{i}" in bk:
            mb = bk[f"mamba_{i}"]
            if "norm_w" not in mb:
                raise ValueError(
                    f"layer {i} is a Mamba1-style block; upstream hybrid "
                    "checkpoints need ZonosConfig(mixer='mamba2')")
            m[f"backbone/mamba_{i}/in_proj/kernel"] = (
                "dense_w", f"{b}.mixer.in_proj")
            m[f"backbone/mamba_{i}/conv_w"] = ("dwconv_w", f"{b}.mixer.conv1d")
            m[f"backbone/mamba_{i}/conv_b"] = ("bias", f"{b}.mixer.conv1d")
            m[f"backbone/mamba_{i}/dt_bias"] = ("direct",
                                                f"{b}.mixer.dt_bias")
            m[f"backbone/mamba_{i}/a_log"] = ("direct", f"{b}.mixer.A_log")
            m[f"backbone/mamba_{i}/d_skip"] = ("direct", f"{b}.mixer.D")
            m[f"backbone/mamba_{i}/norm_w"] = ("direct",
                                               f"{b}.mixer.norm.weight")
            m[f"backbone/mamba_{i}/out_proj/kernel"] = (
                "dense_w", f"{b}.mixer.out_proj")
            m[f"backbone/norm_{i}/weight"] = ("direct", f"{b}.norm.weight")
            m[f"backbone/mlp_norm_{i}/weight"] = ("direct",
                                                  f"{b}.norm2.weight")
            m[f"backbone/mlp_{i}/w3/kernel"] = ("wslice", f"{b}.mlp.fc1|0|2")
            m[f"backbone/mlp_{i}/w1/kernel"] = ("wslice", f"{b}.mlp.fc1|1|2")
            m[f"backbone/mlp_{i}/w2/kernel"] = ("dense_w", f"{b}.mlp.fc2")
            continue
        for j, w in enumerate(("wq", "wk", "wv")):
            m[f"backbone/attn_{i}/{w}/kernel"] = (
                "wslice", f"{b}.mixer.in_proj|{j}|3")
        m[f"backbone/attn_{i}/wo/kernel"] = ("dense_w", f"{b}.mixer.out_proj")
        m[f"backbone/norm_{i}/weight"] = ("direct", f"{b}.norm.weight")
        m[f"backbone/mlp_norm_{i}/weight"] = ("direct", f"{b}.norm2.weight")
        # mamba_ssm GatedMLP: fc1 rows = [value; gate], y = value*silu(gate)
        # == our silu(w1)*w3 with w1<-gate, w3<-value
        m[f"backbone/mlp_{i}/w3/kernel"] = ("wslice", f"{b}.mlp.fc1|0|2")
        m[f"backbone/mlp_{i}/w1/kernel"] = ("wslice", f"{b}.mlp.fc1|1|2")
        m[f"backbone/mlp_{i}/w2/kernel"] = ("dense_w", f"{b}.mlp.fc2")
    m["backbone/final_norm/weight"] = ("direct", "backbone.norm_f.weight")
    return m


def convert_zonos(state_dict: dict, template: dict, cfg) -> dict:
    """Unmapped branches (prefix conditioner, speaker encoder — espeak-
    gated) keep their init; every MAPPED leaf must resolve or this
    raises with the offending torch key."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    embs = [sd[f"embeddings.{q}.weight"] for q in range(cfg.n_codebooks)
            if f"embeddings.{q}.weight" in sd]
    if embs:
        sd["__zonos_code_embs__"] = np.concatenate(embs, axis=0)
    mapping = zonos_mapping(template, cfg)
    for path, (kind, key) in mapping.items():
        try:
            extract(kind, key, sd)
        except KeyError as e:
            raise KeyError(f"{path}: missing torch key {e}") from e
    return fill_tree(template, mapping, sd, strict=False)


# -------------------------------------------------------------- OpenVoice

def openvoice_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax ToneColorConverter tree -> OpenVoice converter checkpoint names
    (openvoice_cli models.py: SynthesizerTrn with n_speakers=0 — ref_enc +
    enc_q + flow + plain-HiFiGAN dec)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    # ---- ref_enc (models.py:302-366)
    m["ref_enc/layernorm/scale"] = ("w", "ref_enc.layernorm")
    m["ref_enc/layernorm/bias"] = ("b", "ref_enc.layernorm")
    for i in range(6):
        m[f"ref_enc/conv_{i}/kernel"] = ("convwn2d_w", f"ref_enc.convs.{i}")
        m[f"ref_enc/conv_{i}/bias"] = ("bias", f"ref_enc.convs.{i}")
    _rmvpe_gru(m, "ref_enc/GRUCell_0", "ref_enc.gru", "l0")
    dense("ref_enc/proj", "ref_enc.proj")

    # ---- enc_q (PosteriorEncoder, same layout as RVC's)
    conv("enc_q/pre/Conv_0", "enc_q.pre")
    conv("enc_q/proj/Conv_0", "enc_q.proj")
    enc_q = template["enc_q"]["enc"]
    for j in range(sum(1 for k in enc_q if k.startswith("in_layer_"))):
        wn(f"enc_q/enc/in_layer_{j}/Conv_0", f"enc_q.enc.in_layers.{j}")
        wn(f"enc_q/enc/res_skip_{j}/Conv_0", f"enc_q.enc.res_skip_layers.{j}")
    if "cond_layer" in enc_q:
        wn("enc_q/enc/cond_layer/Conv_0", "enc_q.enc.cond_layer")

    # ---- flow (mean-only coupling; odd torch indices are Flips)
    for fi in range(sum(1 for k in template["flow"] if k.startswith("flow_"))):
        t = 2 * fi
        conv(f"flow/flow_{fi}/pre/Conv_0", f"flow.flows.{t}.pre")
        conv(f"flow/flow_{fi}/post/Conv_0", f"flow.flows.{t}.post")
        enc_f = template["flow"][f"flow_{fi}"]["enc"]
        for j in range(sum(1 for k in enc_f if k.startswith("in_layer_"))):
            wn(f"flow/flow_{fi}/enc/in_layer_{j}/Conv_0",
               f"flow.flows.{t}.enc.in_layers.{j}")
            wn(f"flow/flow_{fi}/enc/res_skip_{j}/Conv_0",
               f"flow.flows.{t}.enc.res_skip_layers.{j}")
        if "cond_layer" in enc_f:
            wn(f"flow/flow_{fi}/enc/cond_layer/Conv_0",
               f"flow.flows.{t}.enc.cond_layer")

    # ---- dec (plain HiFiGAN Generator, models.py:225-300)
    conv("dec/conv_pre/Conv_0", "dec.conv_pre")
    m["dec/cond/kernel"] = ("dense1x1_w", "dec.cond")
    m["dec/cond/bias"] = ("bias", "dec.cond")
    m["dec/conv_post/Conv_0/kernel"] = ("convwn_w", "dec.conv_post")
    dec_t = template["dec"]
    n_kernels = 3
    for key in dec_t:
        if key.startswith("up_"):
            i = int(key.split("_")[1])
            m[f"dec/{key}/ConvTranspose_0/kernel"] = ("convTwn_w", f"dec.ups.{i}")
            m[f"dec/{key}/ConvTranspose_0/bias"] = ("bias", f"dec.ups.{i}")
        elif key.startswith("res_"):
            _, i, j = key.split("_")
            flat = int(i) * n_kernels + int(j)
            for cj in range(3):
                for ours, theirs in (("conv1", "convs1"), ("conv2", "convs2")):
                    wn(f"dec/{key}/{ours}_{cj}/Conv_0",
                       f"dec.resblocks.{flat}.{theirs}.{cj}")
    return m


def convert_openvoice(state_dict: dict, template: dict,
                      strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = np.asarray(v)
    return fill_tree(template, openvoice_mapping(template), sd, strict)


def load_openvoice_checkpoint(path: str, cfg=None) -> dict:
    """OpenVoice converter.pth ({'model': state_dict}) -> flax params."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.openvoice import (
        ToneColorConfig,
        ToneColorConverter,
    )

    ckpt = torch_load_weights(path)
    sd = ckpt.get("model", ckpt)
    sd = {k: (v.float().numpy() if hasattr(v, "float") else np.asarray(v))
          for k, v in sd.items()}
    cfg = cfg or ToneColorConfig()
    model = ToneColorConverter(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, cfg.spec_channels), jnp.float32),
            jnp.full((1,), 8, jnp.int32),
            jnp.zeros((1, 8, cfg.spec_channels), jnp.float32),
            jnp.zeros((1, 8, cfg.spec_channels), jnp.float32)))["params"]
    return convert_openvoice(sd, template)


# ----------------------------------------------------------- ADaMoS vocoder

def adamos_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax AdamosVocoder tree -> ACE-Step music_vocoder state-dict names
    (vendored modules/acestep/acestep/music_dcae/music_vocoder.py)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    bk = template["backbone"]
    conv("backbone/stem_conv", "backbone.channel_layers.0.0")
    norm("backbone/stem_norm", "backbone.channel_layers.0.1")
    n_stages = 1 + sum(1 for k in bk if k.startswith("mid_norm_"))
    for i in range(n_stages):
        if i > 0:
            norm(f"backbone/mid_norm_{i}", f"backbone.channel_layers.{i}.0")
            m[f"backbone/mid_proj_{i}/kernel"] = (
                "dense1x1_w", f"backbone.channel_layers.{i}.1")
            m[f"backbone/mid_proj_{i}/bias"] = (
                "bias", f"backbone.channel_layers.{i}.1")
        j = 0
        while f"stage_{i}_{j}" in bk:
            b = f"backbone.stages.{i}.{j}"
            p = f"backbone/stage_{i}_{j}"
            conv(f"{p}/dwconv", f"{b}.dwconv")
            norm(f"{p}/norm", f"{b}.norm")
            dense(f"{p}/pwconv1", f"{b}.pwconv1")
            dense(f"{p}/pwconv2", f"{b}.pwconv2")
            m[f"{p}/gamma"] = ("direct", f"{b}.gamma")
            j += 1
    norm("backbone/final_norm", "backbone.norm")

    hd = template["head"]
    wn("head/conv_pre", "head.conv_pre")
    n_ups = sum(1 for k in hd if k.startswith("up_"))
    n_kernels = sum(1 for k in hd if k.startswith("res_0_"))
    for i in range(n_ups):
        m[f"head/up_{i}/kernel"] = ("convTwn_w", f"head.ups.{i}")
        m[f"head/up_{i}/bias"] = ("bias", f"head.ups.{i}")
        for j in range(n_kernels):
            flat = i * n_kernels + j
            res = template["head"][f"res_{i}_{j}"]
            n_dil = sum(1 for k in res if k.startswith("c1_"))
            for dj in range(n_dil):
                wn(f"head/res_{i}_{j}/c1_{dj}",
                   f"head.resblocks.{flat}.convs1.{dj}")
                wn(f"head/res_{i}_{j}/c2_{dj}",
                   f"head.resblocks.{flat}.convs2.{dj}")
    wn("head/conv_post", "head.conv_post")
    return m


def convert_adamos(state_dict: dict, template: dict,
                   strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("vocoder.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, adamos_mapping(template), sd, strict)


# ------------------------------------------------------------------ ACE-Step DiT

def acestep_dit_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/acestep_dit.ACEStepDiT tree -> the published ACE-Step
    transformer state-dict names (vendored
    modules/acestep/acestep/models/ace_step_transformer.py:206-330).  The
    lyric ConformerEncoder keys are not consumed (documented cut)."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def conv(path, key, bias=True):
        m[f"{path}/kernel"] = ("conv_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    dense("speaker_embedder", "speaker_embedder")
    dense("genre_embedder", "genre_embedder")
    m["lyric_embs/embedding"] = ("w", "lyric_embs")
    dense("lyric_proj", "lyric_proj")
    dense("timestep_embedder_linear_1", "timestep_embedder.linear_1")
    dense("timestep_embedder_linear_2", "timestep_embedder.linear_2")
    dense("t_block", "t_block.1")

    kh = template["proj_in"]["early0"]["kernel"].shape[0] \
        // (template["proj_in"]["early0"]["kernel"].shape[1] // 256)
    m["proj_in/early0/kernel"] = (
        "patch_w", f"proj_in.early_conv_layers.0|{kh}")
    m["proj_in/early0/bias"] = ("bias", "proj_in.early_conv_layers.0")
    m["proj_in/gn/scale"] = ("w", "proj_in.early_conv_layers.1")
    m["proj_in/gn/bias"] = ("b", "proj_in.early_conv_layers.1")
    m["proj_in/early2/kernel"] = ("conv2d1x1_w", "proj_in.early_conv_layers.2")
    m["proj_in/early2/bias"] = ("bias", "proj_in.early_conv_layers.2")

    i = 0
    while f"block_{i}" in template:
        p, b = f"block_{i}", f"transformer_blocks.{i}"
        m[f"{p}/scale_shift_table"] = ("direct", f"{b}.scale_shift_table")
        for a in ("attn", "cross_attn"):
            for proj in ("to_q", "to_k", "to_v"):
                dense(f"{p}/{a}/{proj}", f"{b}.{a}.{proj}")
            dense(f"{p}/{a}/to_out", f"{b}.{a}.to_out.0")
        conv(f"{p}/ff/inverted_conv", f"{b}.ff.inverted_conv.conv")
        conv(f"{p}/ff/depth_conv", f"{b}.ff.depth_conv.conv")
        conv(f"{p}/ff/point_conv", f"{b}.ff.point_conv.conv", bias=False)
        i += 1

    m["final_layer/scale_shift_table"] = (
        "direct", "final_layer.scale_shift_table")
    dense("final_layer/linear", "final_layer.linear")
    for i in range(8):
        for j in range(3):
            if f"projector_{i}_{j}" in template:
                # torch Sequential(Linear, SiLU, Linear, SiLU, Linear)
                dense(f"projector_{i}_{j}", f"projectors.{i}.{2 * j}")
    return m


def convert_acestep_dit(state_dict: dict, template: dict,
                        strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k[6:] if k.startswith("model.") else k] = np.asarray(v)
    return fill_tree(template, acestep_dit_mapping(template), sd, strict)


def load_acestep_dit_checkpoint(path: str, cfg=None) -> dict:
    """ace_step_transformer checkpoint -> flax params for
    models/acestep_dit.ACEStepDiT (template via eval_shape — no compile)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.acestep_dit import ACEStepDiT, ACEStepDiTConfig

    cfg = cfg or ACEStepDiTConfig()
    model = ACEStepDiT(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, cfg.patch_height, 4)),
            jnp.ones((1, 4)),
            jnp.zeros((1, 2, cfg.text_embedding_dim)), jnp.ones((1, 2)),
            jnp.zeros((1, cfg.speaker_embedding_dim)), jnp.full((1,), 0.5),
            jnp.zeros((1, 3, cfg.lyric_hidden_size)), jnp.ones((1, 3)),
            return_hidden=True)["params"])
    # lyric_embs only materializes through embed_lyrics — merge its template
    template = dict(template) | dict(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3), jnp.int32),
                           method=ACEStepDiT.embed_lyrics)["params"]))
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_acestep_dit(sd, template)


def acestep_lyric_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax LyricConformerEncoder tree -> the checkpoint's lyric_encoder
    keys (prefix already stripped; lyric_encoder.py:902-1010 layout)."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    dense("embed_lin", "embed.out.0")
    norm("embed_norm", "embed.out.1")
    i = 0
    while f"attn_{i}" in template:
        b = f"encoders.{i}"
        for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
            dense(f"attn_{i}/{lin}", f"{b}.self_attn.{lin}")
        dense(f"attn_{i}/linear_pos", f"{b}.self_attn.linear_pos",
              bias=False)
        m[f"attn_{i}/pos_bias_u"] = ("direct", f"{b}.self_attn.pos_bias_u")
        m[f"attn_{i}/pos_bias_v"] = ("direct", f"{b}.self_attn.pos_bias_v")
        norm(f"norm_mha_{i}", f"{b}.norm_mha")
        norm(f"norm_ff_{i}", f"{b}.norm_ff")
        dense(f"ff_w1_{i}", f"{b}.feed_forward.w_1")
        dense(f"ff_w2_{i}", f"{b}.feed_forward.w_2")
        i += 1
    norm("after_norm", "after_norm")
    return m


def convert_acestep_lyric(state_dict: dict, template: dict,
                          strict: bool = True) -> dict:
    """Accepts either bare lyric-encoder keys or the full transformer
    state dict (keys under ``lyric_encoder.``)."""
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.lyric_encoder.", "lyric_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, acestep_lyric_mapping(template), sd, strict)


def load_acestep_lyric_checkpoint(path: str, **kw) -> dict:
    """ace_step_transformer checkpoint -> flax params for
    models/acestep_dit.LyricConformerEncoder (published defaults)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.acestep_dit import LyricConformerEncoder

    model = LyricConformerEncoder(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, model.dim), jnp.float32),
                           jnp.ones((1, 4)))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_acestep_lyric(sd, template)


def zonos_prefix_mapping(template: dict, specs,
                         projection: str = "none") -> dict:
    """flax models/zonos.ZonosPrefixConditioner -> the checkpoint's
    prefix_conditioner keys (modules/zonos/conditioning.py:38-303)."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def proj(nm, base, kind):
        if kind == "linear":
            dense(f"{nm}_proj", f"{base}.project")
        elif kind == "mlp":
            dense(f"{nm}_proj0", f"{base}.project.0")
            dense(f"{nm}_proj1", f"{base}.project.2")

    for i, s in enumerate(specs):
        b = f"conditioners.{i}"
        nm = f"c_{s.name}"
        if s.uncond_type == "learned":
            m[f"{nm}_uncond"] = ("direct", f"{b}.uncond_vector")
        if s.type == "EspeakPhonemeConditioner":
            m[f"{nm}_emb/embedding"] = ("w", f"{b}.phoneme_embedder")
        elif s.type == "FourierConditioner":
            m[f"{nm}_weight"] = ("direct", f"{b}.weight")
        elif s.type == "IntegerConditioner":
            m[f"{nm}_emb/embedding"] = ("w", f"{b}.int_embedder")
        proj(nm, b, s.projection)
    proj("prefix", "", projection)
    if projection != "none":  # strip the leading "." from the bank keys
        m = {k: (kind, key.lstrip(".")) for k, (kind, key) in m.items()}
    m["norm/scale"] = ("w", "norm")
    m["norm/bias"] = ("b", "norm")
    return m


def convert_zonos_prefix(state_dict: dict, template: dict, specs,
                         projection: str = "none",
                         strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.prefix_conditioner.", "prefix_conditioner."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, zonos_prefix_mapping(template, specs,
                                                    projection), sd, strict)


def zonos_prefix_specs_from_config(conditioners: list) -> tuple:
    """Model config.json ``prefix_conditioner.conditioners`` list ->
    CondSpec tuple (data-driven: whatever the published config says is
    what gets built and mapped)."""
    from audiolab_tpu.models.zonos import CondSpec

    return tuple(
        CondSpec(
            type=d["type"], name=d["name"], cond_dim=d.get("cond_dim"),
            projection=d.get("projection", "none"),
            uncond_type=d.get("uncond_type", "none"),
            input_dim=d.get("input_dim", 1),
            min_val=float(d.get("min_val", 0.0)),
            max_val=float(d.get("max_val", 1.0)),
        )
        for d in conditioners
    )


# -------------------------------------------------------------- XTTS-v2

def xtts_hifigan_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/xtts.XttsHifiganDecoder -> XTTS-v2 model.pth keys under
    hifigan_decoder.waveform_decoder (coqui hifigan_generator.py:165-250;
    handles both weight_g/weight_v and torch>=2 parametrizations)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key, bias=True):  # plain conv (no weight norm)
        m[f"{path}/kernel"] = ("conv_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    conv("conv_pre", "conv_pre")
    m["cond_layer/kernel"] = ("dense1x1_w", "cond_layer")
    m["cond_layer/bias"] = ("bias", "cond_layer")
    n_ups = sum(1 for k in template if k.startswith("up_"))
    n_kernels = sum(1 for k in template if k.startswith("res_0_"))
    for i in range(n_ups):
        m[f"up_{i}/kernel"] = ("convTwn_w", f"ups.{i}")
        m[f"up_{i}/bias"] = ("bias", f"ups.{i}")
        m[f"cond_{i}/kernel"] = ("dense1x1_w", f"conds.{i}")
        m[f"cond_{i}/bias"] = ("bias", f"conds.{i}")
        for j in range(n_kernels):
            flat = i * n_kernels + j
            res = template[f"res_{i}_{j}"]
            for dj in range(sum(1 for k in res if k.startswith("c1_"))):
                wn(f"res_{i}_{j}/c1_{dj}", f"resblocks.{flat}.convs1.{dj}")
                wn(f"res_{i}_{j}/c2_{dj}", f"resblocks.{flat}.convs2.{dj}")
    conv("conv_post", "conv_post", bias=False)
    return m


def convert_xtts_hifigan(state_dict: dict, template: dict,
                         strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("hifigan_decoder.waveform_decoder.",
                    "waveform_decoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, xtts_hifigan_mapping(template), sd, strict)


def load_xtts_hifigan_checkpoint(path: str) -> dict:
    """XTTS-v2 model.pth -> flax params for models/xtts.XttsHifiganDecoder
    (published geometry: 1024-d latents, 512-d d-vector, 1024x upsample)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsHifiganDecoder

    model = XttsHifiganDecoder()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 1024), jnp.float32),
                           jnp.zeros((1, 512), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_hifigan(sd, template)


def xtts_speaker_mapping(params: dict) -> dict[str, tuple[str, str]]:
    """flax models/xtts.XttsSpeakerEncoder params -> XTTS-v2 keys under
    hifigan_decoder.speaker_encoder (encoder/models/resnet.py:59-150)."""
    m: dict[str, tuple[str, str]] = {}

    def bn_p(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    m["conv1/kernel"] = ("conv2_w", "conv1")
    m["conv1/bias"] = ("bias", "conv1")
    bn_p("bn1", "bn1")
    for name, tpl in params.items():
        if not name.startswith("layer"):
            continue
        li, j = name[5:].split("_")
        b = f"layer{li}.{j}"
        m[f"{name}/conv1/kernel"] = ("conv2_w", f"{b}.conv1")
        bn_p(f"{name}/bn1", f"{b}.bn1")
        m[f"{name}/conv2/kernel"] = ("conv2_w", f"{b}.conv2")
        bn_p(f"{name}/bn2", f"{b}.bn2")
        m[f"{name}/se/fc0/kernel"] = ("dense_w", f"{b}.se.fc.0")
        m[f"{name}/se/fc0/bias"] = ("bias", f"{b}.se.fc.0")
        m[f"{name}/se/fc1/kernel"] = ("dense_w", f"{b}.se.fc.2")
        m[f"{name}/se/fc1/bias"] = ("bias", f"{b}.se.fc.2")
        if "down_conv" in tpl:
            m[f"{name}/down_conv/kernel"] = ("conv2_w", f"{b}.downsample.0")
            bn_p(f"{name}/down_bn", f"{b}.downsample.1")
    m["att0/kernel"] = ("dense1x1_w", "attention.0")
    m["att0/bias"] = ("bias", "attention.0")
    bn_p("att_bn", "attention.2")
    m["att1/kernel"] = ("dense1x1_w", "attention.3")
    m["att1/bias"] = ("bias", "attention.3")
    m["fc/kernel"] = ("dense_w", "fc")
    m["fc/bias"] = ("bias", "fc")
    return m


def xtts_speaker_stats_mapping(stats: dict) -> dict[str, tuple[str, str]]:
    m: dict[str, tuple[str, str]] = {}

    def bn(path, key):
        m[f"{path}/mean"] = ("direct", f"{key}.running_mean")
        m[f"{path}/var"] = ("direct", f"{key}.running_var")

    bn("bn1", "bn1")
    for name, tpl in stats.items():
        if name.startswith("layer"):
            li, j = name[5:].split("_")
            b = f"layer{li}.{j}"
            bn(f"{name}/bn1", f"{b}.bn1")
            bn(f"{name}/bn2", f"{b}.bn2")
            if "down_bn" in tpl:
                bn(f"{name}/down_bn", f"{b}.downsample.1")
    bn("att_bn", "attention.2")
    return m


def convert_xtts_speaker(state_dict: dict, variables: dict,
                         strict: bool = True) -> dict:
    """XTTS-v2 speaker-encoder weights -> {"params", "batch_stats"}."""
    sd = {}
    for k, v in state_dict.items():
        for pre in ("hifigan_decoder.speaker_encoder.", "speaker_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return {
        "params": fill_tree(variables["params"],
                            xtts_speaker_mapping(variables["params"]),
                            sd, strict),
        "batch_stats": fill_tree(
            variables["batch_stats"],
            xtts_speaker_stats_mapping(variables["batch_stats"]),
            sd, strict),
    }


def load_xtts_speaker_checkpoint(path: str) -> dict:
    """XTTS-v2 model.pth -> flax variables for XttsSpeakerEncoder."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsSpeakerEncoder

    model = XttsSpeakerEncoder()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 40, 64), jnp.float32)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_speaker(sd, variables)


def xtts_gpt_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/xtts.XttsGPT2 -> XTTS-v2 model.pth keys under ``gpt.``
    (TTS/tts/layers/xtts/gpt.py:20-250; inner transformers GPT2Model at
    ``gpt.gpt``, Conv1D kernels are already (in, out))."""
    m: dict[str, tuple[str, str]] = {}

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    def conv1d(path, key):  # transformers Conv1D: weight (in, out)
        m[f"{path}/kernel"] = ("w", key)
        m[f"{path}/bias"] = ("bias", key)

    i = 0
    while f"h_{i}" in template:
        b = f"gpt.h.{i}"
        norm(f"h_{i}/ln_1", f"{b}.ln_1")
        conv1d(f"h_{i}/c_attn", f"{b}.attn.c_attn")
        conv1d(f"h_{i}/c_proj_attn", f"{b}.attn.c_proj")
        norm(f"h_{i}/ln_2", f"{b}.ln_2")
        conv1d(f"h_{i}/c_fc", f"{b}.mlp.c_fc")
        conv1d(f"h_{i}/c_proj_mlp", f"{b}.mlp.c_proj")
        i += 1
    norm("ln_f", "gpt.ln_f")
    m["text_embedding/embedding"] = ("w", "text_embedding")
    m["mel_embedding/embedding"] = ("w", "mel_embedding")
    m["text_pos"] = ("direct", "text_pos_embedding.emb.weight")
    m["mel_pos"] = ("direct", "mel_pos_embedding.emb.weight")
    norm("final_norm", "final_norm")
    m["text_head/kernel"] = ("dense_w", "text_head")
    m["text_head/bias"] = ("bias", "text_head")
    m["mel_head/kernel"] = ("dense_w", "mel_head")
    m["mel_head/bias"] = ("bias", "mel_head")
    return m


def convert_xtts_gpt(state_dict: dict, template: dict,
                     strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("gpt."):
            k = k[4:]
        sd[k] = np.asarray(v)
    return fill_tree(template, xtts_gpt_mapping(template), sd, strict)


def load_xtts_gpt_checkpoint(path: str, **kw) -> dict:
    """XTTS-v2 model.pth -> flax params for models/xtts.XttsGPT2
    (published geometry: 30 layers x 1024 x 16 heads)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsGPT2

    model = XttsGPT2(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.zeros((1, 2, model.dim), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_gpt(sd, template)


def xtts_conditioner_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax XttsConditioningEncoder -> XTTS keys under
    gpt.conditioning_encoder (tortoise autoregressive.py:171-195)."""
    m: dict[str, tuple[str, str]] = {}
    m["init/kernel"] = ("dense1x1_w", "init")
    m["init/bias"] = ("bias", "init")
    i = 0
    while f"attn_{i}" in template:
        b = f"attn.{i}"
        m[f"attn_{i}/norm/scale"] = ("w", f"{b}.norm")
        m[f"attn_{i}/norm/bias"] = ("b", f"{b}.norm")
        m[f"attn_{i}/qkv/kernel"] = ("dense1x1_w", f"{b}.qkv")
        m[f"attn_{i}/qkv/bias"] = ("bias", f"{b}.qkv")
        m[f"attn_{i}/proj_out/kernel"] = ("dense1x1_w", f"{b}.proj_out")
        m[f"attn_{i}/proj_out/bias"] = ("bias", f"{b}.proj_out")
        i += 1
    return m


def convert_xtts_conditioner(state_dict: dict, template: dict,
                             strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("gpt.conditioning_encoder.", "conditioning_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, xtts_conditioner_mapping(template), sd,
                     strict)


def xtts_perceiver_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax XttsPerceiverResampler -> XTTS keys under
    gpt.conditioning_perceiver (perceiver_encoder.py:204-274)."""
    m: dict[str, tuple[str, str]] = {"latents": ("direct", "latents"),
                                     "norm_gamma": ("direct", "norm.gamma")}
    i = 0
    while f"q_{i}" in template:
        b = f"layers.{i}"
        m[f"q_{i}/kernel"] = ("dense_w", f"{b}.0.to_q")
        m[f"kv_{i}/kernel"] = ("dense_w", f"{b}.0.to_kv")
        m[f"out_{i}/kernel"] = ("dense_w", f"{b}.0.to_out")
        m[f"ff0_{i}/kernel"] = ("dense_w", f"{b}.1.0")
        m[f"ff0_{i}/bias"] = ("bias", f"{b}.1.0")
        m[f"ff1_{i}/kernel"] = ("dense_w", f"{b}.1.2")
        m[f"ff1_{i}/bias"] = ("bias", f"{b}.1.2")
        i += 1
    return m


def convert_xtts_perceiver(state_dict: dict, template: dict,
                           strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("gpt.conditioning_perceiver.", "conditioning_perceiver."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, xtts_perceiver_mapping(template), sd, strict)


def load_xtts_conditioner_checkpoint(path: str, **kw) -> dict:
    """XTTS-v2 model.pth -> flax params for XttsConditioningEncoder."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsConditioningEncoder

    model = XttsConditioningEncoder(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 80), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_conditioner(sd, template)


def load_xtts_perceiver_checkpoint(path: str, **kw) -> dict:
    """XTTS-v2 model.pth -> flax params for XttsPerceiverResampler."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsPerceiverResampler

    model = XttsPerceiverResampler(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, model.dim), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_perceiver(sd, template)


def xtts_dvae_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/xtts.XttsDVAE -> the published dvae.pth keys
    (dvae.py:202-366 Sequential index layout; codebook.embed is an EMA
    buffer, converted as the codebook)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv_w", key)
        m[f"{path}/bias"] = ("bias", key)

    n_layers = sum(1 for k in template if k.startswith("enc_conv_"))
    n_res = sum(1 for k in template if k.startswith("enc_res_"))
    for i in range(n_layers):
        conv(f"enc_conv_{i}", f"encoder.{i}.0")
    for j in range(n_res):
        b = f"encoder.{n_layers + j}.net"
        conv(f"enc_res_{j}/c0", f"{b}.0")
        conv(f"enc_res_{j}/c1", f"{b}.2")
        conv(f"enc_res_{j}/c2", f"{b}.4")
    conv("enc_out", f"encoder.{n_layers + n_res}")
    m["embed"] = ("direct", "codebook.embed")
    conv("dec_in", "decoder.0")
    for j in range(n_res):
        b = f"decoder.{1 + j}.net"
        conv(f"dec_res_{j}/c0", f"{b}.0")
        conv(f"dec_res_{j}/c1", f"{b}.2")
        conv(f"dec_res_{j}/c2", f"{b}.4")
    for i in range(n_layers):
        conv(f"dec_up_{i}", f"decoder.{1 + n_res + i}.0.conv")
    conv("dec_out", f"decoder.{1 + n_res + n_layers}")
    return m


def convert_xtts_dvae(state_dict: dict, template: dict,
                      strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("dvae."):
            k = k[5:]
        sd[k] = np.asarray(v)
    return fill_tree(template, xtts_dvae_mapping(template), sd, strict)


def load_xtts_dvae_checkpoint(path: str, **kw) -> dict:
    """dvae.pth -> flax params for models/xtts.XttsDVAE."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.xtts import XttsDVAE

    model = XttsDVAE(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, model.channels),
                                     jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_xtts_dvae(sd, template)


def audiosr_vocoder_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/audiosr_vocoder.AudioSRVocoder -> audiosr 48k vocoder
    keys (hifigan/models_v2.py:154-230; all convs weight-normed)."""
    m: dict[str, tuple[str, str]] = {}

    def wn(path, key):
        m[f"{path}/kernel"] = ("convwn_w", key)
        m[f"{path}/bias"] = ("bias", key)

    wn("conv_pre", "conv_pre")
    n_ups = sum(1 for k in template if k.startswith("up_"))
    n_kernels = sum(1 for k in template if k.startswith("res_0_"))
    for i in range(n_ups):
        m[f"up_{i}/kernel"] = ("convTwn_w", f"ups.{i}")
        m[f"up_{i}/bias"] = ("bias", f"ups.{i}")
        for j in range(n_kernels):
            flat = i * n_kernels + j
            res = template[f"res_{i}_{j}"]
            for dj in range(sum(1 for k in res if k.startswith("c1_"))):
                wn(f"res_{i}_{j}/c1_{dj}", f"resblocks.{flat}.convs1.{dj}")
                wn(f"res_{i}_{j}/c2_{dj}", f"resblocks.{flat}.convs2.{dj}")
    wn("conv_post", "conv_post")
    return m


def convert_audiosr_vocoder(state_dict: dict, template: dict,
                            strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("first_stage_model.vocoder.", "vocoder.", "generator."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, audiosr_vocoder_mapping(template), sd, strict)


def load_audiosr_scale_factor(path: str, default: float = 1.0) -> float:
    """Read the latent ``scale_factor`` buffer from an AudioSR checkpoint
    (audiosr ddpm.py:672 register_buffer; set by scale_by_std at :747).
    The DiffusionWrapper multiplies the concat conditioning by it
    (ddpm.py:1658) and decode_first_stage divides sampled latents by it
    (ddpm.py:930) — AudioSRCheckpointPipeline needs it for real weights."""
    sd = torch_load_weights(path)
    for k in ("scale_factor", "model.scale_factor", "state_dict.scale_factor"):
        if k in sd:
            v = sd[k]
            if hasattr(v, "numpy"):
                v = v.float().numpy()
            return float(np.asarray(v).reshape(()))
    return float(default)


def load_audiosr_vocoder_checkpoint(path: str, **kw) -> dict:
    """AudioSR checkpoint -> flax params for AudioSRVocoder (48k config)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.audiosr_vocoder import AudioSRVocoder

    model = AudioSRVocoder(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, model.num_mels),
                                     jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_audiosr_vocoder(sd, template)


def audiosr_vae_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/audiosr_vae.AudioSRVAE -> AudioSR first_stage keys
    (latent_encoder/autoencoder.py + diffusionmodules/model.py layout)."""
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv2_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    def res(path, key, tpl):
        norm(f"{path}/norm1", f"{key}.norm1")
        conv(f"{path}/conv1", f"{key}.conv1")
        norm(f"{path}/norm2", f"{key}.norm2")
        conv(f"{path}/conv2", f"{key}.conv2")
        if "nin_shortcut" in tpl:
            conv(f"{path}/nin_shortcut", f"{key}.nin_shortcut")

    def attn(path, key):
        norm(f"{path}/norm", f"{key}.norm")
        for p in ("q", "k", "v", "proj_out"):
            conv(f"{path}/{p}", f"{key}.{p}")

    for side in ("encoder", "decoder"):
        s = template[side]
        conv(f"{side}/conv_in", f"{side}.conv_in")
        res(f"{side}/mid_1", f"{side}.mid.block_1", s["mid_1"])
        attn(f"{side}/mid_attn", f"{side}.mid.attn_1")
        res(f"{side}/mid_2", f"{side}.mid.block_2", s["mid_2"])
        norm(f"{side}/norm_out", f"{side}.norm_out")
        conv(f"{side}/conv_out", f"{side}.conv_out")
        for name, tpl in s.items():
            if name.startswith("down_") and not name.endswith("_ds"):
                _, li, bi = name.split("_")
                res(f"{side}/{name}", f"{side}.down.{li}.block.{bi}", tpl)
            elif name.endswith("_ds"):
                li = name.split("_")[1]
                conv(f"{side}/{name}", f"{side}.down.{li}.downsample.conv")
            elif name.startswith("up_") and not name.endswith("_us"):
                _, li, bi = name.split("_")
                res(f"{side}/{name}", f"{side}.up.{li}.block.{bi}", tpl)
            elif name.endswith("_us"):
                li = name.split("_")[1]
                conv(f"{side}/{name}", f"{side}.up.{li}.upsample.conv")
    conv("quant_conv", "quant_conv")
    conv("post_quant_conv", "post_quant_conv")
    return m


def convert_audiosr_vae(state_dict: dict, template: dict,
                        strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("first_stage_model."):
            k = k[len("first_stage_model."):]
        sd[k] = np.asarray(v)
    return fill_tree(template, audiosr_vae_mapping(template), sd, strict)


def load_audiosr_vae_checkpoint(path: str, **kw) -> dict:
    """AudioSR checkpoint -> flax params for AudioSRVAE."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.audiosr_vae import AudioSRVAE

    model = AudioSRVAE(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 1), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_audiosr_vae(sd, template)


def audiosr_unet_mapping(cfg=None) -> dict[str, tuple[str, str]]:
    """flax models/audiosr_unet.AudioSRUNet -> AudioSR
    model.diffusion_model keys — generated from the SAME
    unet_layer_schedule as the flax module, so torch Sequential indices
    always line up."""
    from audiolab_tpu.models.audiosr_unet import (
        AudioSRUNetConfig,
        unet_layer_schedule,
    )

    cfg = cfg or AudioSRUNetConfig()
    m: dict[str, tuple[str, str]] = {}

    def conv(path, key):
        m[f"{path}/kernel"] = ("conv2_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    def res(path, key, inp, out):
        norm(f"{path}/norm_in", f"{key}.in_layers.0")
        conv(f"{path}/conv_in", f"{key}.in_layers.2")
        dense(f"{path}/emb", f"{key}.emb_layers.1")
        norm(f"{path}/norm_out", f"{key}.out_layers.0")
        conv(f"{path}/conv_out", f"{key}.out_layers.3")
        if inp != out:
            conv(f"{path}/skip", f"{key}.skip_connection")

    def attn(path, key):
        norm(f"{path}/norm", f"{key}.norm")
        conv(f"{path}/proj_in", f"{key}.proj_in")
        tb = f"{key}.transformer_blocks.0"
        for a in ("attn1", "attn2"):
            for p in ("q", "k", "v"):
                dense(f"{path}/{a}_{p}", f"{tb}.{a}.to_{p}", bias=False)
            dense(f"{path}/{a}_out", f"{tb}.{a}.to_out.0")
        for i in (1, 2, 3):
            norm(f"{path}/norm{i}", f"{tb}.norm{i}")
        dense(f"{path}/ff0", f"{tb}.ff.net.0.proj")
        dense(f"{path}/ff1", f"{tb}.ff.net.2")
        conv(f"{path}/proj_out", f"{key}.proj_out")

    def block(prefix, tkey, layers):
        for j, (kind, p) in enumerate(layers):
            nm = f"{prefix}_{j}"
            tk = f"{tkey}.{j}"
            if kind == "conv_in":
                conv(nm, tk)
            elif kind == "res":
                res(nm, tk, p["inp"], p["out"])
            elif kind == "attn":
                attn(nm, tk)
            elif kind == "down":
                conv(nm, f"{tk}.op")
            elif kind == "up":
                conv(nm, f"{tk}.conv")

    dense("time_0", "time_embed.0")
    dense("time_2", "time_embed.2")
    inputs, middle, outputs = unet_layer_schedule(cfg)
    for i, layers in enumerate(inputs):
        block(f"in_{i}", f"input_blocks.{i}", layers)
    block("mid", "middle_block", middle)
    for i, layers in enumerate(outputs):
        block(f"out_{i}", f"output_blocks.{i}", layers)
    norm("norm_out", "out.0")
    conv("conv_out", "out.2")
    return m


def convert_audiosr_unet(state_dict: dict, template: dict, cfg=None,
                         strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.diffusion_model."):
            k = k[len("model.diffusion_model."):]
        sd[k] = np.asarray(v)
    return fill_tree(template, audiosr_unet_mapping(cfg), sd, strict)


def load_audiosr_unet_checkpoint(path: str, cfg=None) -> dict:
    """AudioSR checkpoint -> flax params for AudioSRUNet (basic config)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.audiosr_unet import (
        AudioSRUNet,
        AudioSRUNetConfig,
    )

    cfg = cfg or AudioSRUNetConfig()
    model = AudioSRUNet(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32),
                           jnp.zeros((1,), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_audiosr_unet(sd, template, cfg)


def clap_text_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/clap.ClapTextBranch -> laion_clap checkpoint keys
    (text_branch.* = transformers RobertaModel layout +
    text_projection.{0,2})."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    e = "text_branch.embeddings"
    m["word_emb/embedding"] = ("w", f"{e}.word_embeddings")
    m["pos_emb/embedding"] = ("w", f"{e}.position_embeddings")
    m["type_emb/embedding"] = ("w", f"{e}.token_type_embeddings")
    norm("emb_ln", f"{e}.LayerNorm")
    i = 0
    while f"layer_{i}" in template:
        b = f"text_branch.encoder.layer.{i}"
        dense(f"layer_{i}/q", f"{b}.attention.self.query")
        dense(f"layer_{i}/k", f"{b}.attention.self.key")
        dense(f"layer_{i}/v", f"{b}.attention.self.value")
        dense(f"layer_{i}/attn_out", f"{b}.attention.output.dense")
        norm(f"layer_{i}/attn_ln", f"{b}.attention.output.LayerNorm")
        dense(f"layer_{i}/ffn_in", f"{b}.intermediate.dense")
        dense(f"layer_{i}/ffn_out", f"{b}.output.dense")
        norm(f"layer_{i}/ffn_ln", f"{b}.output.LayerNorm")
        i += 1
    dense("pooler", "text_branch.pooler.dense")
    dense("proj0", "text_projection.0")
    dense("proj1", "text_projection.2")
    return m


def convert_clap_text(state_dict: dict, template: dict,
                      strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, clap_text_mapping(template), sd, strict)


def load_clap_text_checkpoint(path: str, **kw) -> dict:
    """laion_clap checkpoint -> flax params for ClapTextBranch."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.clap import ClapTextBranch

    model = ClapTextBranch(**kw)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.ones((1, 4), jnp.int32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_clap_text(sd, template)


def clap_audio_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/clap.ClapAudioBranch -> laion_clap audio keys
    (audio_branch.* = HTSAT swin layout + audio_projection.{0,2})."""
    m: dict[str, tuple[str, str]] = {}

    def dense(path, key, bias=True):
        m[f"{path}/kernel"] = ("dense_w", key)
        if bias:
            m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    m["patch_proj/kernel"] = ("conv2_w", "audio_branch.patch_embed.proj")
    m["patch_proj/bias"] = ("bias", "audio_branch.patch_embed.proj")
    norm("patch_norm", "audio_branch.patch_embed.norm")
    li = 0
    while f"l{li}_b0" in template:
        bi = 0
        while f"l{li}_b{bi}" in template:
            p = f"l{li}_b{bi}"
            b = f"audio_branch.layers.{li}.blocks.{bi}"
            norm(f"{p}/norm1", f"{b}.norm1")
            dense(f"{p}/qkv", f"{b}.attn.qkv")
            m[f"{p}/rel_bias"] = ("direct",
                                  f"{b}.attn.relative_position_bias_table")
            dense(f"{p}/proj", f"{b}.attn.proj")
            norm(f"{p}/norm2", f"{b}.norm2")
            dense(f"{p}/fc1", f"{b}.mlp.fc1")
            dense(f"{p}/fc2", f"{b}.mlp.fc2")
            bi += 1
        if f"merge_{li}_norm" in template:
            norm(f"merge_{li}_norm",
                 f"audio_branch.layers.{li}.downsample.norm")
            dense(f"merge_{li}_red",
                  f"audio_branch.layers.{li}.downsample.reduction",
                  bias=False)
        li += 1
    norm("norm", "audio_branch.norm")
    dense("proj0", "audio_projection.0")
    dense("proj1", "audio_projection.2")
    return m


def convert_clap_audio(state_dict: dict, template: dict,
                       strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, clap_audio_mapping(template), sd, strict)


def load_clap_audio_checkpoint(path: str, **kw) -> dict:
    """laion_clap checkpoint -> flax params for ClapAudioBranch."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.clap import ClapAudioBranch

    model = ClapAudioBranch(**kw)
    s = model.cfg.spec_size
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, s, s, 1), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_clap_audio(sd, template)


# ------------------------------------------------------------- T5 encoder

def t5_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/t5.T5Encoder -> transformers T5EncoderModel keys.

    The stable-audio T5Conditioner (wheel conditioners.py:286-368) hides
    the frozen torch module from state_dict, so these weights come from
    the published t5-base checkpoint, not the stable-audio safetensors."""
    m: dict[str, tuple[str, str]] = {
        "emb/embedding": ("direct", "shared.weight"),
        "final_ln/weight": ("direct", "encoder.final_layer_norm.weight"),
    }
    if "rel_bias" in template:
        m["rel_bias/embedding"] = (
            "direct",
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
            ".weight")
    n = sum(1 for k in template if k.startswith("attn_"))
    for i in range(n):
        b = f"encoder.block.{i}.layer"
        if f"rel_bias_{i}" in template:  # UMT5 per-layer bias
            m[f"rel_bias_{i}/embedding"] = (
                "direct", f"{b}.0.SelfAttention.relative_attention_bias"
                          ".weight")
        m[f"ln1_{i}/weight"] = ("direct", f"{b}.0.layer_norm.weight")
        m[f"ln2_{i}/weight"] = ("direct", f"{b}.1.layer_norm.weight")
        for p in ("q", "k", "v", "o"):
            m[f"attn_{i}/{p}/kernel"] = ("dense_w",
                                         f"{b}.0.SelfAttention.{p}")
        ff = template[f"ffn_{i}"]
        # transformers names the FFN submodule DenseReluDense for BOTH the
        # relu (wi) and gated (wi_0/wi_1) layouts
        if "wi" in ff:
            m[f"ffn_{i}/wi/kernel"] = ("dense_w", f"{b}.1.DenseReluDense.wi")
        else:  # v1.1 gated
            m[f"ffn_{i}/wi_0/kernel"] = ("dense_w",
                                         f"{b}.1.DenseReluDense.wi_0")
            m[f"ffn_{i}/wi_1/kernel"] = ("dense_w",
                                         f"{b}.1.DenseReluDense.wi_1")
        m[f"ffn_{i}/wo/kernel"] = ("dense_w", f"{b}.1.DenseReluDense.wo")
    return m


def convert_t5(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k] = np.asarray(v)
        if k == "encoder.embed_tokens.weight" and "shared.weight" not in state_dict:
            sd["shared.weight"] = np.asarray(v)
    return fill_tree(template, t5_mapping(template), sd, strict)


def load_t5_encoder(path: str, cfg=None) -> dict:
    """t5-base .safetensors/.bin -> flax params for models/t5.T5Encoder."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.t5 import T5Config, T5Encoder

    cfg = cfg or T5Config()
    model = T5Encoder(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_t5(sd, template)


def sao_number_mapping(template: dict, prefix: str) -> dict[str, tuple[str, str]]:
    """flax stable_audio.NumberEmbedder -> stable-audio checkpoint keys
    (conditioner.conditioners.{seconds_start,seconds_total}.embedder,
    wheel conditioners.py:58-91 / adp.py:655-678,1455-1474)."""
    return {
        "fourier_w": ("direct", f"{prefix}.embedding.0.weights"),
        "proj/kernel": ("dense_w", f"{prefix}.embedding.1"),
        "proj/bias": ("bias", f"{prefix}.embedding.1"),
    }


def convert_sao_number(state_dict: dict, template: dict, which: str,
                       strict: bool = True) -> dict:
    prefix = f"conditioner.conditioners.{which}.embedder"
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if not any(k.startswith(prefix) for k in sd):
        prefix = "embedder"  # bare NumberEmbedder state dict (tests)
    return fill_tree(template, sao_number_mapping(template, prefix), sd,
                     strict)


# ------------------------------------------------------- wav2vec2 CTC

def wav2vec2_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/wav2vec2.Wav2Vec2CTC -> HF Wav2Vec2ForCTC keys.

    The encoder reuses models/hubert.Hubert (same topology); HF names
    differ from fairseq's, hence the separate mapping.  Reference use:
    WhisperX alignment models, layouts/transcribe.py:89-112."""
    m: dict[str, tuple[str, str]] = {}
    enc = template["encoder"]

    def dense(path, key):
        m[f"{path}/kernel"] = ("dense_w", key)
        m[f"{path}/bias"] = ("bias", key)

    def norm(path, key):
        m[f"{path}/scale"] = ("w", key)
        m[f"{path}/bias"] = ("b", key)

    w2v = "wav2vec2"
    n_convs = sum(1 for k in enc["feature_extractor"] if k.startswith("conv_"))
    for i in range(n_convs):
        m[f"encoder/feature_extractor/conv_{i}/kernel"] = (
            "conv_w", f"{w2v}.feature_extractor.conv_layers.{i}.conv")
    norm("encoder/feature_extractor/gn_0",
         f"{w2v}.feature_extractor.conv_layers.0.layer_norm")
    norm("encoder/ln_post_extract", f"{w2v}.feature_projection.layer_norm")
    dense("encoder/post_extract_proj", f"{w2v}.feature_projection.projection")
    m["encoder/pos_conv/kernel"] = (
        "convwn2_w", f"{w2v}.encoder.pos_conv_embed.conv")
    m["encoder/pos_conv/bias"] = ("bias", f"{w2v}.encoder.pos_conv_embed.conv")
    norm("encoder/ln_pre", f"{w2v}.encoder.layer_norm")
    i = 0
    while f"layer_{i}" in enc:
        b = f"{w2v}.encoder.layers.{i}"
        for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"encoder/layer_{i}/attn/{w}", f"{b}.attention.{w}")
        dense(f"encoder/layer_{i}/fc1", f"{b}.feed_forward.intermediate_dense")
        dense(f"encoder/layer_{i}/fc2", f"{b}.feed_forward.output_dense")
        norm(f"encoder/layer_{i}/ln1", f"{b}.layer_norm")
        norm(f"encoder/layer_{i}/ln2", f"{b}.final_layer_norm")
        i += 1
    dense("lm_head", "lm_head")
    return m


def convert_wav2vec2(state_dict: dict, template: dict,
                     strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, wav2vec2_mapping(template), sd, strict)


def load_wav2vec2_checkpoint(path: str, cfg=None, vocab: dict | None = None):
    """HF Wav2Vec2ForCTC checkpoint -> CTCWordAligner."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.wav2vec2 import (
        CTCWordAligner,
        Wav2Vec2Config,
        Wav2Vec2CTC,
    )

    cfg = cfg or Wav2Vec2Config()
    model = Wav2Vec2CTC(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3200), jnp.float32))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    params = convert_wav2vec2(sd, template)
    return CTCWordAligner(params, cfg, vocab)


# ------------------------------------------------------------ DCAE (f8c8)

def _dcae_block_map(m: dict, fp: str, tk: str, node: dict) -> None:
    """Map one DCAE block's params; block type inferred from the tree."""
    def conv(p, k):
        m[f"{p}/kernel"] = ("conv2_w", k)
        if "bias" in _leaf(p):
            m[f"{p}/bias"] = ("bias", k)

    def _leaf(p):
        n = node
        for part in p.split("/")[1:]:
            n = n[part]
        return n

    def norm(p, k):
        m[f"{p}/weight"] = ("w", k)
        m[f"{p}/bias"] = ("b", k)

    name = fp.rsplit("/", 1)[-1]
    if "conv1" in node:                                   # ResBlock
        conv(f"{name}/conv1", f"{tk}.conv1")
        conv(f"{name}/conv2", f"{tk}.conv2")
        norm(f"{name}/norm", f"{tk}.norm")
    elif "attn" in node:                                  # EfficientViT
        at = node["attn"]
        for q in ("to_q", "to_k", "to_v", "to_out"):
            m[f"{name}/attn/{q}/kernel"] = ("dense_w", f"{tk}.attn.{q}")
        s = 0
        while f"to_qkv_multiscale_{s}" in at:
            for c in ("proj_in", "proj_out"):
                m[f"{name}/attn/to_qkv_multiscale_{s}/{c}/kernel"] = (
                    "conv2_w", f"{tk}.attn.to_qkv_multiscale.{s}.{c}")
            s += 1
        norm(f"{name}/attn/norm_out", f"{tk}.attn.norm_out")
        conv(f"{name}/conv_out/conv_inverted", f"{tk}.conv_out.conv_inverted")
        conv(f"{name}/conv_out/conv_depth", f"{tk}.conv_out.conv_depth")
        conv(f"{name}/conv_out/conv_point", f"{tk}.conv_out.conv_point")
        norm(f"{name}/conv_out/norm", f"{tk}.conv_out.norm")
    elif "conv" in node and "kernel" in node["conv"]:     # DC up/down block
        conv(f"{name}/conv", f"{tk}.conv")
    else:                                                 # plain conv
        conv(name, tk)


def dcae_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/dcae.AutoencoderDC -> diffusers AutoencoderDC keys
    (checkpoint layout of ACE-Step's music_dcae_f8c8;
    music_dcae_pipeline.py:40)."""
    m: dict[str, tuple[str, str]] = {}
    for side, seq, tseq in (("encoder", "down", "down_blocks"),
                            ("decoder", "up", "up_blocks")):
        tree = template[side]
        sub: dict[str, tuple[str, str]] = {}
        for k, node in tree.items():
            if k.startswith(f"{seq}_"):
                _i, _j = k.split("_")[1:]
                _dcae_block_map(sub, k, f"{side}.{tseq}.{_i}.{_j}", node)
            elif k in ("conv_in", "conv_out"):
                _dcae_block_map(sub, k, f"{side}.{k}", node)
            elif k == "norm_out":
                sub[f"{k}/weight"] = ("w", f"{side}.{k}")
                sub[f"{k}/bias"] = ("b", f"{side}.{k}")
        m.update({f"{side}/{p}": v for p, v in sub.items()})
    return m


def convert_dcae(state_dict: dict, template: dict,
                 strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, dcae_mapping(template), sd, strict)


def load_dcae_checkpoint(path: str, cfg=None) -> tuple[dict, "object"]:
    """diffusers music_dcae_f8c8 dir (config.json + safetensors) -> flax
    params + DCAEConfig for models/dcae.AutoencoderDC."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.dcae import (
        AutoencoderDC,
        DCAEConfig,
        config_from_json,
        spatial_compression,
    )

    if cfg is None:
        try:
            cfg = config_from_json(path)
        except FileNotFoundError:
            cfg = DCAEConfig()
    model = AutoencoderDC(cfg)
    f = spatial_compression(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4 * f, 4 * f, cfg.in_channels)))
        ["params"])
    import os as _os
    wfile = path
    if _os.path.isdir(path):
        for cand in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin", "model.safetensors"):
            if _os.path.exists(_os.path.join(path, cand)):
                wfile = _os.path.join(path, cand)
                break
    sd = torch_load_weights(wfile)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_dcae(sd, template), cfg


# ------------------------------------------------------------- PyanNet

def pyannet_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/pyannet.PyanNet -> pyannote segmentation-3.0 checkpoint
    names (pyannote.audio PyanNet + sincnet.py; reference use
    modules/cloning/speaker_separation.py:39-45)."""
    m: dict[str, tuple[str, str]] = {
        "sincnet/wav_norm/weight": ("w", "sincnet.wav_norm1d"),
        "sincnet/wav_norm/bias": ("b", "sincnet.wav_norm1d"),
        "sincnet/sinc/low_hz": ("direct",
                                "sincnet.conv1d.0.filterbank.low_hz_"),
        "sincnet/sinc/band_hz": ("direct",
                                 "sincnet.conv1d.0.filterbank.band_hz_"),
    }
    for i in (1, 2):
        m[f"sincnet/conv_{i}/kernel"] = ("conv_w", f"sincnet.conv1d.{i}")
        m[f"sincnet/conv_{i}/bias"] = ("bias", f"sincnet.conv1d.{i}")
    for i in (0, 1, 2):
        m[f"sincnet/norm_{i}/weight"] = ("w", f"sincnet.norm1d.{i}")
        m[f"sincnet/norm_{i}/bias"] = ("b", f"sincnet.norm1d.{i}")
    n_layers = sum(1 for k in template["lstm"] if k.endswith("_fwd_cell"))
    for k in range(n_layers):
        for d, sfx in (("fwd", f"l{k}"), ("bwd", f"l{k}_reverse")):
            cell = f"lstm/l{k}_{d}_cell"
            for ours, gate in (("i", "i"), ("f", "f"), ("g", "g"),
                               ("o", "o")):
                m[f"{cell}/i{ours}/kernel"] = ("lstm_iw",
                                               f"lstm.{sfx}|{gate}")
                m[f"{cell}/h{ours}/kernel"] = ("lstm_hw",
                                               f"lstm.{sfx}|{gate}")
                m[f"{cell}/h{ours}/bias"] = ("lstm_hb",
                                             f"lstm.{sfx}|{gate}")
    for i in (0, 1):
        m[f"linear_{i}/kernel"] = ("dense_w", f"linear.{i}")
        m[f"linear_{i}/bias"] = ("bias", f"linear.{i}")
    m["classifier/kernel"] = ("dense_w", "classifier")
    m["classifier/bias"] = ("bias", "classifier")
    return m


def convert_pyannet(state_dict: dict, template: dict,
                    strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):  # lightning checkpoint prefix
            k = k[6:]
        sd[k] = np.asarray(v)
    return fill_tree(template, pyannet_mapping(template), sd, strict)


def load_pyannet_checkpoint(path: str, cfg=None) -> dict:
    """pyannote segmentation .ckpt/.bin -> flax params for PyanNet."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.pyannet import PyanNet, PyanNetConfig

    cfg = cfg or PyanNetConfig()
    model = PyanNet(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16000)))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_pyannet(sd, template)


# ----------------------------------------------------------- RTLA CRNN

def rtla_crnn_mapping() -> dict:
    """flax models/rtla.RtlaCRNN tree -> the RTLA pretrained-model
    state dict (modules/rtla/CRNN_model.py:63-160; loaded by
    modules/rtla/utils.py:30-50).  BatchNorms fold to affines."""
    m: dict = {}
    for fl, tk in (("conv_0", "model.0.cnn.0"), ("conv_1", "model.0.cnn.3"),
                   ("conv_2", "model.0.cnn.8")):
        m[f"{fl}/kernel"] = ("conv2_w", tk)
        m[f"{fl}/bias"] = ("bias", tk)
    for fl, tk in (("bn_0", "model.0.cnn.1"), ("bn_1", "model.0.cnn.4"),
                   ("bn_2", "model.0.cnn.9")):
        m[f"{fl}/scale"] = ("bnfold_w", tk)
        m[f"{fl}/bias"] = ("bnfold_b", tk)
    m["fc/kernel"] = ("dense_w", "model.0.fc.0")
    m["fc/bias"] = ("bias", "model.0.fc.0")
    for gate in "ifgo":
        m[f"lstm_cell/i{gate}/kernel"] = ("lstm_iw", f"model.1.rnn.l0|{gate}")
        m[f"lstm_cell/h{gate}/kernel"] = ("lstm_hw", f"model.1.rnn.l0|{gate}")
        m[f"lstm_cell/h{gate}/bias"] = ("lstm_hb", f"model.1.rnn.l0|{gate}")
    m["head/kernel"] = ("dense_w", "model.2")
    m["head/bias"] = ("bias", "model.2")
    return m


def convert_rtla_crnn(state_dict: dict, template: dict,
                      strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, rtla_crnn_mapping(), sd, strict)


def load_rtla_crnn_checkpoint(path: str, config_json: str | None = None):
    """RTLA pretrained-model.safetensors/.pt (+ sibling json hyperparams,
    modules/rtla/utils.py:30-50) -> (RtlaCRNN, flax params)."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.rtla import RtlaCRNN, RtlaCRNNConfig

    if path.endswith((".pt", ".pth")):
        blob = torch_load_weights(path)
        sd = blob.get("model_state_dict", blob)
        meta = {"config": blob.get("config", {})}
    else:
        sd = torch_load_weights(path)
        meta = {}
        if config_json:
            with open(config_json) as f:
                meta = _json.load(f)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    mc = dict(meta.get("config", {}))
    cfg = RtlaCRNNConfig(
        n_mels=int(mc.get("n_mels", 66)),
        num_lbl=int(mc.get("num_lbl",
                           np.asarray(sd["model.2.bias"]).shape[0])),
        model_complexity=int(mc.get(
            "model_complexity",
            np.asarray(sd["model.2.weight"]).shape[1] // 16)))
    model = RtlaCRNN(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, cfg.n_mels)))["params"])
    return model, convert_rtla_crnn(sd, template)


# ------------------------------------------------------- WeSpeaker r-vector

def wespeaker_mapping(template: dict) -> dict:
    """flax models/wespeaker.WeSpeakerResNet tree -> the wespeaker ResNet34
    state dict (pyannote/wespeaker-voxceleb-resnet34-LM pytorch_model.bin,
    the embedding stage of speaker-diarization-3.1 —
    modules/cloning/speaker_separation.py:39-45).  BatchNorms fold to
    affines (inference)."""
    m: dict = {
        "conv1/kernel": ("conv2_w", "conv1"),
        "bn1/scale": ("bnfold_w", "bn1"),
        "bn1/bias": ("bnfold_b", "bn1"),
        "seg_1/kernel": ("dense_w", "seg_1"),
        "seg_1/bias": ("bias", "seg_1"),
    }
    for name in template:
        if not name.startswith("layer"):
            continue
        li, bi = name[5:].split("_block")
        tk = f"layer{li}.{bi}"
        m[f"{name}/conv1/kernel"] = ("conv2_w", f"{tk}.conv1")
        m[f"{name}/bn1/scale"] = ("bnfold_w", f"{tk}.bn1")
        m[f"{name}/bn1/bias"] = ("bnfold_b", f"{tk}.bn1")
        m[f"{name}/conv2/kernel"] = ("conv2_w", f"{tk}.conv2")
        m[f"{name}/bn2/scale"] = ("bnfold_w", f"{tk}.bn2")
        m[f"{name}/bn2/bias"] = ("bnfold_b", f"{tk}.bn2")
        if "short_conv" in template[name]:
            m[f"{name}/short_conv/kernel"] = ("conv2_w", f"{tk}.shortcut.0")
            m[f"{name}/short_bn/scale"] = ("bnfold_w", f"{tk}.shortcut.1")
            m[f"{name}/short_bn/bias"] = ("bnfold_b", f"{tk}.shortcut.1")
    if "seg_2" in template:  # two_emb_layer checkpoints
        m["seg_bn_1/scale"] = ("bnfoldna_w", "seg_bn_1")
        m["seg_bn_1/bias"] = ("bnfoldna_b", "seg_bn_1")
        m["seg_2/kernel"] = ("dense_w", "seg_2")
        m["seg_2/bias"] = ("bias", "seg_2")
    return m


def convert_wespeaker(state_dict: dict, template: dict,
                      strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        # some exports nest the speaker model (e.g. "resnet." / "model.")
        for pre in ("resnet.", "model.", "speaker_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        if k.startswith("projection."):  # wespeaker margin head — unused
            continue
        sd[k] = np.asarray(v)
    return fill_tree(template, wespeaker_mapping(template), sd, strict)


def load_wespeaker_checkpoint(path: str, cfg=None):
    """wespeaker-voxceleb-resnet34-LM .bin/.pt -> (model, flax params)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.wespeaker import (WeSpeakerConfig,
                                               WeSpeakerResNet)

    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    cfg = cfg or WeSpeakerConfig(
        two_emb_layer=any(k.endswith("seg_2.weight") for k in sd))
    model = WeSpeakerResNet(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 200, cfg.feat_dim)))["params"])
    return model, convert_wespeaker(sd, template)


# ------------------------------------------------------------ HTDemucs

def _htd_dconv(m: dict, fp: str, tk: str, node: dict) -> None:
    d = 0
    while f"c1_{d}" in node:
        b = f"{tk}.layers.{d}"
        m[f"{fp}/c1_{d}/kernel"] = ("conv_w", f"{b}.0")
        m[f"{fp}/c1_{d}/bias"] = ("bias", f"{b}.0")
        m[f"{fp}/n1_{d}/weight"] = ("w", f"{b}.1")
        m[f"{fp}/n1_{d}/bias"] = ("b", f"{b}.1")
        m[f"{fp}/c2_{d}/kernel"] = ("conv_w", f"{b}.3")
        m[f"{fp}/c2_{d}/bias"] = ("bias", f"{b}.3")
        m[f"{fp}/n2_{d}/weight"] = ("w", f"{b}.4")
        m[f"{fp}/n2_{d}/bias"] = ("b", f"{b}.4")
        m[f"{fp}/scale_{d}"] = ("direct", f"{b}.6.scale")
        d += 1


def _htd_coder(m: dict, fp: str, tk: str, node: dict, freq: bool,
               transposed: bool) -> None:
    ck = "conv2_w" if freq else "conv_w"
    if transposed:
        tck = "convT2_w" if freq else "convTwn_w"
        m[f"{fp}/conv_tr/kernel"] = (tck, f"{tk}.conv_tr")
        m[f"{fp}/conv_tr/bias"] = ("bias", f"{tk}.conv_tr")
    else:
        m[f"{fp}/conv/kernel"] = (ck, f"{tk}.conv")
        m[f"{fp}/conv/bias"] = ("bias", f"{tk}.conv")
    if "rewrite" in node:
        m[f"{fp}/rewrite/kernel"] = (ck, f"{tk}.rewrite")
        m[f"{fp}/rewrite/bias"] = ("bias", f"{tk}.rewrite")
    for nrm in ("norm1", "norm2"):
        if nrm in node:
            m[f"{fp}/{nrm}/weight"] = ("w", f"{tk}.{nrm}")
            m[f"{fp}/{nrm}/bias"] = ("b", f"{tk}.{nrm}")
    if "dconv" in node:
        _htd_dconv(m, f"{fp}/dconv", f"{tk}.dconv", node["dconv"])


def _htd_attn(m: dict, fp: str, tk: str) -> None:
    for qi, q in enumerate(("q", "k", "v")):
        m[f"{fp}/{q}/kernel"] = ("wslice", f"{tk}.in_proj|{qi}|3")
        m[f"{fp}/{q}/bias"] = ("bslice", f"{tk}.in_proj|{qi}|3")
    m[f"{fp}/out_proj/kernel"] = ("dense_w", f"{tk}.out_proj")
    m[f"{fp}/out_proj/bias"] = ("bias", f"{tk}.out_proj")


def _htd_tlayer(m: dict, fp: str, tk: str, node: dict) -> None:
    cross = "cross_attn" in node
    _htd_attn(m, f"{fp}/{'cross_attn' if cross else 'self_attn'}",
              f"{tk}.{'cross_attn' if cross else 'self_attn'}")
    for ln in ("norm1", "norm2", "norm3"):
        if ln in node:
            m[f"{fp}/{ln}/scale"] = ("w", f"{tk}.{ln}")
            m[f"{fp}/{ln}/bias"] = ("b", f"{tk}.{ln}")
    m[f"{fp}/norm_out/weight"] = ("w", f"{tk}.norm_out")
    m[f"{fp}/norm_out/bias"] = ("b", f"{tk}.norm_out")
    for li in ("linear1", "linear2"):
        m[f"{fp}/{li}/kernel"] = ("dense_w", f"{tk}.{li}")
        m[f"{fp}/{li}/bias"] = ("bias", f"{tk}.{li}")
    m[f"{fp}/gamma_1"] = ("direct", f"{tk}.gamma_1.scale")
    m[f"{fp}/gamma_2"] = ("direct", f"{tk}.gamma_2.scale")


def htdemucs_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/separation/htdemucs.HTDemucs -> demucs v4 checkpoint
    names (htdemucs/htdemucs_6s; reference loads them via audio-separator,
    stem_separator.py:459,466)."""
    m: dict[str, tuple[str, str]] = {
        "freq_emb": ("direct", "freq_emb.embedding.weight"),
    }
    i = 0
    while f"encoder_{i}" in template:
        _htd_coder(m, f"encoder_{i}", f"encoder.{i}",
                   template[f"encoder_{i}"], True, False)
        _htd_coder(m, f"tencoder_{i}", f"tencoder.{i}",
                   template[f"tencoder_{i}"], False, False)
        _htd_coder(m, f"decoder_{i}", f"decoder.{i}",
                   template[f"decoder_{i}"], True, True)
        _htd_coder(m, f"tdecoder_{i}", f"tdecoder.{i}",
                   template[f"tdecoder_{i}"], False, True)
        i += 1
    for nm in ("channel_upsampler", "channel_upsampler_t",
               "channel_downsampler", "channel_downsampler_t"):
        if nm in template:
            m[f"{nm}/kernel"] = ("dense1x1_w", nm)
            m[f"{nm}/bias"] = ("bias", nm)
    ct = template.get("crosstransformer", {})
    for nm in ("norm_in", "norm_in_t"):
        m[f"crosstransformer/{nm}/scale"] = ("w", f"crosstransformer.{nm}")
        m[f"crosstransformer/{nm}/bias"] = ("b", f"crosstransformer.{nm}")
    idx = 0
    while f"layer_{idx}" in ct:
        _htd_tlayer(m, f"crosstransformer/layer_{idx}",
                    f"crosstransformer.layers.{idx}", ct[f"layer_{idx}"])
        _htd_tlayer(m, f"crosstransformer/layer_t_{idx}",
                    f"crosstransformer.layers_t.{idx}",
                    ct[f"layer_t_{idx}"])
        idx += 1
    return m


def convert_htdemucs(state_dict: dict, template: dict,
                     strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("models.0.", "model.", "state."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    # torch MultiheadAttention packs qkv as in_proj_weight/in_proj_bias;
    # alias to ".in_proj.weight/.bias" so the wslice/bslice keys resolve
    for k in list(sd):
        if k.endswith(".in_proj_bias"):
            sd[k[: -len("_bias")] + ".bias"] = sd[k]
        elif k.endswith(".in_proj_weight"):
            sd[k[: -len("_weight")] + ".weight"] = sd[k]
    return fill_tree(template, htdemucs_mapping(template), sd, strict)


def load_htdemucs_checkpoint(path: str, cfg=None) -> dict:
    """demucs v4 .th checkpoint -> flax params for HTDemucs."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.separation.htdemucs import (
        HTDemucs,
        HTDemucsConfig,
    )

    cfg = cfg or HTDemucsConfig()
    model = HTDemucs(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.audio_channels,
                       int(cfg.segment_seconds * cfg.samplerate))))
        ["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_htdemucs(sd, template)


# --------------------------------------------------- MDX23C (TFC-TDF v3)

def _mdx23c_tfctdf(m: dict, fp: str, tk: str, node: dict) -> None:
    """Map one TFCTDFv3 stack (flax prefix fp) to torch
    ``{tk}.blocks.{j}.*`` keys."""
    j = 0
    while f"b{j}_shortcut" in node:
        b = f"{tk}.blocks.{j}"
        m[f"{fp}/b{j}_shortcut/kernel"] = ("conv2_w", f"{b}.shortcut")
        for part, t_idx in (("tfc1", "tfc1"), ("tfc2", "tfc2")):
            if f"b{j}_{part}_norm" in node:
                m[f"{fp}/b{j}_{part}_norm/norm/scale"] = ("w", f"{b}.{t_idx}.0")
                m[f"{fp}/b{j}_{part}_norm/norm/bias"] = ("b", f"{b}.{t_idx}.0")
            m[f"{fp}/b{j}_{part}_conv/kernel"] = ("conv2_w", f"{b}.{t_idx}.2")
        if f"b{j}_tdf_norm" in node:
            m[f"{fp}/b{j}_tdf_norm/norm/scale"] = ("w", f"{b}.tdf.0")
            m[f"{fp}/b{j}_tdf_norm/norm/bias"] = ("b", f"{b}.tdf.0")
        m[f"{fp}/b{j}_tdf1/kernel"] = ("dense_w", f"{b}.tdf.2")
        m[f"{fp}/b{j}_tdf2/kernel"] = ("dense_w", f"{b}.tdf.4")
        j += 1


def mdx23c_mapping(template: dict, sd: dict) -> dict[str, tuple[str, str]]:
    """flax models/separation/mdx23c.TFCTDFNetV3 -> MDX23C .ckpt names
    (ZFTurbo tfc_tdf_v3 layout; the reference runs these checkpoints via
    audio-separator, stem_separator.py:111,113,379-386,534-541).

    ``sd`` is probed for the down/upscale Sequential prefix so minor
    vendor repackagings (``downscale.2`` vs ``downscale.conv.2``) both
    resolve."""
    def seq(base: str) -> str:
        return base if f"{base}.2.weight" in sd else f"{base}.conv"

    m: dict[str, tuple[str, str]] = {
        "first_conv/kernel": ("conv2_w", "first_conv"),
        "final_conv1/kernel": ("conv2_w", "final_conv.0"),
        "final_conv2/kernel": ("conv2_w", "final_conv.2"),
    }
    _mdx23c_tfctdf(m, "mid", "bottleneck_block", template["mid"])
    n_scales = 0
    while f"enc_{n_scales}" in template:
        n_scales += 1
    for i in range(n_scales):
        # torch decoder_blocks run deepest-first: flax dec_{i} (named by
        # encoder scale) pairs with decoder_blocks.{n-1-i}
        d = n_scales - 1 - i
        _mdx23c_tfctdf(m, f"enc_{i}", f"encoder_blocks.{i}.tfc_tdf",
                       template[f"enc_{i}"])
        _mdx23c_tfctdf(m, f"dec_{i}", f"decoder_blocks.{d}.tfc_tdf",
                       template[f"dec_{i}"])
        dn = seq(f"encoder_blocks.{i}.downscale")
        up = seq(f"decoder_blocks.{d}.upscale")
        if f"down_{i}_norm" in template:
            m[f"down_{i}_norm/norm/scale"] = ("w", f"{dn}.0")
            m[f"down_{i}_norm/norm/bias"] = ("b", f"{dn}.0")
            m[f"up_{i}_norm/norm/scale"] = ("w", f"{up}.0")
            m[f"up_{i}_norm/norm/bias"] = ("b", f"{up}.0")
        m[f"down_{i}_conv/kernel"] = ("conv2_w", f"{dn}.2")
        m[f"up_{i}_conv/kernel"] = ("convT2_w", f"{up}.2")
    return m


def convert_mdx23c(state_dict: dict, template: dict,
                   strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "module.", "state_dict."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, mdx23c_mapping(template, sd), sd, strict)


def load_mdx23c_checkpoint(path: str, cfg=None) -> tuple[dict, "object"]:
    """MDX23C .ckpt -> (flax params, TFCTDFNetV3 model).

    ``cfg``: MDX23CConfig or a dict of its fields (copy the values from
    the checkpoint's published audio/model yaml sections)."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.separation.mdx23c import (
        MDX23CConfig,
        TFCTDFNetV3,
    )

    if isinstance(cfg, dict):
        cfg = MDX23CConfig(**cfg)
    cfg = cfg or MDX23CConfig()
    model = TFCTDFNetV3(cfg)
    n = model.good_length(1.0)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.num_channels, n)))["params"])
    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_mdx23c(sd, template), model


# -------------------------------------------- UVR VR architecture (.pth)

def _vr_cba(m: dict, fp: str, tk: str) -> None:
    """Conv2DBNActiv at flax path fp <- torch prefix tk."""
    m[f"{fp}/conv/kernel"] = ("conv2_w", f"{tk}.conv.0")
    m[f"{fp}/bn/scale"] = ("bnfold_w", f"{tk}.conv.1")
    m[f"{fp}/bn/bias"] = ("bnfold_b", f"{tk}.conv.1")


def _vr_sep_cba(m: dict, fp: str, tk: str) -> None:
    """SeperableConv2DBNActiv (depthwise + pointwise + BN)."""
    m[f"{fp}/dw/kernel"] = ("conv2_w", f"{tk}.conv.0")
    m[f"{fp}/pw/kernel"] = ("conv2_w", f"{tk}.conv.1")
    m[f"{fp}/bn/scale"] = ("bnfold_w", f"{tk}.conv.2")
    m[f"{fp}/bn/bias"] = ("bnfold_b", f"{tk}.conv.2")


def _vr_base_asppnet(m: dict, fp: str, tk: str) -> None:
    for i in (1, 2, 3, 4):
        _vr_cba(m, f"{fp}/enc{i}/conv1", f"{tk}.enc{i}.conv1")
        _vr_cba(m, f"{fp}/enc{i}/conv2", f"{tk}.enc{i}.conv2")
        _vr_cba(m, f"{fp}/dec{i}/conv", f"{tk}.dec{i}.conv")
    _vr_cba(m, f"{fp}/aspp/conv1", f"{tk}.aspp.conv1.1")
    _vr_cba(m, f"{fp}/aspp/conv2", f"{tk}.aspp.conv2")
    for i in (3, 4, 5):
        _vr_sep_cba(m, f"{fp}/aspp/conv{i}", f"{tk}.aspp.conv{i}")
    _vr_cba(m, f"{fp}/aspp/bottleneck", f"{tk}.aspp.bottleneck.0")


def _vr_lstm(m: dict, fp: str, tk: str) -> None:
    _vr_cba(m, f"{fp}/conv", f"{tk}.conv")
    for d, sfx in (("fwd", "l0"), ("bwd", "l0_reverse")):
        cell = f"{fp}/lstm/l0_{d}_cell"
        for g in ("i", "f", "g", "o"):
            m[f"{cell}/i{g}/kernel"] = ("lstm_iw", f"{tk}.lstm.{sfx}|{g}")
            m[f"{cell}/h{g}/kernel"] = ("lstm_hw", f"{tk}.lstm.{sfx}|{g}")
            m[f"{cell}/h{g}/bias"] = ("lstm_hb", f"{tk}.lstm.{sfx}|{g}")
    m[f"{fp}/dense/kernel"] = ("dense_w", f"{tk}.dense.0")
    m[f"{fp}/dense/bias"] = ("bias", f"{tk}.dense.0")
    m[f"{fp}/dense_bn/scale"] = ("bnfold_w", f"{tk}.dense.1")
    m[f"{fp}/dense_bn/bias"] = ("bnfold_b", f"{tk}.dense.1")


def _vr_basenet_new(m: dict, fp: str, tk: str) -> None:
    _vr_cba(m, f"{fp}/enc1", f"{tk}.enc1")
    for i in (2, 3, 4, 5):
        _vr_cba(m, f"{fp}/enc{i}/conv1", f"{tk}.enc{i}.conv1")
        _vr_cba(m, f"{fp}/enc{i}/conv2", f"{tk}.enc{i}.conv2")
    _vr_cba(m, f"{fp}/aspp/conv1", f"{tk}.aspp.conv1.1")
    for i in (2, 3, 4, 5):
        _vr_cba(m, f"{fp}/aspp/conv{i}", f"{tk}.aspp.conv{i}")
    m[f"{fp}/aspp/bottleneck/kernel"] = ("conv2_w", f"{tk}.aspp.bottleneck")
    for i in (1, 2, 3, 4):
        _vr_cba(m, f"{fp}/dec{i}/conv1", f"{tk}.dec{i}.conv1")
    _vr_lstm(m, f"{fp}/lstm_dec2", f"{tk}.lstm_dec2")


def vr_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/separation/vr nets -> UVR .pth key names (tsurumeso
    vocal-remover lib_v5; the reference runs these checkpoints via
    audio-separator — stem_separator.py:114,148,752,1048-1050)."""
    m: dict[str, tuple[str, str]] = {
        "out/kernel": ("conv2_w", "out"),
    }
    if "stg2_bridge" in template:          # old CascadedASPPNet
        _vr_base_asppnet(m, "stg1_low_band_net", "stg1_low_band_net")
        _vr_base_asppnet(m, "stg1_high_band_net", "stg1_high_band_net")
        _vr_cba(m, "stg2_bridge", "stg2_bridge")
        _vr_base_asppnet(m, "stg2_full_band_net", "stg2_full_band_net")
        _vr_cba(m, "stg3_bridge", "stg3_bridge")
        _vr_base_asppnet(m, "stg3_full_band_net", "stg3_full_band_net")
        return m
    _vr_basenet_new(m, "stg1_low_band_net_0", "stg1_low_band_net.0")
    _vr_cba(m, "stg1_low_band_net_1", "stg1_low_band_net.1")
    _vr_basenet_new(m, "stg1_high_band_net", "stg1_high_band_net")
    _vr_basenet_new(m, "stg2_low_band_net_0", "stg2_low_band_net.0")
    _vr_cba(m, "stg2_low_band_net_1", "stg2_low_band_net.1")
    _vr_basenet_new(m, "stg2_high_band_net", "stg2_high_band_net")
    _vr_basenet_new(m, "stg3_full_band_net", "stg3_full_band_net")
    return m


def convert_vr(state_dict: dict, template: dict, strict: bool = True) -> dict:
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v)
    return fill_tree(template, vr_mapping(template), sd, strict)


def load_vr_checkpoint(path: str, cfg=None,
                       n_fft: int | None = None) -> tuple[dict, "object"]:
    """UVR VR-arch .pth -> (flax params, net).  Arch and widths are
    sniffed from the state dict (``infer_vr_config``); pass ``n_fft`` (2x
    the combined-spec bins of the model's band params) for old-arch
    checkpoints where it is not derivable from weights."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.separation.vr import (
        infer_vr_config,
        make_vr_net,
    )

    sd = torch_load_weights(path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    cfg = cfg or infer_vr_config(sd, n_fft=n_fft)
    model = make_vr_net(cfg)
    frames = 32
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.max_bin, frames, 2)))["params"])
    return convert_vr(sd, template), model


# ------------------------------------------------------ Chatterbox (T3)

def chatterbox_t3_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax models/chatterbox_t3.T3 tree -> t3_cfg.safetensors names
    (published chatterbox-tts models/t3/t3.py: a transformers LlamaModel
    under ``tfmr.`` plus text/speech embeddings, learned position
    embeddings, T3CondEnc and the two logit heads)."""
    m: dict[str, tuple[str, str]] = {}
    m["text_emb/embedding"] = ("direct", "text_emb.weight")
    m["speech_emb/embedding"] = ("direct", "speech_emb.weight")
    m["text_pos_emb/embedding"] = ("direct", "text_pos_emb.emb.weight")
    m["speech_pos_emb/embedding"] = ("direct", "speech_pos_emb.emb.weight")
    for head in ("text_head", "speech_head"):
        m[f"{head}/kernel"] = ("dense_w", head)
        m[f"{head}/bias"] = ("bias", head)
    ce = template["cond_enc"]
    m["cond_enc/spkr_enc/kernel"] = ("dense_w", "cond_enc.spkr_enc")
    m["cond_enc/spkr_enc/bias"] = ("bias", "cond_enc.spkr_enc")
    m["cond_enc/emotion_adv_fc/kernel"] = ("dense_w",
                                           "cond_enc.emotion_adv_fc")
    m["cond_enc/emotion_adv_fc/bias"] = ("bias", "cond_enc.emotion_adv_fc")
    if "perceiver" in ce:
        p = "cond_enc.perceiver"
        m["cond_enc/perceiver/pre_attention_query"] = (
            "direct", f"{p}.pre_attention_query")
        for proj in ("to_q", "to_k", "to_v"):
            m[f"cond_enc/perceiver/attn/{proj}/kernel"] = (
                "dense_w", f"{p}.attn.{proj}")
        m["cond_enc/perceiver/attn/to_out/kernel"] = (
            "dense_w", f"{p}.attn.to_out.0")
        m["cond_enc/perceiver/attn/to_out/bias"] = (
            "bias", f"{p}.attn.to_out.0")
    # LLaMA backbone under the ``tfmr.`` prefix (no embed/head)
    tf = template["tfmr"]
    n = sum(1 for k in tf if k.startswith("layer_"))
    for i in range(n):
        b = f"tfmr.layers.{i}"
        p = f"tfmr/layer_{i}"
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "o_proj")):
            m[f"{p}/attn/{ours}/kernel"] = ("dense_w",
                                            f"{b}.self_attn.{theirs}")
        m[f"{p}/attn_norm/weight"] = ("direct", f"{b}.input_layernorm.weight")
        m[f"{p}/mlp_norm/weight"] = ("direct",
                                     f"{b}.post_attention_layernorm.weight")
        for ours, theirs in (("w1", "gate_proj"), ("w3", "up_proj"),
                             ("w2", "down_proj")):
            m[f"{p}/mlp/{ours}/kernel"] = ("dense_w", f"{b}.mlp.{theirs}")
    m["tfmr/final_norm/weight"] = ("direct", "tfmr.norm.weight")
    return m


def convert_chatterbox_t3(state_dict: dict, template: dict,
                          strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, chatterbox_t3_mapping(template), sd, strict)


def voice_encoder_mapping(template: dict) -> dict[str, tuple[str, str]]:
    """flax VoiceEncoder tree -> ve.safetensors names (Resemblyzer layout:
    ``lstm.weight_ih_l{k}``/``weight_hh_l{k}``/biases + ``proj``)."""
    m: dict[str, tuple[str, str]] = {}
    n = sum(1 for k in template if k.startswith("lstm_l"))
    for i in range(n):
        # torch LSTM weights are (4h, in) gate-major — flax wants (in, 4h);
        # gate order (i, f, g, o) is shared, so a plain transpose suffices
        m[f"lstm_l{i}/w_ih"] = ("direct_t", f"lstm.weight_ih_l{i}")
        m[f"lstm_l{i}/w_hh"] = ("direct_t", f"lstm.weight_hh_l{i}")
        m[f"lstm_l{i}/b_ih"] = ("direct", f"lstm.bias_ih_l{i}")
        m[f"lstm_l{i}/b_hh"] = ("direct", f"lstm.bias_hh_l{i}")
    m["proj/kernel"] = ("dense_w", "proj")
    m["proj/bias"] = ("bias", "proj")
    return m


def convert_voice_encoder(state_dict: dict, template: dict,
                          strict: bool = True) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, voice_encoder_mapping(template), sd, strict)


# --------------------------------------------------- Chatterbox (S3Gen)

def _s3gen_conformer_layer(m: dict, flax_p: str, torch_p: str) -> None:
    """wenet ConformerEncoderLayer (rel-pos attn + SiLU FF, no macaron)."""
    a = f"{torch_p}.self_attn"
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        m[f"{flax_p}/self_attn/{proj}/kernel"] = ("dense_w", f"{a}.{proj}")
        m[f"{flax_p}/self_attn/{proj}/bias"] = ("bias", f"{a}.{proj}")
    m[f"{flax_p}/self_attn/linear_pos/kernel"] = ("dense_w", f"{a}.linear_pos")
    m[f"{flax_p}/self_attn/pos_bias_u"] = ("direct", f"{a}.pos_bias_u")
    m[f"{flax_p}/self_attn/pos_bias_v"] = ("direct", f"{a}.pos_bias_v")
    m[f"{flax_p}/ffn_w1/kernel"] = ("dense_w", f"{torch_p}.feed_forward.w_1")
    m[f"{flax_p}/ffn_w1/bias"] = ("bias", f"{torch_p}.feed_forward.w_1")
    m[f"{flax_p}/ffn_w2/kernel"] = ("dense_w", f"{torch_p}.feed_forward.w_2")
    m[f"{flax_p}/ffn_w2/bias"] = ("bias", f"{torch_p}.feed_forward.w_2")
    for norm in ("norm_mha", "norm_ff"):
        m[f"{flax_p}/{norm}/scale"] = ("w", f"{torch_p}.{norm}")
        m[f"{flax_p}/{norm}/bias"] = ("b", f"{torch_p}.{norm}")


def _s3gen_causal_block(m: dict, flax_p: str, torch_p: str) -> None:
    """CausalBlock1D: causal conv (``block.0``) + LayerNorm (``block.2``)."""
    m[f"{flax_p}/conv/conv/Conv_0/kernel"] = ("conv_w", f"{torch_p}.block.0")
    m[f"{flax_p}/conv/conv/Conv_0/bias"] = ("bias", f"{torch_p}.block.0")
    m[f"{flax_p}/norm/scale"] = ("w", f"{torch_p}.block.2")
    m[f"{flax_p}/norm/bias"] = ("b", f"{torch_p}.block.2")


def _s3gen_resnet_block(m: dict, flax_p: str, torch_p: str) -> None:
    """matcha CausalResnetBlock1D: mlp.1 + block1/block2 + res_conv."""
    m[f"{flax_p}/mlp/kernel"] = ("dense_w", f"{torch_p}.mlp.1")
    m[f"{flax_p}/mlp/bias"] = ("bias", f"{torch_p}.mlp.1")
    _s3gen_causal_block(m, f"{flax_p}/block1", f"{torch_p}.block1")
    _s3gen_causal_block(m, f"{flax_p}/block2", f"{torch_p}.block2")
    m[f"{flax_p}/res_conv/Conv_0/kernel"] = ("conv_w", f"{torch_p}.res_conv")
    m[f"{flax_p}/res_conv/Conv_0/bias"] = ("bias", f"{torch_p}.res_conv")


def _s3gen_transformer_block(m: dict, flax_p: str, torch_p: str) -> None:
    """diffusers BasicTransformerBlock (self-attn + gelu FF)."""
    for proj in ("to_q", "to_k", "to_v"):
        m[f"{flax_p}/{proj}/kernel"] = ("dense_w", f"{torch_p}.attn1.{proj}")
    m[f"{flax_p}/to_out/kernel"] = ("dense_w", f"{torch_p}.attn1.to_out.0")
    m[f"{flax_p}/to_out/bias"] = ("bias", f"{torch_p}.attn1.to_out.0")
    for norm in ("norm1", "norm3"):
        m[f"{flax_p}/{norm}/scale"] = ("w", f"{torch_p}.{norm}")
        m[f"{flax_p}/{norm}/bias"] = ("b", f"{torch_p}.{norm}")
    m[f"{flax_p}/ff_in/kernel"] = ("dense_w", f"{torch_p}.ff.net.0.proj")
    m[f"{flax_p}/ff_in/bias"] = ("bias", f"{torch_p}.ff.net.0.proj")
    m[f"{flax_p}/ff_out/kernel"] = ("dense_w", f"{torch_p}.ff.net.2")
    m[f"{flax_p}/ff_out/bias"] = ("bias", f"{torch_p}.ff.net.2")


def s3gen_flow_mapping(template: dict, prefix: str = "") -> dict:
    """flax chatterbox_s3gen.CausalMaskedDiffWithXvec tree ->
    s3gen.safetensors ``flow.*`` names (chatterbox-tts models/s3gen/
    {flow,decoder}.py; layouts/tts.py:381)."""
    m: dict[str, tuple[str, str]] = {}
    m["input_embedding/embedding"] = ("direct", f"{prefix}input_embedding.weight")
    for lin in ("spk_embed_affine_layer", "encoder_proj"):
        m[f"{lin}/kernel"] = ("dense_w", f"{prefix}{lin}")
        m[f"{lin}/bias"] = ("bias", f"{prefix}{lin}")
    enc = template["encoder"]
    for emb in ("embed", "up_embed"):
        m[f"encoder/{emb}/out0/kernel"] = ("dense_w",
                                           f"{prefix}encoder.{emb}.out.0")
        m[f"encoder/{emb}/out0/bias"] = ("bias", f"{prefix}encoder.{emb}.out.0")
        m[f"encoder/{emb}/out1/scale"] = ("w", f"{prefix}encoder.{emb}.out.1")
        m[f"encoder/{emb}/out1/bias"] = ("b", f"{prefix}encoder.{emb}.out.1")
    for conv in ("conv1", "conv2"):
        p = f"{prefix}encoder.pre_lookahead_layer.{conv}"
        m[f"encoder/pre_lookahead_layer/{conv}/Conv_0/kernel"] = ("conv_w", p)
        m[f"encoder/pre_lookahead_layer/{conv}/Conv_0/bias"] = ("bias", p)
    m["encoder/up_layer/conv/Conv_0/kernel"] = ("conv_w",
                                                f"{prefix}encoder.up_layer.conv")
    m["encoder/up_layer/conv/Conv_0/bias"] = ("bias",
                                              f"{prefix}encoder.up_layer.conv")
    for group, tname in (("encoders", "encoders"),
                         ("up_encoders", "up_encoders")):
        n = sum(1 for k in enc if k.startswith(f"{group}_"))
        for i in range(n):
            _s3gen_conformer_layer(m, f"encoder/{group}_{i}",
                                   f"{prefix}encoder.{tname}.{i}")
    m["encoder/after_norm/scale"] = ("w", f"{prefix}encoder.after_norm")
    m["encoder/after_norm/bias"] = ("b", f"{prefix}encoder.after_norm")

    est = template["decoder"]["estimator"]
    te = f"{prefix}decoder.estimator"
    m["decoder/estimator/time_mlp_1/kernel"] = ("dense_w", f"{te}.time_mlp.linear_1")
    m["decoder/estimator/time_mlp_1/bias"] = ("bias", f"{te}.time_mlp.linear_1")
    m["decoder/estimator/time_mlp_2/kernel"] = ("dense_w", f"{te}.time_mlp.linear_2")
    m["decoder/estimator/time_mlp_2/bias"] = ("bias", f"{te}.time_mlp.linear_2")
    _s3gen_resnet_block(m, "decoder/estimator/down_resnet",
                        f"{te}.down_blocks.0.0")
    n_tb = sum(1 for k in est if k.startswith("down_tb_"))
    for i in range(n_tb):
        _s3gen_transformer_block(m, f"decoder/estimator/down_tb_{i}",
                                 f"{te}.down_blocks.0.1.{i}")
    m["decoder/estimator/downsample/conv/Conv_0/kernel"] = (
        "conv_w", f"{te}.down_blocks.0.2")
    m["decoder/estimator/downsample/conv/Conv_0/bias"] = (
        "bias", f"{te}.down_blocks.0.2")
    n_mid = sum(1 for k in est if k.startswith("mid_resnet_"))
    for mb in range(n_mid):
        _s3gen_resnet_block(m, f"decoder/estimator/mid_resnet_{mb}",
                            f"{te}.mid_blocks.{mb}.0")
        for i in range(n_tb):
            _s3gen_transformer_block(m, f"decoder/estimator/mid_tb_{mb}_{i}",
                                     f"{te}.mid_blocks.{mb}.1.{i}")
    _s3gen_resnet_block(m, "decoder/estimator/up_resnet",
                        f"{te}.up_blocks.0.0")
    for i in range(n_tb):
        _s3gen_transformer_block(m, f"decoder/estimator/up_tb_{i}",
                                 f"{te}.up_blocks.0.1.{i}")
    m["decoder/estimator/upsample/conv/Conv_0/kernel"] = (
        "conv_w", f"{te}.up_blocks.0.2")
    m["decoder/estimator/upsample/conv/Conv_0/bias"] = (
        "bias", f"{te}.up_blocks.0.2")
    _s3gen_causal_block(m, "decoder/estimator/final_block",
                        f"{te}.final_block")
    m["decoder/estimator/final_proj/Conv_0/kernel"] = ("conv_w",
                                                       f"{te}.final_proj")
    m["decoder/estimator/final_proj/Conv_0/bias"] = ("bias",
                                                     f"{te}.final_proj")
    return m


def hift_mapping(template: dict, prefix: str = "") -> dict:
    """flax chatterbox_s3gen.HiFTGenerator tree -> s3gen.safetensors
    ``mel2wav.*`` names (cosyvoice-style hifigan generator)."""
    m: dict[str, tuple[str, str]] = {}
    for i in range(5):
        p = f"{prefix}f0_predictor.condnet.{2 * i}"
        m[f"f0_predictor/condnet_{i}/Conv_0/kernel"] = ("convwn_w", p)
        m[f"f0_predictor/condnet_{i}/Conv_0/bias"] = ("bias", p)
    m["f0_predictor/classifier/kernel"] = ("dense_w",
                                           f"{prefix}f0_predictor.classifier")
    m["f0_predictor/classifier/bias"] = ("bias",
                                         f"{prefix}f0_predictor.classifier")
    m["m_source_linear/kernel"] = ("dense_w", f"{prefix}m_source.l_linear")
    m["m_source_linear/bias"] = ("bias", f"{prefix}m_source.l_linear")
    for conv in ("conv_pre", "conv_post"):
        m[f"{conv}/Conv_0/kernel"] = ("convwn_w", f"{prefix}{conv}")
        m[f"{conv}/Conv_0/bias"] = ("bias", f"{prefix}{conv}")

    def resblock(flax_p: str, torch_p: str, n_dil: int) -> None:
        for j in range(n_dil):
            for cv in ("convs1", "convs2"):
                m[f"{flax_p}/{cv}_{j}/Conv_0/kernel"] = (
                    "convwn_w", f"{torch_p}.{cv}.{j}")
                m[f"{flax_p}/{cv}_{j}/Conv_0/bias"] = (
                    "bias", f"{torch_p}.{cv}.{j}")
            m[f"{flax_p}/act1_{j}/alpha"] = (
                "direct", f"{torch_p}.activations1.{j}.alpha")
            m[f"{flax_p}/act2_{j}/alpha"] = (
                "direct", f"{torch_p}.activations2.{j}.alpha")

    n_up = sum(1 for k in template if k.startswith("ups_"))
    n_k = len({k.rsplit("_", 1)[1] for k in template
               if k.startswith("resblocks_")})
    for i in range(n_up):
        m[f"ups_{i}/ConvTranspose_0/kernel"] = ("convTwn_w", f"{prefix}ups.{i}")
        m[f"ups_{i}/ConvTranspose_0/bias"] = ("bias", f"{prefix}ups.{i}")
        m[f"source_downs_{i}/Conv_0/kernel"] = ("conv_w",
                                                f"{prefix}source_downs.{i}")
        m[f"source_downs_{i}/Conv_0/bias"] = ("bias",
                                              f"{prefix}source_downs.{i}")
        sr = template[f"source_resblocks_{i}"]
        resblock(f"source_resblocks_{i}", f"{prefix}source_resblocks.{i}",
                 sum(1 for k in sr if k.startswith("convs1_")))
        for j in range(n_k):
            rb = template[f"resblocks_{i}_{j}"]
            resblock(f"resblocks_{i}_{j}",
                     f"{prefix}resblocks.{i * n_k + j}",
                     sum(1 for k in rb if k.startswith("convs1_")))
    return m


def convert_s3gen_flow(state_dict: dict, template: dict, strict: bool = True,
                       prefix: str = "") -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, s3gen_flow_mapping(template, prefix), sd,
                     strict)


def convert_hift(state_dict: dict, template: dict, strict: bool = True,
                 prefix: str = "") -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, hift_mapping(template, prefix), sd, strict)


def convert_s3gen(state_dict: dict, flow_template: dict, hift_template: dict,
                  strict: bool = True) -> tuple[dict, dict]:
    """Split one s3gen.safetensors state dict on its ``flow.`` /
    ``mel2wav.`` prefixes and fill both flax trees."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return (convert_s3gen_flow(sd, flow_template, strict, prefix="flow."),
            convert_hift(sd, hift_template, strict, prefix="mel2wav."))


# ---------------------------------------------- full-pipeline assemblies

def load_stable_audio_pipeline(model_path: str, t5_path: str,
                               spm_model_path: str):
    """One-call assembly of the REAL stable-audio-open stack: the
    model.safetensors holds the DiT, the Oobleck decoder and the two
    seconds NumberEmbedders; ``t5_path`` holds published t5-base weights
    (the checkpoint does not embed them — wheel conditioners.py:341);
    ``spm_model_path`` is the t5 tokenizer .model.  Returns
    pipelines.music.StableAudioCheckpointPipeline."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.stable_audio import NumberEmbedder
    from audiolab_tpu.models.stable_audio_dit import (
        OobleckConfig,
        OobleckDecoder,
        SAODiTConfig,
        StableAudioDiT,
    )
    from audiolab_tpu.models.t5 import T5Config
    from audiolab_tpu.pipelines.music import StableAudioCheckpointPipeline

    sd = torch_load_weights(model_path)
    if hasattr(next(iter(sd.values())), "numpy"):
        sd = {k: v.float().numpy() for k, v in sd.items()}
    dit_cfg = SAODiTConfig()
    dit_tpl = jax.eval_shape(
        lambda: StableAudioDiT(dit_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 64)), jnp.zeros((1,)),
            jnp.zeros((1, 4, 768)), jnp.zeros((1, 1536)))["params"])
    dit_params = convert_sao_dit(sd, dit_tpl)
    vae_cfg = OobleckConfig()
    dec_tpl = jax.eval_shape(
        lambda: OobleckDecoder(vae_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))["params"])
    dec_params = convert_oobleck(sd, dec_tpl)
    t5_cfg = T5Config()
    ne_tpl = jax.eval_shape(
        lambda: NumberEmbedder(features=t5_cfg.dim).init(
            jax.random.PRNGKey(0), jnp.zeros((1,)))["params"])
    ss = convert_sao_number(sd, ne_tpl, "seconds_start")
    st = convert_sao_number(sd, ne_tpl, "seconds_total")
    t5_params = load_t5_encoder(t5_path, t5_cfg)
    return StableAudioCheckpointPipeline(
        dit_params, dec_params, t5_params, ss, st, spm_model_path,
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg)


def load_acestep_pipeline(checkpoint_dir: str):
    """One-call assembly of the REAL ACE-Step stack from the reference's
    checkpoint layout (pipeline_ace_step.py:156: music_dcae_f8c8 /
    music_vocoder / ace_step_transformer / umt5-base dirs).  Returns
    pipelines.acestep.CheckpointACEStep wired with the DCAE+vocoder
    decode and the umt5 text encoder."""
    import os

    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.adamos_vocoder import AdamosConfig, AdamosVocoder
    from audiolab_tpu.models.music_dcae import MusicDCAE, dcae_codec_fns
    from audiolab_tpu.models.t5 import umt5_base
    from audiolab_tpu.pipelines.acestep import (
        ACEStepTextEncoder,
        CheckpointACEStep,
    )

    def find(d, names):
        for n in names:
            p = os.path.join(checkpoint_dir, d, n)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"{d}: none of {names} in {checkpoint_dir}")

    from audiolab_tpu.models.acestep_dit import ACEStepDiTConfig

    wnames = ("diffusion_pytorch_model.safetensors", "model.safetensors",
              "pytorch_model.bin", "diffusion_pytorch_model.bin")
    dit_cfg = ACEStepDiTConfig()
    dit_params = load_acestep_dit_checkpoint(
        find("ace_step_transformer", wnames), dit_cfg)
    lyric_params = load_acestep_lyric_checkpoint(
        find("ace_step_transformer", wnames))
    dcae_params, dcae_cfg = load_dcae_checkpoint(
        os.path.join(checkpoint_dir, "music_dcae_f8c8"))
    enc_fn, dec_fn = dcae_codec_fns(dcae_params, dcae_cfg)
    voc_cfg = AdamosConfig()
    voc = AdamosVocoder(voc_cfg)
    voc_tpl = jax.eval_shape(
        lambda: voc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, voc_cfg.input_channels)))["params"])
    vsd = torch_load_weights(find("music_vocoder", wnames))
    if hasattr(next(iter(vsd.values())), "numpy"):
        vsd = {k: v.float().numpy() for k, v in vsd.items()}
    voc_params = convert_adamos(vsd, voc_tpl)
    codec = MusicDCAE(encoder_fn=enc_fn, decoder_fn=dec_fn,
                      vocoder=voc, vocoder_params=voc_params)
    text_enc = ACEStepTextEncoder(
        load_t5_encoder(find("umt5-base", wnames), umt5_base()),
        find("umt5-base", ("spiece.model", "tokenizer.model")))
    return CheckpointACEStep(dit_cfg, dit_params, lyric_params=lyric_params,
                             decode_fn=codec.decode, text_encoder=text_enc)


def load_chatterbox_pipeline(checkpoint_dir: str):
    """One-call assembly of the REAL resemble-ai Chatterbox stack from its
    published layout (reference layouts/tts.py:12,381:
    ``ChatterboxTTS.from_pretrained`` pulls ve.safetensors,
    t3_cfg.safetensors, s3gen.safetensors, tokenizer.json and the builtin
    voice conds.pt).  Returns pipelines.tts.ChatterboxCheckpointEngine."""
    import os

    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.chatterbox_s3gen import FlowConfig, HiFTConfig
    from audiolab_tpu.models.chatterbox_s3gen import (
        CausalMaskedDiffWithXvec,
        HiFTGenerator,
    )
    from audiolab_tpu.models.chatterbox_t3 import (
        T3,
        T3CkptConfig,
        VoiceEncoder,
    )
    from audiolab_tpu.pipelines.tts import (
        ChatterboxCheckpointEngine,
        ChatterboxTokenizer,
    )

    def path(name):
        p = os.path.join(checkpoint_dir, name)
        if not os.path.exists(p):
            raise FileNotFoundError(f"{name} not found in {checkpoint_dir}")
        return p

    t3_cfg = T3CkptConfig()
    t3 = T3(t3_cfg, max_seq_len=4096)
    t3_tpl = jax.eval_shape(
        lambda: t3.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1, 5), jnp.int32),
                        jnp.zeros((1, t3_cfg.speaker_embed_size)),
                        jnp.zeros((1, 3), jnp.int32),
                        jnp.zeros((1,)))["params"])
    t3_params = convert_chatterbox_t3(
        torch_load_weights(path("t3_cfg.safetensors")), t3_tpl)

    ve = VoiceEncoder()
    ve_tpl = jax.eval_shape(
        lambda: ve.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, ve.cfg.n_mels)))["params"])
    ve_params = convert_voice_encoder(
        torch_load_weights(path("ve.safetensors")), ve_tpl)

    flow_cfg, hift_cfg = FlowConfig(), HiFTConfig()
    flow_tpl = jax.eval_shape(
        lambda: CausalMaskedDiffWithXvec(flow_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32),
            jnp.zeros((1, flow_cfg.xvector_dim)),
            jnp.zeros((1, 2, flow_cfg.mel_dim)),
            jnp.zeros((1, 6, flow_cfg.mel_dim)))["params"])
    hift_tpl = jax.eval_shape(
        lambda: HiFTGenerator(hift_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, hift_cfg.in_channels)),
            jax.random.PRNGKey(1))["params"])
    # the safetensors also bundles the S3 speech tokenizer and CAMPPlus
    # speaker encoder — extra keys are ignored by the flow/hift fills;
    # the CAMPPlus (speaker_encoder.*) converts separately for ref-audio
    # xvectors
    sgen_sd = torch_load_weights(path("s3gen.safetensors"))
    flow_params, hift_params = convert_s3gen(sgen_sd, flow_tpl, hift_tpl)
    campplus_params = None
    if any(k.startswith("speaker_encoder.") for k in sgen_sd):
        from audiolab_tpu.models.campplus import CAMPPlus, CAMPPlusConfig

        cp_cfg = CAMPPlusConfig()
        cp_tpl = jax.eval_shape(
            lambda: CAMPPlus(cp_cfg).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, cp_cfg.feat_dim)))["params"])
        campplus_params = convert_campplus(sgen_sd, cp_tpl,
                                           prefix="speaker_encoder.")
    s3tok_params = s3tok_cfg = None
    if any(k.startswith("tokenizer.encoder.") for k in sgen_sd):
        import re as _re

        from audiolab_tpu.models.s3tokenizer import (S3TokenizerConfig,
                                                     S3TokenizerV2)

        n_layer = 1 + max(
            int(m.group(1)) for k in sgen_sd
            if (m := _re.match(r"tokenizer\.encoder\.blocks\.(\d+)\.", k)))
        w = np.asarray(sgen_sd["tokenizer.encoder.conv1.weight"])
        s3tok_cfg = S3TokenizerConfig(n_mels=w.shape[1], n_state=w.shape[0],
                                      n_layer=n_layer)
        st_tpl = jax.eval_shape(
            lambda: S3TokenizerV2(s3tok_cfg).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 16, s3tok_cfg.n_mels)))["params"])
        s3tok_params = convert_s3tokenizer(sgen_sd, st_tpl,
                                           prefix="tokenizer.")

    tokenizer = None
    tok_path = os.path.join(checkpoint_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        tokenizer = ChatterboxTokenizer(tok_path).encode

    builtin = {}
    conds_path = os.path.join(checkpoint_dir, "conds.pt")
    if os.path.exists(conds_path):
        cd = torch_load_weights(conds_path)

        def pick(d, *keys):
            for k in keys:
                if k in d:
                    v = d[k]
                    return np.asarray(v.float().numpy()
                                      if hasattr(v, "numpy") else v)
            return None

        flat = {}
        for k, v in (cd.items() if isinstance(cd, dict) else []):
            if isinstance(v, dict):
                for kk, vv in v.items():
                    flat[f"{k}.{kk}"] = vv
            else:
                flat[k] = v
        spk = pick(flat, "t3.speaker_emb", "speaker_emb")
        if spk is not None:
            builtin["speaker_emb"] = spk.reshape(-1)
        pt = pick(flat, "t3.cond_prompt_speech_tokens",
                  "cond_prompt_speech_tokens")
        if pt is not None:
            builtin["prompt_tokens"] = pt.reshape(1, -1).astype(np.int32)
        rt = pick(flat, "gen.prompt_token", "prompt_token")
        if rt is not None:
            builtin["ref_tokens"] = rt.reshape(1, -1).astype(np.int32)
        rm = pick(flat, "gen.prompt_feat", "prompt_feat")
        if rm is not None:
            builtin["ref_mel"] = rm.reshape(1, -1, flow_cfg.mel_dim)
        xv = pick(flat, "gen.embedding", "embedding")
        if xv is not None:
            builtin["ref_xvector"] = xv.reshape(-1)

    return ChatterboxCheckpointEngine(
        t3_cfg, t3_params, flow_cfg, flow_params, hift_cfg, hift_params,
        ve_params=ve_params, tokenizer=tokenizer, builtin=builtin,
        campplus_params=campplus_params, s3tok_params=s3tok_params,
        s3tok_cfg=s3tok_cfg)


# --------------------------------------------------------------- CAMPPlus

def _bn_map(m: dict, flax_p: str, torch_p: str, affine: bool = True) -> None:
    """Frozen BatchNorm -> BNInfer params (running stats + affine)."""
    m[f"{flax_p}/mean"] = ("direct", f"{torch_p}.running_mean")
    m[f"{flax_p}/var"] = ("direct", f"{torch_p}.running_var")
    if affine:
        m[f"{flax_p}/scale"] = ("w", torch_p)
        m[f"{flax_p}/bias"] = ("b", torch_p)


def campplus_mapping(template: dict, prefix: str = "") -> dict:
    """flax models/campplus.CAMPPlus tree -> 3D-Speaker CAMPPlus state
    dict (the chatterbox s3gen.safetensors bundles it under
    ``speaker_encoder.``)."""
    p = prefix
    m: dict = {}
    m["head/conv1/kernel"] = ("conv2_w", f"{p}head.conv1")
    _bn_map(m, "head/bn1", f"{p}head.bn1")
    for li, layer in enumerate(("layer1", "layer2")):
        for bi in range(2):
            fp, tp = f"head/{layer}_{bi}", f"{p}head.{layer}.{bi}"
            m[f"{fp}/conv1/kernel"] = ("conv2_w", f"{tp}.conv1")
            _bn_map(m, f"{fp}/bn1", f"{tp}.bn1")
            m[f"{fp}/conv2/kernel"] = ("conv2_w", f"{tp}.conv2")
            _bn_map(m, f"{fp}/bn2", f"{tp}.bn2")
            if bi == 0:  # stride-2 block carries the projection shortcut
                m[f"{fp}/shortcut_conv/kernel"] = ("conv2_w",
                                                   f"{tp}.shortcut.0")
                _bn_map(m, f"{fp}/shortcut_bn", f"{tp}.shortcut.1")
    m["head/conv2/kernel"] = ("conv2_w", f"{p}head.conv2")
    _bn_map(m, "head/bn2", f"{p}head.bn2")

    m["tdnn_linear/Conv_0/kernel"] = ("conv_w", f"{p}xvector.tdnn.linear")
    _bn_map(m, "tdnn_nonlinear/batchnorm",
            f"{p}xvector.tdnn.nonlinear.batchnorm")
    blocks = {}
    for k in template:
        if k.startswith("block"):
            b, t = k.split("_", 1)
            blocks.setdefault(int(b[5:]), set()).add(int(t[5:]))
    for bi in sorted(blocks):
        for li in sorted(blocks[bi]):
            fp = f"block{bi}_tdnnd{li}"
            tp = f"{p}xvector.block{bi}.tdnnd{li}"
            _bn_map(m, f"{fp}/nonlinear1/batchnorm",
                    f"{tp}.nonlinear1.batchnorm")
            m[f"{fp}/linear1/Conv_0/kernel"] = ("conv_w", f"{tp}.linear1")
            _bn_map(m, f"{fp}/nonlinear2/batchnorm",
                    f"{tp}.nonlinear2.batchnorm")
            cl = f"{tp}.cam_layer"
            m[f"{fp}/cam_layer/linear_local/Conv_0/kernel"] = (
                "conv_w", f"{cl}.linear_local")
            m[f"{fp}/cam_layer/linear1/Conv_0/kernel"] = ("conv_w",
                                                          f"{cl}.linear1")
            m[f"{fp}/cam_layer/linear1/Conv_0/bias"] = ("bias",
                                                        f"{cl}.linear1")
            m[f"{fp}/cam_layer/linear2/Conv_0/kernel"] = ("conv_w",
                                                          f"{cl}.linear2")
            m[f"{fp}/cam_layer/linear2/Conv_0/bias"] = ("bias",
                                                        f"{cl}.linear2")
        _bn_map(m, f"transit{bi}_nonlinear/batchnorm",
                f"{p}xvector.transit{bi}.nonlinear.batchnorm")
        m[f"transit{bi}_linear/Conv_0/kernel"] = (
            "conv_w", f"{p}xvector.transit{bi}.linear")
    _bn_map(m, "out_nonlinear/batchnorm",
            f"{p}xvector.out_nonlinear.batchnorm")
    m["dense_linear/kernel"] = ("dense1x1_w", f"{p}xvector.dense.linear")
    _bn_map(m, "dense_nonlinear",
            f"{p}xvector.dense.nonlinear.batchnorm", affine=False)
    return m


def convert_campplus(state_dict: dict, template: dict, strict: bool = True,
                     prefix: str = "") -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return fill_tree(template, campplus_mapping(template, prefix), sd,
                     strict)


# ----------------------------------------------------------- S3Tokenizer

def s3tokenizer_mapping(template: dict, prefix: str = "",
                        fsq_prefix: str = "quantizer.vq") -> dict:
    """flax models/s3tokenizer.S3TokenizerV2 tree -> the s3tokenizer
    package's state dict (bundled under ``tokenizer.`` in chatterbox's
    s3gen.safetensors)."""
    p = prefix
    m: dict = {}
    for cv in ("conv1", "conv2"):
        m[f"encoder/{cv}/kernel"] = ("conv_w", f"{p}encoder.{cv}")
        m[f"encoder/{cv}/bias"] = ("bias", f"{p}encoder.{cv}")
    n_layers = sum(1 for k in template["encoder"] if k.startswith("block_"))
    for i in range(n_layers):
        fp, tp = f"encoder/block_{i}", f"{p}encoder.blocks.{i}"
        for proj, bias in (("query", True), ("key", False),
                           ("value", True), ("out", True)):
            m[f"{fp}/attn/{proj}/kernel"] = ("dense_w", f"{tp}.attn.{proj}")
            if bias:
                m[f"{fp}/attn/{proj}/bias"] = ("bias", f"{tp}.attn.{proj}")
        m[f"{fp}/attn/fsmn_kernel"] = ("dwconv_w", f"{tp}.attn.fsmn_block")
        for ln in ("attn_ln", "mlp_ln"):
            m[f"{fp}/{ln}/scale"] = ("w", f"{tp}.{ln}")
            m[f"{fp}/{ln}/bias"] = ("b", f"{tp}.{ln}")
        m[f"{fp}/mlp_0/kernel"] = ("dense_w", f"{tp}.mlp.0")
        m[f"{fp}/mlp_0/bias"] = ("bias", f"{tp}.mlp.0")
        m[f"{fp}/mlp_2/kernel"] = ("dense_w", f"{tp}.mlp.2")
        m[f"{fp}/mlp_2/bias"] = ("bias", f"{tp}.mlp.2")
    m["encoder/ln_post/scale"] = ("w", f"{p}encoder.ln_post")
    m["encoder/ln_post/bias"] = ("b", f"{p}encoder.ln_post")
    m["project_down/kernel"] = ("dense_w", f"{p}{fsq_prefix}.project_down")
    m["project_down/bias"] = ("bias", f"{p}{fsq_prefix}.project_down")
    return m


def convert_s3tokenizer(state_dict: dict, template: dict,
                        strict: bool = True, prefix: str = "") -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # the FSQ projection has appeared under a few module spellings
    fsq = "quantizer.vq"
    for cand in ("quantizer.vq", "quantizer._codebook", "quantizer"):
        if f"{prefix}{cand}.project_down.weight" in sd:
            fsq = cand
            break
    return fill_tree(template, s3tokenizer_mapping(template, prefix, fsq),
                     sd, strict)


# ---------------------------------------------------------------- YuE assembly

def load_hf_dir_weights(d: str) -> dict:
    """Merge an HF checkpoint directory's weights (single model.safetensors
    / pytorch_model.bin, or sharded via model.safetensors.index.json) into
    one numpy state dict."""
    import glob
    import json
    import os

    idx = os.path.join(d, "model.safetensors.index.json")
    paths: list[str]
    if os.path.exists(idx):
        with open(idx) as f:
            paths = sorted({os.path.join(d, v)
                            for v in json.load(f)["weight_map"].values()})
    else:
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                paths = [p]
                break
        else:
            paths = sorted(glob.glob(os.path.join(d, "*.safetensors")))
            if not paths:
                raise FileNotFoundError(f"no weights in {d}")
    sd: dict = {}
    for p in paths:
        part = torch_load_weights(p)
        sd.update({k: (v.float().numpy() if hasattr(v, "float")
                       else np.asarray(v)) for k, v in part.items()})
    return sd


def lm_config_from_hf_dir(d: str, **overrides):
    """LLaMA-family config.json -> models/lm.LMConfig."""
    import json
    import os

    from audiolab_tpu.models.lm import LMConfig

    with open(os.path.join(d, "config.json")) as f:
        c = json.load(f)
    heads = c["num_attention_heads"]
    kw = dict(
        vocab_size=c["vocab_size"], dim=c["hidden_size"],
        n_layers=c["num_hidden_layers"], n_heads=heads,
        n_kv_heads=c.get("num_key_value_heads", heads),
        ffn_dim=c["intermediate_size"],
        rope_theta=float(c.get("rope_theta", 10000.0)),
        norm_eps=float(c.get("rms_norm_eps", 1e-5)),
        max_seq_len=int(c.get("max_position_embeddings", 4096)),
        tie_embeddings=bool(c.get("tie_word_embeddings", False)),
    )
    kw.update(overrides)
    return LMConfig(**kw)


def load_yue_pipeline(stage1_dir: str, stage2_dir: str, xcodec_path: str,
                      tokenizer_model: str | None = None,
                      xcodec_cfg=None, vocab=None):
    """One-call assembly of the REAL YuE stack: stage-1 + stage-2 HF LLaMA
    checkpoint dirs (the reference loads them with AutoModelForCausalLM,
    modules/yue/inference/infer.py:245), the xcodec_mini_infer final.pth,
    and the mm tokenizer.model (_MMSentencePieceTokenizer,
    mmtokenizer.py:238).  Returns models/yue.YuEPipeline with the
    checkpoint-faithful xcodec decode path wired."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.codecs import (
        CodecConfig,
        SoundStreamCodec,
        XCodecConfig,
        XCodecDecoder,
    )
    from audiolab_tpu.models.lm import TransformerLM
    from audiolab_tpu.models.mm_vocab import MMTokenizer
    from audiolab_tpu.models.yue import YuEConfig, YuEPipeline, YuEVocab

    def load_stage(d):
        cfg = lm_config_from_hf_dir(d)
        model = TransformerLM(cfg)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 4), jnp.int32)))["params"]
        return cfg, convert_llama(load_hf_dir_weights(d), template)

    s1_cfg, s1p = load_stage(stage1_dir)
    s2_cfg, s2p = load_stage(stage2_dir)

    vocab = vocab or YuEVocab()
    if s1_cfg.vocab_size != vocab.size:
        logger.warning(
            "stage-1 vocab %d != mm-v0.2 layout %d; codec id offsets may "
            "not line up", s1_cfg.vocab_size, vocab.size)

    xcfg = xcodec_cfg or XCodecConfig()
    xdec = XCodecDecoder(xcfg)
    xp = load_xcodec_checkpoint(xcodec_path, xcfg)
    tok = (MMTokenizer(model_file=tokenizer_model)
           if tokenizer_model else None)
    cfg = YuEConfig(vocab=vocab, stage1=s1_cfg, stage2=s2_cfg)
    # the SoundStreamCodec instance only supplies frame-rate metadata on
    # the xcodec decode path; its params are never touched there
    codec = SoundStreamCodec(CodecConfig())
    return YuEPipeline(cfg, s1p, s2p, codec, None,
                       xcodec=xdec, xcodec_params=xp, tokenizer=tok)
