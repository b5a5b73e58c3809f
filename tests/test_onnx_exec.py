"""ONNX parser/executor parity vs torch ops (the onnxruntime replacement
for MDX-NET members and rmvpe_onnx — stem_separator.py:110-123).

The graphs are serialized with utils/onnx.build_model (the onnx package
is absent, so the wire format is produced and consumed in-repo; field
numbers follow the public onnx.proto spec) and the numerical oracle is
torch: every op's output is compared against the equivalent torch module
run on the same weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.utils.onnx import (  # noqa: E402
    OnnxNode,
    OnnxRunner,
    build_model,
    parse_model,
)


def run_graph(nodes, inits, inputs, outputs, feeds):
    data = build_model(nodes, inits, list(feeds), outputs)
    g = parse_model(data)
    return [np.asarray(r) for r in OnnxRunner(g)(**{
        k: jnp.asarray(v) for k, v in feeds.items()})]


def test_conv_bn_relu_parity():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    bn = torch.nn.BatchNorm2d(8).eval()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    x = torch.randn(1, 3, 12, 10)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).numpy()

    nodes = [
        OnnxNode("Conv", ["x", "w", "b"], ["c"],
                 {"strides": [2, 2], "pads": [1, 1, 1, 1],
                  "kernel_shape": [3, 3]}),
        OnnxNode("BatchNormalization", ["c", "g", "be", "m", "v"], ["n"],
                 {"epsilon": 1e-5}),
        OnnxNode("Relu", ["n"], ["y"], {}),
    ]
    inits = {"w": conv.weight.detach().numpy(),
             "b": conv.bias.detach().numpy(),
             "g": bn.weight.detach().numpy(),
             "be": bn.bias.detach().numpy(),
             "m": bn.running_mean.numpy(),
             "v": bn.running_var.numpy()}
    (out,) = run_graph(nodes, inits, ["x"], ["y"], {"x": x.numpy()})
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_conv_transpose_parity():
    torch.manual_seed(1)
    ct = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1,
                                  output_padding=0)
    x = torch.randn(2, 6, 7, 9)
    with torch.no_grad():
        ref = ct(x).numpy()
    nodes = [OnnxNode("ConvTranspose", ["x", "w", "b"], ["y"],
                      {"strides": [2, 2], "pads": [1, 1, 1, 1]})]
    inits = {"w": ct.weight.detach().numpy(),
             "b": ct.bias.detach().numpy()}
    (out,) = run_graph(nodes, inits, ["x"], ["y"], {"x": x.numpy()})
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_mini_tfc_tdf_unet_parity():
    """A miniature MDX-style net exercising the op mix of the real ONNX
    graphs: conv stem, TDF linear bottleneck through Shape->Reshape
    plumbing (constant-folded), skip concat, transposed-conv upsample,
    slice + pad, matmul."""
    torch.manual_seed(2)

    class Mini(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = torch.nn.Conv2d(4, 8, 1)
            self.tfc = torch.nn.Conv2d(8, 8, 3, padding=1)
            self.tdf1 = torch.nn.Linear(16, 4)
            self.tdf2 = torch.nn.Linear(4, 16)
            self.down = torch.nn.Conv2d(8, 16, 2, stride=2)
            self.up = torch.nn.ConvTranspose2d(16, 8, 2, stride=2)
            self.head = torch.nn.Conv2d(16, 4, 1)

        def forward(self, x):
            h = torch.relu(self.stem(x))
            t = torch.relu(self.tfc(h))
            d = self.tdf2(torch.relu(self.tdf1(t)))  # Linear over last axis
            h = h + d
            dn = torch.relu(self.down(h))
            u = self.up(dn)
            cat = torch.cat([h, u], dim=1)
            return self.head(cat)

    m = Mini().eval()
    x = torch.randn(1, 4, 8, 16)
    with torch.no_grad():
        ref = m(x).numpy()

    nodes = [
        OnnxNode("Conv", ["x", "w0", "b0"], ["s"], {}),
        OnnxNode("Relu", ["s"], ["h"], {}),
        OnnxNode("Conv", ["h", "w1", "b1"], ["t0"],
                 {"pads": [1, 1, 1, 1]}),
        OnnxNode("Relu", ["t0"], ["t"], {}),
        # Linear over last axis == MatMul with transposed weight + Add
        OnnxNode("MatMul", ["t", "w2t"], ["d0"], {}),
        OnnxNode("Add", ["d0", "b2"], ["d1"], {}),
        OnnxNode("Relu", ["d1"], ["d2"], {}),
        OnnxNode("MatMul", ["d2", "w3t"], ["d3"], {}),
        OnnxNode("Add", ["d3", "b3"], ["d4"], {}),
        OnnxNode("Add", ["h", "d4"], ["hs"], {}),
        OnnxNode("Conv", ["hs", "w4", "b4"], ["dn0"], {"strides": [2, 2]}),
        OnnxNode("Relu", ["dn0"], ["dn"], {}),
        OnnxNode("ConvTranspose", ["dn", "w5", "b5"], ["u"],
                 {"strides": [2, 2]}),
        OnnxNode("Concat", ["hs", "u"], ["cat"], {"axis": 1}),
        OnnxNode("Conv", ["cat", "w6", "b6"], ["y"], {}),
    ]
    p = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    inits = {"w0": p["stem.weight"], "b0": p["stem.bias"],
             "w1": p["tfc.weight"], "b1": p["tfc.bias"],
             "w2t": p["tdf1.weight"].T.copy(), "b2": p["tdf1.bias"],
             "w3t": p["tdf2.weight"].T.copy(), "b3": p["tdf2.bias"],
             "w4": p["down.weight"], "b4": p["down.bias"],
             "w5": p["up.weight"], "b5": p["up.bias"],
             "w6": p["head.weight"], "b6": p["head.bias"]}
    (out,) = run_graph(nodes, inits, ["x"], ["y"], {"x": x.numpy()})
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_static_shape_folding_and_misc_ops():
    """Shape->Gather->Concat->Reshape chains fold to constants; Slice,
    Pad, pooling, Sigmoid match torch."""
    torch.manual_seed(3)
    x = torch.randn(2, 6, 8, 8)
    with torch.no_grad():
        ref = torch.sigmoid(
            torch.nn.functional.avg_pool2d(x, 2))[:, :3].numpy()
        ref = np.pad(ref, ((0, 0), (0, 0), (1, 1), (0, 0)))

    nodes = [
        OnnxNode("Shape", ["x"], ["shp"], {}),
        OnnxNode("Gather", ["shp", "i0"], ["b_dim"], {"axis": 0}),
        OnnxNode("AveragePool", ["x"], ["p"],
                 {"kernel_shape": [2, 2], "strides": [2, 2]}),
        OnnxNode("Sigmoid", ["p"], ["sg"], {}),
        OnnxNode("Slice", ["sg", "st", "en", "ax"], ["sl"], {}),
        OnnxNode("Pad", ["sl", "pads"], ["y"], {"mode": "constant"}),
    ]
    inits = {"i0": np.asarray(0, np.int64),
             "st": np.asarray([0], np.int64),
             "en": np.asarray([3], np.int64),
             "ax": np.asarray([1], np.int64),
             "pads": np.asarray([0, 0, 1, 0, 0, 0, 1, 0], np.int64)}
    (out,) = run_graph(nodes, inits, ["x"], ["y"], {"x": x.numpy()})
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_mdx_onnx_separator_framing():
    """MDXOnnxSeparator with an Identity graph and dim_f == all bins must
    reconstruct the mix (COLA istft(stft(x))) — validates the
    ConvTDFNetTrim channel packing (mdxnet.py:40-76) end-to-end — and the
    complement stem must satisfy mix = target + complement."""
    from audiolab_tpu.models.separation.mdx import MDXOnnxSeparator
    from audiolab_tpu.utils.onnx import build_model, parse_model

    n_fft, hop, dim_t = 128, 32, 16
    dim_f = n_fft // 2 + 1
    data = build_model([OnnxNode("Identity", ["input"], ["output"], {})],
                       {}, ["input"], ["output"])
    sep = MDXOnnxSeparator(parse_model(data), dim_f=dim_f, dim_t=dim_t,
                           n_fft=n_fft, hop=hop)
    rng = np.random.default_rng(0)
    n = sep.chunk * 2 + 100  # forces padding + multi-chunk batching
    audio = jnp.asarray(rng.standard_normal((1, 2, n)) * 0.3, jnp.float32)
    out = sep(audio)
    assert set(out) == {"vocals", "instrumental"}
    v = np.asarray(out["vocals"])
    assert v.shape == (1, 2, n)
    # identity spec + demix_base trim-margin windowing => COLA
    # reconstruction everywhere except the outermost trim samples —
    # including ACROSS window seams (each kept sample sits in its
    # window's untapered middle, mdxnet.py:152-179)
    trim = n_fft // 2
    np.testing.assert_allclose(v[..., trim:-trim],
                               np.asarray(audio)[..., trim:-trim],
                               atol=1e-3)
    np.testing.assert_allclose(
        v + np.asarray(out["instrumental"]), np.asarray(audio), atol=1e-5)


def test_mdx_onnx_separator_with_conv_graph():
    """A conv-mask onnx graph runs through the member contract."""
    from audiolab_tpu.models.separation.mdx import MDXOnnxSeparator

    torch.manual_seed(5)
    conv = torch.nn.Conv2d(4, 4, 3, padding=1)
    nodes = [
        OnnxNode("Conv", ["input", "w", "b"], ["s"],
                 {"pads": [1, 1, 1, 1]}),
        OnnxNode("Sigmoid", ["s"], ["m"], {}),
        OnnxNode("Mul", ["m", "input"], ["output"], {}),
    ]
    inits = {"w": conv.weight.detach().numpy(),
             "b": conv.bias.detach().numpy()}
    data = build_model(nodes, inits, ["input"], ["output"])
    sep = MDXOnnxSeparator(parse_model(data), dim_f=32, dim_t=16,
                           n_fft=128, hop=32)
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 2, sep.chunk)) * 0.2,
        jnp.float32)
    out = sep(audio)
    assert np.isfinite(out["vocals"]).all()
    assert out["vocals"].shape == (1, 2, sep.chunk)
