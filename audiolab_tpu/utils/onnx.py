"""Pure-Python ONNX import + JAX execution (no onnxruntime, no onnx pkg).

The reference runs its MDX-NET separation members and the rmvpe_onnx f0
model through onnxruntime-gpu (modules/separator/stem_separator.py:110-123,
modules/rvc/pitch_extraction.py) — there is no ORT on TPU, so this module
(1) parses the ONNX protobuf wire format directly (field numbers from the
public onnx.proto spec) and (2) executes the graph as jittable JAX ops.

Scope: the static-shape conv/matmul op set used by audio U-Nets.  Shape-
only subgraphs (Shape -> Gather -> Concat -> Reshape chains that torch
exporters emit) are constant-folded at build time, so the jitted function
contains only tensor math.  Unknown ops raise loudly.

A writer (``build_model``) serializes the same subset so parity tests can
round-trip a hand-built graph without the onnx package.

TPU notes: convs run NCHW->NHWC transposed at the boundary of each op via
lax.conv_general_dilated dimension_numbers instead, so XLA lays them on
the MXU without explicit transposes.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# ------------------------------------------------------------- wire format

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


# onnx TensorProto.DataType
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = 1
    raw = None
    floats: list[float] = []
    i32: list[int] = []
    i64: list[int] = []
    name = ""
    for fno, wt, v in _fields(buf):
        if fno == 1:
            dims.append(v)
        elif fno == 2:
            dtype = v
        elif fno == 4:
            if wt == 2:  # packed
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                floats.append(struct.unpack("<f", v)[0])
        elif fno == 5:
            if wt == 2:
                j = 0
                while j < len(v):
                    x, j = _read_varint(v, j)
                    i32.append(x)
            else:
                i32.append(v)
        elif fno == 7:
            if wt == 2:
                j = 0
                while j < len(v):
                    x, j = _read_varint(v, j)
                    i64.append(x)
            else:
                i64.append(v)
        elif fno == 8:
            name = v.decode("utf-8")
        elif fno == 9:
            raw = v
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif floats:
        arr = np.asarray(floats, np_dtype)
    elif i64:
        arr = np.asarray(i64, np_dtype)
    elif i32:
        arr = np.asarray(i32, np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def _parse_attr(buf: bytes) -> tuple[str, object]:
    name = ""
    out: object = None
    ints: list[int] = []
    floats: list[float] = []
    strings: list[bytes] = []
    for fno, wt, v in _fields(buf):
        if fno == 1:
            name = v.decode("utf-8")
        elif fno == 2:
            out = struct.unpack("<f", v)[0]
        elif fno == 3:
            out = v - (1 << 64) if v >= (1 << 63) else v
        elif fno == 4:
            out = v.decode("utf-8")
        elif fno == 5:
            out = _parse_tensor(v)[1]
        elif fno == 7:
            if wt == 2:
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                floats.append(struct.unpack("<f", v)[0])
        elif fno == 8:
            if wt == 2:
                j = 0
                while j < len(v):
                    x, j = _read_varint(v, j)
                    ints.append(x - (1 << 64) if x >= (1 << 63) else x)
            else:
                ints.append(v - (1 << 64) if v >= (1 << 63) else v)
        elif fno == 9:
            strings.append(v)
    if ints:
        out = ints
    elif floats and out is None:
        out = floats
    elif strings:
        out = [s.decode("utf-8") for s in strings]
    return name, out


@dataclass
class OnnxNode:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict


@dataclass
class OnnxGraph:
    nodes: list[OnnxNode] = field(default_factory=list)
    initializers: dict = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)


def _parse_node(buf: bytes) -> OnnxNode:
    node = OnnxNode("", [], [], {})
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            node.inputs.append(v.decode("utf-8"))
        elif fno == 2:
            node.outputs.append(v.decode("utf-8"))
        elif fno == 4:
            node.op_type = v.decode("utf-8")
        elif fno == 5:
            k, a = _parse_attr(v)
            node.attrs[k] = a
    return node


def _parse_graph(buf: bytes) -> OnnxGraph:
    g = OnnxGraph()
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            g.nodes.append(_parse_node(v))
        elif fno == 5:
            name, arr = _parse_tensor(v)
            g.initializers[name] = arr
        elif fno == 11:
            g.inputs.append(_vi_name(v))
        elif fno == 12:
            g.outputs.append(_vi_name(v))
    return g


def _vi_name(buf: bytes) -> str:
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            return v.decode("utf-8")
    return ""


def parse_model(data: bytes) -> OnnxGraph:
    for fno, _wt, v in _fields(data):
        if fno == 7:
            return _parse_graph(v)
    raise ValueError("no graph in ONNX model")


def load_onnx(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        return parse_model(f.read())


# --------------------------------------------------------------- writer

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _f_len(fno: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | 2) + _varint(len(payload)) + payload


def _f_int(fno: int, v: int) -> bytes:
    return _varint(fno << 3) + _varint(v & ((1 << 64) - 1))


def _ser_tensor(name: str, arr: np.ndarray) -> bytes:
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.float64): 11, np.dtype(np.int32): 6}[arr.dtype]
    out = b"".join(_f_int(1, d) for d in arr.shape)
    out += _f_int(2, dt)
    out += _f_len(8, name.encode())
    out += _f_len(9, np.ascontiguousarray(arr).tobytes())
    return out


def _ser_attr(name: str, val) -> bytes:
    out = _f_len(1, name.encode())
    if isinstance(val, (list, tuple)) and all(
            isinstance(x, (int, np.integer)) for x in val):
        for x in val:
            out += _f_int(8, int(x))
        out += _f_int(20, 7)
    elif isinstance(val, (int, np.integer)):
        out += _f_int(3, int(val))
        out += _f_int(20, 2)
    elif isinstance(val, float):
        out += _varint((2 << 3) | 5) + struct.pack("<f", val)
        out += _f_int(20, 1)
    elif isinstance(val, str):
        out += _f_len(4, val.encode())
        out += _f_int(20, 3)
    elif isinstance(val, np.ndarray):
        out += _f_len(5, _ser_tensor("", val))
        out += _f_int(20, 4)
    else:  # pragma: no cover
        raise ValueError(type(val))
    return out


def _ser_vi(name: str) -> bytes:
    return _f_len(1, name.encode())


def build_model(nodes: list[OnnxNode], initializers: dict,
                inputs: list[str], outputs: list[str]) -> bytes:
    g = b""
    for n in nodes:
        nb = b"".join(_f_len(1, s.encode()) for s in n.inputs)
        nb += b"".join(_f_len(2, s.encode()) for s in n.outputs)
        nb += _f_len(4, n.op_type.encode())
        nb += b"".join(_f_len(5, _ser_attr(k, v))
                       for k, v in n.attrs.items())
        g += _f_len(1, nb)
    for name, arr in initializers.items():
        g += _f_len(5, _ser_tensor(name, np.asarray(arr)))
    g += b"".join(_f_len(11, _ser_vi(s)) for s in inputs)
    g += b"".join(_f_len(12, _ser_vi(s)) for s in outputs)
    m = _f_int(1, 8)                       # ir_version
    m += _f_len(8, _f_int(2, 17))          # opset 17
    m += _f_len(7, g)
    return m


# -------------------------------------------------------------- executor

def _pair(v, n=2):
    if v is None:
        return (0,) * n
    return tuple(int(x) for x in v)


class OnnxRunner:
    """Execute a parsed graph with JAX ops; call inside jax.jit.

    Static (shape-only / initializer-only) values are folded with numpy at
    trace time, so Shape/Gather/Concat/Reshape plumbing disappears from
    the compiled graph."""

    def __init__(self, graph: OnnxGraph):
        self.g = graph

    def __call__(self, **inputs):
        import jax.numpy as jnp
        from jax import lax

        env: dict[str, object] = {}
        static: set[str] = set()
        for k, v in self.g.initializers.items():
            env[k] = v
            static.add(k)
        for k, v in inputs.items():
            env[k] = v

        def is_static(*names):
            return all((n == "" or n in static) for n in names)

        def S(name):  # static numpy value
            return np.asarray(env[name])

        for node in self.g.nodes:
            op, a = node.op_type, node.attrs
            ins = node.inputs
            out = node.outputs[0]
            x = env[ins[0]] if ins and ins[0] else None

            if op == "Constant":
                env[out] = np.asarray(a.get("value"))
                static.add(out)
                continue
            if op == "Shape" or (op in _STATIC_OPS and is_static(*ins)):
                env[out] = _static_eval(op, node, env)
                static.add(out)
                continue

            if op == "Conv":
                w = np.asarray(env[ins[1]])
                b = np.asarray(env[ins[2]]) if len(ins) > 2 and ins[2] else None
                nd = w.ndim - 2
                pads = _pair(a.get("pads"), 2 * nd)
                y = lax.conv_general_dilated(
                    jnp.asarray(x), jnp.asarray(w),
                    window_strides=_pair(a.get("strides", (1,) * nd), nd),
                    padding=list(zip(pads[:nd], pads[nd:])),
                    rhs_dilation=_pair(a.get("dilations", (1,) * nd), nd),
                    feature_group_count=int(a.get("group", 1)),
                    dimension_numbers=_dims(nd))
                if b is not None:
                    y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
                env[out] = y
            elif op == "ConvTranspose":
                w = np.asarray(env[ins[1]])   # (in, out/g, kh, kw)
                b = np.asarray(env[ins[2]]) if len(ins) > 2 and ins[2] else None
                nd = w.ndim - 2
                strides = _pair(a.get("strides", (1,) * nd), nd)
                pads = _pair(a.get("pads"), 2 * nd)
                opad = _pair(a.get("output_padding", (0,) * nd), nd)
                g = int(a.get("group", 1))
                if g != 1:
                    raise NotImplementedError("grouped ConvTranspose")
                k = w.shape[2:]
                # torch-semantics transposed conv: lhs-dilated conv with
                # flipped kernel (validated vs torch in the parity tests)
                wt = np.flip(w, axis=tuple(range(2, 2 + nd)))
                wt = np.swapaxes(wt, 0, 1)
                pad = [(k[i] - 1 - pads[i],
                        k[i] - 1 - pads[nd + i] + opad[i]) for i in range(nd)]
                y = lax.conv_general_dilated(
                    jnp.asarray(x), jnp.asarray(wt),
                    window_strides=(1,) * nd, padding=pad,
                    lhs_dilation=strides, dimension_numbers=_dims(nd))
                if b is not None:
                    y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
                env[out] = y
            elif op == "BatchNormalization":
                sc, bi, mean, var = (np.asarray(env[n]) for n in ins[1:5])
                eps = float(a.get("epsilon", 1e-5))
                nd = jnp.ndim(x) - 2
                shape = (1, -1) + (1,) * nd
                env[out] = (jnp.asarray(x) - mean.reshape(shape)) * (
                    sc.reshape(shape) / np.sqrt(var.reshape(shape) + eps)
                ) + bi.reshape(shape)
            elif op == "InstanceNormalization":
                sc, bi = (np.asarray(env[n]) for n in ins[1:3])
                eps = float(a.get("epsilon", 1e-5))
                nd = jnp.ndim(x) - 2
                ax = tuple(range(2, 2 + nd))
                mu = jnp.mean(x, axis=ax, keepdims=True)
                var = jnp.var(x, axis=ax, keepdims=True)
                shape = (1, -1) + (1,) * nd
                env[out] = (x - mu) / jnp.sqrt(var + eps) * sc.reshape(shape) \
                    + bi.reshape(shape)
            elif op == "Relu":
                env[out] = jnp.maximum(x, 0)
            elif op == "LeakyRelu":
                al = float(a.get("alpha", 0.01))
                env[out] = jnp.where(jnp.asarray(x) > 0, x,
                                     al * jnp.asarray(x))
            elif op == "Elu":
                al = float(a.get("alpha", 1.0))
                env[out] = jnp.where(jnp.asarray(x) > 0, x,
                                     al * (jnp.exp(jnp.asarray(x)) - 1))
            elif op == "Sigmoid":
                env[out] = 1.0 / (1.0 + jnp.exp(-jnp.asarray(x)))
            elif op == "Tanh":
                env[out] = jnp.tanh(x)
            elif op in ("Add", "Sub", "Mul", "Div"):
                y = env[ins[1]]
                fn = {"Add": jnp.add, "Sub": jnp.subtract,
                      "Mul": jnp.multiply, "Div": jnp.divide}[op]
                env[out] = fn(jnp.asarray(x), jnp.asarray(y))
            elif op == "Concat":
                env[out] = jnp.concatenate(
                    [jnp.asarray(env[n]) for n in ins],
                    axis=int(a["axis"]))
            elif op == "MatMul":
                env[out] = jnp.matmul(jnp.asarray(x),
                                      jnp.asarray(env[ins[1]]))
            elif op == "Gemm":
                y = jnp.asarray(env[ins[1]])
                if int(a.get("transA", 0)):
                    x = jnp.swapaxes(jnp.asarray(x), -1, -2)
                if int(a.get("transB", 0)):
                    y = jnp.swapaxes(y, -1, -2)
                r = float(a.get("alpha", 1.0)) * jnp.matmul(jnp.asarray(x), y)
                if len(ins) > 2 and ins[2]:
                    r = r + float(a.get("beta", 1.0)) * jnp.asarray(env[ins[2]])
                env[out] = r
            elif op == "Reshape":
                shape = [int(v) for v in S(ins[1])]
                env[out] = jnp.reshape(jnp.asarray(x), _resolve_shape(
                    shape, jnp.shape(x)))
            elif op == "Transpose":
                env[out] = jnp.transpose(jnp.asarray(x), a.get("perm"))
            elif op == "Unsqueeze":
                axes = a.get("axes") or [int(v) for v in S(ins[1])]
                y = jnp.asarray(x)
                for ax in sorted(int(v) for v in axes):
                    y = jnp.expand_dims(y, ax)
                env[out] = y
            elif op == "Squeeze":
                axes = a.get("axes") or (
                    [int(v) for v in S(ins[1])] if len(ins) > 1 else None)
                env[out] = jnp.squeeze(jnp.asarray(x),
                                       tuple(axes) if axes else None)
            elif op == "Slice":
                env[out] = _slice(jnp, x, node, S, a)
            elif op == "Pad":
                if len(ins) > 1 and ins[1]:
                    pads = [int(v) for v in S(ins[1])]
                else:
                    pads = [int(v) for v in a["pads"]]
                nd = jnp.ndim(x)
                cfg = list(zip(pads[:nd], pads[nd:]))
                mode = a.get("mode", "constant")
                env[out] = jnp.pad(jnp.asarray(x), cfg,
                                   mode={"constant": "constant",
                                         "reflect": "reflect",
                                         "edge": "edge"}[mode])
            elif op in ("AveragePool", "MaxPool"):
                nd = len(a["kernel_shape"])
                k = _pair(a["kernel_shape"], nd)
                s = _pair(a.get("strides", k), nd)
                pads = _pair(a.get("pads"), 2 * nd)
                pad = list(zip(pads[:nd], pads[nd:]))
                full_k = (1, 1) + k
                full_s = (1, 1) + s
                full_p = [(0, 0), (0, 0)] + pad
                if op == "MaxPool":
                    env[out] = lax.reduce_window(
                        jnp.asarray(x), -jnp.inf, lax.max, full_k, full_s,
                        full_p)
                else:
                    sums = lax.reduce_window(
                        jnp.asarray(x), 0.0, lax.add, full_k, full_s, full_p)
                    env[out] = sums / float(np.prod(k))
            elif op == "GlobalAveragePool":
                nd = jnp.ndim(x) - 2
                env[out] = jnp.mean(x, axis=tuple(range(2, 2 + nd)),
                                    keepdims=True)
            elif op == "Softmax":
                import jax.nn as jnn
                env[out] = jnn.softmax(jnp.asarray(x),
                                       axis=int(a.get("axis", -1)))
            elif op == "Cast":
                env[out] = jnp.asarray(x).astype(
                    _DTYPES.get(int(a["to"]), np.float32))
            elif op == "Identity":
                env[out] = x
            elif op == "Clip":
                lo = env[ins[1]] if len(ins) > 1 and ins[1] else None
                hi = env[ins[2]] if len(ins) > 2 and ins[2] else None
                env[out] = jnp.clip(jnp.asarray(x),
                                    None if lo is None else np.asarray(lo),
                                    None if hi is None else np.asarray(hi))
            else:
                raise NotImplementedError(f"ONNX op {op}")

        return [env[n] for n in self.g.outputs]


_STATIC_OPS = {"Gather", "Concat", "Unsqueeze", "Squeeze", "Cast", "Slice",
               "Add", "Sub", "Mul", "Div", "Reshape", "Transpose"}


def _static_eval(op: str, node: OnnxNode, env: dict):
    a = node.attrs
    ins = node.inputs
    if op == "Shape":
        import jax.numpy as jnp

        return np.asarray(jnp.shape(env[ins[0]]), np.int64)
    vals = [np.asarray(env[n]) for n in ins if n]
    if op == "Gather":
        return np.take(vals[0], vals[1], axis=int(a.get("axis", 0)))
    if op == "Concat":
        return np.concatenate([np.atleast_1d(v) for v in vals],
                              axis=int(a.get("axis", 0)))
    if op == "Unsqueeze":
        axes = a.get("axes") or [int(v) for v in vals[1]]
        y = vals[0]
        for ax in sorted(int(v) for v in axes):
            y = np.expand_dims(y, ax)
        return y
    if op == "Squeeze":
        axes = a.get("axes") or ([int(v) for v in vals[1]]
                                 if len(vals) > 1 else None)
        return np.squeeze(vals[0], tuple(axes) if axes else None)
    if op == "Cast":
        return vals[0].astype(_DTYPES.get(int(a["to"]), np.float32))
    if op == "Reshape":
        return vals[0].reshape(_resolve_shape([int(v) for v in vals[1]],
                                              vals[0].shape))
    if op == "Transpose":
        return np.transpose(vals[0], a.get("perm"))
    if op in ("Add", "Sub", "Mul", "Div"):
        f = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
             "Div": np.divide}[op]
        return f(vals[0], vals[1])
    if op == "Slice":
        return np.asarray(_slice(np, vals[0], node,
                                 lambda n: np.asarray(env[n]), a))
    raise NotImplementedError(op)  # pragma: no cover


def _resolve_shape(shape: list[int], in_shape) -> list[int]:
    out = list(shape)
    for i, v in enumerate(out):
        if v == 0:
            out[i] = in_shape[i]
    return out


def _slice(xp, x, node: OnnxNode, S, a: dict):
    ins = node.inputs
    if len(ins) > 1:  # opset >= 10: starts/ends/axes/steps are inputs
        starts = [int(v) for v in S(ins[1])]
        ends = [int(v) for v in S(ins[2])]
        axes = ([int(v) for v in S(ins[3])] if len(ins) > 3 and ins[3]
                else list(range(len(starts))))
        steps = ([int(v) for v in S(ins[4])] if len(ins) > 4 and ins[4]
                 else [1] * len(starts))
    else:
        starts = [int(v) for v in a["starts"]]
        ends = [int(v) for v in a["ends"]]
        axes = [int(v) for v in a.get("axes", range(len(starts)))]
        steps = [1] * len(starts)
    nd = len(x.shape)
    sl = [slice(None)] * nd
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        if ax < 0:
            ax += nd
        en = min(en, x.shape[ax]) if en >= 0 else en
        sl[ax] = slice(st, en, sp)
    return x[tuple(sl)]


def _dims(nd: int):
    if nd == 1:
        return ("NCH", "OIH", "NCH")
    if nd == 2:
        return ("NCHW", "OIHW", "NCHW")
    raise NotImplementedError(f"{nd}-d conv")
