"""JAX executor for ONNX graphs — the framework's onnxruntime replacement.

The reference runs `.onnx` voice models, F0 predictors, embedders, and the
whole MDX separation family through onnxruntime (convert.py:545-552,
mdx_separator.py:251-273, library/utils.py:131-170).  onnxruntime does not
exist in this image (and would not target TPU anyway), so ONNX graphs are
interpreted into jax.numpy/lax ops and jit-compiled: the whole graph becomes
one XLA program running on the TPU.

Usage:
    g = OnnxGraph("model.onnx")
    outs = g.run({"input": x})      # eager
    fn = g.jit()                    # compiled: fn(x, ...) -> (out, ...)

Semantics: shape-carrying values (Shape results and arithmetic on them)
stay concrete NumPy so data-dependent-looking reshapes trace statically
under jit — ONNX "dynamic" shapes become static per input signature,
which is exactly the XLA model (one compile per bucketed shape).

Supported op set: the union of what RVC SynthesizerONNX exports, MDX-Net
separation models, CREPE/RMVPE/FCPE onnx predictors, and fairseq/transformers
HuBERT exports use.  Unknown ops raise with the op name.
"""

from __future__ import annotations



import numpy as np

import jax
import jax.numpy as jnp

from . import onnx_proto as op


# ---------------------------------------------------------------------------
# attribute decoding
# ---------------------------------------------------------------------------

def _attr_value(a: op.AttributeProto):
    t = a.type
    # proto3 omits default-valued scalars on the wire, so typed attributes
    # may decode with the payload field still None — fall back to the default
    if t == op.ATTR_FLOAT or (t is None and a.f is not None):
        return 0.0 if a.f is None else a.f
    if t == op.ATTR_INT or (t is None and a.i is not None):
        return 0 if a.i is None else a.i
    if t == op.ATTR_STRING or (t is None and a.s is not None):
        return (a.s or b"").decode("utf-8")
    if t == op.ATTR_TENSOR or (t is None and a.t is not None):
        return op.array_from_tensor(a.t)
    if t == op.ATTR_FLOATS or (t is None and a.floats):
        return list(a.floats)
    if t == op.ATTR_INTS or (t is None and a.ints):
        return list(a.ints)
    if t == op.ATTR_STRINGS or (t is None and a.strings):
        return [s.decode("utf-8") for s in a.strings]
    if t == op.ATTR_GRAPH:
        return a.g
    raise ValueError(f"unsupported attribute {a.name} type={t}")


def _attrs(node: op.NodeProto) -> dict:
    return {a.name: _attr_value(a) for a in node.attribute}


def _is_np(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _xp(*vals):
    """numpy for all-concrete operands (constant/shape folding), else jnp."""
    return np if all(v is None or _is_np(v) for v in vals) else jnp


_ONNX_TO_NP_DT = {k: np.dtype(v) for k, v in op._ONNX_TO_NP.items()}


# ---------------------------------------------------------------------------
# op registry
# ---------------------------------------------------------------------------

_OPS: dict = {}


def _op(name):
    def deco(fn):
        _OPS[name] = fn
        return fn
    return deco


def _unary(name, np_fn, jnp_fn=None):
    jf = jnp_fn or getattr(jnp, np_fn.__name__)

    @_op(name)
    def run(vals, attrs):
        (x,) = vals
        return [np_fn(x) if _is_np(x) else jf(x)]


_unary("Exp", np.exp)
_unary("Log", np.log)
_unary("Sqrt", np.sqrt)
_unary("Neg", np.negative)
_unary("Abs", np.abs, jnp.abs)
_unary("Sin", np.sin)
_unary("Cos", np.cos)
_unary("Tanh", np.tanh)
_unary("Floor", np.floor)
_unary("Ceil", np.ceil)
_unary("Sign", np.sign)
_unary("Reciprocal", np.reciprocal, lambda x: 1.0 / x)
_unary("Not", np.logical_not, jnp.logical_not)
_unary("Round", np.round, jnp.round)
_OPS["Erf"] = lambda vals, attrs: [jax.scipy.special.erf(jnp.asarray(vals[0]))]


def _binary(name, fn):
    @_op(name)
    def run(vals, attrs):
        a, b = vals
        return [fn(_xp(a, b), a, b)]


_binary("Add", lambda xp, a, b: xp.add(a, b))
_binary("Sub", lambda xp, a, b: xp.subtract(a, b))
_binary("Mul", lambda xp, a, b: xp.multiply(a, b))
_binary("Div", lambda xp, a, b: xp.divide(a, b)
        if xp.asarray(a).dtype.kind == "f" or xp.asarray(b).dtype.kind == "f"
        else xp.floor_divide(a, b))
_binary("Pow", lambda xp, a, b: xp.power(a, xp.asarray(b).astype(
    xp.asarray(a).dtype)))
_binary("Equal", lambda xp, a, b: xp.equal(a, b))
_binary("Greater", lambda xp, a, b: xp.greater(a, b))
_binary("GreaterOrEqual", lambda xp, a, b: xp.greater_equal(a, b))
_binary("Less", lambda xp, a, b: xp.less(a, b))
_binary("LessOrEqual", lambda xp, a, b: xp.less_equal(a, b))
_binary("And", lambda xp, a, b: xp.logical_and(a, b))
_binary("Or", lambda xp, a, b: xp.logical_or(a, b))
_binary("PRelu", lambda xp, a, b: xp.where(a >= 0, a, a * b))


@_op("Mod")
def _mod(vals, attrs):
    a, b = vals
    xp = _xp(a, b)
    if attrs.get("fmod", 0):
        return [xp.fmod(a, b)]
    return [xp.mod(a, b)]


@_op("Min")
def _min(vals, attrs):
    out = vals[0]
    for v in vals[1:]:
        out = _xp(out, v).minimum(out, v)
    return [out]


@_op("Max")
def _max(vals, attrs):
    out = vals[0]
    for v in vals[1:]:
        out = _xp(out, v).maximum(out, v)
    return [out]


@_op("Sum")
def _sum(vals, attrs):
    out = vals[0]
    for v in vals[1:]:
        out = out + v
    return [out]


@_op("Relu")
def _relu(vals, attrs):
    (x,) = vals
    return [_xp(x).maximum(x, 0)]


@_op("LeakyRelu")
def _leaky(vals, attrs):
    (x,) = vals
    alpha = attrs.get("alpha", 0.01)
    return [_xp(x).where(x >= 0, x, x * alpha)]


@_op("Elu")
def _elu(vals, attrs):
    (x,) = vals
    alpha = attrs.get("alpha", 1.0)
    xp = _xp(x)
    return [xp.where(x >= 0, x, alpha * (xp.exp(x) - 1.0))]


@_op("Sigmoid")
def _sigmoid(vals, attrs):
    (x,) = vals
    if _is_np(x):
        return [1.0 / (1.0 + np.exp(-x))]
    return [jax.nn.sigmoid(x)]


@_op("HardSigmoid")
def _hard_sigmoid(vals, attrs):
    (x,) = vals
    a, b = attrs.get("alpha", 0.2), attrs.get("beta", 0.5)
    return [_xp(x).clip(a * x + b, 0.0, 1.0)]


@_op("Gelu")
def _gelu(vals, attrs):
    (x,) = vals
    approx = attrs.get("approximate", "none")
    return [jax.nn.gelu(jnp.asarray(x), approximate=(approx == "tanh"))]


@_op("Softplus")
def _softplus(vals, attrs):
    (x,) = vals
    return [jax.nn.softplus(jnp.asarray(x))]


@_op("Softmax")
def _softmax(vals, attrs):
    (x,) = vals
    axis = attrs.get("axis", -1)
    return [jax.nn.softmax(jnp.asarray(x), axis=axis)]


@_op("LogSoftmax")
def _log_softmax(vals, attrs):
    (x,) = vals
    axis = attrs.get("axis", -1)
    return [jax.nn.log_softmax(jnp.asarray(x), axis=axis)]


@_op("Clip")
def _clip(vals, attrs):
    x = vals[0]
    lo = vals[1] if len(vals) > 1 and vals[1] is not None else attrs.get("min")
    hi = vals[2] if len(vals) > 2 and vals[2] is not None else attrs.get("max")
    xp = _xp(x, lo, hi)
    out = x
    if lo is not None:
        out = xp.maximum(out, lo)
    if hi is not None:
        out = xp.minimum(out, hi)
    return [out]


@_op("Cast")
def _cast(vals, attrs):
    (x,) = vals
    dt = _ONNX_TO_NP_DT[attrs["to"]]
    return [np.asarray(x).astype(dt) if _is_np(x)
            else jnp.asarray(x).astype(dt)]


@_op("Identity")
def _identity(vals, attrs):
    return [vals[0]]


@_op("Dropout")
def _dropout(vals, attrs):
    x = vals[0]
    # inference: identity (+ all-true mask if the second output is consumed)
    mask = _xp(x).ones_like(x, dtype=bool)
    return [x, mask]


@_op("Constant")
def _constant(vals, attrs):
    if "value" in attrs:
        return [attrs["value"]]
    for k in ("value_float", "value_int"):
        if k in attrs:
            return [np.asarray(attrs[k])]
    for k in ("value_floats", "value_ints"):
        if k in attrs:
            return [np.asarray(attrs[k])]
    raise ValueError("Constant node with no value")


@_op("ConstantOfShape")
def _constant_of_shape(vals, attrs):
    shape = np.asarray(vals[0]).astype(np.int64)
    value = attrs.get("value", np.zeros(1, np.float32))
    return [np.full(tuple(shape), np.asarray(value).reshape(-1)[0],
                    dtype=np.asarray(value).dtype)]


@_op("Shape")
def _shape(vals, attrs):
    (x,) = vals
    shp = np.asarray(np.shape(x), np.int64)
    start = attrs.get("start", 0)
    end = attrs.get("end")
    return [shp[start:end]]


@_op("Size")
def _size(vals, attrs):
    (x,) = vals
    return [np.asarray(int(np.prod(np.shape(x))), np.int64)]


@_op("Reshape")
def _reshape(vals, attrs):
    x, shape = vals
    shape = [int(s) for s in np.asarray(shape)]
    if attrs.get("allowzero", 0) == 0:
        shape = [np.shape(x)[i] if s == 0 else s for i, s in enumerate(shape)]
    return [_xp(x).reshape(x, shape)]


@_op("Transpose")
def _transpose(vals, attrs):
    (x,) = vals
    perm = attrs.get("perm")
    if perm is None:
        perm = list(range(np.ndim(x)))[::-1]
    return [_xp(x).transpose(x, perm)]


def _axes_arg(vals, attrs, idx=1):
    """Squeeze/Unsqueeze/Reduce axes moved from attribute to input at
    opset 13/18 — accept both."""
    if len(vals) > idx and vals[idx] is not None:
        return [int(a) for a in np.asarray(vals[idx])]
    axes = attrs.get("axes")
    return None if axes is None else [int(a) for a in axes]


@_op("Squeeze")
def _squeeze(vals, attrs):
    x = vals[0]
    axes = _axes_arg(vals, attrs)
    xp = _xp(x)
    if axes is None:
        return [xp.squeeze(x)]
    return [xp.squeeze(x, axis=tuple(a % np.ndim(x) for a in axes))]


@_op("Unsqueeze")
def _unsqueeze(vals, attrs):
    x = vals[0]
    axes = _axes_arg(vals, attrs)
    out_ndim = np.ndim(x) + len(axes)
    axes = sorted(a % out_ndim for a in axes)
    xp = _xp(x)
    for a in axes:
        x = xp.expand_dims(x, a)
    return [x]


@_op("Flatten")
def _flatten(vals, attrs):
    (x,) = vals
    axis = attrs.get("axis", 1) % (np.ndim(x) + 1)
    lead = int(np.prod(np.shape(x)[:axis])) if axis else 1
    return [_xp(x).reshape(x, (lead, -1))]


@_op("Concat")
def _concat(vals, attrs):
    return [_xp(*vals).concatenate(vals, axis=attrs["axis"])]


@_op("Split")
def _split(vals, attrs):
    x = vals[0]
    axis = attrs.get("axis", 0)
    n_out = attrs["__n_outputs__"]
    sizes = None
    if len(vals) > 1 and vals[1] is not None:
        sizes = [int(s) for s in np.asarray(vals[1])]
    elif "split" in attrs:
        sizes = [int(s) for s in attrs["split"]]
    xp = _xp(x)
    if sizes is None:
        return list(xp.split(x, n_out, axis=axis))
    bounds = np.cumsum(sizes)[:-1].tolist()
    return list(xp.split(x, bounds, axis=axis))


@_op("Slice")
def _slice(vals, attrs):
    x = vals[0]
    if len(vals) > 1:  # opset >= 10: starts/ends/axes/steps are inputs
        starts = np.asarray(vals[1]).tolist()
        ends = np.asarray(vals[2]).tolist()
        axes = (np.asarray(vals[3]).tolist() if len(vals) > 3
                and vals[3] is not None else list(range(len(starts))))
        steps = (np.asarray(vals[4]).tolist() if len(vals) > 4
                 and vals[4] is not None else [1] * len(starts))
    else:
        starts = list(attrs["starts"])
        ends = list(attrs["ends"])
        axes = list(attrs.get("axes", range(len(starts))))
        steps = [1] * len(starts)
    idx = [slice(None)] * np.ndim(x)
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = int(a) % np.ndim(x)
        s, e, st = int(s), int(e), int(st)
        # ONNX uses INT64_MAX/MIN as open bounds
        if e >= 2**31:
            e = None
        if e is not None and e <= -(2**31):
            e = None if st < 0 else 0
        idx[a] = slice(s, e, st)
    return [x[tuple(idx)]]


@_op("Gather")
def _gather(vals, attrs):
    x, ind = vals
    axis = attrs.get("axis", 0)
    xp = _xp(x, ind)
    return [xp.take(x, np.asarray(ind) if _is_np(ind) else ind, axis=axis)]


@_op("GatherElements")
def _gather_elements(vals, attrs):
    x, ind = vals
    axis = attrs.get("axis", 0)
    return [jnp.take_along_axis(jnp.asarray(x), jnp.asarray(ind), axis=axis)]


@_op("Where")
def _where(vals, attrs):
    c, a, b = vals
    return [_xp(c, a, b).where(c, a, b)]


@_op("Expand")
def _expand(vals, attrs):
    x, shape = vals
    shape = [int(s) for s in np.asarray(shape)]
    cur = list(np.shape(x))
    ndim = max(len(cur), len(shape))
    cur = [1] * (ndim - len(cur)) + cur
    shape = [1] * (ndim - len(shape)) + shape
    tgt = [max(c, s) for c, s in zip(cur, shape)]
    return [_xp(x).broadcast_to(_xp(x).reshape(x, cur), tgt)]


@_op("Tile")
def _tile(vals, attrs):
    x, reps = vals
    return [_xp(x).tile(x, tuple(int(r) for r in np.asarray(reps)))]


@_op("Range")
def _range(vals, attrs):
    start, limit, delta = (np.asarray(v).item() for v in vals)
    return [np.arange(start, limit, delta)]


@_op("CumSum")
def _cumsum(vals, attrs):
    x, axis = vals
    axis = int(np.asarray(axis).reshape(()))
    if attrs.get("exclusive", 0) or attrs.get("reverse", 0):
        raise NotImplementedError("CumSum exclusive/reverse")
    return [_xp(x).cumsum(x, axis=axis)]


@_op("Einsum")
def _einsum(vals, attrs):
    return [jnp.einsum(attrs["equation"], *[jnp.asarray(v) for v in vals])]


# -- random ops (torch-traced noise: SineGen dither, z noise) ---------------
#
# torch.onnx traces torch.randn/rand into RandomNormal(Like)/
# RandomUniform(Like).  Sampling runs host-side numpy: deterministic per
# seed attr (or a fixed default), and constant-folded under jax tracing —
# the same "noise is explicit/fixed" stance as our parity mode.  Callers
# needing fresh noise per run re-execute eagerly.

def _random_state(attrs):
    seed = attrs.get("seed")
    if seed is not None:
        return np.random.RandomState(np.uint32(abs(int(seed))))
    # Unseeded nodes: mix a stable per-node identifier into the default
    # seed so distinct noise nodes in one graph (e.g. z noise vs SineGen
    # dither) decorrelate while staying deterministic across runs.
    import zlib

    tag = attrs.get("__node_id__", "")
    return np.random.RandomState(np.uint32(0x5EED ^ zlib.crc32(tag.encode())))


def _random_dtype(attrs, like=None):
    if "dtype" in attrs:
        return _ONNX_TO_NP_DT[attrs["dtype"]]
    if like is not None:
        return np.asarray(like).dtype if _is_np(like) else like.dtype
    return np.dtype(np.float32)


@_op("RandomNormal")
def _random_normal(vals, attrs):
    rs = _random_state(attrs)
    out = rs.normal(attrs.get("mean", 0.0), attrs.get("scale", 1.0),
                    size=tuple(attrs["shape"]))
    return [out.astype(_random_dtype(attrs))]


@_op("RandomNormalLike")
def _random_normal_like(vals, attrs):
    rs = _random_state(attrs)
    out = rs.normal(attrs.get("mean", 0.0), attrs.get("scale", 1.0),
                    size=tuple(np.shape(vals[0])))
    return [out.astype(_random_dtype(attrs, vals[0]))]


@_op("RandomUniform")
def _random_uniform(vals, attrs):
    rs = _random_state(attrs)
    out = rs.uniform(attrs.get("low", 0.0), attrs.get("high", 1.0),
                     size=tuple(attrs["shape"]))
    return [out.astype(_random_dtype(attrs))]


@_op("RandomUniformLike")
def _random_uniform_like(vals, attrs):
    rs = _random_state(attrs)
    out = rs.uniform(attrs.get("low", 0.0), attrs.get("high", 1.0),
                     size=tuple(np.shape(vals[0])))
    return [out.astype(_random_dtype(attrs, vals[0]))]


# -- recurrent ops (torch-exported RMVPE BiGRU / separator LSTMs) -----------

def _rnn_common(vals, attrs, n_gates):
    """Shared unpacking for GRU/LSTM: returns (X, W, R, B, H0, extra,
    dirs, hidden).  Layout 0 only (seq, batch, input) — what torch
    exports.  sequence_lens must be absent or full-length (the graphs we
    target run packed full windows)."""
    if attrs.get("layout", 0) != 0:
        raise NotImplementedError("RNN layout=1")
    acts = attrs.get("activations")
    if acts:
        defaults = ([b"Sigmoid", b"Tanh"] if n_gates == 3
                    else [b"Sigmoid", b"Tanh", b"Tanh"])
        per_dir = [a if isinstance(a, bytes) else a.encode() for a in acts]
        n = len(defaults)
        for i, a in enumerate(per_dir):
            if a != defaults[i % n]:
                raise NotImplementedError(f"RNN activation {a}")
    def opt(i):
        return vals[i] if len(vals) > i else None

    X = jnp.asarray(vals[0])
    W = jnp.asarray(vals[1])
    R = jnp.asarray(vals[2])
    dirs, gh, _ = W.shape
    hidden = attrs.get("hidden_size", gh // n_gates)
    B = opt(3)
    B = (jnp.zeros((dirs, 2 * n_gates * hidden), X.dtype)
         if B is None else jnp.asarray(B))
    seq_lens = opt(4)
    if seq_lens is not None:
        sl = np.asarray(seq_lens) if _is_np(seq_lens) else None
        if sl is None or not (sl == X.shape[0]).all():
            raise NotImplementedError("RNN sequence_lens < seq length")
    H0 = opt(5)
    H0 = (jnp.zeros((dirs, X.shape[1], hidden), X.dtype)
          if H0 is None else jnp.asarray(H0))
    return X, W, R, B, H0, dirs, hidden


def _rnn_directions(attrs, dirs):
    direction = attrs.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    want = {"forward": 1, "reverse": 1, "bidirectional": 2}[direction]
    if dirs != want:
        raise ValueError(f"W has {dirs} dirs for direction={direction}")
    return [direction] if want == 1 else ["forward", "reverse"]


@_op("GRU")
def _gru(vals, attrs):
    """ONNX GRU (gate order z, r, h).  linear_before_reset=1 is the torch
    nn.GRU semantics torch.onnx emits (e.g. reference rmvpe.onnx BiGRU,
    RMVPE.py:60-69)."""
    X, W, R, B, H0, dirs, H = _rnn_common(vals, attrs, 3)
    lbr = attrs.get("linear_before_reset", 0)

    def run_dir(d, reverse):
        Wd, Rd = W[d], R[d]
        Wb, Rb = B[d, : 3 * H], B[d, 3 * H:]
        xs = X[::-1] if reverse else X
        # precompute input projections for the whole sequence
        xp_ = xs @ Wd.T + Wb  # (seq, batch, 3H)

        def step(h, xt):
            rz = xt[:, : 2 * H] + h @ Rd[: 2 * H].T + Rb[: 2 * H]
            z = jax.nn.sigmoid(rz[:, :H])
            r = jax.nn.sigmoid(rz[:, H: 2 * H])
            if lbr:
                hh = jnp.tanh(xt[:, 2 * H:]
                              + r * (h @ Rd[2 * H:].T + Rb[2 * H:]))
            else:
                hh = jnp.tanh(xt[:, 2 * H:] + (r * h) @ Rd[2 * H:].T
                              + Rb[2 * H:])
            h = (1.0 - z) * hh + z * h
            return h, h

        hT, ys = jax.lax.scan(step, H0[d], xp_)
        return (ys[::-1] if reverse else ys), hT

    outs = [run_dir(d, rev == "reverse")
            for d, rev in enumerate(_rnn_directions(attrs, dirs))]
    Y = jnp.stack([y for y, _ in outs], axis=1)   # (seq, dirs, batch, H)
    Yh = jnp.stack([h for _, h in outs], axis=0)  # (dirs, batch, H)
    return [Y, Yh][: attrs.get("__n_outputs__", 2)]


@_op("LSTM")
def _lstm(vals, attrs):
    """ONNX LSTM (gate order i, o, f, c); no peepholes (input 7 must be
    absent), matching torch exports."""
    if len(vals) > 7 and vals[7] is not None:
        raise NotImplementedError("LSTM peepholes")
    X, W, R, B, H0, dirs, H = _rnn_common(vals, attrs, 4)
    C0 = (jnp.asarray(vals[6]) if len(vals) > 6 and vals[6] is not None
          else jnp.zeros_like(H0))

    def run_dir(d, reverse):
        Wd, Rd = W[d], R[d]
        Wb, Rb = B[d, : 4 * H], B[d, 4 * H:]
        xs = X[::-1] if reverse else X
        xp_ = xs @ Wd.T + Wb

        def step(carry, xt):
            h, c = carry
            g = xt + h @ Rd.T + Rb
            i = jax.nn.sigmoid(g[:, :H])
            o = jax.nn.sigmoid(g[:, H: 2 * H])
            f = jax.nn.sigmoid(g[:, 2 * H: 3 * H])
            cc = jnp.tanh(g[:, 3 * H:])
            c = f * c + i * cc
            h = o * jnp.tanh(c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, (H0[d], C0[d]), xp_)
        return (ys[::-1] if reverse else ys), hT, cT

    outs = [run_dir(d, rev == "reverse")
            for d, rev in enumerate(_rnn_directions(attrs, dirs))]
    Y = jnp.stack([y for y, _, _ in outs], axis=1)
    Yh = jnp.stack([h for _, h, _ in outs], axis=0)
    Yc = jnp.stack([c for _, _, c in outs], axis=0)
    return [Y, Yh, Yc][: attrs.get("__n_outputs__", 3)]


def _reduce(name, np_red, jnp_red):
    @_op(name)
    def run(vals, attrs):
        x = vals[0]
        axes = _axes_arg(vals, attrs)
        keepdims = bool(attrs.get("keepdims", 1))
        if axes is None and attrs.get("noop_with_empty_axes", 0):
            return [x]
        ax = None if axes is None else tuple(a % np.ndim(x) for a in axes)
        fn = np_red if _is_np(x) else jnp_red
        return [fn(x, axis=ax, keepdims=keepdims)]


_reduce("ReduceMean", np.mean, jnp.mean)
_reduce("ReduceSum", np.sum, jnp.sum)
_reduce("ReduceMax", np.max, jnp.max)
_reduce("ReduceMin", np.min, jnp.min)
_reduce("ReduceProd", np.prod, jnp.prod)
_reduce("ReduceL2", lambda x, axis, keepdims: np.sqrt(
    np.sum(np.square(x), axis=axis, keepdims=keepdims)),
    lambda x, axis, keepdims: jnp.sqrt(
        jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)))


@_op("ArgMax")
def _argmax(vals, attrs):
    (x,) = vals
    axis = attrs.get("axis", 0)
    keepdims = bool(attrs.get("keepdims", 1))
    xp = _xp(x)
    out = xp.argmax(x, axis=axis).astype(np.int64)
    if keepdims:
        out = xp.expand_dims(out, axis)
    return [out]


@_op("MatMul")
def _matmul(vals, attrs):
    a, b = vals
    return [jnp.matmul(jnp.asarray(a), jnp.asarray(b))]


@_op("Gemm")
def _gemm(vals, attrs):
    a, b = vals[0], vals[1]
    c = vals[2] if len(vals) > 2 else None
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = attrs.get("alpha", 1.0) * (a @ b)
    if c is not None:
        y = y + attrs.get("beta", 1.0) * jnp.asarray(c)
    return [y]


# ---- conv / pool -----------------------------------------------------------

def _conv_dnums(nd: int):
    return jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 1) + tuple(range(2, 2 + nd)),
        rhs_spec=(0, 1) + tuple(range(2, 2 + nd)),
        out_spec=(0, 1) + tuple(range(2, 2 + nd)))


def _pads_pairs(attrs, nd, x_shape, k_eff, strides):
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("NOTSET", ""):
        pads = attrs.get("pads", [0] * (2 * nd))
        return [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
    if auto == "VALID":
        return [(0, 0)] * nd
    out = []
    for i in range(nd):  # SAME_UPPER / SAME_LOWER
        in_sz = x_shape[2 + i]
        out_sz = -(-in_sz // strides[i])
        total = max(0, (out_sz - 1) * strides[i] + k_eff[i] - in_sz)
        lo = total // 2 if auto == "SAME_UPPER" else (total + 1) // 2
        out.append((lo, total - lo))
    return out


@_op("Conv")
def _conv(vals, attrs):
    x = jnp.asarray(vals[0])
    w = jnp.asarray(vals[1])
    b = vals[2] if len(vals) > 2 else None
    nd = x.ndim - 2
    strides = [int(s) for s in attrs.get("strides", [1] * nd)]
    dil = [int(d) for d in attrs.get("dilations", [1] * nd)]
    group = int(attrs.get("group", 1))
    k_eff = [dil[i] * (w.shape[2 + i] - 1) + 1 for i in range(nd)]
    pads = _pads_pairs(attrs, nd, x.shape, k_eff, strides)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads, rhs_dilation=dil,
        dimension_numbers=_conv_dnums(nd), feature_group_count=group)
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return [y]


@_op("ConvTranspose")
def _conv_transpose(vals, attrs):
    x = jnp.asarray(vals[0])
    w = jnp.asarray(vals[1])  # (Cin, Cout/group, *k)
    b = vals[2] if len(vals) > 2 else None
    nd = x.ndim - 2
    strides = [int(s) for s in attrs.get("strides", [1] * nd)]
    dil = [int(d) for d in attrs.get("dilations", [1] * nd)]
    group = int(attrs.get("group", 1))
    out_pad = [int(p) for p in attrs.get("output_padding", [0] * nd)]
    pads_attr = attrs.get("pads", [0] * (2 * nd))
    if attrs.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise NotImplementedError("ConvTranspose auto_pad")
    cin = w.shape[0]
    cout_g = w.shape[1]
    k = w.shape[2:]
    # grouped weight permutation: (Cin, Cout/g, *k) -> (Cout, Cin/g, *k)
    wg = w.reshape((group, cin // group, cout_g) + k)
    wg = jnp.moveaxis(wg, 1, 2)  # (g, Cout/g, Cin/g, *k)
    w_oihw = wg.reshape((group * cout_g, cin // group) + k)
    w_flip = jnp.flip(w_oihw, axis=tuple(range(2, 2 + nd)))
    pads = []
    for i in range(nd):
        k_eff = dil[i] * (k[i] - 1) + 1
        lo = k_eff - 1 - int(pads_attr[i])
        hi = k_eff - 1 - int(pads_attr[i + nd]) + out_pad[i]
        pads.append((lo, hi))
    y = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=[1] * nd, padding=pads,
        lhs_dilation=strides, rhs_dilation=dil,
        dimension_numbers=_conv_dnums(nd), feature_group_count=group)
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return [y]


def _pool(vals, attrs, reducer, init, average=False):
    x = jnp.asarray(vals[0])
    nd = x.ndim - 2
    ks = [int(s) for s in attrs["kernel_shape"]]
    strides = [int(s) for s in attrs.get("strides", [1] * nd)]
    k_eff = list(ks)
    pads = _pads_pairs(attrs, nd, x.shape, k_eff, strides)
    if attrs.get("ceil_mode", 0):
        raise NotImplementedError("pool ceil_mode")
    window = (1, 1) + tuple(ks)
    strides_full = (1, 1) + tuple(strides)
    pads_full = [(0, 0), (0, 0)] + pads
    y = jax.lax.reduce_window(x, init, reducer, window, strides_full,
                              pads_full)
    if average:
        ones = jnp.ones(x.shape[2:], x.dtype)
        if attrs.get("count_include_pad", 0):
            denom = float(np.prod(ks))
            y = y / denom
        else:
            cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, tuple(ks),
                                        tuple(strides), pads)
            y = y / cnt
    return [y]


@_op("MaxPool")
def _maxpool(vals, attrs):
    return _pool(vals, attrs, jax.lax.max, -jnp.inf)


@_op("AveragePool")
def _avgpool(vals, attrs):
    return _pool(vals, attrs, jax.lax.add, 0.0, average=True)


@_op("GlobalAveragePool")
def _gap(vals, attrs):
    x = jnp.asarray(vals[0])
    return [jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)]


# ---- normalization ---------------------------------------------------------

@_op("BatchNormalization")
def _batchnorm(vals, attrs):
    x, scale, bias, mean, var = (jnp.asarray(v) for v in vals[:5])
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var + eps)
    return [(x - mean.reshape(shape)) * (inv * scale).reshape(shape)
            + bias.reshape(shape)]


@_op("InstanceNormalization")
def _instancenorm(vals, attrs):
    x, scale, bias = (jnp.asarray(v) for v in vals)
    eps = attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [(x - mu) * jax.lax.rsqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape)]


@_op("LayerNormalization")
def _layernorm(vals, attrs):
    x = jnp.asarray(vals[0])
    scale = jnp.asarray(vals[1])
    bias = jnp.asarray(vals[2]) if len(vals) > 2 and vals[2] is not None \
        else None
    axis = attrs.get("axis", -1) % x.ndim
    eps = attrs.get("epsilon", 1e-5)
    axes = tuple(range(axis, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return [y]


@_op("GroupNormalization")
def _groupnorm(vals, attrs):
    x, scale, bias = (jnp.asarray(v) for v in vals)
    g = int(attrs["num_groups"])
    eps = attrs.get("epsilon", 1e-5)
    n, c = x.shape[:2]
    xg = x.reshape((n, g, c // g) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mu = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [y * scale.reshape(shape) + bias.reshape(shape)]


# ---- resize / pad ----------------------------------------------------------

@_op("Pad")
def _pad(vals, attrs):
    x = vals[0]
    if len(vals) > 1 and vals[1] is not None:  # opset >= 11
        pads = [int(p) for p in np.asarray(vals[1])]
        cval = (np.asarray(vals[2]).item()
                if len(vals) > 2 and vals[2] is not None else 0.0)
    else:
        pads = [int(p) for p in attrs["pads"]]
        cval = attrs.get("value", 0.0)
    mode = attrs.get("mode", "constant")
    nd = np.ndim(x)
    pairs = [(pads[i], pads[i + nd]) for i in range(nd)]
    neg = [(-min(lo, 0), -min(hi, 0)) for lo, hi in pairs]
    pairs = [(max(lo, 0), max(hi, 0)) for lo, hi in pairs]
    xp = _xp(x)
    if mode == "constant":
        y = xp.pad(x, pairs, constant_values=cval)
    elif mode == "reflect":
        y = xp.pad(x, pairs, mode="reflect")
    elif mode == "edge":
        y = xp.pad(x, pairs, mode="edge")
    else:
        raise NotImplementedError(f"Pad mode {mode}")
    if any(lo or hi for lo, hi in neg):
        idx = tuple(slice(lo, (-hi or None)) for lo, hi in neg)
        y = y[idx]
    return [y]


@_op("Resize")
def _resize(vals, attrs):
    x = jnp.asarray(vals[0])
    scales = (np.asarray(vals[2]) if len(vals) > 2 and vals[2] is not None
              and np.asarray(vals[2]).size else None)
    sizes = (np.asarray(vals[3]) if len(vals) > 3 and vals[3] is not None
             else None)
    if sizes is not None:
        out_shape = [int(s) for s in sizes]
    else:
        out_shape = [int(np.floor(x.shape[i] * float(scales[i])))
                     for i in range(x.ndim)]
    mode = attrs.get("mode", "nearest")
    coord = attrs.get("coordinate_transformation_mode", "half_pixel")
    if mode == "nearest":
        # torch Upsample(nearest) exports asymmetric + floor
        idx = []
        for i in range(x.ndim):
            scale = out_shape[i] / x.shape[i]
            ii = np.floor(np.arange(out_shape[i]) / scale).astype(np.int64)
            idx.append(np.clip(ii, 0, x.shape[i] - 1))
        out = x
        for ax, ii in enumerate(idx):
            if out_shape[ax] != x.shape[ax]:
                out = jnp.take(out, jnp.asarray(ii), axis=ax)
        return [out]
    if mode == "linear":
        method = "bilinear"
        if coord == "align_corners":
            raise NotImplementedError("Resize linear align_corners")
        return [jax.image.resize(x, out_shape, method=method)]
    raise NotImplementedError(f"Resize mode {mode}")


# ---------------------------------------------------------------------------
# graph executor
# ---------------------------------------------------------------------------

# -- control flow (Loop / If) and the node interpreter ----------------------
#
# Subgraphs (graph-typed attributes) execute with ONNX outer-scope
# semantics: the body sees every name visible at the Loop/If node plus its
# own formal inputs and local initializers.  Trip counts and conditions
# must be concrete (numpy) values — under jax tracing they derive from
# Shape ops, which stay static, so jitted graphs with shape-driven Loops
# still compile; a Loop whose condition depends on traced DATA raises.

def _run_subgraph(g, outer_env: dict, input_vals):
    env = dict(outer_env)
    for t in g.initializer:
        env[t.name] = op.array_from_tensor(t)
    for vi, v in zip(g.input, input_vals):
        env[vi.name] = v
    _exec_nodes(g.node, env)
    return [env[vi.name] for vi in g.output]


def _loop_node(node, attrs, env):
    """ONNX Loop: [M, cond, v...] -> [v_final..., scan_outputs...]."""
    body = attrs["body"]
    vals = [env[i] if i else None for i in node.input]
    M = vals[0]
    M = None if M is None else int(np.asarray(M).reshape(()))
    cond = vals[1]
    cond = True if cond is None else bool(np.asarray(cond).reshape(()))
    carried = list(vals[2:])
    n_carried = len(carried)
    n_scan = len(body.output) - 1 - n_carried
    scans = [[] for _ in range(n_scan)]
    it = 0
    while cond and (M is None or it < M):
        outs = _run_subgraph(
            body, env,
            [np.asarray(it, np.int64), np.asarray(cond)] + carried)
        cond = bool(np.asarray(outs[0]).reshape(()))
        carried = list(outs[1: 1 + n_carried])
        for j, v in enumerate(outs[1 + n_carried:]):
            scans[j].append(v)
        it += 1
    if n_scan and it == 0:
        raise NotImplementedError(
            "Loop with zero iterations and scan outputs (result shape "
            "unknowable without type inference)")
    stacked = [_xp(*s).stack(s, axis=0) for s in scans]
    return carried + stacked


def _if_node(node, attrs, env):
    cond = bool(np.asarray(env[node.input[0]]).reshape(()))
    branch = attrs["then_branch"] if cond else attrs["else_branch"]
    return _run_subgraph(branch, env, [])


_CONTROL = {"Loop": _loop_node, "If": _if_node}


def _exec_nodes(nodes, env: dict) -> None:
    for node in nodes:
        attrs = _attrs(node)
        attrs["__n_outputs__"] = len(node.output)
        attrs["__node_id__"] = (node.output[0] if node.output
                                else node.name or "")
        try:
            if node.op_type in _CONTROL:
                outs = _CONTROL[node.op_type](node, attrs, env)
            else:
                vals = [env[i] if i else None for i in node.input]
                outs = _OPS[node.op_type](vals, attrs)
        except Exception as e:  # re-raise with node context
            raise type(e)(
                f"{node.op_type} node {node.name or node.output[0]!r}: {e}"
            ) from e
        for name, v in zip(node.output, outs):
            if name:
                env[name] = v


class OnnxGraph:
    """Parsed ONNX model executable with JAX.

    run(feeds) evaluates eagerly; jit() returns a compiled positional
    callable (inputs in graph order, outputs as a tuple).
    """

    def __init__(self, model_or_path):
        if isinstance(model_or_path, op.ModelProto):
            self.model = model_or_path
        else:
            # The reference's released fcpe*.onnx files are AES-encrypted
            # at rest (FCPE.py:28-40, 776); plain files pass through.
            from .modelcrypt import maybe_decrypt

            if isinstance(model_or_path, (bytes, bytearray)):
                raw = bytes(model_or_path)
            else:
                with open(model_or_path, "rb") as fh:
                    raw = fh.read()
            self.model = op.load_model(maybe_decrypt(raw))
        g = self.model.graph
        self.graph = g
        self.initializers = {t.name: op.array_from_tensor(t)
                             for t in g.initializer}
        self.input_names = [vi.name for vi in g.input
                            if vi.name not in self.initializers]
        self.output_names = [vi.name for vi in g.output]
        self.metadata = {e.key: e.value for e in self.model.metadata_props}
        known = set(_OPS) | set(_CONTROL)

        def collect(graph, acc):
            for n in graph.node:
                if n.op_type not in known:
                    acc.add(n.op_type)
                for a in n.attribute:
                    if a.g is not None:
                        collect(a.g, acc)
                    for sub in a.graphs or []:
                        collect(sub, acc)
            return acc

        unknown = sorted(collect(g, set()))
        if unknown:
            raise NotImplementedError(
                f"ONNX ops not supported by the JAX executor: {unknown}")

    def run(self, feeds: dict):
        env = dict(self.initializers)
        for name, value in feeds.items():
            env[name] = value
        _exec_nodes(self.graph.node, env)
        return [env[n] for n in self.output_names]

    def jit(self):
        names = list(self.input_names)

        @jax.jit
        def fn(*args):
            outs = self.run(dict(zip(names, args)))
            return tuple(jnp.asarray(o) for o in outs)

        return fn
