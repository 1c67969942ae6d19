"""Export jitted JAX functions to ONNX by translating their jaxpr.

The reference exports voice models with torch.onnx.export + onnxsim
(main/library/algorithm/onnx_export.py:16-50).  We are not torch: the
TPU-native equivalent is tracing the jitted inference function to a jaxpr
(exactly what XLA compiles) and lowering each primitive to ONNX ops.  The
result is a standalone `.onnx` interchange file carrying the same
`model_info` metadata JSON the reference embeds.

Scope: the primitive set used by our model zoo's inference paths
(synthesizer/NSF-HiFiGAN, HuBERT, RMVPE, CREPE — convs incl. transposed,
dot_general, attention index arithmetic, cumsum phase accumulation).
Anything else raises NotImplementedError with the primitive name.

Notes:
  * parameters become ONNX initializers; only true activations are inputs
  * jax convs with lhs_dilation (transposed convs) are lowered to
    zero-stuffing (Unsqueeze+Pad+Reshape) + ordinary Conv — always correct,
    for any stride/group/dilation combination
  * randomness is NOT traced into the graph: export functions that take
    noise as explicit inputs (our infer() does)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import onnx_proto as op


def _np_attr(builder, v):
    a = np.asarray(v)
    return a


def _is_static_dim(d) -> bool:
    return isinstance(d, (int, np.integer))


# -- _DimExpr introspection adapter -----------------------------------------
#
# Shape polymorphism forces us into jax's PRIVATE symbolic-dim API
# (_DimExpr._sorted_terms / _DimTerm._factors / _DimFactor.var/.operands/
# .operation).  Every such access goes through the helpers below so that a
# jax upgrade that changes the internals surfaces as one clear
# "dynamic export unsupported on this jax version" error instead of an
# opaque AttributeError deep in the lowering.

def _dim_api_error(e: Exception) -> Exception:
    return NotImplementedError(
        "dynamic (shape-polymorphic) ONNX export is unsupported on this "
        f"jax version ({jax.__version__}): the private symbolic-dimension "
        f"API changed ({type(e).__name__}: {e}). Export with static shapes "
        "(dynamic_axes=None) or pin a known-good jax version.")


def _dim_sorted_terms(d):
    """[(term, coeff)] of a symbolic dim expression."""
    try:
        return d._sorted_terms
    except AttributeError as e:
        raise _dim_api_error(e) from e


def _term_factors(term):
    """[(factor, exponent)] of one term."""
    try:
        return term._factors
    except AttributeError as e:
        raise _dim_api_error(e) from e


def _factor_parts(f):
    """(var, op_name, operands) of one factor; var is None for op nodes.
    op_name is one of "floordiv"/"mod"/"max"/"min" (or the raw operation
    string for anything newer) — the private operation constants are
    mapped HERE so no caller touches the private API."""
    try:
        if f.var is not None:
            return f.var, None, None
        names = {f.FLOORDIV: "floordiv", f.MOD: "mod",
                 f.MAX: "max", f.MIN: "min"}
        return None, names.get(f.operation, str(f.operation)), f.operands
    except AttributeError as e:
        raise _dim_api_error(e) from e


def _dim_to_var(d):
    """The plain variable name if d is a bare dim variable, else None."""
    try:
        return d._to_var()
    except AttributeError as e:
        raise _dim_api_error(e) from e


def _static_shape(shape) -> bool:
    return all(_is_static_dim(d) for d in shape)


class OnnxBuilder:
    def __init__(self):
        self.nodes: list[op.NodeProto] = []
        self.initializers: dict[str, np.ndarray] = {}
        self._nbox = [0]  # shared with child scopes for unique names
        # dynamic-axes state: symbolic dim variable -> 0-D int64 tensor name
        # (bound from Shape(input) at graph start), plus memo caches so each
        # distinct dim expression / shape vector is computed once.
        self.dim_vars: dict[str, str] = {}
        self._dim_cache: dict[str, str] = {}
        self._shape_cache: dict[tuple, str] = {}

    def child(self) -> "OnnxBuilder":
        """A builder for a subgraph (ONNX Loop/If body).  Shares the
        initializer table and name counter (outer scope is visible to the
        body, so constants can live at top level); dim caches are COPIED —
        outer-computed dims are reusable inside, body-computed ones must
        not leak out of scope."""
        c = OnnxBuilder()
        c.initializers = self.initializers
        c._nbox = self._nbox
        c.dim_vars = dict(self.dim_vars)
        c._dim_cache = dict(self._dim_cache)
        c._shape_cache = dict(self._shape_cache)
        return c

    def fresh(self, hint="v") -> str:
        self._nbox[0] += 1
        return f"{hint}_{self._nbox[0]}"

    def const(self, arr, hint="c") -> str:
        name = self.fresh(hint)
        self.initializers[name] = np.asarray(arr)
        return name

    # -- symbolic dimension lowering (jax shape polymorphism -> ONNX) -------
    #
    # A jax _DimExpr is a sum of (term, coeff) with each term a product of
    # factors; a factor is either a dim variable or floordiv/mod/max/min of
    # sub-expressions.  We lower that structure to int64 scalar arithmetic
    # (0-D tensors), rooted at Shape(input)+Gather bindings made by
    # export_onnx.  Dim values are nonnegative, so ONNX Div (trunc) matches
    # jax floordiv and Mod(fmod=0) matches jax mod on this domain.

    def dim_scalar(self, d) -> str:
        """int or DimExpr -> name of a 0-D int64 tensor holding its value."""
        if _is_static_dim(d):
            return self.const(np.asarray(int(d), np.int64), "dim")
        key = str(d)
        if key in self._dim_cache:
            return self._dim_cache[key]
        acc = None
        for term, coeff in _dim_sorted_terms(d):
            t = self._dim_term(term)
            if t is None:  # constant term
                part = self.const(np.asarray(int(coeff), np.int64), "dim")
            elif coeff == 1:
                part = t
            else:
                part = self.add("Mul", [
                    t, self.const(np.asarray(int(coeff), np.int64))])
            acc = part if acc is None else self.add("Add", [acc, part])
        self._dim_cache[key] = acc
        return acc

    def _dim_term(self, term):
        acc = None
        for f, exp in _term_factors(term):
            base = self._dim_factor(f)
            cur = base
            for _ in range(int(exp) - 1):
                cur = self.add("Mul", [cur, base])
            acc = cur if acc is None else self.add("Mul", [acc, cur])
        return acc  # None for the empty (constant) term

    def _dim_factor(self, f) -> str:
        var, operation, operands = _factor_parts(f)
        if var is not None:
            if var not in self.dim_vars:
                raise ValueError(
                    f"symbolic dim '{var}' is not bound to any input axis; "
                    f"name it as a plain axis of some input in dynamic_axes")
            return self.dim_vars[var]
        a, c = operands
        x, y = self.dim_scalar(a), self.dim_scalar(c)
        onnx_of = {"floordiv": "Div", "mod": "Mod",
                   "max": "Max", "min": "Min"}
        if operation not in onnx_of:
            raise NotImplementedError(f"dim operation {operation}")
        return self.add(onnx_of[operation], [x, y])

    def shape_vec(self, shape, hint="shp") -> str:
        """Sequence of int|DimExpr -> name of a 1-D int64 shape tensor."""
        shape = list(shape)
        if _static_shape(shape):
            return self.const(np.asarray([int(d) for d in shape], np.int64),
                              hint)
        key = tuple(str(d) for d in shape)
        if key in self._shape_cache:
            return self._shape_cache[key]
        parts, run = [], []
        for d in shape:
            if _is_static_dim(d):
                run.append(int(d))
                continue
            if run:
                parts.append(self.const(np.asarray(run, np.int64)))
                run = []
            parts.append(self.add("Reshape", [
                self.dim_scalar(d), self.const(np.asarray([1], np.int64))]))
        if run:
            parts.append(self.const(np.asarray(run, np.int64)))
        out = (parts[0] if len(parts) == 1
               else self.add("Concat", parts, axis=0))
        self._shape_cache[key] = out
        return out

    def add(self, op_type, inputs, n_out=1, outputs=None, **attrs):
        outs = outputs or [self.fresh(op_type.lower()) for _ in range(n_out)]
        node = op.NodeProto(op_type=op_type, input=list(inputs),
                            output=list(outs))
        for k, v in attrs.items():
            if v is None:
                continue
            a = op.AttributeProto(name=k)
            if isinstance(v, op.GraphProto):
                a.type, a.g = op.ATTR_GRAPH, v
            elif isinstance(v, float):
                a.type, a.f = op.ATTR_FLOAT, v
            elif isinstance(v, (bool, int, np.integer)):
                a.type, a.i = op.ATTR_INT, int(v)
            elif isinstance(v, str):
                a.type, a.s = op.ATTR_STRING, v.encode()
            elif isinstance(v, np.ndarray):
                a.type, a.t = op.ATTR_TENSOR, op.tensor_from_array(v)
            elif isinstance(v, (list, tuple)) and v and isinstance(v[0], float):
                a.type, a.floats = op.ATTR_FLOATS, [float(x) for x in v]
            elif isinstance(v, (list, tuple)):
                a.type, a.ints = op.ATTR_INTS, [int(x) for x in v]
            else:  # pragma: no cover
                raise TypeError(f"attr {k}: {type(v)}")
            node.attribute.append(a)
        self.nodes.append(node)
        return outs if n_out != 1 else outs[0]


# ---------------------------------------------------------------------------
# primitive translators: fn(builder, eqn, in_names, avals) -> [out_names]
# ---------------------------------------------------------------------------

_PRIMS = {}


def _prim(name):
    def deco(fn):
        _PRIMS[name] = fn
        return fn
    return deco


def _simple(name, onnx_op):
    @_prim(name)
    def run(b, eqn, ins):
        return [b.add(onnx_op, ins)]


for _jax, _onnx in [
        ("add", "Add"), ("sub", "Sub"), ("mul", "Mul"), ("div", "Div"),
        ("max", "Max"), ("min", "Min"), ("pow", "Pow"),
        ("exp", "Exp"), ("log", "Log"), ("tanh", "Tanh"), ("sin", "Sin"),
        ("cos", "Cos"), ("sqrt", "Sqrt"), ("neg", "Neg"), ("abs", "Abs"),
        ("sign", "Sign"), ("floor", "Floor"), ("ceil", "Ceil"),
        ("round", "Round"), ("erf", "Erf"), ("logistic", "Sigmoid"),
        ("and", "And"), ("or", "Or"), ("not", "Not"),
        ("stop_gradient", "Identity"), ("copy", "Identity"),
        ("ge", "GreaterOrEqual"), ("gt", "Greater"),
        ("le", "LessOrEqual"), ("lt", "Less"), ("eq", "Equal")]:
    _simple(_jax, _onnx)


@_prim("ne")
def _ne(b, eqn, ins):
    return [b.add("Not", [b.add("Equal", ins)])]


@_prim("rem")
def _rem(b, eqn, ins):
    return [b.add("Mod", ins, fmod=1)]


@_prim("erfc")
def _erfc(b, eqn, ins):
    one = b.const(np.asarray(1.0, eqn.invars[0].aval.dtype))
    return [b.add("Sub", [one, b.add("Erf", ins)])]


@_prim("rsqrt")
def _rsqrt(b, eqn, ins):
    return [b.add("Reciprocal", [b.add("Sqrt", ins)])]


@_prim("square")
def _square(b, eqn, ins):
    return [b.add("Mul", [ins[0], ins[0]])]


@_prim("integer_pow")
def _integer_pow(b, eqn, ins):
    y = int(eqn.params["y"])
    dt = eqn.invars[0].aval.dtype
    e = b.const(np.asarray(y, dt))
    return [b.add("Pow", [ins[0], e])]


@_prim("clamp")
def _clamp(b, eqn, ins):
    lo, x, hi = ins
    return [b.add("Min", [b.add("Max", [x, lo]), hi])]


@_prim("convert_element_type")
def _convert(b, eqn, ins):
    dt = np.dtype(eqn.params["new_dtype"])
    return [b.add("Cast", ins, to=op._NP_TO_ONNX[dt.name])]


@_prim("select_n")
def _select_n(b, eqn, ins):
    if len(ins) != 3:
        raise NotImplementedError(f"select_n with {len(ins) - 1} cases")
    pred, on_false, on_true = ins
    if eqn.invars[0].aval.dtype != np.bool_:
        pred = b.add("Cast", [pred], to=op.BOOL)
    return [b.add("Where", [pred, on_true, on_false])]


@_prim("transpose")
def _transpose(b, eqn, ins):
    return [b.add("Transpose", ins, perm=list(eqn.params["permutation"]))]


@_prim("reshape")
def _reshape(b, eqn, ins):
    return [b.add("Reshape", [ins[0], b.shape_vec(eqn.params["new_sizes"])])]


@_prim("squeeze")
def _squeeze(b, eqn, ins):
    return [b.add("Reshape", [ins[0],
                              b.shape_vec(eqn.outvars[0].aval.shape)])]


@_prim("expand_dims")
def _expand_dims(b, eqn, ins):
    return [b.add("Reshape", [ins[0],
                              b.shape_vec(eqn.outvars[0].aval.shape)])]


def _same_dims(a, bb) -> bool:
    return len(a) == len(bb) and all(str(x) == str(y) for x, y in zip(a, bb))


@_prim("broadcast_in_dim")
def _broadcast(b, eqn, ins):
    shape = list(eqn.params["shape"])
    bdims = list(eqn.params["broadcast_dimensions"])
    in_shape = eqn.invars[0].aval.shape
    # step 1: reshape to rank-matched shape with 1s
    mid = [1] * len(shape)
    for i, d in enumerate(bdims):
        mid[d] = in_shape[i]
    x = ins[0]
    if not _same_dims(in_shape, mid):
        x = b.add("Reshape", [x, b.shape_vec(mid)])
    if not _same_dims(mid, shape):
        x = b.add("Expand", [x, b.shape_vec(shape)])
    return [x]


@_prim("concatenate")
def _concat(b, eqn, ins):
    return [b.add("Concat", ins, axis=int(eqn.params["dimension"]))]


@_prim("split")
def _split(b, eqn, ins):
    sizes = b.shape_vec(eqn.params["sizes"])
    n = len(eqn.params["sizes"])
    outs = b.add("Split", [ins[0], sizes], n_out=n,
                 axis=int(eqn.params["axis"]))
    return outs if isinstance(outs, list) else [outs]


@_prim("slice")
def _slice(b, eqn, ins):
    starts = list(eqn.params["start_indices"])
    ends = list(eqn.params["limit_indices"])
    strides = eqn.params["strides"]
    strides = list(strides) if strides is not None else [1] * len(starts)
    axes = list(range(len(starts)))
    return [b.add("Slice", [
        ins[0], b.shape_vec(starts), b.shape_vec(ends),
        b.const(np.asarray(axes, np.int64)),
        b.shape_vec(strides)])]


@_prim("rev")
def _rev(b, eqn, ins):
    dims = list(eqn.params["dimensions"])
    n = len(dims)
    big = 2 ** 62
    return [b.add("Slice", [
        ins[0], b.const(np.full(n, -1, np.int64)),
        b.const(np.full(n, -big, np.int64)),
        b.const(np.asarray(dims, np.int64)),
        b.const(np.full(n, -1, np.int64))])]


@_prim("pad")
def _pad(b, eqn, ins):
    cfg = eqn.params["padding_config"]
    if any((not _is_static_dim(inner)) or inner for _, _, inner in cfg):
        raise NotImplementedError("pad with interior padding")
    los = [lo for lo, _, _ in cfg]
    his = [hi for _, hi, _ in cfg]
    x = ins[0]
    if not _static_shape(los + his):
        # symbolic pad amounts (e.g. pad-to-length-t): Pad by max(p, 0)
        # computed at run time, then Slice the negative parts off using the
        # traced output shape as the kept extent.
        nd = len(cfg)
        zero = b.const(np.asarray(0, np.int64))
        pos = b.add("Max", [b.shape_vec(los + his, "pads"), zero])
        x = b.add("Pad", [x, pos, ins[1]], mode="constant")
        starts = b.add("Neg", [b.add("Min", [b.shape_vec(los), zero])])
        ends = b.add("Add", [starts,
                             b.shape_vec(eqn.outvars[0].aval.shape)])
        return [b.add("Slice", [
            x, starts, ends, b.const(np.arange(nd, dtype=np.int64)),
            b.const(np.ones(nd, np.int64))])]
    if any(p > 0 for p in los + his):
        pads = [max(p, 0) for p in los] + [max(p, 0) for p in his]
        x = b.add("Pad", [x, b.const(np.asarray(pads, np.int64)), ins[1]],
                  mode="constant")
    if any(p < 0 for p in los + his):
        nd = len(cfg)
        starts = [-min(lo, 0) for lo in los]
        ends = [2 ** 62 + min(hi, 0) for hi in his]
        x = b.add("Slice", [
            x, b.const(np.asarray(starts, np.int64)),
            b.const(np.asarray(ends, np.int64)),
            b.const(np.arange(nd, dtype=np.int64)),
            b.const(np.ones(nd, np.int64))])
    return [x]


@_prim("iota")
def _iota(b, eqn, ins):
    shape = list(eqn.params["shape"])
    dim = int(eqn.params["dimension"])
    dt = np.dtype(eqn.params["dtype"])
    n = shape[dim]
    r = b.add("Range", [b.const(np.asarray(0, np.int64)),
                        b.dim_scalar(n),
                        b.const(np.asarray(1, np.int64))])
    if dt != np.int64:
        r = b.add("Cast", [r], to=op._NP_TO_ONNX[dt.name])
    mid = [1] * len(shape)
    mid[dim] = n
    r = b.add("Reshape", [r, b.shape_vec(mid)])
    if not _same_dims(mid, shape):
        r = b.add("Expand", [r, b.shape_vec(shape)])
    return [r]


@_prim("dim_as_value")
def _dim_as_value(b, eqn, ins):
    """A symbolic dimension used as an array value (shape polymorphism)."""
    d = b.dim_scalar(eqn.params["dim"])
    dt = np.dtype(eqn.outvars[0].aval.dtype)
    if dt != np.int64:
        d = b.add("Cast", [d], to=op._NP_TO_ONNX[dt.name])
    return [d]


@_prim("cumsum")
def _cumsum(b, eqn, ins):
    if eqn.params.get("reverse"):
        raise NotImplementedError("reverse cumsum")
    ax = b.const(np.asarray(eqn.params["axis"], np.int64))
    return [b.add("CumSum", [ins[0], ax])]


def _reduce(jax_name, onnx_name):
    @_prim(jax_name)
    def run(b, eqn, ins):
        axes = b.const(np.asarray(eqn.params["axes"], np.int64))
        return [b.add(onnx_name, [ins[0], axes], keepdims=0)]


_reduce("reduce_sum", "ReduceSum")
_reduce("reduce_max", "ReduceMax")
_reduce("reduce_min", "ReduceMin")
_reduce("reduce_prod", "ReduceProd")


@_prim("argmax")
def _argmax(b, eqn, ins):
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise NotImplementedError("argmax over multiple axes")
    out = b.add("ArgMax", ins, axis=int(axes[0]), keepdims=0)
    dt = np.dtype(eqn.params["index_dtype"])
    if dt != np.int64:
        out = b.add("Cast", [out], to=op._NP_TO_ONNX[dt.name])
    return [out]


@_prim("dot_general")
def _dot_general(b, eqn, ins):
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    lhs_aval, rhs_aval = eqn.invars[0].aval, eqn.invars[1].aval
    lshape, rshape = list(lhs_aval.shape), list(rhs_aval.shape)
    lfree = [i for i in range(len(lshape)) if i not in lc and i not in lb]
    rfree = [i for i in range(len(rshape)) if i not in rc and i not in rb]
    lperm = list(lb) + lfree + list(lc)
    rperm = list(rb) + list(rc) + rfree

    def prod(idx, shape):
        out = 1
        for i in idx:
            out *= shape[i]
        return out

    B = prod(lb, lshape)
    L = prod(lfree, lshape)
    C = prod(lc, lshape)
    R = prod(rfree, rshape)
    a = b.add("Transpose", [ins[0]], perm=lperm) if lperm != list(
        range(len(lshape))) else ins[0]
    a = b.add("Reshape", [a, b.shape_vec([B, L, C])])
    c = b.add("Transpose", [ins[1]], perm=rperm) if rperm != list(
        range(len(rshape))) else ins[1]
    c = b.add("Reshape", [c, b.shape_vec([B, C, R])])
    y = b.add("MatMul", [a, c])
    out_shape = ([lshape[i] for i in lb] + [lshape[i] for i in lfree]
                 + [rshape[i] for i in rfree])
    return [b.add("Reshape", [y, b.shape_vec(out_shape)])]


@_prim("reduce_window_sum")
def _reduce_window_sum(b, eqn, ins):
    """Sum pooling (jax.lax.reduce_window with add) -> AveragePool *
    window_count.  Window axes are transposed to the trailing positions
    and the leading ones collapse into (N, 1)."""
    p = eqn.params
    wd = list(p["window_dimensions"])
    ws = list(p["window_strides"])
    pad = [list(x) for x in p["padding"]]
    rank = len(wd)
    if any(d != 1 for d in (p.get("base_dilation") or [1] * rank)):
        raise NotImplementedError("reduce_window_sum base_dilation")
    if any(d != 1 for d in (p.get("window_dilation") or [1] * rank)):
        raise NotImplementedError("reduce_window_sum window_dilation")

    in_shape = list(eqn.invars[0].aval.shape)
    out_shape = list(eqn.outvars[0].aval.shape)
    spatial = [i for i in range(rank)
               if wd[i] != 1 or ws[i] != 1 or pad[i] != [0, 0]]
    if not spatial:
        return [b.add("Identity", ins)]
    batch = [i for i in range(rank) if i not in spatial]
    perm = batch + spatial
    x = b.add("Transpose", ins, perm=perm)
    n = 1
    for i in batch:
        n = n * in_shape[i]
    pool_in = [n, 1] + [in_shape[i] for i in spatial]
    x = b.add("Reshape", [x, b.shape_vec(pool_in)])
    y = b.add("AveragePool", [x],
              kernel_shape=[wd[i] for i in spatial],
              strides=[ws[i] for i in spatial],
              pads=[pad[i][0] for i in spatial]
                   + [pad[i][1] for i in spatial],
              count_include_pad=1)
    scale = float(np.prod([wd[i] for i in spatial]))
    y = b.add("Mul", [y, b.const(np.asarray(
        scale, np.dtype(eqn.outvars[0].aval.dtype)))])
    mid = ([out_shape[i] for i in batch]
           + [out_shape[i] for i in spatial])
    y = b.add("Reshape", [y, b.shape_vec(mid)])
    inv = np.argsort(perm).tolist()
    return [b.add("Transpose", [y], perm=inv)]


@_prim("conv_general_dilated")
def _conv(b, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    nd = len(lhs_spec) - 2
    strides = list(p["window_strides"])
    padding = [list(pr) for pr in p["padding"]]
    lhs_dil = list(p["lhs_dilation"] or [1] * nd)
    rhs_dil = list(p["rhs_dilation"] or [1] * nd)
    groups = int(p["feature_group_count"])
    if int(p.get("batch_group_count", 1) or 1) != 1:
        raise NotImplementedError("batch_group_count")

    x = ins[0]
    if list(lhs_spec) != list(range(nd + 2)):
        x = b.add("Transpose", [x], perm=list(lhs_spec))
    w = ins[1]
    if list(rhs_spec) != list(range(nd + 2)):
        w = b.add("Transpose", [w], perm=list(rhs_spec))

    x_shape = [eqn.invars[0].aval.shape[i] for i in lhs_spec]

    # input dilation (transposed conv) -> zero-stuff each spatial dim
    for d in range(nd):
        s = lhs_dil[d]
        if s == 1:
            continue
        ax = 2 + d
        rank = nd + 2
        # (…, T, …) -> (…, T, 1, …) -> pad -> (…, T*s, …) -> trim s-1
        unsq = b.add("Unsqueeze", [x, b.const(np.asarray([ax + 1], np.int64))])
        pads = np.zeros(2 * (rank + 1), np.int64)
        pads[(rank + 1) + ax + 1] = s - 1  # end-pad the inserted axis
        zero = b.const(np.asarray(0, np.dtype(eqn.invars[0].aval.dtype)))
        padded = b.add("Pad", [unsq, b.const(pads), zero], mode="constant")
        new_shape = list(x_shape)
        new_shape[ax] = x_shape[ax] * s
        x = b.add("Reshape", [padded, b.shape_vec(new_shape)])
        # drop the trailing s-1 stuffed zeros
        x = b.add("Slice", [x, b.const(np.zeros(1, np.int64)),
                            b.shape_vec([new_shape[ax] - (s - 1)]),
                            b.const(np.asarray([ax], np.int64)),
                            b.const(np.ones(1, np.int64))])
        x_shape[ax] = new_shape[ax] - (s - 1)

    # negative jax padding -> Slice before Conv
    if any(lo < 0 or hi < 0 for lo, hi in padding):
        starts = [-min(lo, 0) for lo, hi in padding]
        ends = [2 ** 62 + min(hi, 0) for lo, hi in padding]
        x = b.add("Slice", [
            x, b.const(np.asarray(starts, np.int64)),
            b.const(np.asarray(ends, np.int64)),
            b.const(np.arange(2, nd + 2, dtype=np.int64)),
            b.const(np.ones(nd, np.int64))])
        padding = [[max(lo, 0), max(hi, 0)] for lo, hi in padding]

    kernel_shape = [eqn.invars[1].aval.shape[rhs_spec[2 + i]]
                    for i in range(nd)]
    pads = [pr[0] for pr in padding] + [pr[1] for pr in padding]
    y = b.add("Conv", [x, w], strides=strides, pads=pads,
              dilations=rhs_dil, group=groups, kernel_shape=kernel_shape)
    inv = [0] * (nd + 2)
    for i, d in enumerate(out_spec):
        inv[d] = i
    if inv != list(range(nd + 2)):
        y = b.add("Transpose", [y], perm=inv)
    return [y]


@_prim("dynamic_slice")
def _dynamic_slice(b, eqn, ins):
    x = ins[0]
    starts = ins[1:]
    sizes = list(eqn.params["slice_sizes"])
    nd = len(sizes)
    # runtime starts: build starts tensor via Concat of Unsqueezed scalars
    parts = []
    for s, v in zip(starts, eqn.invars[1:]):
        u = b.add("Reshape", [s, b.const(np.asarray([1], np.int64))])
        if np.dtype(v.aval.dtype) != np.int64:
            u = b.add("Cast", [u], to=op.INT64)
        parts.append(u)
    st = b.add("Concat", parts, axis=0) if len(parts) > 1 else parts[0]
    # clamp starts to [0, dim - size] like lax semantics
    dims = [eqn.invars[0].aval.shape[i] for i in range(nd)]
    limit = [d - s for d, s in zip(dims, sizes)]
    st = b.add("Min", [b.add("Max", [st, b.const(np.zeros(nd, np.int64))]),
                       b.shape_vec(limit)])
    en = b.add("Add", [st, b.shape_vec(sizes)])
    return [b.add("Slice", [x, st, en,
                            b.const(np.arange(nd, dtype=np.int64)),
                            b.const(np.ones(nd, np.int64))])]


@_prim("gather")
def _gather(b, eqn, ins):
    """Supports the patterns jnp.take / embedding lookups trace to:
    single collapsed axis, full slices elsewhere."""
    p = eqn.params
    dnums = p["dimension_numbers"]
    slice_sizes = list(p["slice_sizes"])
    operand = eqn.invars[0].aval
    indices = eqn.invars[1].aval
    # pattern: index_vector_dim is last, one start_index_map axis g,
    # slice covers whole operand except axis g (collapsed)
    if (len(dnums.start_index_map) == 1
            and dnums.collapsed_slice_dims == (dnums.start_index_map[0],)
            and slice_sizes[dnums.start_index_map[0]] == 1
            and all(slice_sizes[i] == operand.shape[i]
                    for i in range(len(slice_sizes))
                    if i != dnums.start_index_map[0])):
        axis = dnums.start_index_map[0]
        idx = ins[1]
        # indices shape (..., 1) -> squeeze the index-vector dim
        if indices.shape and indices.shape[-1] == 1:
            idx = b.add("Reshape", [idx, b.shape_vec(indices.shape[:-1])])
        out = b.add("Gather", [ins[0], idx], axis=axis)
        # jax output: batch dims of indices replace the collapsed axis and
        # land at offset_dims complement — for axis-0 takes this matches
        # ONNX Gather; reshape to the traced output shape for safety
        out = b.add("Reshape", [out,
                                b.shape_vec(eqn.outvars[0].aval.shape)])
        return [out]
    # pattern: dynamic slice along k axes (symbolic-shape slicing and
    # advanced start-index slicing lower to this): a single rank-1 index
    # vector of k starts, no index batch dims, full slices on unmapped
    # axes, collapsed dims of size 1.  Lowered to one ONNX Slice plus a
    # Reshape dropping the collapsed dims.
    nd = len(slice_sizes)
    out_rank = len(eqn.outvars[0].aval.shape)
    if (dnums.operand_batching_dims == ()
            and dnums.start_indices_batching_dims == ()
            and len(indices.shape) == 1
            and _is_static_dim(indices.shape[0])
            and int(indices.shape[0]) == len(dnums.start_index_map)
            and tuple(dnums.offset_dims) == tuple(range(out_rank))
            and all(str(slice_sizes[i]) == "1"
                    for i in dnums.collapsed_slice_dims)
            and all(str(slice_sizes[i]) == str(operand.shape[i])
                    for i in range(nd)
                    if i not in dnums.start_index_map)):
        idx = ins[1]
        if np.dtype(indices.dtype) != np.int64:
            idx = b.add("Cast", [idx], to=op.INT64)
        pos_of = {ax: j for j, ax in enumerate(dnums.start_index_map)}
        parts = []
        for ax in range(nd):
            if ax in pos_of:
                j = pos_of[ax]
                parts.append(b.add("Slice", [
                    idx, b.const(np.asarray([j], np.int64)),
                    b.const(np.asarray([j + 1], np.int64)),
                    b.const(np.zeros(1, np.int64)),
                    b.const(np.ones(1, np.int64))]))
            else:
                parts.append(b.const(np.zeros(1, np.int64)))
        st = b.add("Concat", parts, axis=0) if nd > 1 else parts[0]
        sizes = b.shape_vec(slice_sizes)
        lim = b.add("Sub", [b.shape_vec(operand.shape), sizes])
        st = b.add("Min", [
            b.add("Max", [st, b.const(np.zeros(nd, np.int64))]), lim])
        ends = b.add("Add", [st, sizes])
        out = b.add("Slice", [
            ins[0], st, ends, b.const(np.arange(nd, dtype=np.int64)),
            b.const(np.ones(nd, np.int64))])
        return [b.add("Reshape", [out,
                                  b.shape_vec(eqn.outvars[0].aval.shape)])]
    raise NotImplementedError(
        f"general gather: dnums={dnums} sizes={slice_sizes}")


@_prim("scan")
def _scan(b, eqn, ins):
    """lax.scan lowered by static unrolling (stacked-layer loops become
    repeated blocks, exactly like a torch-exported model)."""
    p = eqn.params
    reverse = bool(p.get("reverse"))
    if not _is_static_dim(p["length"]):
        return _scan_loop(b, eqn, ins)
    length = int(p["length"])
    n_consts = int(p["num_consts"])
    n_carry = int(p["num_carry"])
    closed = p["jaxpr"]
    consts = ins[:n_consts]
    carry = list(ins[n_consts:n_consts + n_carry])
    xs = ins[n_consts + n_carry:]
    xs_avals = [v.aval for v in eqn.invars[n_consts + n_carry:]]
    n_ys = len(eqn.outvars) - n_carry
    ys_parts = [[] for _ in range(n_ys)]
    # reverse scan (e.g. the backward GRU direction): consume xs from the
    # end; ys stay stacked in input order, so the parts list is reversed
    # before Concat
    order = range(length - 1, -1, -1) if reverse else range(length)
    for i in order:
        x_slices = []
        for xname, aval in zip(xs, xs_avals):
            nd = len(aval.shape)
            sl = b.add("Slice", [
                xname, b.const(np.asarray([i], np.int64)),
                b.const(np.asarray([i + 1], np.int64)),
                b.const(np.asarray([0], np.int64)),
                b.const(np.asarray([1], np.int64))])
            x_slices.append(b.add("Reshape", [sl,
                                              b.shape_vec(aval.shape[1:])]))
        outs = _inline(b, closed, list(consts) + carry + x_slices)
        carry = list(outs[:n_carry])
        for j, y in enumerate(outs[n_carry:]):
            aval = eqn.outvars[n_carry + j].aval
            ys_parts[j].append(b.add("Reshape", [
                y, b.shape_vec((1,) + tuple(aval.shape[1:]))]))
    if reverse:
        ys_parts = [parts[::-1] for parts in ys_parts]
    ys = [parts[0] if length == 1 else b.add("Concat", parts, axis=0)
          for parts in ys_parts]
    return carry + ys


def _scan_loop(b, eqn, ins):
    """lax.scan over a SYMBOLIC length -> ONNX Loop.

    The body jaxpr translates into a Loop body subgraph; per-iteration xs
    elements are Gathered from the full (outer-scope) arrays at the loop
    index, carries ride the Loop state, ys ride its scan outputs (each
    Unsqueezed to stack along axis 0, exactly jax's ys stacking).  This is
    what makes recurrences over a dynamic axis exportable — e.g. the
    RMVPE BiGRU over a symbolic frame count."""
    p = eqn.params
    reverse = bool(p.get("reverse"))
    length = p["length"]  # symbolic DimExpr
    n_consts = int(p["num_consts"])
    n_carry = int(p["num_carry"])
    closed = p["jaxpr"]
    consts = ins[:n_consts]
    carry0 = list(ins[n_consts:n_consts + n_carry])
    xs = ins[n_consts + n_carry:]
    n_ys = len(eqn.outvars) - n_carry

    cb = b.child()
    iter_in = cb.fresh("iter")
    cond_in = cb.fresh("cond_in")
    carry_in = [cb.fresh("carry") for _ in range(n_carry)]
    idx = iter_in
    if reverse:
        idx = cb.add("Sub", [cb.dim_scalar(length - 1), iter_in])
    x_slices = [cb.add("Gather", [xname, idx], axis=0) for xname in xs]
    outs = _translate_jaxpr(cb, closed.jaxpr, closed.consts,
                            list(consts) + carry_in + x_slices)
    cond_out = cb.add("Identity", [cond_in])
    carry_out = [cb.add("Identity", [o]) for o in outs[:n_carry]]
    # scan outputs: the runtime stacks each iteration's value along a new
    # axis 0 ((trip, *per_iter_shape)) — exactly jax's ys stacking
    ys_out = [cb.add("Identity", [o]) for o in outs[n_carry:]]
    # The ONNX IR requires subgraph inputs/outputs to carry type info
    # (onnx.checker / onnxruntime reject untyped ones): iter is an int64
    # scalar, cond a bool scalar, carries/ys take their jaxpr avals.
    carry_avals = [v.aval for v in
                   closed.jaxpr.invars[n_consts:n_consts + n_carry]]
    ys_avals = [v.aval for v in closed.jaxpr.outvars[n_carry:]]
    body = op.GraphProto(
        name=b.fresh("scan_body"), node=cb.nodes,
        input=[_value_info(iter_in, shape=(), dtype=np.int64),
               _value_info(cond_in, shape=(), dtype=np.bool_)]
              + [_value_info(nm, aval=a)
                 for nm, a in zip(carry_in, carry_avals)],
        output=[_value_info(cond_out, shape=(), dtype=np.bool_)]
               + [_value_info(nm, aval=a)
                  for nm, a in zip(carry_out, carry_avals)]
               + [_value_info(nm, aval=a)
                  for nm, a in zip(ys_out, ys_avals)])
    loop_outs = b.add("Loop",
                      [b.dim_scalar(length), b.const(np.asarray(True))]
                      + carry0,
                      n_out=n_carry + n_ys, body=body)
    if not isinstance(loop_outs, list):
        loop_outs = [loop_outs]
    carries = loop_outs[:n_carry]
    ys = loop_outs[n_carry:]
    if reverse:
        # iteration j consumed xs[L-1-j]; jax returns ys in xs order
        ys = [b.add("Slice", [y, b.const(np.asarray([-1], np.int64)),
                              b.const(np.asarray([-2 ** 62], np.int64)),
                              b.const(np.asarray([0], np.int64)),
                              b.const(np.asarray([-1], np.int64))])
              for y in ys]
    return list(carries) + list(ys)


# recursion into sub-jaxprs -------------------------------------------------

def _inline(b, closed, ins, env_literals=True):
    return _translate_jaxpr(b, closed.jaxpr, closed.consts, ins)


@_prim("pjit")
def _pjit(b, eqn, ins):
    return _inline(b, eqn.params["jaxpr"], ins)


@_prim("jit")
def _jit(b, eqn, ins):
    return _inline(b, eqn.params["jaxpr"], ins)


@_prim("custom_jvp_call")
def _custom_jvp(b, eqn, ins):
    return _inline(b, eqn.params["call_jaxpr"], ins)


@_prim("custom_vjp_call")
def _custom_vjp(b, eqn, ins):
    return _inline(b, eqn.params["call_jaxpr"], ins)


@_prim("remat")
def _remat(b, eqn, ins):
    from jax._src.core import ClosedJaxpr
    j = eqn.params["jaxpr"]
    if not hasattr(j, "consts"):
        j = ClosedJaxpr(j, ())
    return _inline(b, j, ins)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _translate_jaxpr(b: OnnxBuilder, jaxpr, consts, in_names):
    env = {}

    def read(v):
        from jax._src.core import Literal

        if isinstance(v, Literal):
            val = np.asarray(v.val)
            return b.const(val, "lit")
        return env[v]

    for var, name in zip(jaxpr.constvars, consts):
        env[var] = b.const(np.asarray(name), "const")
    for var, name in zip(jaxpr.invars, in_names):
        env[var] = name

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        fn = _PRIMS.get(prim)
        if fn is None:
            raise NotImplementedError(f"no ONNX lowering for primitive "
                                      f"{prim!r}")
        ins = [read(v) for v in eqn.invars]
        outs = fn(b, eqn, ins)
        for var, name in zip(eqn.outvars, outs):
            env[var] = name
    return [read(v) for v in jaxpr.outvars]


def _value_info(name, aval=None, shape=None, dtype=None):
    vi = op.ValueInfoProto(name=name)
    if aval is not None:
        shape, dtype = aval.shape, aval.dtype
    if dtype is not None:
        dims = [op.TensorShapeDim(dim_value=int(d)) if _is_static_dim(d)
                else op.TensorShapeDim(dim_param=str(d)) for d in shape]
        tt = op.TypeProtoTensor(
            elem_type=op._NP_TO_ONNX[np.dtype(dtype).name],
            shape=op.TensorShapeProto(dim=dims))
        vi.type = op.TypeProto(tensor_type=tt)
    return vi


def export_onnx(fn, example_args, *, params=None, input_names,
                output_names, metadata=None, producer="rvc_maker_tpu",
                opset=17, dynamic_axes=None,
                dim_constraints=()) -> op.ModelProto:
    """Trace fn(params, *example_args) (or fn(*example_args) if params is
    None) and lower the jaxpr to an ONNX ModelProto.

    params (a pytree) becomes initializers; example_args become graph
    inputs named input_names (in flattened pytree order).

    dynamic_axes marks input axes as symbolic, like torch.onnx.export's
    argument of the same name (the reference exporter's usage:
    main/library/algorithm/onnx_export.py:16-50): a dict
    {input_name: {axis: dim_spec}} where dim_spec is a jax symbolic-shape
    expression string — a plain variable ("t") or an expression of
    variables declared on other axes ("320*t").  The function is traced
    once with jax shape polymorphism and every shape the graph consumes
    is emitted as ONNX int64 arithmetic rooted at Shape() of the inputs,
    so one exported file serves every length.  Each variable must appear
    as a PLAIN axis of at least one input (that axis binds its value).
    dim_constraints passes constraints like "t >= 21" through to
    jax.export.symbolic_shape (needed when the traced code branches on a
    minimum length)."""
    flat_args, args_tree = jax.tree_util.tree_flatten(example_args)
    if len(input_names) != len(flat_args):
        raise ValueError(f"{len(flat_args)} traced inputs but "
                         f"{len(input_names)} input_names")

    scope = None
    if dynamic_axes:
        from jax import export as jexport

        sym_cache: dict[str, object] = {}

        def sym(spec: str):
            nonlocal scope
            if spec not in sym_cache:
                if scope is None:
                    (d,) = jexport.symbolic_shape(
                        spec, constraints=list(dim_constraints))
                    scope = d.scope
                else:
                    (d,) = jexport.symbolic_shape(spec, scope=scope)
                sym_cache[spec] = d
            return sym_cache[spec]

        structs = []
        for nm, leaf in zip(input_names, flat_args):
            axes = dynamic_axes.get(nm, {})
            shape = [sym(axes[i]) if i in axes else int(d)
                     for i, d in enumerate(np.shape(leaf))]
            structs.append(jax.ShapeDtypeStruct(
                tuple(shape), np.asarray(leaf).dtype))
        trace_args = jax.tree_util.tree_unflatten(args_tree, structs)
    else:
        trace_args = example_args

    if params is not None:
        closed = jax.make_jaxpr(fn)(params, *trace_args)
        flat_params, _ = jax.tree_util.tree_flatten(params)
        n_params = len(flat_params)
    else:
        closed = jax.make_jaxpr(fn)(*trace_args)
        flat_params, n_params = [], 0

    b = OnnxBuilder()
    names = []
    invars = closed.jaxpr.invars
    for i, leaf in enumerate(flat_params):
        names.append(b.const(np.asarray(leaf), "p"))
    names.extend(input_names)
    if dynamic_axes:
        # bind dim variables from input shapes: a plain axis `v` binds
        # directly to Shape(input)[axis]; a single-term axis `k*v` binds
        # v = Shape(input)[axis] // k (e.g. RMVPE's 32-divisible frame
        # axis declared as "32*t", or sine noise at "upp*t")
        def solve(d):
            var = _dim_to_var(d)
            if var is not None:
                return var, 1
            terms = _dim_sorted_terms(d)
            if len(terms) == 1:
                term, coeff = terms[0]
                fs = _term_factors(term)
                if len(fs) == 1 and fs[0][1] == 1 and coeff > 1:
                    fvar, _, _ = _factor_parts(fs[0][0])
                    if fvar is not None:
                        return fvar, int(coeff)
            return None, None

        for i, nm in enumerate(input_names):
            aval = invars[n_params + i].aval
            shp = None
            for ax, d in enumerate(aval.shape):
                if _is_static_dim(d):
                    continue
                var, k = solve(d)
                if var is None or var in b.dim_vars:
                    continue
                if shp is None:
                    shp = b.add("Shape", [nm])
                v = b.add("Gather",
                          [shp, b.const(np.asarray(ax, np.int64))], axis=0)
                if k != 1:
                    v = b.add("Div",
                              [v, b.const(np.asarray(k, np.int64))])
                b.dim_vars[var] = v
                if k == 1:
                    b._dim_cache[str(d)] = v
    outs = _translate_jaxpr(b, closed.jaxpr, closed.consts, names)

    out_nodes = []
    final_names = []
    for o, want in zip(outs, output_names):
        if o in b.initializers or o in input_names:
            o = b.add("Identity", [o])  # outputs must be node-produced
        # rename the producing node's output to the requested name
        for nd in b.nodes:
            nd.output = [want if x == o else x for x in nd.output]
            nd.input = [want if x == o else x for x in nd.input]
        final_names.append(want)

    graph_inputs = [
        _value_info(nm, aval=invars[n_params + i].aval)
        for i, nm in enumerate(input_names)]
    graph_outputs = [
        _value_info(nm, aval=v.aval)
        for nm, v in zip(output_names, closed.jaxpr.outvars)]

    g = op.GraphProto(
        name="main", node=b.nodes,
        initializer=[op.tensor_from_array(v, k)
                     for k, v in b.initializers.items()],
        input=graph_inputs, output=graph_outputs)
    model = op.ModelProto(
        ir_version=8, producer_name=producer, producer_version="0.1",
        graph=g, opset_import=[op.OperatorSetIdProto(version=opset)],
        metadata_props=[op.StringStringEntryProto(key=k, value=v)
                        for k, v in (metadata or {}).items()])
    return model
