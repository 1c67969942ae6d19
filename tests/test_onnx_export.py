"""jaxpr -> ONNX exporter, verified by round-tripping through the JAX ONNX
executor: export fn to a ModelProto (through real serialized bytes), run it
with OnnxGraph, compare against calling fn directly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.interop import onnx_proto as op
from rvc_maker_tpu.interop.onnx_export import export_onnx
from rvc_maker_tpu.interop.onnx_run import OnnxGraph

RS = np.random.RandomState(0)


def roundtrip(fn, example_args, params=None, n_out=1):
    names = [f"in{i}" for i in range(len(jax.tree_util.tree_leaves(
        example_args)))]
    onames = [f"out{i}" for i in range(n_out)]
    model = export_onnx(fn, example_args, params=params,
                        input_names=names, output_names=onames)
    g = OnnxGraph(op.decode(op.ModelProto, op.encode(model)))
    flat = jax.tree_util.tree_leaves(example_args)
    outs = g.run(dict(zip(names, flat)))
    if params is not None:
        ref = fn(params, *example_args)
    else:
        ref = fn(*example_args)
    refs = ref if isinstance(ref, (tuple, list)) else [ref]
    for got, want in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
    return model


def test_elementwise_chain():
    def f(x, y):
        return jnp.tanh(x) * jax.nn.sigmoid(y) + jnp.sqrt(jnp.abs(x)) - 2.0

    x = RS.randn(3, 5).astype(np.float32)
    y = RS.randn(3, 5).astype(np.float32)
    roundtrip(f, (x, y))


def test_reductions_broadcast_where():
    def f(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        z = jnp.where(x > mu, x, -x)
        return jnp.sum(z, axis=0), jnp.max(z, axis=(0, 1))

    x = RS.randn(4, 6, 3).astype(np.float32)
    roundtrip(f, (x,), n_out=2)


def test_matmul_and_dot_general():
    def f(a, c):
        plain = a @ c                      # (B, T, H) @ (H, K)
        btc = jnp.einsum("bth,bsh->bts", a, a)  # batched, contracted last
        return plain, btc

    a = RS.randn(2, 5, 4).astype(np.float32)
    c = RS.randn(4, 3).astype(np.float32)
    roundtrip(f, (a, c), n_out=2)


def test_conv1d_same_and_transposed():
    from rvc_maker_tpu.ops.nn import conv1d, conv_transpose1d

    w = RS.randn(5, 4, 8).astype(np.float32) * 0.2
    wt = RS.randn(6, 8, 4).astype(np.float32) * 0.2
    b = RS.randn(8).astype(np.float32)

    def f(x):
        y = conv1d(x, w, b, padding=2, dilation=1)
        z = conv_transpose1d(y, wt, None, stride=4, padding=2,
                             output_padding=1)
        return z

    x = RS.randn(2, 20, 4).astype(np.float32)
    roundtrip(f, (x,))


def test_grouped_dilated_conv():
    from rvc_maker_tpu.ops.nn import conv1d

    w = RS.randn(3, 2, 8).astype(np.float32)

    def f(x):
        return conv1d(x, w, padding=3, dilation=3, groups=4)

    x = RS.randn(1, 17, 8).astype(np.float32)
    roundtrip(f, (x,))


def test_cumsum_mod_sin_phase_accumulation():
    """The SineGen idiom: cumsum + fmod + sin."""
    def f(f0):
        rad = jnp.cumsum(f0 / 16000.0, axis=1)
        rad = jnp.mod(rad, 1.0)
        return jnp.sin(2 * np.pi * rad)

    f0 = np.abs(RS.randn(2, 50)).astype(np.float32) * 200
    roundtrip(f, (f0,))


def test_embedding_gather_and_iota_mask():
    from rvc_maker_tpu.ops.nn import sequence_mask

    table = RS.randn(10, 16).astype(np.float32)

    def f(ids, lengths):
        g = jnp.take(table, ids, axis=0)
        mask = sequence_mask(lengths, 7)
        return g, mask.astype(np.float32)

    ids = np.array([3, 7], np.int32)
    lengths = np.array([4, 6], np.int32)
    roundtrip(f, (ids, lengths), n_out=2)


def test_params_become_initializers():
    params = {"w": RS.randn(4, 3).astype(np.float32),
              "b": RS.randn(3).astype(np.float32)}

    def f(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = RS.randn(5, 4).astype(np.float32)
    model = roundtrip(f, (x,), params=params)
    g = OnnxGraph(model)
    assert g.input_names == ["in0"]
    assert len(g.initializers) >= 2


def test_metadata_and_jit_of_exported_graph():
    def f(x):
        return jax.nn.softmax(x, axis=-1)

    x = RS.randn(2, 7).astype(np.float32)
    model = export_onnx(f, (x,), input_names=["x"], output_names=["y"],
                        metadata={"model_info": '{"sr": 40000}'})
    g = OnnxGraph(model)
    assert g.metadata["model_info"] == '{"sr": 40000}'
    fn = g.jit()
    np.testing.assert_allclose(np.asarray(fn(x)[0]), np.asarray(f(x)),
                               rtol=1e-5, atol=1e-6)


def test_unsupported_primitive_raises():
    def f(x):
        return jnp.fft.rfft(x).real

    x = RS.randn(16).astype(np.float32)
    with pytest.raises(NotImplementedError, match="fft"):
        export_onnx(f, (x,), input_names=["x"], output_names=["y"])


# -- dynamic axes (jax shape polymorphism -> runtime ONNX shape math) --------

def dyn_roundtrip(fn, example_args, dynamic_axes, run_shapes, n_out=1,
                  dim_constraints=()):
    """Export once with symbolic axes, execute at several concrete shapes,
    compare each against calling fn directly (serialization included)."""
    names = [f"in{i}" for i in range(len(example_args))]
    onames = [f"out{i}" for i in range(n_out)]
    model = export_onnx(
        fn, example_args, input_names=names, output_names=onames,
        dynamic_axes={names[i]: ax for i, ax in dynamic_axes.items()},
        dim_constraints=dim_constraints)
    g = OnnxGraph(op.decode(op.ModelProto, op.encode(model)))
    for shapes in run_shapes:
        args = [np.asarray(RS.randn(*s), np.float32) for s in shapes]
        ref = fn(*[jnp.asarray(a) for a in args])
        ref = [ref] if n_out == 1 else list(ref)
        outs = g.run(dict(zip(names, args)))
        for r, o in zip(ref, outs):
            r, o = np.asarray(r), np.asarray(o)
            assert r.shape == o.shape, (shapes, r.shape, o.shape)
            np.testing.assert_allclose(r, o, rtol=1e-4, atol=1e-4)


def test_dynamic_shape_math_ops():
    """reshape / iota / pad+negative-slice / dot_general / cumsum over a
    symbolic axis: one graph, three lengths."""
    def fn(x, w):
        b, t, c = x.shape
        y = x.reshape(b, t * c)
        y = y + jnp.arange(y.shape[1], dtype=x.dtype)
        y = jnp.pad(y, ((0, 0), (2, 3)))[:, 1:-1]
        y = y[:, : t * c].reshape(b, t, c)
        z = jnp.einsum("btc,cd->btd", y, w)
        return z, jnp.cumsum(y, axis=1)

    dyn_roundtrip(fn, (np.zeros((2, 8, 4), np.float32),
                       np.zeros((4, 4), np.float32)),
                  {0: {1: "t"}},
                  [((2, 8, 4), (4, 4)), ((2, 13, 4), (4, 4)),
                   ((2, 30, 4), (4, 4))], n_out=2)


def test_dynamic_transposed_conv():
    """lhs-dilated (transposed) conv over a symbolic time axis — the
    zero-stuffing Reshape/Slice must use runtime shapes."""
    w = np.asarray(RS.randn(4, 4, 3), np.float32)

    def fn(x):
        z = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1,), padding=((1, 1),),
            lhs_dilation=(2,), dimension_numbers=("NCH", "OIH", "NCH"))
        return jnp.tanh(z)

    dyn_roundtrip(fn, (np.zeros((2, 4, 8), np.float32),), {0: {2: "t"}},
                  [((2, 4, 8),), ((2, 4, 19),)])


def test_dynamic_dim_as_value_and_mean():
    """shape[i] used as a VALUE (normalization by length) plus a reduce —
    exercises the dim_as_value primitive lowering."""
    def fn(x):
        t = x.shape[1]
        return x.sum(axis=1) / t, jnp.broadcast_to(
            jnp.float32(t), (x.shape[0],))

    dyn_roundtrip(fn, (np.zeros((3, 8), np.float32),), {0: {1: "t"}},
                  [((3, 8),), ((3, 21),)], n_out=2)


def test_dynamic_expression_axis_binding():
    """A second input whose axis is an EXPRESSION of the first's (k*t):
    binds through the plain axis, arithmetic lowered to ONNX ops."""
    def fn(x, up):
        b, t = x.shape
        r = jnp.repeat(x, 4, axis=1)
        return r + up

    dyn_roundtrip(fn, (np.zeros((2, 8), np.float32),
                       np.zeros((2, 32), np.float32)),
                  {0: {1: "t"}, 1: {1: "4*t"}},
                  [((2, 8), (2, 32)), ((2, 11), (2, 44))])


def test_dynamic_scan_lowers_to_loop():
    """lax.scan over a symbolic length becomes an ONNX Loop (forward and
    reverse); one graph serves multiple sequence lengths."""
    W = np.asarray(RS.randn(4, 4), np.float32) * 0.3

    def fn(x):
        def step(h, xt):
            h = jnp.tanh(xt + h @ jnp.asarray(W))
            return h, h

        h0 = jnp.zeros((x.shape[0], 4), x.dtype)
        xs = jnp.swapaxes(x, 0, 1)
        hT, ys = jax.lax.scan(step, h0, xs)
        hR, ysR = jax.lax.scan(step, h0, xs, reverse=True)
        return hT, jnp.swapaxes(ys, 0, 1), hR, jnp.swapaxes(ysR, 0, 1)

    model = export_onnx(fn, (np.zeros((2, 8, 4), np.float32),),
                        input_names=["x"],
                        output_names=["hT", "ys", "hR", "ysR"],
                        dynamic_axes={"x": {1: "t"}})
    assert any(n.op_type == "Loop" for n in model.graph.node)
    # the ONNX IR requires subgraph inputs/outputs to carry type info —
    # onnx.checker/onnxruntime reject untyped ones (iter must be int64,
    # cond bool, carries/ys their traced dtypes)
    for n in model.graph.node:
        if n.op_type != "Loop":
            continue
        body = next(a.g for a in n.attribute if a.name == "body")
        ios = list(body.input) + list(body.output)
        assert len(body.input) >= 2 and len(body.output) >= 1
        for vi in ios:
            assert vi.type is not None and vi.type.tensor_type is not None, \
                f"untyped Loop body io {vi.name}"
            assert vi.type.tensor_type.elem_type > 0
        assert body.input[0].type.tensor_type.elem_type == op._NP_TO_ONNX["int64"]
        assert body.input[1].type.tensor_type.elem_type == op._NP_TO_ONNX["bool"]
        assert body.output[0].type.tensor_type.elem_type == op._NP_TO_ONNX["bool"]
    g = OnnxGraph(op.decode(op.ModelProto, op.encode(model)))
    for T in (8, 13):
        xt = np.asarray(RS.randn(2, T, 4), np.float32)
        ref = [np.asarray(o) for o in fn(jnp.asarray(xt))]
        got = [np.asarray(o) for o in g.run({"x": xt})]
        for r, q in zip(ref, got):
            assert r.shape == q.shape
            np.testing.assert_allclose(r, q, rtol=1e-5, atol=1e-5)


def test_dynamic_composite_axis_binding():
    """An input whose only symbolic axis is k*v (no plain-v input) still
    binds v via Shape // k."""
    def fn(x):
        b, t4 = x.shape
        t = t4 // 4
        return x.reshape(b, t, 4).sum(axis=2)

    model = export_onnx(fn, (np.zeros((2, 32), np.float32),),
                        input_names=["x"], output_names=["y"],
                        dynamic_axes={"x": {1: "4*t"}})
    g = OnnxGraph(op.decode(op.ModelProto, op.encode(model)))
    for T4 in (32, 48):
        xt = np.asarray(RS.randn(2, T4), np.float32)
        ref = np.asarray(fn(jnp.asarray(xt)))
        got = np.asarray(g.run({"x": xt})[0])
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)
