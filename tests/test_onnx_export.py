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
