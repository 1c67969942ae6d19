"""JAX ONNX executor vs torch semantics.

Graphs are hand-built with the field layout real exporters emit
(torch.onnx legacy exporter conventions), weights taken from torch
modules, outputs compared against running the torch module directly."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rvc_maker_tpu.interop import onnx_proto as op
from rvc_maker_tpu.interop.onnx_run import OnnxGraph


def node(op_type, inputs, outputs, **attrs):
    n = op.NodeProto(op_type=op_type, input=list(inputs),
                     output=list(outputs))
    for k, v in attrs.items():
        a = op.AttributeProto(name=k)
        if isinstance(v, float):
            a.type, a.f = op.ATTR_FLOAT, v
        elif isinstance(v, bool) or isinstance(v, int):
            a.type, a.i = op.ATTR_INT, int(v)
        elif isinstance(v, str):
            a.type, a.s = op.ATTR_STRING, v.encode()
        elif isinstance(v, np.ndarray):
            a.type, a.t = op.ATTR_TENSOR, op.tensor_from_array(v)
        elif isinstance(v, (list, tuple)) and v and isinstance(v[0], float):
            a.type, a.floats = op.ATTR_FLOATS, list(v)
        elif isinstance(v, (list, tuple)):
            a.type, a.ints = op.ATTR_INTS, [int(i) for i in v]
        else:
            raise TypeError(type(v))
        n.attribute.append(a)
    return n


def graph(nodes, inputs, outputs, initializers=None):
    g = op.GraphProto(
        name="t", node=nodes,
        input=[op.ValueInfoProto(name=i) for i in inputs],
        output=[op.ValueInfoProto(name=o) for o in outputs],
        initializer=[op.tensor_from_array(v, k)
                     for k, v in (initializers or {}).items()])
    m = op.ModelProto(ir_version=8, graph=g,
                      opset_import=[op.OperatorSetIdProto(version=17)])
    # roundtrip through bytes so the executor exercises the codec too
    return OnnxGraph(op.decode(op.ModelProto, op.encode(m)))


def run1(g, **feeds):
    return np.asarray(g.run(feeds)[0])


RS = np.random.RandomState(0)


# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,pad,dil,groups", [
    (1, 0, 1, 1), (2, 3, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4)])
def test_conv1d(stride, pad, dil, groups):
    tc = torch.nn.Conv1d(8, 12, 5, stride=stride, padding=pad,
                         dilation=dil, groups=groups)
    x = torch.randn(2, 8, 37)
    with torch.no_grad():
        ref = tc(x).numpy()
    g = graph([node("Conv", ["x", "w", "b"], ["y"],
                    strides=[stride], pads=[pad, pad], dilations=[dil],
                    group=groups, kernel_shape=[5])],
              ["x"], ["y"],
              {"w": tc.weight.detach().numpy(), "b": tc.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv2d_same_upper():
    tc = torch.nn.Conv2d(3, 6, 3, bias=False)
    x = torch.randn(1, 3, 12, 14)
    with torch.no_grad():
        ref = tc(F.pad(x, (1, 1, 1, 1))).numpy()
    g = graph([node("Conv", ["x", "w"], ["y"], auto_pad="SAME_UPPER",
                    strides=[1, 1], kernel_shape=[3, 3])],
              ["x"], ["y"], {"w": tc.weight.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,pad,outpad,groups", [
    (2, 0, 0, 1), (4, 3, 1, 1), (2, 1, 0, 3)])
def test_conv_transpose1d(stride, pad, outpad, groups):
    tc = torch.nn.ConvTranspose1d(6, 9 if groups == 1 else 6, 7,
                                  stride=stride, padding=pad,
                                  output_padding=outpad, groups=groups)
    x = torch.randn(2, 6, 25)
    with torch.no_grad():
        ref = tc(x).numpy()
    g = graph([node("ConvTranspose", ["x", "w", "b"], ["y"],
                    strides=[stride], pads=[pad, pad],
                    output_padding=[outpad], group=groups,
                    kernel_shape=[7])],
              ["x"], ["y"],
              {"w": tc.weight.detach().numpy(), "b": tc.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose2d():
    tc = torch.nn.ConvTranspose2d(4, 5, (3, 5), stride=(2, 3),
                                  padding=(1, 2), output_padding=(1, 0))
    x = torch.randn(1, 4, 9, 11)
    with torch.no_grad():
        ref = tc(x).numpy()
    g = graph([node("ConvTranspose", ["x", "w", "b"], ["y"],
                    strides=[2, 3], pads=[1, 2, 1, 2],
                    output_padding=[1, 0], kernel_shape=[3, 5])],
              ["x"], ["y"],
              {"w": tc.weight.detach().numpy(), "b": tc.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref,
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_instancenorm_groupnorm_layernorm():
    x = torch.randn(3, 8, 10)
    bn = torch.nn.BatchNorm1d(8).eval()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    with torch.no_grad():
        ref = bn(x).numpy()
    g = graph([node("BatchNormalization", ["x", "s", "b", "m", "v"], ["y"],
                    epsilon=1e-5)],
              ["x"], ["y"],
              {"s": bn.weight.detach().numpy(), "b": bn.bias.detach().numpy(),
               "m": bn.running_mean.numpy(), "v": bn.running_var.numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-4,
                               atol=1e-5)

    inorm = torch.nn.InstanceNorm1d(8, affine=True)
    with torch.no_grad():
        inorm.weight.normal_()
        inorm.bias.normal_()
        ref = inorm(x).numpy()
    g = graph([node("InstanceNormalization", ["x", "s", "b"], ["y"],
                    epsilon=1e-5)],
              ["x"], ["y"], {"s": inorm.weight.detach().numpy(),
                             "b": inorm.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-4,
                               atol=1e-5)

    gn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        gn.weight.normal_()
        gn.bias.normal_()
        ref = gn(x).numpy()
    g = graph([node("GroupNormalization", ["x", "s", "b"], ["y"],
                    num_groups=4, epsilon=1e-5)],
              ["x"], ["y"], {"s": gn.weight.detach().numpy(),
                             "b": gn.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-4,
                               atol=1e-5)

    ln = torch.nn.LayerNorm(10)
    with torch.no_grad():
        ln.weight.normal_()
        ln.bias.normal_()
        ref = ln(x).numpy()
    g = graph([node("LayerNormalization", ["x", "s", "b"], ["y"],
                    axis=-1, epsilon=1e-5)],
              ["x"], ["y"], {"s": ln.weight.detach().numpy(),
                             "b": ln.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-4,
                               atol=1e-5)


def test_pools():
    x = torch.randn(2, 3, 17, 19)
    ref = F.max_pool2d(x, (3, 3), stride=2, padding=1).numpy()
    g = graph([node("MaxPool", ["x"], ["y"], kernel_shape=[3, 3],
                    strides=[2, 2], pads=[1, 1, 1, 1])], ["x"], ["y"])
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-5,
                               atol=1e-6)

    ref = F.avg_pool2d(x, (2, 2), stride=2).numpy()
    g = graph([node("AveragePool", ["x"], ["y"], kernel_shape=[2, 2],
                    strides=[2, 2])], ["x"], ["y"])
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-5,
                               atol=1e-6)

    ref = x.mean(dim=(2, 3), keepdim=True).numpy()
    g = graph([node("GlobalAveragePool", ["x"], ["y"])], ["x"], ["y"])
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-5,
                               atol=1e-6)


def test_gemm_matmul():
    lin = torch.nn.Linear(7, 5)
    x = torch.randn(4, 7)
    with torch.no_grad():
        ref = lin(x).numpy()
    g = graph([node("Gemm", ["x", "w", "b"], ["y"], alpha=1.0, beta=1.0,
                    transB=1)],
              ["x"], ["y"],
              {"w": lin.weight.detach().numpy(),
               "b": lin.bias.detach().numpy()})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-4,
                               atol=1e-5)

    a = RS.randn(2, 3, 4, 5).astype(np.float32)
    b = RS.randn(5, 6).astype(np.float32)
    g = graph([node("MatMul", ["a", "b"], ["y"])], ["a", "b"], ["y"])
    np.testing.assert_allclose(np.asarray(g.run({"a": a, "b": b})[0]),
                               a @ b, rtol=1e-5, atol=1e-5)


def test_resize_nearest_and_linear():
    x = torch.randn(1, 4, 10)
    ref = F.interpolate(x, scale_factor=2, mode="nearest").numpy()
    g = graph([node("Resize", ["x", "", "scales"], ["y"], mode="nearest",
                    coordinate_transformation_mode="asymmetric",
                    nearest_mode="floor")],
              ["x"], ["y"],
              {"scales": np.array([1, 1, 2], np.float32)})
    np.testing.assert_allclose(run1(g, x=x.numpy()), ref, rtol=1e-5,
                               atol=1e-6)

    x2 = torch.randn(1, 2, 8, 8)
    ref = F.interpolate(x2, scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    g = graph([node("Resize", ["x", "", "scales"], ["y"], mode="linear",
                    coordinate_transformation_mode="half_pixel")],
              ["x"], ["y"],
              {"scales": np.array([1, 1, 2, 2], np.float32)})
    np.testing.assert_allclose(run1(g, x=x2.numpy()), ref, rtol=1e-4,
                               atol=1e-5)


def test_shape_pipeline_stays_static_under_jit():
    """Shape -> Gather -> Unsqueeze -> Concat -> Reshape: the classic
    torch.onnx dynamic-reshape idiom must trace statically."""
    nodes = [
        node("Shape", ["x"], ["shp"]),
        node("Gather", ["shp", "i0"], ["d0"], axis=0),
        node("Unsqueeze", ["d0", "ax0"], ["d0u"]),
        node("Concat", ["d0u", "minus1"], ["tgt"], axis=0),
        node("Reshape", ["x", "tgt"], ["y"]),
        node("Relu", ["y"], ["z"]),
    ]
    g = graph(nodes, ["x"], ["z"],
              {"i0": np.array(0, np.int64),
               "ax0": np.array([0], np.int64),
               "minus1": np.array([-1], np.int64)})
    x = RS.randn(3, 4, 5).astype(np.float32)
    out = run1(g, x=x)
    np.testing.assert_allclose(out, np.maximum(x.reshape(3, -1), 0))
    fn = g.jit()
    out2 = np.asarray(fn(x)[0])
    np.testing.assert_allclose(out2, out, rtol=1e-6, atol=1e-6)


def test_slice_pad_split_expand_where():
    x = RS.randn(4, 10, 6).astype(np.float32)
    # Slice with negative step on axis 1
    g = graph([node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
              ["x"], ["y"],
              {"st": np.array([-1], np.int64),
               "en": np.array([-(2**63)], np.int64),
               "ax": np.array([1], np.int64),
               "sp": np.array([-2], np.int64)})
    np.testing.assert_array_equal(run1(g, x=x), x[:, ::-1, :][:, ::2, :])

    # reflect Pad (opset-11 style pads input)
    t = torch.from_numpy(x)
    ref = F.pad(t, (2, 3), mode="reflect").numpy()
    g = graph([node("Pad", ["x", "pads"], ["y"], mode="reflect")],
              ["x"], ["y"],
              {"pads": np.array([0, 0, 2, 0, 0, 3], np.int64)})
    np.testing.assert_array_equal(run1(g, x=x), ref)

    # Split sizes input
    g = graph([node("Split", ["x", "sz"], ["a", "b"], axis=1)],
              ["x"], ["a", "b"], {"sz": np.array([3, 7], np.int64)})
    outs = g.run({"x": x})
    np.testing.assert_array_equal(np.asarray(outs[0]), x[:, :3])
    np.testing.assert_array_equal(np.asarray(outs[1]), x[:, 3:])

    # Expand + Where
    c = (x[..., :1] > 0)
    g = graph([node("Expand", ["c", "shape"], ["ce"]),
               node("Where", ["ce", "x", "negx"], ["y"])],
              ["c", "x", "negx"], ["y"],
              {"shape": np.array([4, 10, 6], np.int64)})
    out = np.asarray(g.run({"c": c, "x": x, "negx": -x})[0])
    np.testing.assert_array_equal(out, np.where(c, x, -x))


def test_reduce_argmax_cumsum_cast():
    x = RS.randn(3, 5, 7).astype(np.float32)
    g = graph([node("ReduceMean", ["x"], ["y"], axes=[-1], keepdims=1)],
              ["x"], ["y"])
    np.testing.assert_allclose(run1(g, x=x), x.mean(-1, keepdims=True),
                               rtol=1e-5, atol=1e-6)
    g = graph([node("ArgMax", ["x"], ["y"], axis=1, keepdims=0)],
              ["x"], ["y"])
    np.testing.assert_array_equal(run1(g, x=x), x.argmax(1))
    g = graph([node("CumSum", ["x", "ax"], ["y"])], ["x"], ["y"],
              {"ax": np.array(2, np.int64)})
    np.testing.assert_allclose(run1(g, x=x), np.cumsum(x, 2), rtol=1e-5,
                               atol=1e-5)
    g = graph([node("Cast", ["x"], ["y"], to=op.INT64)], ["x"], ["y"])
    assert run1(g, x=x).dtype == np.int64


def test_unknown_op_raises():
    g_nodes = [node("TotallyMadeUpOp", ["x"], ["y"])]
    with pytest.raises(NotImplementedError, match="TotallyMadeUpOp"):
        graph(g_nodes, ["x"], ["y"])


def test_small_cnn_end_to_end_jit():
    """A little conv->bn->relu->pool->gemm net vs torch, via jit()."""
    torch.manual_seed(3)
    net = torch.nn.Sequential(
        torch.nn.Conv2d(1, 4, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2), torch.nn.Flatten(),
        torch.nn.Linear(4 * 4 * 4, 3)).eval()
    x = torch.randn(2, 1, 8, 8)
    with torch.no_grad():
        ref = net(x).numpy()
    conv, lin = net[0], net[4]
    nodes = [
        node("Conv", ["x", "cw", "cb"], ["c"], strides=[1, 1],
             pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
        node("Relu", ["c"], ["r"]),
        node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        node("Flatten", ["p"], ["f"], axis=1),
        node("Gemm", ["f", "lw", "lb"], ["y"], transB=1),
    ]
    g = graph(nodes, ["x"], ["y"],
              {"cw": conv.weight.detach().numpy(),
               "cb": conv.bias.detach().numpy(),
               "lw": lin.weight.detach().numpy(),
               "lb": lin.bias.detach().numpy()})
    fn = g.jit()
    np.testing.assert_allclose(np.asarray(fn(x.numpy())[0]), ref,
                               rtol=1e-4, atol=1e-5)


# -- recurrent ops (GRU / LSTM, torch weight packing) ------------------------

def _gru_onnx_weights(m, dirs):
    """Pack torch nn.GRU params the way torch.onnx does: gate reorder
    (r,z,n) -> (z,r,n), per-direction stacking, linear_before_reset=1."""
    Ws, Rs, Bs = [], [], []
    for d in range(dirs):
        sfx = "_reverse" if d == 1 else ""
        H = m.hidden_size

        def reorder(w):
            return np.concatenate([w[H:2*H], w[:H], w[2*H:]], 0)

        wi = reorder(getattr(m, f"weight_ih_l0{sfx}").detach().numpy())
        wh = reorder(getattr(m, f"weight_hh_l0{sfx}").detach().numpy())
        bi = reorder(getattr(m, f"bias_ih_l0{sfx}").detach().numpy())
        bh = reorder(getattr(m, f"bias_hh_l0{sfx}").detach().numpy())
        Ws.append(wi); Rs.append(wh); Bs.append(np.concatenate([bi, bh]))
    return (np.stack(Ws).astype(np.float32),
            np.stack(Rs).astype(np.float32),
            np.stack(Bs).astype(np.float32))


def _lstm_onnx_weights(m, dirs):
    """torch LSTM gates (i,f,g,o) -> ONNX (i,o,f,c)."""
    Ws, Rs, Bs = [], [], []
    for d in range(dirs):
        sfx = "_reverse" if d == 1 else ""
        H = m.hidden_size

        def reorder(w):
            return np.concatenate([w[:H], w[3*H:], w[H:2*H], w[2*H:3*H]], 0)

        wi = reorder(getattr(m, f"weight_ih_l0{sfx}").detach().numpy())
        wh = reorder(getattr(m, f"weight_hh_l0{sfx}").detach().numpy())
        bi = reorder(getattr(m, f"bias_ih_l0{sfx}").detach().numpy())
        bh = reorder(getattr(m, f"bias_hh_l0{sfx}").detach().numpy())
        Ws.append(wi); Rs.append(wh); Bs.append(np.concatenate([bi, bh]))
    return (np.stack(Ws).astype(np.float32),
            np.stack(Rs).astype(np.float32),
            np.stack(Bs).astype(np.float32))


@pytest.mark.parametrize("bidir", [False, True])
def test_gru_matches_torch(bidir):
    """The reference rmvpe.onnx BiGRU shape: torch.onnx emits GRU with
    linear_before_reset=1 and (z,r,n) gate packing."""
    torch.manual_seed(0)
    I, H, S, B = 6, 5, 9, 3
    m = torch.nn.GRU(I, H, bidirectional=bidir)
    dirs = 2 if bidir else 1
    W, R, Bb = _gru_onnx_weights(m, dirs)
    x = RS.randn(S, B, I).astype(np.float32)
    g = graph([node("GRU", ["x", "W", "R", "B"], ["Y", "Yh"],
                    hidden_size=H, linear_before_reset=1,
                    direction="bidirectional" if bidir else "forward")],
              ["x"], ["Y", "Yh"], {"W": W, "R": R, "B": Bb})
    outs = g.run({"x": x})
    Y, Yh = np.asarray(outs[0]), np.asarray(outs[1])
    with torch.no_grad():
        yt, ht = m(torch.from_numpy(x))
    # ONNX Y: (seq, dirs, batch, H); torch: (seq, batch, dirs*H)
    yt_onnx = yt.numpy().reshape(S, B, dirs, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(Y, yt_onnx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Yh, ht.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("direction", ["forward", "reverse",
                                       "bidirectional"])
def test_lstm_matches_torch(direction):
    torch.manual_seed(1)
    I, H, S, B = 4, 7, 8, 2
    bidir = direction == "bidirectional"
    m = torch.nn.LSTM(I, H, bidirectional=bidir)
    dirs = 2 if bidir else 1
    W, R, Bb = _lstm_onnx_weights(m, dirs)
    x = RS.randn(S, B, I).astype(np.float32)
    g = graph([node("LSTM", ["x", "W", "R", "B"], ["Y", "Yh", "Yc"],
                    hidden_size=H, direction=direction)],
              ["x"], ["Y", "Yh", "Yc"], {"W": W, "R": R, "B": Bb})
    outs = g.run({"x": x})
    Y, Yh, Yc = (np.asarray(o) for o in outs)
    xin = x[::-1].copy() if direction == "reverse" else x
    with torch.no_grad():
        yt, (ht, ct) = m(torch.from_numpy(xin))
    ytn = yt.numpy()
    if direction == "reverse":
        ytn = ytn[::-1]
    yt_onnx = ytn.reshape(S, B, dirs, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(Y, yt_onnx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Yh, ht.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Yc, ct.numpy(), rtol=1e-5, atol=1e-5)


def test_gru_under_jit():
    """RNN ops must trace (the f0 .onnx path jit-compiles graphs)."""
    import jax, jax.numpy as jnp

    torch.manual_seed(2)
    I, H, S, B = 3, 4, 6, 2
    m = torch.nn.GRU(I, H)
    W, R, Bb = _gru_onnx_weights(m, 1)
    x = RS.randn(S, B, I).astype(np.float32)
    g = graph([node("GRU", ["x", "W", "R", "B"], ["Y"],
                    hidden_size=H, linear_before_reset=1)],
              ["x"], ["Y"], {"W": W, "R": R, "B": Bb})
    eager = np.asarray(g.run({"x": x})[0])
    jitted = np.asarray(jax.jit(lambda a: g.run({"x": a})[0])(
        jnp.asarray(x)))
    np.testing.assert_allclose(jitted, eager, rtol=1e-5, atol=1e-5)


# -- control flow: Loop / If -------------------------------------------------

def subgraph(nodes, inputs, outputs, initializers=None):
    return op.GraphProto(
        name="body", node=nodes,
        input=[op.ValueInfoProto(name=i) for i in inputs],
        output=[op.ValueInfoProto(name=o) for o in outputs],
        initializer=[op.tensor_from_array(v, k)
                     for k, v in (initializers or {}).items()])


def graph_attr(n, name, g):
    a = op.AttributeProto(name=name)
    a.type, a.g = op.ATTR_GRAPH, g
    n.attribute.append(a)
    return n


def test_loop_accumulate_and_scan():
    """x_{i+1} = x_i + step; scan output collects each iterate.  The body
    references `step` from the OUTER scope (ONNX scoping rules)."""
    body = subgraph(
        [node("Add", ["v_in", "step"], ["v_out"]),
         node("Identity", ["cond_in"], ["cond_out"]),
         node("Unsqueeze", ["v_out", "axes0"], ["scan_el"])],
        ["iter", "cond_in", "v_in"], ["cond_out", "v_out", "scan_el"],
        {"axes0": np.asarray([0], np.int64)})
    ln = graph_attr(node("Loop", ["M", "cond", "v0"], ["vf", "scans"]),
                    "body", body)
    g = graph([ln], ["M", "v0"], ["vf", "scans"],
              {"step": np.asarray([1.0, 2.0], np.float32),
               "cond": np.asarray(True)})
    outs = g.run({"M": np.asarray(4, np.int64),
                  "v0": np.zeros(2, np.float32)})
    vf, scans = np.asarray(outs[0]), np.asarray(outs[1])
    np.testing.assert_allclose(vf, [4.0, 8.0])
    # scan: each iteration's v unsqueezed to (1, 2), stacked -> (4, 1, 2)
    np.testing.assert_allclose(scans[:, 0, 0], [1, 2, 3, 4])


def test_loop_early_termination():
    """cond_out goes False once the accumulator passes a threshold."""
    body = subgraph(
        [node("Add", ["v_in", "one"], ["v_out"]),
         node("Less", ["v_out", "limit"], ["cond_out"])],
        ["iter", "cond_in", "v_in"], ["cond_out", "v_out"],
        {"one": np.asarray(1.0, np.float32),
         "limit": np.asarray(3.5, np.float32)})
    ln = graph_attr(node("Loop", ["M", "cond", "v0"], ["vf"]), "body", body)
    g = graph([ln], ["M", "v0"], ["vf"], {"cond": np.asarray(True)})
    vf = run1(g, M=np.asarray(100, np.int64), v0=np.asarray(0.0, np.float32))
    assert vf == 4.0  # stops after producing 4.0 (4.0 < 3.5 is False)


def test_if_branches():
    then_g = subgraph([node("Mul", ["x", "two"], ["o"])], [], ["o"],
                      {"two": np.asarray(2.0, np.float32)})
    else_g = subgraph([node("Neg", ["x"], ["o"])], [], ["o"])
    ifn = node("If", ["c"], ["y"])
    graph_attr(ifn, "then_branch", then_g)
    graph_attr(ifn, "else_branch", else_g)
    g = graph([ifn], ["c", "x"], ["y"])
    assert run1(g, c=np.asarray(True), x=np.asarray(3.0, np.float32)) == 6.0
    assert run1(g, c=np.asarray(False), x=np.asarray(3.0, np.float32)) == -3.0


def test_loop_under_jit_with_shape_trip_count():
    """Trip count derived from Shape() stays concrete under jax tracing,
    so a shape-driven Loop jit-compiles (unrolled at trace time)."""
    import jax, jax.numpy as jnp

    body = subgraph(
        [node("Add", ["acc", "row_sum"], ["acc_out"]),
         node("Identity", ["cond_in"], ["cond_out"])],
        ["iter", "cond_in", "acc"], ["cond_out", "acc_out"])
    shp = node("Shape", ["x"], ["xs"])
    m = node("Gather", ["xs", "zero"], ["M"], axis=0)
    rs = node("ReduceSum", ["x"], ["row_sum"], keepdims=0)
    ln = graph_attr(node("Loop", ["M", "cond", "v0"], ["vf"]), "body", body)
    g = graph([shp, m, rs, ln], ["x", "v0"], ["vf"],
              {"zero": np.asarray(0, np.int64), "cond": np.asarray(True)})
    x = RS.randn(3, 4).astype(np.float32)
    want = 3 * x.sum()
    got_eager = run1(g, x=x, v0=np.asarray(0.0, np.float32))
    got_jit = jax.jit(lambda a: g.run({"x": a, "v0": jnp.float32(0.0)})[0])(
        jnp.asarray(x))
    np.testing.assert_allclose(got_eager, want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_jit), want, rtol=1e-5)


# -- random ops (torch-traced noise) ----------------------------------------

def test_random_normal_deterministic_and_shaped():
    g = graph([node("RandomNormal", [], ["y"], shape=[64, 32],
                    mean=1.5, scale=0.5, dtype=1)], [], ["y"])
    a = run1(g)
    b = run1(g)
    assert a.shape == (64, 32) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # seeded: stable across runs
    assert abs(a.mean() - 1.5) < 0.1 and abs(a.std() - 0.5) < 0.1


def test_random_uniform_like_bounds():
    g = graph([node("RandomUniformLike", ["x"], ["y"], low=2.0, high=3.0)],
              ["x"], ["y"])
    y = run1(g, x=np.zeros((50, 40), np.float32))
    assert y.shape == (50, 40)
    assert y.min() >= 2.0 and y.max() <= 3.0 and y.std() > 0.1


def test_unknown_op_inside_subgraph_rejected_at_load():
    """Op coverage validation must descend into Loop/If bodies so an
    unsupported op fails at load, not mid-run."""
    body = subgraph([node("NotARealOp", ["v_in"], ["v_out"]),
                     node("Identity", ["cond_in"], ["cond_out"])],
                    ["iter", "cond_in", "v_in"], ["cond_out", "v_out"])
    ln = graph_attr(node("Loop", ["M", "cond", "v0"], ["vf"]), "body", body)
    with pytest.raises(NotImplementedError, match="NotARealOp"):
        graph([ln], ["M", "cond", "v0"], ["vf"])
