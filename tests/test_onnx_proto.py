"""ONNX protobuf codec validated against protoc (the real protobuf
implementation) using the canonical schema subset in tests/data/onnx.proto."""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from rvc_maker_tpu.interop import onnx_proto as op

HERE = os.path.dirname(__file__)
PROTO = os.path.join(HERE, "data", "onnx.proto")


def _sample_model() -> op.ModelProto:
    w = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.5 - 1.0
    b = np.array([-2, 0, 7], dtype=np.int64)
    graph = op.GraphProto(
        name="g",
        node=[
            op.NodeProto(
                op_type="Gemm", name="n0", input=["x", "w"], output=["y"],
                attribute=[
                    op.AttributeProto(name="alpha", type=op.ATTR_FLOAT,
                                      f=1.5),
                    op.AttributeProto(name="transB", type=op.ATTR_INT, i=1),
                    op.AttributeProto(name="axes", type=op.ATTR_INTS,
                                      ints=[0, -1, 3]),
                    op.AttributeProto(name="mode", type=op.ATTR_STRING,
                                      s=b"constant"),
                ]),
            op.NodeProto(op_type="Relu", input=["y"], output=["z"]),
        ],
        initializer=[op.tensor_from_array(w, "w"),
                     op.tensor_from_array(b, "b")],
        input=[op.ValueInfoProto(
            name="x",
            type=op.TypeProto(tensor_type=op.TypeProtoTensor(
                elem_type=op.FLOAT,
                shape=op.TensorShapeProto(dim=[
                    op.TensorShapeDim(dim_param="N"),
                    op.TensorShapeDim(dim_value=4)]))))],
        output=[op.ValueInfoProto(name="z")],
    )
    return op.ModelProto(
        ir_version=8, producer_name="rvc_maker_tpu",
        producer_version="0.1", graph=graph,
        opset_import=[op.OperatorSetIdProto(version=17)],
        metadata_props=[op.StringStringEntryProto(
            key="model_info", value='{"sr": 40000}')],
    )


def test_roundtrip_self():
    m = _sample_model()
    data = op.encode(m)
    m2 = op.decode(op.ModelProto, data)
    assert m2.ir_version == 8
    assert m2.producer_name == "rvc_maker_tpu"
    assert m2.opset_import[0].version == 17
    assert m2.metadata_props[0].key == "model_info"
    g = m2.graph
    assert [n.op_type for n in g.node] == ["Gemm", "Relu"]
    attrs = {a.name: a for a in g.node[0].attribute}
    assert attrs["alpha"].f == pytest.approx(1.5)
    assert attrs["transB"].i == 1
    assert attrs["axes"].ints == [0, -1, 3]
    assert attrs["mode"].s == b"constant"
    w = op.array_from_tensor(g.initializer[0])
    np.testing.assert_array_equal(
        w, np.arange(12, dtype=np.float32).reshape(3, 4) * 0.5 - 1.0)
    b = op.array_from_tensor(g.initializer[1])
    np.testing.assert_array_equal(b, [-2, 0, 7])
    assert g.input[0].type.tensor_type.shape.dim[0].dim_param == "N"
    assert g.input[0].type.tensor_type.shape.dim[1].dim_value == 4


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc missing")
def test_wire_format_matches_protoc():
    """encode -> protoc --decode -> protoc --encode -> decode roundtrips,
    proving our writer emits real protobuf and our reader accepts protoc's
    byte stream (field packing choices may legally differ)."""
    m = _sample_model()
    data = op.encode(m)
    with tempfile.TemporaryDirectory() as td:
        textpb = subprocess.run(
            ["protoc", f"-I{os.path.dirname(PROTO)}", "--decode=onnx.ModelProto",
             PROTO], input=data, stdout=subprocess.PIPE, check=True).stdout
        assert b"rvc_maker_tpu" in textpb
        assert b"op_type: \"Gemm\"" in textpb
        reencoded = subprocess.run(
            ["protoc", f"-I{os.path.dirname(PROTO)}", "--encode=onnx.ModelProto",
             PROTO], input=textpb, stdout=subprocess.PIPE, check=True).stdout
    m2 = op.decode(op.ModelProto, reencoded)
    assert m2.ir_version == m.ir_version
    assert [n.op_type for n in m2.graph.node] == ["Gemm", "Relu"]
    attrs = {a.name: a for a in m2.graph.node[0].attribute}
    assert attrs["axes"].ints == [0, -1, 3]
    assert attrs["transB"].i == 1
    np.testing.assert_array_equal(
        op.array_from_tensor(m2.graph.initializer[0]),
        op.array_from_tensor(m.graph.initializer[0]))


def test_google_protobuf_runtime_roundtrip(tmp_path):
    """Decode our bytes with the google.protobuf runtime via a descriptor
    pool built from tests/data/onnx.proto (independent of protoc CLI)."""
    gp = pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    # compile the .proto to a FileDescriptorSet with protoc if available;
    # otherwise skip (the CLI test above covers the wire format)
    if shutil.which("protoc") is None:
        pytest.skip("protoc missing")
    out = tmp_path / "onnx.pb"
    subprocess.run(["protoc", f"-I{os.path.dirname(PROTO)}",
                    f"--descriptor_set_out={out}", PROTO], check=True)
    fds = descriptor_pb2.FileDescriptorSet()
    fds.ParseFromString(out.read_bytes())
    pool = descriptor_pool.DescriptorPool()
    for f in fds.file:
        pool.Add(f)
    Model = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("onnx.ModelProto"))

    m = _sample_model()
    pb = Model()
    pb.ParseFromString(op.encode(m))
    assert pb.ir_version == 8
    assert pb.graph.node[0].op_type == "Gemm"
    assert list(pb.graph.node[0].attribute[2].ints) == [0, -1, 3]
    # and back: their serialization parses with our reader
    m2 = op.decode(op.ModelProto, pb.SerializeToString())
    assert m2.producer_name == "rvc_maker_tpu"
    np.testing.assert_array_equal(
        op.array_from_tensor(m2.graph.initializer[1]), [-2, 0, 7])


def test_negative_varint_and_unknown_fields():
    a = op.AttributeProto(name="axis", type=op.ATTR_INT, i=-3)
    data = op.encode(a)
    a2 = op.decode(op.AttributeProto, data)
    assert a2.i == -3
    # unknown fields are skipped, not fatal: append a field number 15
    # (varint) and a length-delimited field 14 (neither in our schema)
    extra = bytearray(data)
    extra += bytes([15 << 3 | 0, 5])
    extra += bytes([14 << 3 | 2, 3]) + b"abc"
    a3 = op.decode(op.AttributeProto, bytes(extra))
    assert a3.name == "axis" and a3.i == -3


def test_tensor_dtypes_roundtrip():
    for arr in (np.random.RandomState(0).randn(2, 3).astype(np.float32),
                np.array([1, 2, 3], np.int64),
                np.array([[True, False]], bool),
                np.array([1.5, -2.5], np.float16),
                np.arange(6, dtype=np.int32).reshape(3, 2)):
        t = op.tensor_from_array(arr, "t")
        back = op.array_from_tensor(op.decode(op.TensorProto, op.encode(t)))
        assert back.dtype == arr.dtype
        np.testing.assert_array_equal(back, arr)


def test_float_data_fallback():
    """Tensors stored as float_data (not raw_data) — torch.onnx sometimes
    emits these for small tensors."""
    t = op.TensorProto(data_type=op.FLOAT, dims=[2, 2],
                       float_data=[1.0, 2.0, 3.0, 4.0])
    arr = op.array_from_tensor(op.decode(op.TensorProto, op.encode(t)))
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])
