"""At-rest model decryption (reference FCPE.py:28-40 `decrypt_model`).

The reference AES-256-CBC-encrypts its released FCPE files with the key
it ships at main/configs/decrypt.bin (IV = first 16 bytes, PKCS7).
These tests encrypt synthetic checkpoints with that exact key/layout and
assert the loaders transparently open both encrypted and plain files.
"""

import io
import os

import numpy as np
import torch

from rvc_maker_tpu.interop import modelcrypt as mc


def test_key_matches_shipped_decrypt_bin():
    path = "/root/reference/main/configs/decrypt.bin"
    if os.path.exists(path):
        with open(path, "rb") as fh:
            assert fh.read() == mc.REFERENCE_MODEL_KEY


def test_roundtrip_bytes():
    for n in (0, 1, 15, 16, 17, 1000):
        plain = os.urandom(n)
        enc = mc.encrypt_model_bytes(plain)
        assert enc != plain
        assert mc.decrypt_model_bytes(enc) == plain


def test_maybe_decrypt_passthrough_plain():
    # zip, pickle, and ONNX-protobuf magic must never be "decrypted"
    for head in (b"PK\x03\x04", b"\x80\x02", b"\x08\x07\x12\x00"):
        data = head + os.urandom(64)
        assert mc.maybe_decrypt(data) is data
    # tiny non-model junk passes through too
    junk = os.urandom(20)
    assert mc.maybe_decrypt(junk) is junk


def test_maybe_decrypt_detects_encrypted_torch_file():
    buf = io.BytesIO()
    torch.save({"model": {"w": torch.randn(3)}}, buf)
    plain = buf.getvalue()
    enc = mc.encrypt_model_bytes(plain)
    assert mc.maybe_decrypt(enc) == plain
    assert mc.maybe_decrypt(plain) is plain


def _tiny_fcpe_state_dict(rs):
    """Minimal conv-only current-gen CFNaiveMelPE layout (1 layer, h=8)."""
    t = lambda *s: torch.from_numpy(rs.randn(*s).astype(np.float32))
    h = 8
    sd = {
        "input_stack.0.weight": t(h, 128, 3), "input_stack.0.bias": t(h),
        "input_stack.1.weight": t(h), "input_stack.1.bias": t(h),
        "input_stack.3.weight": t(h, h, 3), "input_stack.3.bias": t(h),
        "norm.weight": t(h), "norm.bias": t(h),
        "output_proj.weight": t(360, h), "output_proj.bias": t(360),
        "cent_table": t(360),
    }
    lp = "net.encoder_layers.0"
    sd.update({
        f"{lp}.norm.weight": t(h), f"{lp}.norm.bias": t(h),
        f"{lp}.conformer.net.0.weight": t(h), f"{lp}.conformer.net.0.bias": t(h),
        f"{lp}.conformer.net.2.weight": t(2 * h, h, 1),
        f"{lp}.conformer.net.2.bias": t(2 * h),
        f"{lp}.conformer.net.4.conv.weight": t(h, 1, 31),
        f"{lp}.conformer.net.4.conv.bias": t(h),
        f"{lp}.conformer.net.6.weight": t(h, h, 1),
        f"{lp}.conformer.net.6.bias": t(h),
    })
    return sd


def test_load_fcpe_ckpt_encrypted_equals_plain(tmp_path):
    from rvc_maker_tpu.models.fcpe import load_fcpe_ckpt

    rs = np.random.RandomState(0)
    ckpt = {"model": _tiny_fcpe_state_dict(rs), "config_dict": {}}
    buf = io.BytesIO()
    torch.save(ckpt, buf)

    plain_path = tmp_path / "fcpe_plain.pt"
    plain_path.write_bytes(buf.getvalue())
    enc_path = tmp_path / "fcpe_enc.pt"
    enc_path.write_bytes(mc.encrypt_model_bytes(buf.getvalue()))

    p_plain, legacy_plain = load_fcpe_ckpt(str(plain_path))
    p_enc, legacy_enc = load_fcpe_ckpt(str(enc_path))
    assert legacy_plain == legacy_enc is False

    flat_a = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(p_plain)]
    flat_b = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(p_enc)]
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_onnx_graph_loads_encrypted(tmp_path):
    from rvc_maker_tpu.interop import onnx_proto as op
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph

    # y = x + 1 graph
    node = op.NodeProto(op_type="Add", input=["x", "one"], output=["y"],
                        name="add")
    one = op.tensor_from_array(np.ones((2, 2), np.float32), "one")
    g = op.GraphProto(
        name="g", node=[node], initializer=[one],
        input=[op.ValueInfoProto(name="x")],
        output=[op.ValueInfoProto(name="y")])
    model = op.ModelProto(ir_version=8, graph=g,
                          opset_import=[op.OperatorSetIdProto(domain="",
                                                              version=17)])
    raw = op.encode(model)

    enc_path = tmp_path / "enc.onnx"
    enc_path.write_bytes(mc.encrypt_model_bytes(raw))

    x = np.arange(4, dtype=np.float32).reshape(2, 2)
    out_plain = OnnxGraph(raw).run({"x": x})
    out_enc = OnnxGraph(str(enc_path)).run({"x": x})
    np.testing.assert_array_equal(np.asarray(out_plain[0]),
                                  np.asarray(out_enc[0]))


def test_looks_plain_onnx_requires_second_field_tag():
    """Advisor r4: first-byte-0x08 alone classifies ~1/512 of random
    ciphertexts as plain ONNX; the sniffer must also see a valid
    ModelProto field tag after the ir_version varint."""
    from rvc_maker_tpu.interop.modelcrypt import _looks_plain

    # real-world ONNX header: ir_version=8 then producer_name (0x12)
    assert _looks_plain(b"\x08\x08\x12\x04onnx" + b"\0" * 16)
    # graph field straight after ir_version
    assert _looks_plain(b"\x08\x07\x3a\x02\x0a\x00" + b"\0" * 16)
    # 0x08 followed by a varint but then garbage: NOT plain
    assert not _looks_plain(b"\x08\x08\xff\xfe" + b"\0" * 16)
    assert not _looks_plain(b"\x08\x08\x00\x00" + b"\0" * 16)
    # an encrypted blob that starts 0x08 <small> <junk> now decrypts
    from rvc_maker_tpu.interop.modelcrypt import (encrypt_model_bytes,
                                                  maybe_decrypt)
    import pickle

    plain = pickle.dumps({"k": 1})
    blob = encrypt_model_bytes(plain, iv=b"\x08\x05\x99" + b"\x01" * 13)
    # iv is the first 16 bytes of the file: crafted to start 0x08 0x05 0x99
    assert blob[:2] == b"\x08\x05" and not _looks_plain(blob)
    assert maybe_decrypt(blob) == plain
