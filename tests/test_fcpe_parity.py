"""FCPE parity vs the reference (random weights, performer projections
imported as buffers).  The reference module imports onnxruntime and
torchaudio at module scope (absent here) — shimmed with stub modules."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import fcpe as jfcpe

from reference_util import ref_module, _shim_module


def _install_fcpe_shims():
    if "onnxruntime" not in sys.modules:
        ort = _shim_module("onnxruntime")
        ort.SessionOptions = object
        ort.InferenceSession = object
        sys.modules["onnxruntime"] = ort
    if "torchaudio" not in sys.modules:
        ta = _shim_module("torchaudio")
        tt = _shim_module("torchaudio.transforms")

        class Resample:  # unused in these tests (16 kHz in == model sr)
            def __init__(self, *a, **k):
                pass

        tt.Resample = Resample
        ta.transforms = tt
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tt


@pytest.fixture(scope="module")
def ref_mod():
    _install_fcpe_shims()
    return ref_module("main.library.predictors.FCPE")


@pytest.fixture(scope="module")
def net_and_params(ref_mod):
    torch.manual_seed(0)
    # conv_only=True: the reference's attention-enabled CFNEncoderLayer
    # is unconstructible (passes use_norm to a SelfAttention without it,
    # FCPE.py:492) — shipped current-gen checkpoints are conv-only
    net = ref_mod.CFNaiveMelPE(input_channels=128, out_dims=360,
                               hidden_dims=128, n_layers=2, n_heads=8,
                               conv_only=True)
    net.eval()
    params = jfcpe.params_from_state_dict(net.state_dict(), legacy=False)
    return net, params


def test_salience_parity(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(1)
    mel = rs.randn(2, 40, 128).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mel)).numpy()
    ours = np.asarray(jfcpe.salience(params, jnp.asarray(mel)))
    assert ours.shape == ref.shape == (2, 40, 360)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_decode_parity(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(2)
    y = (rs.rand(1, 25, 360).astype(np.float32)) ** 3
    with torch.no_grad():
        ref = net.cent_to_f0(
            net.latent2cents_local_decoder(torch.from_numpy(y),
                                           threshold=0.05)).numpy()[:, :, 0]
    # reference masks by multiplying cents with -inf -> f0 = 2^-inf = 0
    ref = np.where(np.isfinite(ref), ref, 0.0)
    ours = np.asarray(jfcpe.decode_local(jnp.asarray(y),
                                         jnp.asarray(params["cent_table"]),
                                         0.05))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_full_infer_parity(net_and_params, ref_mod):
    """audio -> mel -> salience -> decode -> f0, composed as the reference
    InferCFNaiveMelPE does (mel via MelModule numerics)."""
    net, params = net_and_params
    rs = np.random.RandomState(3)
    audio = (rs.randn(4000) * 0.1).astype(np.float32)

    mel_mod = ref_mod.MelModule(16000, 128, 1024, 1024, 160, 0, 8000)
    with torch.no_grad():
        mel_t = mel_mod(torch.from_numpy(audio[None, :, None]))
        n_frames = len(audio) // 160 + 1
        if n_frames > mel_t.shape[1]:
            mel_t = torch.cat((mel_t, mel_t[:, -1:]), 1)
        mel_t = mel_t[:, :n_frames]
        f0_ref = net.infer(mel_t, threshold=0.05).numpy()[:, :, 0]
    f0_ref = np.where(np.isfinite(f0_ref), f0_ref, 0.0)

    mel_j = np.asarray(jfcpe.fcpe_mel(jnp.asarray(audio[None])))
    np.testing.assert_allclose(mel_j, mel_t.numpy(), rtol=1e-3, atol=1e-3)

    f0 = np.asarray(jfcpe.infer(params, jnp.asarray(audio[None])))
    assert f0.shape == f0_ref.shape
    np.testing.assert_allclose(f0, f0_ref, rtol=1e-3, atol=0.5)


def test_legacy_key_mapping(ref_mod):
    """FCPE_LEGACY (PCmer) maps through the same apply functions."""
    torch.manual_seed(5)
    net = ref_mod.FCPE_LEGACY(input_channel=128, out_dims=360, n_layers=2,
                              n_chans=128)
    net.eval()
    params = jfcpe.params_from_state_dict(net.state_dict(), legacy=True)
    rs = np.random.RandomState(6)
    mel = rs.randn(1, 30, 128).astype(np.float32)
    with torch.no_grad():
        ref = torch.sigmoid(net.dense_out(net.norm(net.decoder(
            net.stack(torch.from_numpy(mel).transpose(1, 2)).transpose(1, 2)
        )))).numpy()
    ours = np.asarray(jfcpe.salience(params, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_onnx_export_dynamic_frames(net_and_params):
    """The real FCPE salience net exports with a dynamic frame axis
    (matches shipped fcpe .onnx graphs)."""
    from rvc_maker_tpu.interop.onnx_export import export_onnx
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph

    _, params = net_and_params
    model = export_onnx(jfcpe.salience,
                        (jnp.zeros((1, 40, 128), jnp.float32),),
                        params=params, input_names=["mel"],
                        output_names=["sal"], dynamic_axes={"mel": {1: "t"}})
    g = OnnxGraph(model)
    for t in (40, 73):
        mel = np.random.RandomState(t).randn(1, t, 128).astype(np.float32)
        ref = np.asarray(jfcpe.salience(params, jnp.asarray(mel)))
        got = np.asarray(g.run({"mel": mel})[0])
        assert ref.shape == got.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
