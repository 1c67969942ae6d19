"""CREPE parity vs the reference model (random weights, BN folded)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import crepe as jcrepe

from reference_util import ref_module


@pytest.fixture(scope="module")
def ref_and_params():
    # librosa shim installed by reference_util._install_shims via ref_module
    mod = ref_module("main.library.predictors.CREPE")
    torch.manual_seed(11)
    net = mod.Crepe("tiny")
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    net.eval()
    params = jcrepe.params_from_state_dict(net.state_dict(), "tiny")
    return mod, net, params


def test_model_forward_parity(ref_and_params):
    _, net, params = ref_and_params
    rs = np.random.RandomState(0)
    frames = rs.randn(6, 1024).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(frames)).numpy()
    ours = np.asarray(jcrepe.crepe_apply(params, jnp.asarray(frames)))
    assert ours.shape == ref.shape == (6, 360)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_frame_audio_matches_reference_preprocess(ref_and_params):
    mod, _, _ = ref_and_params
    rs = np.random.RandomState(1)
    audio = rs.randn(1, 3200).astype(np.float32)
    frames_ref = next(mod.preprocess(torch.from_numpy(audio), 16000, 160,
                                     batch_size=None, device="cpu", pad=True))
    ours = np.asarray(jcrepe.frame_audio(jnp.asarray(audio), 160))
    assert ours.shape[1] == frames_ref.shape[0]
    np.testing.assert_allclose(ours[0], frames_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_viterbi_matches_bruteforce():
    """Small-case Viterbi vs exhaustive best path."""
    rs = np.random.RandomState(2)
    t_len, nb = 4, 360
    probs = rs.rand(t_len, nb).astype(np.float64)
    probs /= probs.sum(-1, keepdims=True)
    path = jcrepe.viterbi_decode(probs)
    assert path.shape == (t_len,)
    # verify the path is locally optimal under the transition prior:
    # brute force over a restricted set around the found path
    tr = jcrepe._transition_matrix()

    def score(p):
        s = np.log(1 / nb) + np.log(probs[0, p[0]])
        for t in range(1, t_len):
            s += np.log(tr[p[t - 1], p[t]] + 1e-300) + np.log(probs[t, p[t]])
        return s

    base = score(path)
    for t in range(t_len):
        for d in (-3, -2, -1, 1, 2, 3):
            alt = path.copy()
            alt[t] = np.clip(alt[t] + d, 0, nb - 1)
            assert score(alt) <= base + 1e-9


def test_bins_to_frequency_deterministic():
    f = jcrepe.bins_to_frequency(np.array([0, 100, 359]))
    cents = 20 * np.array([0, 100, 359]) + 1997.3794084376191
    np.testing.assert_allclose(f, 10 * 2 ** (cents / 1200), rtol=1e-9)


def test_decode_tone(ref_and_params):
    """End-to-end on a pure tone with the real graph shape (random weights:
    only shapes/flow are asserted)."""
    _, _, params = ref_and_params
    sr = 16000
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 220 * t).astype(np.float32)[None]
    probs = jcrepe.predict_probs(params, jnp.asarray(audio), hop_length=160)
    pitch, peri = jcrepe.decode(np.asarray(probs), return_periodicity=True)
    assert pitch.shape == peri.shape == (1, 101)
    assert np.all(pitch > 0)


def test_mean_median_filters():
    x = np.array([[1.0, np.nan, 3.0, 5.0, np.nan]])
    m = jcrepe.mean_filter(x, 3)
    np.testing.assert_allclose(m[0, 0], 1.0)       # [1, nan] -> 1
    np.testing.assert_allclose(m[0, 1], 2.0)       # [1, nan, 3] -> 2
    md = jcrepe.median_filter(x, 3)
    assert md.shape == x.shape


def test_onnx_export_dynamic_frames(ref_and_params):
    """The real CREPE net exports with a dynamic frame axis: one .onnx
    serves any frame count (real crepe .onnx graphs are dynamic-N)."""
    from rvc_maker_tpu.interop.onnx_export import export_onnx
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph

    _, _, params = ref_and_params
    model = export_onnx(jcrepe.crepe_apply,
                        (jnp.zeros((8, 1024), jnp.float32),),
                        params=params, input_names=["frames"],
                        output_names=["probs"],
                        dynamic_axes={"frames": {0: "n"}})
    g = OnnxGraph(model)
    for n in (8, 19):
        fr = np.random.RandomState(n).randn(n, 1024).astype(np.float32)
        ref = np.asarray(jcrepe.crepe_apply(params, jnp.asarray(fr)))
        got = np.asarray(g.run({"frames": fr})[0])
        assert ref.shape == got.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
