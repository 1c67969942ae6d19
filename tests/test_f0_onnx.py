"""ONNX F0 predictors on the JAX ONNX executor (reference --f0_onnx).

The rmvpe test exports OUR salience net to ONNX and checks the .onnx
route reproduces the native route exactly; crepe/fcpe use stub graphs
with the reference I/O contracts to validate dispatch + decode plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.f0.onnx_predictor import (crepe_onnx_infer,
                                             fcpe_onnx_infer,
                                             rmvpe_onnx_infer)
from rvc_maker_tpu.interop.onnx_export import export_onnx
from rvc_maker_tpu.interop.onnx_run import OnnxGraph


@pytest.fixture(scope="module")
def rmvpe_tree():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench._random_rmvpe(jax.random.PRNGKey(7))


def test_rmvpe_onnx_matches_native(rmvpe_tree):
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod

    rs = np.random.RandomState(0)
    audio = (rs.randn(1, 16000) * 0.2).astype(np.float32)

    # export our salience net (mel -> hidden) with the reference's
    # graph contract (RMVPE.py:214)
    mel = rmvpe_mod.rmvpe_mel(jnp.asarray(audio))
    pad_to = 32 * ((mel.shape[-1] - 1) // 32 + 1)
    mel_p = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - mel.shape[-1])),
                    mode="reflect")
    model = export_onnx(rmvpe_mod.e2e_apply, (mel_p,), params=rmvpe_tree,
                        input_names=["mel"], output_names=["hidden"])
    graph = OnnxGraph(model)

    ref = np.asarray(rmvpe_mod.infer(rmvpe_tree, jnp.asarray(audio)))
    got = np.asarray(rmvpe_onnx_infer(graph, jnp.asarray(audio)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_crepe_onnx_dispatch():
    """Stub graph: frames (N, 1024) -> probs (N, 360) peaked at a fixed
    bin; the shared decode must recover the corresponding frequency."""
    from rvc_maker_tpu.models.crepe import bins_to_frequency

    target_bin = 150
    w = jnp.zeros((1024, 360)).at[:, target_bin].set(0.01)
    bias = jnp.asarray(np.eye(1, 360, target_bin, dtype=np.float32)[0] * 4.0)

    def net(frames):
        return jax.nn.sigmoid(frames @ w + bias)

    rs = np.random.RandomState(1)
    audio = (rs.randn(4000) * 0.1).astype(np.float32)
    n_frames = len(audio) // 160 + 1
    # our exporter shape-specializes (XLA model); real crepe .onnx graphs
    # are dynamic-N and run the same way through the executor
    model = export_onnx(net, (jnp.zeros((n_frames, 1024), jnp.float32),),
                        input_names=["frames"], output_names=["probs"])
    graph = OnnxGraph(model)
    f0 = crepe_onnx_infer(graph, audio)
    want = bins_to_frequency(np.array([target_bin]),
                             dither=np.zeros(1))[0]
    voiced = f0[f0 > 0]
    assert len(voiced) > 0
    assert np.allclose(voiced, want, atol=20.0)

    f0m = crepe_onnx_infer(graph, audio, mangio=True)
    assert np.allclose(f0m[f0m > 0], want, atol=20.0)


def test_fcpe_onnx_dispatch():
    """Stub graph with the fcpe.onnx contract: (mel, threshold) -> f0."""
    def net(mel, threshold):
        # constant 220 Hz wherever mel has energy; threshold consumed
        return (jnp.full(mel.shape[:2], 220.0)
                * jnp.maximum(threshold * 0 + 1.0, 1.0))[..., None]

    mel_ex = jnp.zeros((1, 101, 128), jnp.float32)
    model = export_onnx(net, (mel_ex, jnp.float32(0.03)),
                        input_names=["mel", "threshold"],
                        output_names=["f0"])
    graph = OnnxGraph(model)

    rs = np.random.RandomState(2)
    audio = jnp.asarray((rs.randn(1, 16000) * 0.1).astype(np.float32))
    f0 = np.asarray(fcpe_onnx_infer(graph, audio, p_len=101))
    assert f0.shape == (1, 101)
    assert np.allclose(f0, 220.0, atol=1.0)


def test_pipeline_stage_with_onnx_rmvpe(rmvpe_tree):
    """ConvertPipeline._stage_f0 routes to the graph when rmvpe_params
    is an OnnxGraph."""
    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod
    from rvc_maker_tpu.models import synthesizer as syn
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline

    mel_ex = jnp.zeros((1, 128, 128), jnp.float32)
    model = export_onnx(rmvpe_mod.e2e_apply, (mel_ex,), params=rmvpe_tree,
                        input_names=["mel"], output_names=["hidden"])
    graph = OnnxGraph(model)

    cfg = preset("v2", 32000).model
    pipe = ConvertPipeline.__new__(ConvertPipeline)  # skip heavy init
    pipe.rmvpe_params = graph
    pipe.fcpe_params = None
    pipe.rmvpe_microbatch = 8
    pipe._step_cache = {}

    rs = np.random.RandomState(3)
    audio = jnp.asarray((rs.randn(1, 16000) * 0.2).astype(np.float32))
    f0 = np.asarray(pipe._stage_f0("rmvpe")(
        None, audio, jnp.float32(0.0), jnp.float32(0.0)))
    ref = np.asarray(rmvpe_onnx_infer(graph, audio))
    np.testing.assert_allclose(f0, ref, atol=1e-4, rtol=1e-4)


def test_rmvpe_export_dynamic_frames(rmvpe_tree):
    """Our rmvpe salience net exports with a DYNAMIC frame axis: the
    U-Net's /32-divisible mel axis is declared as "32*t" and the fused
    BiGRU lowers to an ONNX Loop, so one .onnx serves any frame count
    (torch rmvpe.onnx graphs are dynamic the same way)."""
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod

    mel_ex = jnp.zeros((1, 128, 64), jnp.float32)
    model = export_onnx(rmvpe_mod.e2e_apply, (mel_ex,), params=rmvpe_tree,
                        input_names=["mel"], output_names=["hidden"],
                        dynamic_axes={"mel": {2: "32*t"}})
    assert any(n.op_type == "Loop" for n in model.graph.node)
    graph = OnnxGraph(model)
    for T in (32, 64):
        mel = jnp.asarray(np.random.RandomState(T)
                          .randn(1, 128, T).astype(np.float32))
        ref = np.asarray(rmvpe_mod.e2e_apply(rmvpe_tree, mel))
        got = np.asarray(graph.run({"mel": np.asarray(mel)})[0])
        assert ref.shape == got.shape
        np.testing.assert_allclose(ref, got, atol=1e-4, rtol=1e-4)
