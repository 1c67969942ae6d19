"""W8A8 int8 decode path (RVC_TPU_INT8=1, bf16 fast mode only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.ops.int8_conv import conv1d_w8a8, int8_enabled
from rvc_maker_tpu.ops.nn import conv1d

CFG = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=64, hidden_channels=64,
    filter_channels=128, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    upsample_rates=(5, 4, 2), upsample_initial_channel=256,
    upsample_kernel_sizes=(10, 8, 4), spk_embed_dim=4, gin_channels=32,
    sr=16000, use_f0=True, text_enc_hidden_dim=96)


def test_conv1d_w8a8_close_to_fp32():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 300, 128) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(7, 128, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.01, jnp.float32)
    ref = conv1d(x, w, b, dilation=3, padding=9)
    got = conv1d_w8a8(x, w, b, dilation=3, padding=9)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_gate_respects_dtype_and_env(monkeypatch):
    monkeypatch.delenv("RVC_TPU_INT8", raising=False)
    assert not int8_enabled(jnp.bfloat16)
    monkeypatch.setenv("RVC_TPU_INT8", "1")
    assert int8_enabled(jnp.bfloat16)
    assert not int8_enabled(jnp.float32)  # parity mode never quantizes
    assert not int8_enabled(None)         # no compute_dtype -> fp32 path


def test_int8_never_reaches_training(monkeypatch):
    """The train forward must NOT quantize even with the env flag set in
    bf16 training — rounding has zero gradient and would silently stop
    the decode convs from learning (train paths never pass use_int8)."""
    import inspect

    from rvc_maker_tpu.pipelines import train as train_mod

    src = inspect.getsource(train_mod)
    assert "use_int8" not in src
    # and the model-side default is off
    sig = inspect.signature(syn.generator_nsf)
    assert sig.parameters["use_int8"].default is False


def test_int8_decode_quality_gate(monkeypatch):
    """bf16 decode with int8 resblocks stays close to the bf16 decode:
    the cheap random-weights proxy for the mel-distance gate."""
    params = syn.init_params(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(1)
    b, t = 2, 40
    z = rs.randn(b, t, CFG.inter_channels).astype(np.float32) * 0.5
    f0 = (rs.rand(b, t) * 300 + 80).astype(np.float32)
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32)
    noise = np.zeros((b, t * CFG.upp, 1), np.float32)

    def decode():
        bf = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "astype") and a.dtype == np.float32 else a,
            params["dec"])
        out = syn.generator_nsf(bf, CFG, jnp.asarray(z, jnp.bfloat16),
                                jnp.asarray(f0),
                                jnp.asarray(g, jnp.bfloat16),
                                jnp.asarray(noise, jnp.bfloat16),
                                use_int8=True)
        return np.asarray(out, np.float32)

    # use_int8=True alone must NOT quantize without the env opt-in
    monkeypatch.delenv("RVC_TPU_INT8", raising=False)
    ref = decode()
    monkeypatch.setenv("RVC_TPU_INT8", "1")
    got = decode()
    assert np.abs(got - ref).max() > 0  # int8 actually engaged

    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    # correlation + relative error: quantization noise, not distortion
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert corr > 0.98, corr
    assert rel < 0.2, rel


def test_pipeline_threads_int8(monkeypatch):
    """ConvertPipeline must engage int8 end-to-end when the env flag is
    set in bf16 mode (use_int8 threading), and never in fp32 mode."""
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)

    import dataclasses

    cfg = dataclasses.replace(CFG, text_enc_hidden_dim=768)  # hubert v2
    synth_params = syn.init_params(jax.random.PRNGKey(0), cfg)
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    lengths = np.asarray([16000])
    settings = ConvertSettings(f0_method="yin", index_rate=0.0,
                               deterministic=True)

    monkeypatch.delenv("RVC_TPU_INT8", raising=False)
    plain = ConvertPipeline(synth_params, cfg, hubert_params, version="v2",
                            compute_dtype=jnp.bfloat16)
    assert plain.use_int8 is False
    w_plain, _ = plain.convert_batch(audio, lengths, 0, settings)

    monkeypatch.setenv("RVC_TPU_INT8", "1")
    quant = ConvertPipeline(synth_params, cfg, hubert_params, version="v2",
                            compute_dtype=jnp.bfloat16)
    # init calibrates static activation scales and pre-quantizes weights
    from rvc_maker_tpu.ops.int8_conv import Int8Ctx

    assert isinstance(quant.use_int8, Int8Ctx)
    assert quant.use_int8.mode == "static"
    assert len(quant.use_int8.scales) > 0
    assert (quant.use_int8.scales > 0).all()
    rb0 = quant.synth_params["dec"]["resblocks"][0]["convs1"][0]
    assert rb0["w_q"].dtype == jnp.int8
    w_quant, _ = quant.convert_batch(audio, lengths, 0, settings)

    a, b = np.asarray(w_plain[0]), np.asarray(w_quant[0])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 0          # int8 really ran
    denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-9
    assert float(np.dot(a, b) / denom) > 0.98

    # fp32 pipeline ignores the env flag entirely
    fp32 = ConvertPipeline(synth_params, cfg, hubert_params, version="v2")
    assert fp32.use_int8 is False


def test_int8_audit_flags_hot_input(monkeypatch, caplog):
    """audit_int8_scales compares real input amax against the baked
    calibration scales and warns when the input runs hotter (advisor r4:
    silent int8 clipping)."""
    import logging

    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)

    import dataclasses

    cfg = dataclasses.replace(CFG, text_enc_hidden_dim=768)
    synth_params = syn.init_params(jax.random.PRNGKey(0), cfg)
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    monkeypatch.setenv("RVC_TPU_INT8", "1")
    pipe = ConvertPipeline(synth_params, cfg, hubert_params, version="v2",
                           compute_dtype=jnp.bfloat16)
    assert pipe.use_int8.mode == "static"
    n_sites = len(pipe.use_int8.scales)

    t = np.arange(16000) / 16000
    quiet = (0.05 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ratio = pipe.audit_int8_scales(quiet)
    assert ratio.shape == (n_sites,)
    assert np.isfinite(ratio).all() and (ratio > 0).all()
    # the audit must not clobber the baked static ctx
    assert pipe.use_int8.mode == "static"

    # ~20x hotter than the calibration battery: some site must exceed
    rs = np.random.RandomState(0)
    loud = np.clip(rs.randn(32000) * 8.0, -20, 20).astype(np.float32)
    with caplog.at_level(logging.WARNING,
                         logger="rvc_maker_tpu.pipelines.convert"):
        ratio2 = pipe.audit_int8_scales(loud)
    assert (ratio2 > 1.0).any()
    assert any("int8 audit" in r.message for r in caplog.records)

    # RVC_TPU_INT8_AUDIT=1 wires the audit into the first utterance
    monkeypatch.setenv("RVC_TPU_INT8_AUDIT", "1")
    s = ConvertSettings(f0_method="yin", index_rate=0.0, deterministic=True)
    pipe.convert_utterance(quiet, 0, s)
    assert pipe._int8_audited


def test_linear_w8a8_close_to_fp32():
    from rvc_maker_tpu.ops.int8_conv import linear_w8a8, quantize_linear_weight

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(4, 17, 64).astype(np.float32))
    w = jnp.asarray((rs.randn(64, 96) * 0.1).astype(np.float32))
    b = jnp.asarray(rs.randn(96).astype(np.float32) * 0.01)
    ref = np.asarray(x @ w + b)
    got = np.asarray(linear_w8a8(x, w, b))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
    # stacked (scan-layout) weights quantize per layer
    ws = jnp.stack([w, 3 * w])
    wq, sc = quantize_linear_weight(ws)
    assert wq.shape == ws.shape and sc.shape == (2, 96)
    np.testing.assert_allclose(np.asarray(sc[1]), 3 * np.asarray(sc[0]),
                               rtol=1e-5)


def test_int8_hubert_features_close_and_scoped(monkeypatch):
    """RVC_TPU_INT8 with hubert scope quantizes the transformer matmuls:
    features stay close to bf16 and the scope flag isolates stages."""
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.ops.int8_conv import prequantize_hubert
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline

    params = hubert_mod.init_params(jax.random.PRNGKey(2), n_layers=2)
    rs = np.random.RandomState(5)
    audio = jnp.asarray((rs.randn(2, 16000) * 0.1).astype(np.float32))
    ref, _ = hubert_mod.extract_features(params, audio, output_layer=2)
    qp = prequantize_hubert(params)
    got, _ = hubert_mod.extract_features(qp, audio, output_layer=2,
                                         use_int8=True)
    a, b = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 0.05, rel
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.995, corr

    import dataclasses
    cfg = dataclasses.replace(CFG, text_enc_hidden_dim=768)
    synth_params = syn.init_params(jax.random.PRNGKey(0), cfg)
    monkeypatch.setenv("RVC_TPU_INT8", "1")
    monkeypatch.setenv("RVC_TPU_INT8_SCOPE", "hubert")
    pipe = ConvertPipeline(synth_params, cfg, params, version="v2",
                           compute_dtype=jnp.bfloat16)
    assert pipe.use_int8 is False          # decode excluded by scope
    assert pipe.use_int8_hubert is True
    assert pipe.hubert_params["layers"]["fc1"]["w_q"].dtype == jnp.int8
    monkeypatch.setenv("RVC_TPU_INT8_SCOPE", "decode")
    pipe2 = ConvertPipeline(synth_params, cfg, params, version="v2",
                            compute_dtype=jnp.bfloat16)
    assert pipe2.use_int8_hubert is False
    assert bool(pipe2.use_int8) or hasattr(pipe2.use_int8, "mode")


def test_int8_rmvpe_scales_stay_f32_through_prep(monkeypatch):
    """prequantize_rmvpe must run AFTER the pipeline's bf16 cast: w_scale
    are f32 dequantization constants, and cast_floats rounding them to
    bf16 would add systematic per-channel gain error (review r5)."""
    import dataclasses

    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline

    cfg = dataclasses.replace(CFG, text_enc_hidden_dim=768)
    synth_params = syn.init_params(jax.random.PRNGKey(0), cfg)
    hub = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    rs = np.random.RandomState(0)
    # minimal U-Net-shaped tree: one conv at Cin>=128 (quantized) and one
    # small-C conv (left alone by the RMVPE_INT8_MIN_CIN policy)
    rmvpe_tree = {
        "deep": {"conv1": {"w": rs.randn(3, 3, 128, 128).astype(np.float32),
                           "b": np.zeros(128, np.float32)}},
        "shallow": {"conv1": {"w": rs.randn(3, 3, 16, 16).astype(np.float32),
                              "b": np.zeros(16, np.float32)}},
    }
    monkeypatch.setenv("RVC_TPU_INT8", "1")
    monkeypatch.setenv("RVC_TPU_INT8_SCOPE", "rmvpe")
    pipe = ConvertPipeline(synth_params, cfg, hub, version="v2",
                           rmvpe_params=rmvpe_tree,
                           compute_dtype=jnp.bfloat16)
    deep = pipe.rmvpe_params["deep"]["conv1"]
    assert deep["w_q"].dtype == jnp.int8
    assert deep["w_scale"].dtype == jnp.float32     # NOT bf16-rounded
    assert deep["w"].dtype == jnp.bfloat16          # cast still applied
    assert "w_q" not in pipe.rmvpe_params["shallow"]["conv1"]


def test_int8_scope_warns_on_unknown_token(monkeypatch, caplog):
    """A typoed RVC_TPU_INT8_SCOPE must warn instead of silently
    disabling the stage the operator meant to quantize (review r5)."""
    import logging

    from rvc_maker_tpu.ops.int8_conv import int8_scope

    monkeypatch.setenv("RVC_TPU_INT8_SCOPE", "rvmpe,decode")
    with caplog.at_level(logging.WARNING):
        scope = int8_scope()
    assert "decode" in scope
    assert any("rvmpe" in r.message for r in caplog.records)

    caplog.clear()
    monkeypatch.setenv("RVC_TPU_INT8_SCOPE", "decode,hubert")
    with caplog.at_level(logging.WARNING):
        scope = int8_scope()
    assert scope == frozenset({"decode", "hubert"})
    assert not caplog.records
