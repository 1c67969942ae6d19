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
