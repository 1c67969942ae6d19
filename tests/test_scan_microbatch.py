"""Scan-over-microbatches convert path (RVC_TPU_SCAN_MB=1, one dispatch
per BATCH; off by default — measured slower than the async-pipelined
loop on TPU) must equal the per-microbatch Python-loop path, including
a non-multiple tail that is padded and sliced off."""

import numpy as np
import pytest

import jax

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings

CFG_M = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


@pytest.fixture(scope="module")
def setup():
    synth_params = syn.init_params(jax.random.PRNGKey(0), CFG_M)
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    rs = np.random.RandomState(0)
    index = rs.randn(64, 768).astype(np.float32)
    t = np.arange(8000) / 16000
    return synth_params, hubert_params, index, t


def _audio(t, b):
    return np.stack([
        0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t) for i in range(b)
    ]).astype(np.float32)


@pytest.mark.parametrize("b", [4, 5])  # 5: pad-and-slice tail path
def test_scan_equals_loop(setup, monkeypatch, b):
    synth_params, hubert_params, index, t = setup
    audio = _audio(t, b)
    lengths = np.full((b,), audio.shape[1])
    settings = ConvertSettings(f0_method="yin", index_rate=0.5,
                               deterministic=True)

    pipe = ConvertPipeline(synth_params, CFG_M, hubert_params,
                           version="v2", index_vectors=index,
                           max_device_batch=2)
    monkeypatch.setenv("RVC_TPU_SCAN_MB", "0")
    wav_loop, pf_loop = pipe.convert_batch(audio, lengths, 0, settings)
    monkeypatch.setenv("RVC_TPU_SCAN_MB", "1")
    wav_scan, pf_scan = pipe.convert_batch(audio, lengths, 0, settings)

    assert wav_scan.shape == wav_loop.shape
    assert pf_scan.shape == pf_loop.shape
    np.testing.assert_allclose(np.asarray(wav_scan), np.asarray(wav_loop),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pf_scan), np.asarray(pf_loop),
                               rtol=1e-5, atol=1e-5)


def test_host_f0_still_loops(setup, monkeypatch):
    """Host-side F0 methods cannot fuse; the loop fallback must engage
    (and produce the right shape) even with scanning enabled."""
    synth_params, hubert_params, index, t = setup
    b = 3
    audio = _audio(t, b)
    lengths = np.full((b,), audio.shape[1])
    settings = ConvertSettings(f0_method="pm", index_rate=0.0,
                               deterministic=True)
    pipe = ConvertPipeline(synth_params, CFG_M, hubert_params,
                           version="v2", index_vectors=index,
                           max_device_batch=2)
    monkeypatch.setenv("RVC_TPU_SCAN_MB", "1")
    wav, pf = pipe.convert_batch(audio, lengths, 0, settings)
    assert wav.shape[0] == b and pf.shape[0] == b
