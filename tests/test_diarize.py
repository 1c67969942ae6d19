"""Diarization flow tests (VAD segmentation, clustering, dual-model convert)."""

import numpy as np
import pytest

import jax

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import ecapa_tdnn, hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings
from rvc_maker_tpu.speaker.diarize import (cluster_speakers,
                                           convert_with_diarization,
                                           energy_vad_segments, fbank)

SR = 16000


def _ecapa_params():
    import torch

    from reference_util import ref_module

    mod = ref_module("main.library.speaker_diarization.ECAPA_TDNN")
    torch.manual_seed(0)
    net = mod.ECAPA_TDNN(input_size=80)
    net.eval()
    return ecapa_tdnn.params_from_state_dict(net.state_dict())


def test_fbank_shape():
    f = fbank(np.zeros(SR, np.float32))
    assert f.shape == (101, 80)
    assert np.all(np.isfinite(f))


def test_vad_segments_tone_with_gaps():
    t = np.arange(SR) / SR
    tone = 0.4 * np.sin(2 * np.pi * 220 * t)
    audio = np.concatenate([tone, np.zeros(SR), tone, np.zeros(SR // 2),
                            tone]).astype(np.float32)
    segs = energy_vad_segments(audio, min_seg_s=0.5)
    assert len(segs) >= 2
    # voiced regions found around the tones
    assert segs[0][0] < SR // 4


def test_cluster_speakers_runs():
    params = _ecapa_params()
    rs = np.random.RandomState(0)
    audio = (rs.randn(SR * 4) * 0.1).astype(np.float32)
    segs = [(0, SR), (SR, 2 * SR), (2 * SR, 3 * SR), (3 * SR, 4 * SR)]
    labels = cluster_speakers(audio, segs, params, num_speakers=2)
    assert labels.shape == (4,)
    assert set(labels) <= {0, 1}


@pytest.mark.slow
def test_convert_with_diarization_end_to_end():
    cfg = ModelConfig(
        spec_channels=129, segment_size=8, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        kernel_size=3, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8, 4, 4),
        spk_embed_dim=4, gin_channels=16, sr=6400, use_f0=True,
        text_enc_hidden_dim=768)
    hub = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    pipes = [ConvertPipeline(syn.init_params(jax.random.PRNGKey(s), cfg), cfg,
                             hub, version="v2") for s in (1, 2)]
    settings = [ConvertSettings(f0_method="yin", index_rate=0.0)] * 2

    t = np.arange(int(SR * 1.5)) / SR
    tone = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    audio = np.concatenate([tone, np.zeros(SR, np.float32), tone])

    out = convert_with_diarization(audio, pipes, settings, _ecapa_params())
    assert out.dtype == np.float32
    assert abs(len(out) / 6400 - len(audio) / SR) < 0.1
    assert np.all(np.isfinite(out))
    # silence gap stays (near) silent in the output
    gap = out[int(1.6 * 6400) : int(2.3 * 6400)]
    assert np.sqrt(np.mean(gap ** 2)) < 0.2
