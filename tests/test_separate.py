"""Separation pipeline tests: HDemucs parity + chunked apply behavior."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import demucs as jdemucs
from rvc_maker_tpu.pipelines.separate import apply_model, separate_vocals

from reference_util import REFERENCE_ROOT, ref_module


@pytest.fixture(scope="module")
def ref_hdemucs_mod():
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        return ref_module("main.library.uvr5_separator.demucs.hdemucs")
    finally:
        os.chdir(cwd)


# nfft=4096 so the time branch's total stride (4^5 = 1024) equals the
# spectrogram hop — the alignment the real hdemucs_mmi geometry relies on
HD_CFG = jdemucs.DemucsConfig(
    sources=("drums", "bass", "other", "vocals"), audio_channels=2,
    nfft=4096, depth=6, cac=True, has_transformer=False, samplerate=44100,
    segment=0.4, use_train_segment=False)


def test_hdemucs_forward_parity(ref_hdemucs_mod):
    """HDemucs (hdemucs_mmi family: deep layers carry BLSTM + LocalState
    dconv branches and GroupNorm(4))."""
    torch.manual_seed(0)
    net = ref_hdemucs_mod.HDemucs(
        sources=list(HD_CFG.sources), audio_channels=2, channels=8,
        nfft=HD_CFG.nfft, depth=6, samplerate=44100)
    net.eval()
    params = jdemucs.htdemucs_params_from_state_dict(net.state_dict(), HD_CFG)

    rs = np.random.RandomState(1)
    mix = (rs.randn(1, 2, 12288) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mix)).numpy()
    ours = np.asarray(jdemucs.apply_model_single(params, HD_CFG,
                                                 jnp.asarray(mix)))
    assert ours.shape == ref.shape == (1, 4, 2, 12288)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def tiny_ht(ref_hdemucs_mod):
    mod = ref_module("main.library.uvr5_separator.demucs.htdemucs")
    torch.manual_seed(3)
    cfg = jdemucs.DemucsConfig(nfft=2048, depth=4, segment=0.3,
                               samplerate=44100, use_train_segment=True)
    net = mod.HTDemucs(sources=list(cfg.sources), audio_channels=2,
                       channels=8, nfft=2048, depth=4, t_layers=3,
                       segment=cfg.segment)
    net.eval()
    return jdemucs.htdemucs_params_from_state_dict(net.state_dict(), cfg), cfg


def test_chunked_apply_shapes(tiny_ht):
    params, cfg = tiny_ht
    rs = np.random.RandomState(2)
    mix = (rs.randn(1, 2, 44100) * 0.1).astype(np.float32)  # 1 s, 3 windows
    out = apply_model(params, cfg, mix, shifts=0, overlap=0.25)
    assert out.shape == (1, 4, 2, 44100)
    assert np.all(np.isfinite(out))


def test_shift_averaging_runs(tiny_ht):
    params, cfg = tiny_ht
    rs = np.random.RandomState(4)
    mix = (rs.randn(1, 2, 22050) * 0.1).astype(np.float32)
    out = apply_model(params, cfg, mix, shifts=2, overlap=0.25)
    assert out.shape == (1, 4, 2, 22050)
    assert np.all(np.isfinite(out))


def test_separate_vocals_entry(tiny_ht):
    params, cfg = tiny_ht
    t = np.arange(22050) / 44100
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    vocals, inst = separate_vocals(params, cfg, audio, 44100, shifts=0)
    assert vocals.shape == inst.shape == (22050, 2)
    assert np.all(np.isfinite(vocals)) and np.all(np.isfinite(inst))
