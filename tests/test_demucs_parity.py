"""HTDemucs parity vs the reference vendored demucs (random weights)."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import demucs as jdemucs

from reference_util import REFERENCE_ROOT, ref_module


@pytest.fixture(scope="module")
def ref_mod():
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)  # reference Config() reads relative paths
    try:
        return ref_module("main.library.uvr5_separator.demucs.htdemucs")
    finally:
        os.chdir(cwd)


CFG = jdemucs.DemucsConfig(
    sources=("drums", "bass", "other", "vocals"), audio_channels=2,
    nfft=2048, depth=4, stride=4, kernel_size=8, time_stride=2,
    cac=True, has_transformer=True, t_heads=8, samplerate=44100,
    segment=0.5, use_train_segment=True)


@pytest.fixture(scope="module")
def net_and_params(ref_mod):
    torch.manual_seed(0)
    net = ref_mod.HTDemucs(
        sources=list(CFG.sources), audio_channels=2, channels=8,
        nfft=CFG.nfft, depth=4, t_layers=3, t_heads=8, samplerate=44100,
        segment=CFG.segment)
    net.eval()
    params = jdemucs.htdemucs_params_from_state_dict(net.state_dict(), CFG)
    return net, params


def test_spectro_matches_reference(ref_mod):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4096).astype(np.float32)
    ref = ref_mod.spectro(torch.from_numpy(x), 512, 128).numpy()
    ours = np.asarray(jdemucs._spectro(jnp.asarray(x), 512, 128))
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours.imag, ref.imag, rtol=1e-4, atol=1e-5)


def test_ispectro_matches_reference(ref_mod):
    rs = np.random.RandomState(1)
    z = (rs.randn(2, 257, 30) + 1j * rs.randn(2, 257, 30)).astype(np.complex64)
    ref = ref_mod.ispectro(torch.from_numpy(z), 128, length=3500).numpy()
    ours = np.asarray(jdemucs._ispectro(jnp.asarray(z), 128, 3500))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_htdemucs_forward_parity(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(2)
    mix = (rs.randn(1, 2, 20000) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mix)).numpy()
    ours = np.asarray(jdemucs.apply_model_single(params, CFG, jnp.asarray(mix)))
    assert ours.shape == ref.shape == (1, 4, 2, 20000)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
