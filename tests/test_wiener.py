"""Wiener EM parity vs the reference (hdemucs.py:111-188) and the
non-cac demucs forward path."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import demucs as jdemucs

from reference_util import REFERENCE_ROOT, ref_module


def _ref(name):
    import os

    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)  # main/configs/config.json resolved relatively
    try:
        return ref_module(name)
    finally:
        os.chdir(cwd)


@pytest.fixture(scope="module")
def ref_hd():
    return _ref("main.library.uvr5_separator.demucs.hdemucs")


def _rand_inputs(seed, t=40, f=65, c=2, s=4):
    rs = np.random.RandomState(seed)
    mags = np.abs(rs.randn(t, f, c, s)).astype(np.float32)
    mix = (rs.randn(t, f, c) + 1j * rs.randn(t, f, c)).astype(np.complex64)
    return mags, mix


@pytest.mark.parametrize("iterations,residual,softmask", [
    (0, False, False), (1, False, False), (2, False, False),
    (1, True, False), (0, False, True),
])
def test_wiener_matches_reference(ref_hd, iterations, residual, softmask):
    mags, mix = _rand_inputs(iterations + 10 * residual)
    mix_ri = torch.from_numpy(
        np.stack([mix.real, mix.imag], axis=-1))      # (T,F,C,2)
    ref = ref_hd.wiener(torch.from_numpy(mags), mix_ri, iterations,
                        softmask=softmask, residual=residual).numpy()
    ref_c = ref[..., 0, :] + 1j * ref[..., 1, :]      # -> complex (T,F,C,S')

    ours = np.asarray(jdemucs.wiener(jnp.asarray(mags), jnp.asarray(mix),
                                     iterations, softmask=softmask,
                                     residual=residual))
    assert ours.shape == ref_c.shape
    np.testing.assert_allclose(ours.real, ref_c.real, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours.imag, ref_c.imag, rtol=2e-3, atol=2e-3)


def test_wiener_mask_windowing_consistent():
    """Windowed wiener_mask == direct wiener on each window, and the
    zero-padded tail window is exact."""
    mags, mix = _rand_inputs(3, t=70)
    mag_bsc = jnp.asarray(mags.transpose(3, 2, 1, 0)[None])  # (1,S,C,F,T)
    mix_b = jnp.asarray(mix.transpose(2, 1, 0)[None])        # (1,C,F,T)
    out = np.asarray(jdemucs.wiener_mask(mag_bsc, mix_b, 1, win_len=32))
    # direct computation window by window
    pieces = []
    for pos in (0, 32, 64):
        m = jnp.asarray(mags[pos: pos + 32])
        x = jnp.asarray(mix[pos: pos + 32])
        pieces.append(np.asarray(jdemucs.wiener(m, x, 1)))
    direct = np.concatenate(pieces, axis=0)                  # (T,F,C,S)
    np.testing.assert_allclose(out, direct.transpose(3, 2, 1, 0)[None],
                               rtol=1e-4, atol=1e-5)


def test_non_cac_forward_parity(ref_hd):
    """Full HTDemucs forward with cac=False + wiener_iters=0 vs the
    reference model (magnitude masks + phase reconstruction)."""
    mod = _ref("main.library.uvr5_separator.demucs.htdemucs")
    torch.manual_seed(5)
    net = mod.HTDemucs(sources=["drums", "bass", "other", "vocals"],
                       audio_channels=2, channels=8, nfft=2048, depth=4,
                       t_layers=3, segment=0.3, cac=False, wiener_iters=0)
    net.eval()
    args, kwargs = net._init_args_kwargs
    from rvc_maker_tpu.interop.demucs_load import load_demucs_th
    params, cfg = load_demucs_th({"klass": type(net), "args": args,
                                  "kwargs": kwargs,
                                  "state": net.state_dict()})
    assert not cfg.cac and cfg.wiener_iters == 0

    rs = np.random.RandomState(0)
    mixa = (rs.randn(1, 2, 10000) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mixa)).numpy()
    ours = np.asarray(jdemucs.apply_model_single(params, cfg,
                                                 jnp.asarray(mixa)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
