"""STFT/mel parity vs torch.stft and structural filterbank checks."""

import numpy as np
import torch

import jax.numpy as jnp

from rvc_maker_tpu.ops import stft as jstft


def test_stft_magnitude_center_true_matches_torch():
    rs = np.random.RandomState(0)
    y = rs.randn(2, 2000).astype(np.float32)
    win = torch.hann_window(400)
    ref = torch.stft(torch.from_numpy(y), 512, hop_length=160, win_length=400,
                     window=win, center=True, pad_mode="reflect",
                     return_complex=True).abs().numpy()
    ours = np.asarray(jstft.stft_magnitude(
        jnp.asarray(y), n_fft=512, hop_length=160, win_length=400,
        window=jstft.hann_window(400), center=True))
    # ours: (B, T, F); torch: (B, F, T)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-4)


def test_training_spectrogram_matches_reference():
    """reference train.py:700-706 spectrogram_torch semantics."""
    rs = np.random.RandomState(1)
    hop, n_fft = 160, 1024
    y = rs.randn(1, hop * 20).astype(np.float32)
    win = torch.hann_window(n_fft)
    pad = int((n_fft - hop) / 2)
    y_t = torch.nn.functional.pad(torch.from_numpy(y).unsqueeze(1),
                                  (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y_t, n_fft, hop_length=hop, win_length=n_fft, window=win,
                      center=False, return_complex=True)
    ref = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-6).numpy()
    ours = np.asarray(jstft.spectrogram(jnp.asarray(y), n_fft=n_fft,
                                        hop_length=hop, win_length=n_fft))
    assert ours.shape[1] == ref.shape[2] == 20
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-4)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(jstft.hann_window(1024),
                               torch.hann_window(1024).numpy(), atol=5e-7)


def test_mel_filterbank_structure():
    """Structural invariants of the slaney-normalized triangular bank."""
    for htk in (False, True):
        fb = jstft.mel_filterbank(16000, 1024, 128, 30.0, 8000.0, htk=htk)
        assert fb.shape == (128, 513)
        assert np.all(fb >= 0)
        # every filter has support, and supports are ordered by center freq
        centers = np.argmax(fb, axis=1)
        assert np.all(np.diff(centers) >= 0)
        assert fb[:, 0].sum() == 0  # nothing below fmin touches DC
        # slaney normalization: peak amplitude ~ 2/bandwidth (decreasing
        # for htk-linear spacing is not guaranteed; just check finite/positive)
        assert np.all(fb.max(axis=1) > 0)


def test_mel_spectrogram_shapes():
    y = jnp.zeros((2, 400 * 10))
    m = jstft.mel_spectrogram(y, n_fft=2048, num_mels=125, sample_rate=40000,
                              hop_length=400, win_length=2048, fmin=0.0,
                              fmax=None)
    assert m.shape == (2, 10, 125)
    # silence floor: |STFT| of zeros is sqrt(1e-6) (the reference's eps,
    # train.py:706), so log-mel sits near log(mel_fb_rowsum * 1e-3) — well
    # below speech levels but above log(1e-5)
    assert np.all(np.asarray(m) < -9.0)
    assert np.all(np.isfinite(np.asarray(m)))
