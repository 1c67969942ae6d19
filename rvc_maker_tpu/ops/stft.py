"""STFT / mel-spectrogram ops, jittable, matching the reference numerics.

Two consumers with different conventions:
  * training spectrograms (reference train.py:700-716 `spectrogram_torch`):
    reflect-pad (n_fft-hop)/2, center=False, |STFT| = sqrt(re^2+im^2+1e-6),
    mel basis = librosa slaney-norm, htk=False, then log(clamp(.,1e-5)).
  * RMVPE mel front-end (reference RMVPE.py:146-181): center=True
    (torch.stft reflect pads n_fft//2), plain magnitude, mel basis htk=True
    slaney-norm fmin=30 fmax=8000, log(clamp(.,1e-5)).

librosa is not a dependency: the filterbank construction below reproduces
librosa.filters.mel numerics (triangular filters + slaney area norm) from
the published formulas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window — matches torch.hann_window(periodic=True)."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible)
# ---------------------------------------------------------------------------

def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None, htk: bool = False) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) float32; numerics of librosa.filters.mel
    with norm='slaney'."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min = _hz_to_mel(fmin, htk)
    mel_max = _hz_to_mel(fmax, htk)
    mel_f = _mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------

def frame_signal(y, n_fft: int, hop_length: int):
    """(B, L) -> (B, n_frames, n_fft), frames starting at t*hop.

    Gather-based framing; the fused Pallas STFT+mel kernel replaces this on
    the hot path when profiling says so.
    """
    b, length = y.shape
    n_frames = 1 + (length - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :])
    return y[:, idx]


def stft_magnitude(y, *, n_fft: int, hop_length: int, win_length: int,
                   window, center: bool = False, eps: float = 0.0):
    """|STFT| matching torch.stft(onesided, return_complex).abs().

    y: (B, L). window: (win_length,) — zero-padded to n_fft centered, as
    torch does. center=True reflect-pads n_fft//2 on both sides.
    Returns (B, n_frames, n_fft//2 + 1).
    """
    if center:
        p = n_fft // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode="reflect")
    win = jnp.asarray(window)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(y, n_fft, hop_length) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + eps)
    return mag


def stft_complex(y, *, n_fft: int, hop_length: int, win_length: int,
                 window, center: bool = True, pad_mode: str = "reflect"):
    """Complex STFT matching torch.stft(..., return_complex=True).

    y: (B, L) -> (B, n_frames, n_fft//2+1) complex."""
    if center:
        p = n_fft // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode=pad_mode)
    win = jnp.asarray(window)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(y, n_fft, hop_length) * win
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(spec, *, n_fft: int, hop_length: int, win_length: int, window,
          center: bool = True, length: int | None = None):
    """Inverse STFT matching torch.istft (windowed OLA with window-square
    normalization).  spec: (B, T, n_fft//2+1) complex -> (B, L)."""
    win = jnp.asarray(window)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win     # (B, T, n_fft)
    b, t, _ = frames.shape
    total = (t - 1) * hop_length + n_fft
    idx = jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    y = jnp.zeros((b, total), frames.dtype).at[:, idx].add(frames)
    norm = jnp.zeros((total,), win.dtype).at[idx].add(jnp.square(win))
    y = y / jnp.maximum(norm, 1e-11)
    p = n_fft // 2 if center else 0
    y = y[:, p:]
    target = length if length is not None else total - 2 * p
    if y.shape[1] < target:
        y = jnp.pad(y, ((0, 0), (0, target - y.shape[1])))
    else:
        y = y[:, :target]
    return y


def spectrogram(y, *, n_fft: int, hop_length: int, win_length: int):
    """Training linear spectrogram — reference train.py:700-706.

    y: (B, L). Returns (B, n_frames, n_fft//2+1) with n_frames = L//hop
    when hop | L. Reflect-pads (n_fft-hop)/2, center=False, eps=1e-6.
    """
    p = int((n_fft - hop_length) / 2)
    y = jnp.pad(y, ((0, 0), (p, p)), mode="reflect")
    return stft_magnitude(y, n_fft=n_fft, hop_length=hop_length,
                          win_length=win_length,
                          window=hann_window(win_length), center=False,
                          eps=1e-6)


def spec_to_mel(spec, *, n_fft: int, n_mels: int, sample_rate: int,
                fmin: float, fmax: float | None):
    """(B, T, n_fft//2+1) -> (B, T, n_mels) log-mel. Reference train.py:708-713."""
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax,
                                       htk=False))
    mel = jnp.matmul(spec, basis.T)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(y, *, n_fft: int, num_mels: int, sample_rate: int,
                    hop_length: int, win_length: int, fmin: float,
                    fmax: float | None):
    """Reference mel_spectrogram_torch (train.py:715-716)."""
    spec = spectrogram(y, n_fft=n_fft, hop_length=hop_length,
                       win_length=win_length)
    return spec_to_mel(spec, n_fft=n_fft, n_mels=num_mels,
                       sample_rate=sample_rate, fmin=fmin, fmax=fmax)


def rmvpe_mel(audio_16k, *, n_mels: int = 128, n_fft: int = 1024,
              hop_length: int = 160, win_length: int = 1024,
              fmin: float = 30.0, fmax: float = 8000.0):
    """RMVPE mel front-end — reference RMVPE.py:146-181 (htk, center=True).

    audio_16k: (B, L) at 16 kHz. Returns (B, n_mels, T) to match the
    reference's (mel, time) orientation consumed by its U-Net.
    """
    mag = stft_magnitude(audio_16k, n_fft=n_fft, hop_length=hop_length,
                         win_length=win_length, window=hann_window(win_length),
                         center=True)
    basis = jnp.asarray(mel_filterbank(16000, n_fft, n_mels, fmin, fmax,
                                       htk=True))
    mel = jnp.matmul(mag, basis.T)                 # (B, T, n_mels)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    return mel.transpose(0, 2, 1)
