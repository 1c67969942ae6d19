"""Separation spectral utilities (reference uvr5_separator/spec_utils.py).

The reference's 899-line grab-bag serves mostly the ONNX/VR
architectures; these are the pieces its active demucs/MDX separation
flow actually calls (common_separator.py / separator drivers):
normalize, reshape_sources/to_shape, reduce_vocal_aggressively,
invert_audio / invert_stem (spectral secondary-stem inversion).

STFT runs through ops.stft (librosa semantics: centered hann, constant
padding, n_fft 2048 / hop 1024) on whatever backend jax targets.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.stft import hann_window

N_FFT = 2048
HOP = 1024


def _stft(wave: np.ndarray) -> np.ndarray:
    """librosa.stft semantics (center=True, constant pad).
    wave: (C, L) -> complex (C, F, T)."""
    x = jnp.asarray(wave, jnp.float32)
    pad = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + (x.shape[-1] - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx] * jnp.asarray(hann_window(N_FFT))
    z = jnp.fft.rfft(frames, axis=-1)
    return np.asarray(z.transpose(0, 2, 1))


def _istft(spec: np.ndarray, length: int | None = None) -> np.ndarray:
    """librosa.istft semantics. spec: (C, F, T) -> (C, L)."""
    z = jnp.asarray(spec).transpose(0, 2, 1)          # (C, T, F)
    win = jnp.asarray(hann_window(N_FFT))
    t = jnp.fft.irfft(z, n=N_FFT, axis=-1) * win
    frames = t.shape[1]
    total = (frames - 1) * HOP + N_FFT
    idx = jnp.arange(frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    y = jnp.zeros((t.shape[0], total), t.dtype).at[:, idx].add(t)
    norm = jnp.zeros((total,), win.dtype).at[idx].add(jnp.square(win))
    y = y / jnp.maximum(norm, 1e-11)
    pad = N_FFT // 2
    y = y[:, pad:-pad]
    if length is not None:
        y = y[:, :length]
    return np.asarray(y)


def wave_to_spectrogram(wave: np.ndarray) -> np.ndarray:
    """(C, L) or (L,) -> (C, F, T) complex (spec_utils.py:381-385)."""
    wave = np.asarray(wave)
    if wave.ndim == 1:
        wave = np.stack([wave, wave])
    return _stft(wave)


def spectrogram_to_wave(spec: np.ndarray,
                        length: int | None = None) -> np.ndarray:
    if spec.ndim == 2:
        spec = np.stack([spec, spec])
    return _istft(spec, length)


def normalize(wave: np.ndarray, max_peak: float = 1.0) -> np.ndarray:
    """Peak-limit in place semantics (spec_utils.py:66-70)."""
    maxv = np.abs(wave).max()
    if maxv > max_peak:
        wave = wave * (max_peak / maxv)
    return wave


def to_shape(x: np.ndarray, target_shape) -> np.ndarray:
    pads = [(0, t - s) for s, t in zip(x.shape, target_shape)]
    return np.pad(x, tuple(pads), mode="constant")


def reshape_sources(wav_1: np.ndarray, wav_2: np.ndarray) -> np.ndarray:
    """Match wav_2 to wav_1's shape (spec_utils.py:585-593)."""
    if wav_1.shape > wav_2.shape:
        wav_2 = to_shape(wav_2, wav_1.shape)
    if wav_1.shape < wav_2.shape:
        ln = min(wav_1.shape[1], wav_2.shape[1])
        wav_2 = wav_2[:, :ln]
    ln = min(wav_1.shape[1], wav_2.shape[1])
    return wav_2[:, :ln]


def reduce_vocal_aggressively(X: np.ndarray, y: np.ndarray,
                              softmask: float) -> np.ndarray:
    """(spec_utils.py:101-105): clamp y's magnitude where the residual
    exceeds it, keep y's phase."""
    y_mag = np.abs(y)
    v_mag = np.abs(X - y)
    return (np.clip(y_mag - v_mag * (v_mag > y_mag) * softmask, 0, np.inf)
            * np.exp(1.0j * np.angle(y)))


def invert_audio(specs: list[np.ndarray], invert_p: bool = True) -> np.ndarray:
    """Spectral inversion of a stem against the mixture
    (spec_utils.py:387-399)."""
    ln = min(specs[0].shape[2], specs[1].shape[2])
    specs = [specs[0][:, :, :ln], specs[1][:, :, :ln]]
    if invert_p:
        x_mag, y_mag = np.abs(specs[0]), np.abs(specs[1])
        return specs[1] - (np.where(x_mag >= y_mag, x_mag, y_mag)
                           * np.exp(1.0j * np.angle(specs[0])))
    specs[1] = reduce_vocal_aggressively(specs[0], specs[1], 0.2)
    return specs[0] - specs[1]


def invert_stem(mixture: np.ndarray, stem: np.ndarray) -> np.ndarray:
    """Secondary stem by spectral subtraction (spec_utils.py:401-402).
    mixture/stem: (C, L) waves -> (L, C) inverted wave."""
    v_spec = invert_audio([wave_to_spectrogram(mixture),
                           wave_to_spectrogram(stem)])
    return -spectrogram_to_wave(v_spec).T
