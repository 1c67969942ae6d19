"""YIN pitch estimator, fully vectorized in JAX (librosa.yin numerics).

The reference offers librosa.yin as one of its ~20 F0 methods
(reference convert.py:278-281 get_f0_yin).  librosa is absent from this
image, so this is a from-scratch implementation of the published YIN
algorithm following librosa's formulation: FFT autocorrelation ->
difference function -> cumulative-mean normalization -> threshold trough
with parabolic interpolation.  Runs as one jitted program per bucket —
frames are batched, no python loops.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stft import frame_signal


def _parabolic_shifts(y):
    """Per-sample parabolic interpolation offsets of local minima.

    y: (..., tau). Returns shifts in (-0.5, 0.5)."""
    a = (y[..., 2:] + y[..., :-2] - 2 * y[..., 1:-1]) / 2.0
    b = (y[..., 2:] - y[..., :-2]) / 2.0
    shift = jnp.where(jnp.abs(a) > 1e-12, -b / (2.0 * a), 0.0)
    shift = jnp.where(jnp.abs(shift) < 1.0, shift, 0.0)
    return jnp.pad(shift, [(0, 0)] * (y.ndim - 1) + [(1, 1)])


@partial(jax.jit, static_argnames=("sr", "frame_length", "hop_length",
                                   "fmin", "fmax"))
def yin(audio, *, sr: int = 16000, fmin: float = 50.0, fmax: float = 1100.0,
        frame_length: int = 2048, hop_length: int = 160,
        trough_threshold: float = 0.1):
    """audio: (B, L) -> f0 (B, n_frames) in Hz (always voiced, like
    librosa.yin; callers gate/interp as the reference does)."""
    win_length = frame_length // 2
    min_period = max(int(sr / fmax), 1)
    max_period = min(math.ceil(sr / fmin), win_length - 1)

    pad = frame_length // 2
    y = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, frame_length, hop_length)        # (B, T, W)

    # autocorrelation over lag 0..win_length via FFT
    a = jnp.fft.rfft(frames, frame_length, axis=-1)
    # correlation of frame with its first half reversed
    b = jnp.fft.rfft(jnp.flip(frames[..., 1 : win_length + 1], axis=-1),
                     frame_length, axis=-1)
    acf = jnp.fft.irfft(a * b, frame_length, axis=-1)[..., win_length:]
    acf = jnp.where(jnp.abs(acf) < 1e-6, 0.0, acf)

    # energy terms
    e = jnp.cumsum(jnp.square(frames), axis=-1)
    energy = e[..., win_length:] - jnp.pad(e[..., :-win_length - 1],
                                           [(0, 0)] * (frames.ndim - 1) + [(1, 0)])
    energy = jnp.where(jnp.abs(energy) < 1e-6, 0.0, energy)

    # difference function d(tau), tau = 0..win_length
    d = energy[..., :1] + energy - 2.0 * acf

    # cumulative mean normalized difference
    tau_range = jnp.arange(1, d.shape[-1])
    cmean = jnp.cumsum(d[..., 1:], axis=-1) / tau_range
    cmndf = d[..., min_period : max_period + 1] / (
        cmean[..., min_period - 1 : max_period] + 1e-20)

    shifts = _parabolic_shifts(cmndf)

    # first trough below threshold, else global min
    is_trough = jnp.pad(
        (cmndf[..., 1:-1] < cmndf[..., :-2]) & (cmndf[..., 1:-1] <= cmndf[..., 2:]),
        [(0, 0)] * (cmndf.ndim - 1) + [(1, 1)])
    is_trough = is_trough.at[..., 0].set(cmndf[..., 0] < cmndf[..., 1])
    below = is_trough & (cmndf < trough_threshold)
    any_below = jnp.any(below, axis=-1)
    first_below = jnp.argmax(below, axis=-1)
    global_min = jnp.argmin(cmndf, axis=-1)
    tau_idx = jnp.where(any_below, first_below, global_min)

    shift = jnp.take_along_axis(shifts, tau_idx[..., None], axis=-1)[..., 0]
    period = min_period + tau_idx + shift
    return sr / period
