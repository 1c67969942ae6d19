"""Spectral-gating noise reduction (jittable), behavioral equivalent of
the reference's vendored noisereduce (main/tools/noisereduce.py).

Stationary mode: per-frequency dB threshold = mean + 1.5*std of the
noise (or the signal itself); non-stationary mode: temperature sigmoid
on the relative excess over a moving-average-smoothed magnitude.
The binary/soft mask is scaled by prop_decrease, smoothed with a
triangular (freq x time) kernel, applied to the STFT, and inverted.
Long audio is processed in 600k-sample chunks with 30k padding on host,
matching the reference's streaming wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, istft, stft_complex


def _amp_to_db(x, top_db: float = 40.0):
    eps = jnp.finfo(jnp.float32).eps
    x_db = 20.0 * jnp.log10(jnp.abs(x) + eps)
    floor = jnp.max(x_db, axis=-1, keepdims=True) - top_db
    return jnp.maximum(x_db, floor)


def _smoothing_filter(n_grad_freq: int, n_grad_time: int) -> np.ndarray:
    def tri(n):
        up = np.linspace(0, 1, n + 1, endpoint=False)
        down = np.linspace(1, 0, n + 2)
        return np.concatenate([up, down])[1:-1]

    f = np.outer(tri(n_grad_freq), tri(n_grad_time))
    return (f / f.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "stationary", "n_fft", "win_length",
                                   "hop_length", "freq_mask_smooth_hz",
                                   "time_mask_smooth_ms", "n_movemean"))
def _gate(x, xn, *, sr: int, stationary: bool, prop_decrease: float,
          n_std_thresh: float = 1.5, n_thresh_nonstat: float = 2.0,
          temp_coeff: float = 0.1, n_movemean: int = 20, n_fft: int = 1024,
          win_length: int = 1024, hop_length: int = 256,
          freq_mask_smooth_hz: int = 500, time_mask_smooth_ms: int = 50):
    """x: (B, L); xn: noise clip (B, Ln) or None."""
    win = hann_window(win_length)
    X = stft_complex(x, n_fft=n_fft, hop_length=hop_length,
                     win_length=win_length, window=win, center=True,
                     pad_mode="constant")                      # (B, T, F)
    mag = jnp.abs(X)

    if stationary:
        ref = X if xn is None else stft_complex(
            xn, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            window=win, center=True, pad_mode="constant")
        ref_db = _amp_to_db(ref.transpose(0, 2, 1))            # (B, F, T)
        mean_f = jnp.mean(ref_db, axis=-1)                     # (B, F)
        std_f = jnp.std(ref_db, axis=-1, ddof=1)  # torch.std_mean default
        thresh = (mean_f + std_f * n_std_thresh)[:, None, :]   # (B, 1, F)
        sig_mask = (_amp_to_db(X.transpose(0, 2, 1)).transpose(0, 2, 1)
                    > thresh).astype(jnp.float32)
    else:
        # moving-average smoothing over time per frequency bin
        kernel = jnp.ones((n_movemean,)) / n_movemean
        sm = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, kernel, mode="same"),
                               in_axes=1, out_axes=1))(mag)
        ratio = (mag - sm) / jnp.maximum(sm, 1e-12)
        sig_mask = jax.nn.sigmoid((ratio - n_thresh_nonstat) / temp_coeff)

    sig_mask = prop_decrease * (sig_mask - 1.0) + 1.0

    n_grad_freq = max(int(freq_mask_smooth_hz / (sr / (n_fft / 2))), 1)
    n_grad_time = max(int(time_mask_smooth_ms / (hop_length / sr * 1000)), 1)
    if n_grad_freq > 1 or n_grad_time > 1:
        filt = jnp.asarray(_smoothing_filter(n_grad_freq, n_grad_time))
        # mask: (B, T, F); conv over (F=H, T=W) like the reference conv2d
        m = sig_mask.transpose(0, 2, 1)[..., None]             # (B, F, T, 1)
        kh, kw = filt.shape
        m = jax.lax.conv_general_dilated(
            m, filt[:, :, None, None], (1, 1),
            [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sig_mask = m[..., 0].transpose(0, 2, 1)

    Y = X * sig_mask
    return istft(Y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                 window=win, center=True, length=x.shape[1])


def reduce_noise(y: np.ndarray, sr: int, *, stationary: bool = False,
                 y_noise: np.ndarray | None = None,
                 prop_decrease: float = 1.0, time_constant_s: float = 2.0,
                 chunk_size: int = 600000, padding: int = 30000,
                 n_fft: int = 1024) -> np.ndarray:
    """Host entry point (reference reduce_noise, noisereduce.py:199)."""
    flat = y.ndim == 1
    x = np.atleast_2d(np.asarray(y, np.float32))
    hop = n_fft // 4
    n_movemean = max(int(time_constant_s / hop * sr), 2)
    xn = None
    if y_noise is not None:
        xn = np.atleast_2d(np.asarray(y_noise, np.float32))

    n = x.shape[1]
    out = np.zeros_like(x)
    for start in range(0, n, chunk_size):
        end = min(start + chunk_size, n)
        # the reference zero-pads each chunk by `padding` on both sides
        # (SpectralGate._read_chunk fills zeros beyond the signal) — the
        # pad frames participate in the dB statistics, so mirror it
        buf = np.zeros((x.shape[0], end - start + 2 * padding), np.float32)
        lo = max(start - padding, 0)
        hi = min(end + padding, n)
        buf[:, lo - (start - padding) : lo - (start - padding) + (hi - lo)] = x[:, lo:hi]
        # jnp.convolve(mode="same") returns kernel-sized output when the
        # kernel outgrows the signal — clamp the moving-mean window to
        # the chunk's frame count (short clips at high sample rates)
        n_frames = buf.shape[1] // hop + 1
        seg = _gate(jnp.asarray(buf),
                    None if xn is None else jnp.asarray(xn),
                    sr=sr, stationary=stationary,
                    prop_decrease=float(prop_decrease),
                    n_movemean=min(n_movemean, n_frames), n_fft=n_fft,
                    win_length=n_fft, hop_length=hop)
        out[:, start:end] = np.asarray(seg)[:, padding : padding + (end - start)]
    return out[0] if flat else out
