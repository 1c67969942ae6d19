"""CREPE pitch estimator in JAX (5 capacities) + host-side Viterbi decode.

Re-implements reference main/library/predictors/CREPE.py: 1024-sample
frames at 16 kHz, per-frame mean/std normalization, 6 conv layers
(conv -> ReLU -> BatchNorm -> maxpool2) -> linear -> sigmoid over 360
pitch bins; decoding by Viterbi with a triangular transition prior, then
mean/median smoothing and periodicity gating.

TPU-first: the conv stack is batched over ALL frames at once (one MXU
program); Viterbi is inherently sequential and stays on host in numpy
(SURVEY.md §7 hard parts — CREPE fallback).  BatchNorm is folded at
import (eps = 1e-3, the reference's torch BN eps).

The reference adds random triangular dither in bins_to_frequency
(CREPE.py:117-119) — here dither is an explicit argument (None = off)
so parity is testable (SURVEY.md §4 noise seams).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv1d

Params = Any

CENTS_PER_BIN = 20.0
PITCH_BINS = 360
SAMPLE_RATE = 16000
WINDOW_SIZE = 1024

CAPACITIES = {
    "full": ([1, 1024, 128, 128, 128, 256], [1024, 128, 128, 128, 256, 512], 2048),
    "large": ([1, 768, 96, 96, 96, 192], [768, 96, 96, 96, 192, 384], 1536),
    "medium": ([1, 512, 64, 64, 64, 128], [512, 64, 64, 64, 128, 256], 1024),
    "small": ([1, 256, 32, 32, 32, 64], [256, 32, 32, 32, 64, 128], 512),
    "tiny": ([1, 128, 16, 16, 16, 32], [128, 16, 16, 16, 32, 64], 256),
}
_KERNELS = [512] + [64] * 5
_STRIDES = [4] + [1] * 5
_PADS = [(254, 254)] + [(31, 32)] * 5


def frame_audio(audio, hop_length: int):
    """(B, L) 16 kHz -> normalized frames (B, T, 1024), T = 1 + L//hop.
    Matches reference preprocess (CREPE.py:148-168): center pad 512,
    per-frame mean/std normalize."""
    b, L = audio.shape
    total = 1 + L // hop_length
    x = jnp.pad(audio, ((0, 0), (WINDOW_SIZE // 2, WINDOW_SIZE // 2)))
    idx = jnp.arange(total)[:, None] * hop_length + jnp.arange(WINDOW_SIZE)[None, :]
    frames = x[:, idx]                                          # (B, T, 1024)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # torch.std default is Bessel-corrected (ddof=1) — match it
    std = jnp.std(frames, axis=-1, keepdims=True, ddof=1)
    return frames / jnp.maximum(std, 1e-10)


def crepe_apply(p: Params, frames):
    """frames: (N, 1024) normalized -> sigmoid probabilities (N, 360)."""
    x = frames[:, :, None]                                      # (N, 1024, 1)
    for i in range(6):
        x = conv1d(x, p["convs"][i]["w"], p["convs"][i]["b"],
                   stride=_STRIDES[i], padding=_PADS[i])
        x = jax.nn.relu(x)
        x = x * p["bns"][i]["scale"] + p["bns"][i]["shift"]
        # maxpool (2,1) stride (2,1) over time
        n, t, c = x.shape
        x = jnp.max(x.reshape(n, t // 2, 2, c), axis=2)
    n, t, c = x.shape
    x = x.reshape(n, t * c)                                     # time-major
    return jax.nn.sigmoid(x @ p["classifier"]["w"] + p["classifier"]["b"])


def predict_probs(p: Params, audio, hop_length: int = 160):
    """(B, L) -> (B, T, 360) pitch-bin probabilities, one jit program."""
    frames = frame_audio(audio, hop_length)
    b, t, _ = frames.shape
    probs = crepe_apply(p, frames.reshape(b * t, WINDOW_SIZE))
    return probs.reshape(b, t, PITCH_BINS)


# ---------------------------------------------------------------------------
# decode (host-side numpy; Viterbi is sequential)
# ---------------------------------------------------------------------------

def _transition_matrix() -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(PITCH_BINS), np.arange(PITCH_BINS))
    tr = np.maximum(12 - np.abs(xx - yy), 0).astype(np.float64)
    return tr / tr.sum(axis=1, keepdims=True)


_TRANSITION = None


def viterbi_decode(probs: np.ndarray) -> np.ndarray:
    """probs: (T, 360) observation probabilities -> bin path (T,) int64.
    Standard log-space Viterbi with the triangular transition prior
    (reference CREPE.py:71-81 via librosa.sequence.viterbi)."""
    global _TRANSITION
    if _TRANSITION is None:
        _TRANSITION = _transition_matrix()
    log_trans = np.log(_TRANSITION + 1e-300)
    log_obs = np.log(np.maximum(probs.astype(np.float64), 1e-300))
    t_len = probs.shape[0]
    score = np.full((PITCH_BINS,), -np.log(PITCH_BINS)) + log_obs[0]
    back = np.zeros((t_len, PITCH_BINS), np.int64)
    for t in range(1, t_len):
        cand = score[:, None] + log_trans            # (from, to)
        back[t] = np.argmax(cand, axis=0)
        score = cand[back[t], np.arange(PITCH_BINS)] + log_obs[t]
    path = np.zeros((t_len,), np.int64)
    path[-1] = int(np.argmax(score))
    for t in range(t_len - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path


def bins_to_frequency(bins, dither: np.ndarray | None = None):
    """cents = 20*bin + 1997.379...; f0 = 10 * 2^(cents/1200).
    The reference adds triangular dither (c=0.5, ±20 cents); pass it
    explicitly or None for the deterministic value."""
    cents = CENTS_PER_BIN * np.asarray(bins, np.float64) + 1997.3794084376191
    if dither is not None:
        cents = cents + dither
    return 10.0 * 2.0 ** (cents / 1200.0)


def frequency_to_bins(freq, quantize=np.floor):
    return quantize(((1200 * np.log2(np.asarray(freq) / 10.0))
                     - 1997.3794084376191) / CENTS_PER_BIN).astype(np.int64)


def decode(probs: np.ndarray, fmin: float = 50.0, fmax: float = 2006.0,
           return_periodicity: bool = False, dither_rng=None):
    """probs: (B, T, 360) from predict_probs.  Applies fmin/fmax band
    masking then Viterbi (reference postprocess, CREPE.py:137-146)."""
    probs = np.array(probs, np.float32)
    lo = int(frequency_to_bins(fmin))
    hi = int(frequency_to_bins(fmax, np.ceil))
    masked = probs.copy()
    masked[..., :lo] = -np.inf
    masked[..., hi:] = -np.inf
    # reference viterbi() re-softmaxes over bins
    e = np.exp(masked - masked.max(axis=-1, keepdims=True))
    obs = e / e.sum(axis=-1, keepdims=True)

    bins = np.stack([viterbi_decode(obs[i]) for i in range(obs.shape[0])])
    if dither_rng is not None:
        dither = dither_rng.triangular(-CENTS_PER_BIN, 0, CENTS_PER_BIN,
                                       size=bins.shape)
    else:
        dither = None
    pitch = bins_to_frequency(bins, dither).astype(np.float32)
    if not return_periodicity:
        return pitch
    peri = np.take_along_axis(probs, bins[..., None], axis=-1)[..., 0]
    return pitch, peri


def mean_filter(signal: np.ndarray, win: int = 3) -> np.ndarray:
    """NaN-aware moving average (reference CREPE.py:176-187)."""
    out = np.empty_like(signal)
    half = win // 2
    for b in range(signal.shape[0]):
        s = signal[b]
        for i in range(len(s)):
            w = s[max(0, i - half) : i + half + 1]
            valid = w[~np.isnan(w)]
            out[b, i] = valid.mean() if len(valid) else np.nan
    return out


def median_filter(signal: np.ndarray, win: int) -> np.ndarray:
    """NaN-aware moving median with reflect padding (CREPE.py:189-209)."""
    half = win // 2
    out = np.empty_like(signal)
    for b in range(signal.shape[0]):
        s = np.pad(signal[b], (half, half), mode="reflect")
        m = np.pad(~np.isnan(signal[b]), (half, half), constant_values=False)
        for i in range(signal.shape[1]):
            w = s[i : i + win][m[i : i + win]]
            out[b, i] = np.median(w) if len(w) else np.nan
    return out


# ---------------------------------------------------------------------------
# torch checkpoint import (crepe_{capacity}.pth)
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def params_from_state_dict(sd, capacity: str = "full") -> Params:
    p: dict = {"convs": [], "bns": []}
    eps = 0.0010000000474974513  # reference CREPE.py:38
    for i in range(1, 7):
        w = _np(sd[f"conv{i}.weight"])           # (Cout, Cin, Kh, 1)
        p["convs"].append({"w": np.transpose(w[:, :, :, 0], (2, 1, 0)),
                           "b": _np(sd[f"conv{i}.bias"])})
        gamma = _np(sd[f"conv{i}_BN.weight"])
        beta = _np(sd[f"conv{i}_BN.bias"])
        mean = _np(sd[f"conv{i}_BN.running_mean"])
        var = _np(sd[f"conv{i}_BN.running_var"])
        scale = gamma / np.sqrt(var + eps)
        p["bns"].append({"scale": scale.astype(np.float32),
                         "shift": (beta - mean * scale).astype(np.float32)})
    p["classifier"] = {"w": _np(sd["classifier.weight"]).T,
                       "b": _np(sd["classifier.bias"])}
    return p


def load_crepe_pth(path: str, capacity: str = "full") -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return params_from_state_dict(sd, capacity)
