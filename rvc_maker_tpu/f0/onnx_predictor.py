"""ONNX F0 predictors (reference --f0_onnx, library/utils.py:23-27).

The reference runs `rmvpe.onnx` / `crepe_*.onnx` / `fcpe*.onnx` through
onnxruntime; here the same graphs execute on the JAX ONNX executor
(interop/onnx_run.py), so the network runs on TPU while the shared
front-ends (mel / framing) and decoders (local-average cents, Viterbi)
are the ones already parity-tested against the torch predictors.

Graph I/O contracts (reference usage):
  * RMVPE:  mel (B, 128, T) -> salience (B, T, 360)   (RMVPE.py:214)
  * CREPE:  frames (N, 1024) -> probs (N, 360)        (CREPE.py:95)
  * FCPE:   mel (B, T, 128) + threshold () -> f0 (B, T, 1)  (FCPE.py:791)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _run1(graph, feed: dict):
    outs = graph.run(feed)
    return outs[0] if isinstance(outs, (list, tuple)) else outs


def rmvpe_onnx_infer(graph, audio_16k, *, thred: float = 0.03,
                     f0_min: float | None = None,
                     f0_max: float | None = None):
    """audio_16k: (B, L) -> f0 (B, T) Hz via an rmvpe.onnx graph."""
    from ..models.rmvpe import decode_cents, rmvpe_mel

    mel = rmvpe_mel(audio_16k)                       # (B, 128, T)
    n_frames = mel.shape[-1]
    pad_to = 32 * ((n_frames - 1) // 32 + 1)
    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - n_frames)),
                  mode="reflect")
    hidden = _run1(graph, {graph.input_names[0]: mel.astype(jnp.float32)})
    hidden = jnp.asarray(hidden)[:, :n_frames]
    f0 = decode_cents(hidden.astype(jnp.float32), thred=thred)
    if f0_min is not None:
        f0 = jnp.where((f0 < f0_min) | (f0 > f0_max), 0.0, f0)
    return f0


def crepe_onnx_infer(graph, audio_16k, *, hop_length: int = 160,
                     fmin: float = 50.0, fmax: float = 1100.0,
                     mangio: bool = False, filter_radius: int = 3):
    """audio_16k: (L,) numpy -> f0 (T,) via a crepe_*.onnx graph; shared
    framing + Viterbi/argmax decode from models/crepe."""
    from ..models import crepe as crepe_mod

    frames = crepe_mod.frame_audio(jnp.asarray(audio_16k)[None],
                                   hop_length)[0]       # (T, 1024)
    probs = _run1(graph, {graph.input_names[0]:
                          jnp.asarray(frames, jnp.float32)})
    probs = np.asarray(probs)                            # (T, 360)
    if mangio:
        bins = probs.argmax(axis=-1)
        f0 = crepe_mod.bins_to_frequency(bins,
                                         dither=np.zeros_like(bins, float))
        return np.where(probs.max(axis=-1) > 1e-3, f0, 0.0)
    f0, periodicity = crepe_mod.decode(probs[None], fmin=fmin, fmax=fmax,
                                       return_periodicity=True)
    f0 = crepe_mod.mean_filter(f0, 3)
    periodicity = crepe_mod.median_filter(periodicity, filter_radius)
    return np.where(periodicity > 0.1, f0, 0.0)[0]


def fcpe_onnx_infer(graph, audio_16k, *, threshold: float = 0.03,
                    p_len: int | None = None):
    """audio_16k: (B, L) -> f0 (B, p_len) via an fcpe .onnx graph (graph
    takes mel + threshold and outputs Hz directly, FCPE.py:791)."""
    from ..models.fcpe import fcpe_mel, interp_to_length

    mel = fcpe_mel(audio_16k)                            # (B, T, 128)
    feeds = {graph.input_names[0]: mel.astype(jnp.float32)}
    if len(graph.input_names) > 1:
        feeds[graph.input_names[1]] = jnp.asarray(threshold, jnp.float32)
    f0 = jnp.asarray(_run1(graph, feeds))
    if f0.ndim == 3:
        f0 = f0[..., 0]
    if p_len is not None:
        f0 = interp_to_length(f0, p_len)
    return f0
