"""Source separation pipeline: chunked apply + stem orchestration.

Reference: demucs/apply.py:112-219 (shift averaging, triangular
overlap-add split, bag-of-models weighting) and separator_music.py
(vocals/instrumental routing, karaoke/dereverb passes, noisereduce).

TPU-first: each fixed-size segment is one jitted program (static shapes);
segments could batch across a mesh like conversion chunks.  Model
weights load from demucs-format checkpoints via
models.demucs.htdemucs_params_from_state_dict.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models import demucs as demucs_mod

logger = logging.getLogger(__name__)


def _triangle_weight(segment: int, transition_power: float = 1.0) -> np.ndarray:
    w = np.concatenate([np.arange(1, segment // 2 + 1),
                        np.arange(segment - segment // 2, 0, -1)]).astype(np.float64)
    return (w / w.max()) ** transition_power


def apply_model(params: Any, cfg: demucs_mod.DemucsConfig, mix: np.ndarray,
                *, shifts: int = 1, overlap: float = 0.25,
                transition_power: float = 1.0,
                rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """mix: (B, C, L) -> (B, S, C, L), reference apply_model semantics:
    random shift averaging over `shifts`, triangular overlap-add over
    `segment`-sized windows."""
    if rng is None:
        rng = np.random.RandomState(0)
    b, c, length = mix.shape

    if shifts and shifts > 0:
        max_shift = int(0.5 * cfg.samplerate)
        padded = np.pad(mix, ((0, 0), (0, 0), (max_shift, max_shift)))
        out = None
        for _ in range(shifts):
            offset = rng.randint(0, max_shift + 1)
            shifted = padded[..., offset : offset + length + max_shift]
            so = apply_model(params, cfg, shifted, shifts=0, overlap=overlap,
                             transition_power=transition_power)
            so = so[..., max_shift - offset : max_shift - offset + length]
            out = so if out is None else out + so
        return out / shifts

    # split into segment windows with triangular overlap-add
    segment = int(cfg.samplerate * cfg.segment)
    stride = int((1 - overlap) * segment)
    weight = _triangle_weight(segment, transition_power)
    n_src = len(cfg.sources)
    out = np.zeros((b, n_src, c, length), np.float64)
    sum_weight = np.zeros(length, np.float64)

    # close over params: the tree carries python structure flags (freq/
    # stride/...) that must stay static; weights become jit constants
    fn = jax.jit(lambda chunk: demucs_mod.apply_model_single(params, cfg, chunk))
    for offset in range(0, length, stride):
        chunk = mix[..., offset : offset + segment]
        pad_right = segment - chunk.shape[-1]
        if pad_right:
            chunk = np.pad(chunk, ((0, 0), (0, 0), (0, pad_right)))
        res = np.asarray(fn(jnp.asarray(chunk, jnp.float32)))
        res = res[..., : min(segment, length - offset)]
        n = res.shape[-1]
        out[..., offset : offset + n] += weight[:n] * res
        sum_weight[offset : offset + n] += weight[:n]
    assert sum_weight.min() > 0
    return (out / sum_weight).astype(np.float32)


def apply_bag(bag: Sequence[tuple[Any, demucs_mod.DemucsConfig, Sequence[float]]],
              mix: np.ndarray, **kw) -> np.ndarray:
    """Bag of models with per-source weights (reference BagOfModels)."""
    n_src = len(bag[0][1].sources)
    totals = np.zeros(n_src)
    estimate = None
    for params, cfg, weights in bag:
        o = apply_model(params, cfg, mix, **kw)
        for k, w in enumerate(weights):
            o[:, k] *= w
            totals[k] += w
        estimate = o if estimate is None else estimate + o
    for k in range(n_src):
        estimate[:, k] /= totals[k]
    return estimate


def separate_vocals(params: Any, cfg: demucs_mod.DemucsConfig,
                    audio: np.ndarray, sr: int, *,
                    invert_using_spec: bool = False, **kw):
    """audio: (L,) or (L, 2) at any rate -> (vocals, instrumental) at
    cfg.samplerate, stereo (reference separation flow: sum non-vocal
    stems into the instrumental; invert_using_spec uses spectral
    subtraction of the vocal stem from the mixture instead —
    reference common_separator.py spec_utils.invert_stem)."""
    from ..utils.audio import resample

    if audio.ndim == 1:
        audio = np.stack([audio, audio], axis=1)
    if sr != cfg.samplerate:
        audio = np.stack(
            [resample(audio[:, 0], sr, cfg.samplerate),
             resample(audio[:, 1], sr, cfg.samplerate)], axis=1)
    mix = audio.T[None]                                 # (1, 2, L)
    ref_std = mix.std() + 1e-8
    ref_mean = mix.mean()
    mix_n = (mix - ref_mean) / ref_std
    stems = apply_model(params, cfg, mix_n.astype(np.float32), **kw)
    stems = stems * ref_std + ref_mean
    v_idx = cfg.sources.index("vocals")
    vocals = stems[0, v_idx].T
    if invert_using_spec:
        from .spec_tools import invert_stem

        inst = invert_stem(audio.T.astype(np.float64),
                           stems[0, v_idx].astype(np.float64))
        inst = inst[: len(audio)]
    else:
        inst = sum(stems[0, k] for k in range(len(cfg.sources))
                   if k != v_idx).T
    return vocals.astype(np.float32), inst.astype(np.float32)
