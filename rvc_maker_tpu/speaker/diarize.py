"""Speaker diarization + diarized conversion.

Reference flow (app.py convert_with_whisper:1022-1164): Whisper segments
the audio, each segment gets an ECAPA embedding, AgglomerativeClustering
groups segments into num_speakers, and segments are converted with
alternating RVC models, then merged with silence padding.

Segmentation sources: Whisper transcription segments (models/whisper.py
+ speaker/transcribe.py) when a whisper checkpoint is provided, else the
energy-based VAD fallback.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..models import ecapa_tdnn
from ..ops.stft import mel_filterbank, stft_magnitude, hann_window

logger = logging.getLogger(__name__)

SR = 16000


def fbank(audio_16k: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """(L,) -> (T, n_mels) log-mel features (25 ms window / 10 ms hop),
    the standard speaker-verification front-end shape."""
    mag = stft_magnitude(jnp.asarray(audio_16k[None], jnp.float32),
                         n_fft=400, hop_length=160, win_length=400,
                         window=hann_window(400), center=True)
    power = jnp.square(mag)
    fb = jnp.asarray(mel_filterbank(SR, 400, n_mels, 0.0, 8000.0, htk=True))
    mel = jnp.matmul(power, fb.T)
    return np.asarray(jnp.log(jnp.maximum(mel, 1e-10)))[0]


def energy_vad_segments(audio: np.ndarray, *, min_seg_s: float = 1.0,
                        max_seg_s: float = 10.0,
                        threshold_db: float = -40.0) -> list[tuple[int, int]]:
    """Energy-based segmentation: contiguous voiced stretches split at
    silences (fallback segmenter; Whisper supplies word-aligned segments
    when available)."""
    frame = 400
    hop = 160
    pad = frame // 2
    xp = np.pad(audio.astype(np.float64), (pad, pad))
    n = 1 + (len(xp) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(np.square(xp[idx]), axis=1))
    voiced = rms > 10 ** (threshold_db / 20.0)

    segments = []
    start = None
    for i, v in enumerate(voiced):
        if v and start is None:
            start = i
        elif not v and start is not None:
            segments.append((start * hop, i * hop))
            start = None
    if start is not None:
        segments.append((start * hop, len(audio)))

    # merge tiny gaps / enforce min+max lengths
    merged: list[tuple[int, int]] = []
    for s, e in segments:
        if merged and s - merged[-1][1] < int(0.3 * SR):
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    out = []
    for s, e in merged:
        if e - s < int(min_seg_s * SR):
            continue
        while e - s > int(max_seg_s * SR):
            out.append((s, s + int(max_seg_s * SR)))
            s += int(max_seg_s * SR)
        out.append((s, e))
    return out


def cluster_speakers(audio: np.ndarray, segments: Sequence[tuple[int, int]],
                     ecapa_params: Any, num_speakers: int = 2) -> np.ndarray:
    """Embed each segment and cluster into num_speakers labels
    (reference: AgglomerativeClustering over ECAPA embeddings)."""
    from sklearn.cluster import AgglomerativeClustering

    embs = []
    for (s, e) in segments:
        feats = fbank(audio[s:e])
        emb = np.asarray(ecapa_tdnn.embed(ecapa_params,
                                          jnp.asarray(feats[None])))[0]
        embs.append(emb / (np.linalg.norm(emb) + 1e-9))
    embs = np.stack(embs)
    if len(segments) <= num_speakers:
        return np.arange(len(segments))
    return AgglomerativeClustering(n_clusters=num_speakers).fit_predict(embs)


def whisper_segments(audio_16k: np.ndarray, whisper_params: Any,
                     whisper_dims: Any, tokenizer: Any) -> list[tuple[int, int]]:
    """Word/segment boundaries from Whisper transcription (reference
    convert_with_whisper uses whisper segments as diarization units)."""
    from .transcribe import segments_to_sample_ranges, transcribe

    segs = transcribe(whisper_params, whisper_dims, tokenizer, audio_16k)
    return segments_to_sample_ranges(segs)


def convert_with_diarization(audio_16k: np.ndarray, pipelines: Sequence[Any],
                             settings_list: Sequence[Any],
                             ecapa_params: Any,
                             sids: Optional[Sequence[int]] = None,
                             segments: Optional[Sequence[tuple[int, int]]] = None,
                             whisper=None):
    """Convert each diarized segment with the pipeline assigned to its
    speaker cluster; unvoiced gaps stay silent (reference merge semantics:
    silence-padded concatenation, app.py:1130-1160).

    pipelines/settings_list: one per speaker (cycled if fewer than
    clusters).  whisper: optional (params, dims, tokenizer) triple — when
    given, segmentation comes from Whisper transcription instead of
    energy VAD.  Returns waveform at pipelines[0].cfg.sr.
    """
    if segments is None and whisper is not None:
        segments = whisper_segments(audio_16k, *whisper)
    if segments is None:
        segments = energy_vad_segments(audio_16k)
    if not segments:
        return np.zeros(0, np.float32)
    labels = cluster_speakers(audio_16k, segments, ecapa_params,
                              num_speakers=len(pipelines))
    sids = sids or [0] * len(pipelines)

    out_sr = pipelines[0].cfg.sr
    total = int(len(audio_16k) / SR * out_sr)
    out = np.zeros(total, np.float32)
    for (s, e), lab in zip(segments, labels):
        pipe = pipelines[lab % len(pipelines)]
        st = settings_list[lab % len(settings_list)]
        seg_out = pipe.convert_utterance(audio_16k[s:e], sids[lab % len(sids)], st)
        o_s = int(s / SR * out_sr)
        n = min(len(seg_out), total - o_s)
        out[o_s : o_s + n] = seg_out[:n]
    return out
