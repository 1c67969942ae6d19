"""Segment-level transcription: 30 s windows -> timestamped segments.

The reference transcribe_function (whisper.py:299-520) drives decoding
window by window with temperature fallback and seek logic.  This is the
greedy-core equivalent producing the (start, end, text) segments the
diarized-conversion flow consumes (reference convert_with_whisper,
app.py:1022-1164); temperature fallback and word-level DTW timestamps
are round-2.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..models import whisper as wmod
from .whisper_tokenizer import WhisperTokenizer

logger = logging.getLogger(__name__)


def transcribe(params: Any, dims: wmod.WhisperDims, tok: WhisperTokenizer,
               audio16k: np.ndarray, *, max_windows: int = 100,
               suppress_non_speech: bool = True) -> list[dict]:
    """audio16k: (L,) -> [{"start": s, "end": s, "text": str, "tokens": [...]}]"""
    suppress = list(tok.non_speech_tokens()) if suppress_non_speech else []
    suppress += [tok.sot, tok.no_speech, tok.no_timestamps, tok.sot_prev]

    segments: list[dict] = []
    seek = 0  # in samples
    n = len(audio16k)
    windows = 0
    while seek < n and windows < max_windows:
        windows += 1
        chunk = audio16k[seek : seek + wmod.N_SAMPLES]
        time_offset = seek / wmod.SAMPLE_RATE
        padded = np.zeros(wmod.N_SAMPLES, np.float32)
        padded[: len(chunk)] = chunk

        mel = wmod.log_mel(jnp.asarray(padded[None]), dims.n_mels)
        feats = wmod.encode_audio(params["encoder"], dims, mel)
        tokens = wmod.greedy_decode(
            params["decoder"], dims, feats, tok.sot_sequence(),
            eot=tok.eot, suppress=np.asarray(suppress, np.int64),
            timestamp_begin=tok.timestamp_begin)

        # split on timestamp tokens: <|t0|> text <|t1|> <|t2|> text <|t3|> ...
        ts = tok.timestamp_begin
        cur_start = None
        cur_tokens: list[int] = []
        last_ts_sec = 0.0
        for t in tokens:
            if t >= ts:
                sec = tok.timestamp_to_seconds(t)
                if cur_start is None:
                    cur_start = sec
                else:
                    if cur_tokens:
                        segments.append({
                            "start": time_offset + cur_start,
                            "end": time_offset + sec,
                            "tokens": cur_tokens,
                            "text": tok.decode(cur_tokens).strip(),
                        })
                    last_ts_sec = sec
                    cur_start = None
                    cur_tokens = []
            else:
                cur_tokens.append(t)
        if cur_start is not None and cur_tokens:
            end = min(len(chunk) / wmod.SAMPLE_RATE, 30.0)
            segments.append({
                "start": time_offset + cur_start,
                "end": time_offset + end,
                "tokens": cur_tokens,
                "text": tok.decode(cur_tokens).strip(),
            })
            last_ts_sec = end

        advance = int(last_ts_sec * wmod.SAMPLE_RATE)
        if advance <= 0:
            advance = wmod.N_SAMPLES
        seek += advance
    return segments


def segments_to_sample_ranges(segments: list[dict],
                              sr: int = wmod.SAMPLE_RATE) -> list[tuple[int, int]]:
    return [(int(s["start"] * sr), int(s["end"] * sr)) for s in segments]
