"""Dataset creation: gather audio -> vocal separation -> clean -> dataset.

Reference: main/inference/create_dataset.py — yt-dlp download, optional
head/tail skipping, MDX Kim_Vocal separation, optional dereverb, mono
mix, optional noisereduce, move into the dataset dir.

Here the audio sources are local paths or URLs (URLs go through
utils.downloads — functional in network deployments, clear error in
zero-egress ones); separation runs on our Demucs stack when model
params are provided, and the yt-dlp/MDX-specific plumbing is replaced
by those equivalents.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Any, Optional, Sequence

import numpy as np

from ..utils.audio import load_audio, read_wav, resample, save_wav

from ..utils.i18n import tr

logger = logging.getLogger(__name__)


def _parse_time(value: str | float) -> float:
    """'90', '1:30' or '0:01:30' -> seconds."""
    if isinstance(value, (int, float)):
        return float(value)
    parts = [float(p) for p in str(value).split(":")]
    out = 0.0
    for p in parts:
        out = out * 60 + p
    return out


def create_dataset(inputs: Sequence[str], output_dataset: str, *,
                   sample_rate: int = 44100,
                   skip_start: Optional[Sequence[str]] = None,
                   skip_end: Optional[Sequence[str]] = None,
                   separator: Optional[tuple[Any, Any]] = None,
                   clean_dataset: bool = False,
                   clean_strength: float = 0.7,
                   workdir: str = "/tmp/rvc_dataset_temp") -> list[str]:
    """inputs: local audio paths or URLs. separator: optional
    (demucs_params, DemucsConfig) — when given, vocals are isolated
    before the clean step. Returns the list of written dataset files."""
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(output_dataset, exist_ok=True)

    paths: list[str] = []
    for i, src in enumerate(inputs):
        if src.startswith(("http://", "https://")):
            from ..utils.youtube import download_audio_wav, is_youtube_url

            local = os.path.join(workdir, f"audio_{i}.wav")
            if is_youtube_url(src):
                # reference downloader (create_dataset.py:135-146):
                # yt-dlp bestaudio -> wav; here the native InnerTube client
                download_audio_wav(src, local, sample_rate=sample_rate)
            else:
                from ..utils.downloads import download_url

                download_url(src, local)
        else:
            local = src
        audio, sr = read_wav(local)
        if audio.ndim == 2:
            audio = audio.mean(axis=1)
        audio = resample(audio, sr, sample_rate)
        sr = sample_rate

        if skip_start is not None and i < len(skip_start):
            audio = audio[int(_parse_time(skip_start[i]) * sr):]
        if skip_end is not None and i < len(skip_end):
            n = int(_parse_time(skip_end[i]) * sr)
            if n > 0:
                audio = audio[:-n]

        if separator is not None:
            from .separate import separate_vocals

            params, dcfg = separator
            vocals, _ = separate_vocals(params, dcfg, audio, sr, shifts=0)
            audio = vocals.mean(axis=1)
            sr = dcfg.samplerate

        if clean_dataset:
            from ..utils.noisereduce import reduce_noise

            audio = reduce_noise(audio.astype(np.float32), sr,
                                 prop_decrease=clean_strength)

        out_path = os.path.join(workdir, f"dataset_{i}.wav")
        save_wav(out_path, audio.astype(np.float32), sr, subtype="float32")
        paths.append(out_path)

    final_paths = []
    for p in paths:
        dst = os.path.join(output_dataset, os.path.basename(p))
        shutil.move(p, dst)
        final_paths.append(dst)
    shutil.rmtree(workdir, ignore_errors=True)
    logger.info("%s: %d files in %s", tr("createdataset"), len(final_paths),
                output_dataset)
    return final_paths
