"""Text-to-speech synthesis + TTS->RVC conversion flow.

Reference: app.py synthesize_tts:729-749 (edge-tts or Google Translate
TTS) and convert_tts:1166-1207 (synthesize then run the RVC pipeline on
the result).  Both backends are network services; in a zero-egress
deployment they raise a clear error.  The conversion half is fully
local and works with any WAV produced elsewhere.
"""

from __future__ import annotations

import asyncio
import logging
import os

import numpy as np

from .audio import load_audio, save_wav
from .i18n import tr

logger = logging.getLogger(__name__)


def synthesize_tts(text: str, voice: str, output_path: str,
                   rate: int = 0) -> str:
    """Synthesize speech with edge-tts (the reference's primary backend).
    rate: speaking-rate delta in percent."""
    try:
        import edge_tts  # not bundled; present in network deployments
    except ImportError as e:
        raise RuntimeError(
            "edge-tts is not installed and TTS needs network access. "
            + tr("download_disabled")) from e

    rate_str = f"+{rate}%" if rate >= 0 else f"{rate}%"

    async def _run():
        await edge_tts.Communicate(text, voice, rate=rate_str).save(output_path)

    asyncio.run(_run())
    return output_path


def convert_tts(text: str, voice: str, pipeline, settings, sid: int,
                output_path: str, workdir: str = "/tmp") -> str:
    """TTS -> voice conversion (reference convert_tts flow)."""
    tts_path = os.path.join(workdir, "tts_raw.wav")
    synthesize_tts(text, voice, tts_path)
    audio16 = load_audio(tts_path, 16000)
    peak = np.abs(audio16).max() / 0.95
    if peak > 1:
        audio16 = audio16 / peak
    out = pipeline.convert_utterance(audio16, sid, settings)
    save_wav(output_path, out, pipeline.cfg.sr)
    return output_path
