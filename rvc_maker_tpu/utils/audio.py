"""Host-side audio I/O and resampling.

librosa/soundfile/soxr are not in this image, so:
  * WAV read/write via scipy.io.wavfile (PCM 16/24/32 + float)
  * resampling via polyphase filtering (scipy.signal.resample_poly with a
    kaiser window) — the host-quality stand-in for the reference's
    librosa/soxr_vhq path (reference library/utils.py:89-112 load_audio).

These run on the data-loading host path, never on device.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """High-quality polyphase resample, float32 in/out."""
    if orig_sr == target_sr:
        return audio.astype(np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    out = resample_poly(audio.astype(np.float64), up, down, window=("kaiser", 12.0))
    return out.astype(np.float32)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV or FLAC file -> (float32 array in [-1, 1] (T,) or
    (T, C), sr).  FLAC decodes through our native C++ decoder
    (native/src/flacdec.cpp) — the reference reads it via libsndfile."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from ..native import flac_decode

        with open(path, "rb") as f:
            return flac_decode(f.read())
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    return audio, sr


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Read + mono-mix + resample (reference load_audio semantics:
    library/utils.py:89-112, minus formant shifting which is applied
    separately)."""
    audio, sr = read_wav(path)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    return resample(audio, sr, target_sr)


def save_wav(path: str, audio: np.ndarray, sr: int,
             subtype: str = "pcm16") -> None:
    audio = np.asarray(audio)
    if path.lower().endswith(".flac"):
        from .flac_enc import write_flac

        write_flac(path, np.clip(audio, -1.0, 1.0), sr)
        return
    if subtype == "pcm16":
        clipped = np.clip(audio, -1.0, 1.0)
        wavfile.write(path, sr, (clipped * 32767.0).astype(np.int16))
    elif subtype == "float32":
        wavfile.write(path, sr, audio.astype(np.float32))
    else:
        raise ValueError(f"unknown subtype {subtype!r}")


def save_audio(path: str, audio: np.ndarray, sr: int,
               export_format: str = "wav") -> str:
    """Write with an explicit container (reference --export_format,
    convert.py): wav + flac natively; other formats need ffmpeg."""
    fmt = export_format.lower()
    base = path
    for ext in (".wav", ".flac", ".mp3", ".ogg", ".m4a"):
        if base.lower().endswith(ext):
            base = base[: -len(ext)]
            break
    if fmt == "wav":
        save_wav(base + ".wav", audio, sr)
        return base + ".wav"
    if fmt == "flac":
        save_wav(base + ".flac", audio, sr)
        return base + ".flac"
    import shutil as _sh
    import subprocess as _sp

    ffmpeg = _sh.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"export format {fmt!r} needs ffmpeg (wav/flac are native)")
    tmp = base + ".tmp.wav"
    save_wav(tmp, audio, sr)
    out = f"{base}.{fmt}"
    _sp.run([ffmpeg, "-y", "-i", tmp, out], check=True, capture_output=True)
    import os as _os

    _os.remove(tmp)
    return out
