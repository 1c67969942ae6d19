"""ctypes bindings for the native C++ components (built on demand).

Mirrors the reference's native-loading shape (WORLD .so through ctypes,
WORLD_WRAPPER.py:16-30) but builds from our own sources in native/
instead of unpickling a prebuilt binary.

Components:
  * worldlike_dio / worldlike_stonemask — WORLD-style F0 (harvest/dio
    family equivalent; the reference's `dio`/`harvest`/`stonemask`
    methods route here)
  * resample_sinc — kaiser-windowed polyphase resampler (soxr stand-in)

All entry points degrade gracefully: if no C++ toolchain is available the
callers fall back to the pure-python paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "librvcnative.so")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            logger.info("building native library in %s", _NATIVE_DIR)
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        dbl_p = ctypes.POINTER(ctypes.c_double)
        flt_p = ctypes.POINTER(ctypes.c_float)
        lib.worldlike_num_frames.restype = ctypes.c_int
        lib.worldlike_num_frames.argtypes = [ctypes.c_int, ctypes.c_double,
                                             ctypes.c_double]
        lib.worldlike_dio.restype = None
        lib.worldlike_dio.argtypes = [dbl_p, ctypes.c_int, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_double,
                                      ctypes.c_double, dbl_p, dbl_p]
        lib.worldlike_stonemask.restype = None
        lib.worldlike_stonemask.argtypes = [dbl_p, ctypes.c_int,
                                            ctypes.c_double, dbl_p, dbl_p,
                                            ctypes.c_int, dbl_p]
        lib.worldlike_harvest.restype = None
        lib.worldlike_harvest.argtypes = [dbl_p, ctypes.c_int, ctypes.c_double,
                                          ctypes.c_double, ctypes.c_double,
                                          ctypes.c_double, dbl_p, dbl_p]
        lib.resample_out_len.restype = ctypes.c_longlong
        lib.resample_out_len.argtypes = [ctypes.c_longlong, ctypes.c_longlong,
                                         ctypes.c_longlong]
        lib.resample_sinc.restype = None
        lib.resample_sinc.argtypes = [flt_p, ctypes.c_longlong,
                                      ctypes.c_longlong, ctypes.c_longlong,
                                      ctypes.c_int, ctypes.c_double, flt_p]
        u8_p = ctypes.POINTER(ctypes.c_uint8)
        i32_p = ctypes.POINTER(ctypes.c_int32)
        int_p = ctypes.POINTER(ctypes.c_int)
        ll_p = ctypes.POINTER(ctypes.c_longlong)
        lib.flac_probe.restype = ctypes.c_int
        lib.flac_probe.argtypes = [u8_p, ctypes.c_longlong, int_p, int_p,
                                   int_p, ll_p]
        lib.flac_decode.restype = ctypes.c_longlong
        lib.flac_decode.argtypes = [u8_p, ctypes.c_longlong, i32_p,
                                    ctypes.c_longlong]
        _lib = lib
    except Exception as e:  # toolchain missing -> python fallbacks
        logger.warning("native library unavailable (%s); using python fallbacks", e)
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def dio(x: np.ndarray, fs: int, *, f0_floor: float = 50.0,
        f0_ceil: float = 1100.0, frame_period: float = 10.0):
    """WORLD-dio-style F0. Returns (f0 (T,), time_axis (T,)) float64,
    matching the reference PYWORLD.dio return shape
    (WORLD_WRAPPER.py:56-81)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    n_frames = lib.worldlike_num_frames(len(x), float(fs), float(frame_period))
    t = np.zeros(n_frames, np.float64)
    f0 = np.zeros(n_frames, np.float64)
    lib.worldlike_dio(_dptr(x), len(x), float(fs), float(f0_floor),
                      float(f0_ceil), float(frame_period), _dptr(t), _dptr(f0))
    return f0, t


def stonemask(x: np.ndarray, fs: int, time_axis: np.ndarray,
              f0: np.ndarray) -> np.ndarray:
    """Refine an F0 contour (reference PYWORLD.stonemask,
    WORLD_WRAPPER.py:83-89)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    t = np.ascontiguousarray(time_axis, np.float64)
    f0 = np.ascontiguousarray(f0, np.float64)
    out = np.zeros_like(f0)
    lib.worldlike_stonemask(_dptr(x), len(x), float(fs), _dptr(t), _dptr(f0),
                            len(f0), _dptr(out))
    return out


def harvest(x: np.ndarray, fs: int, *, f0_floor: float = 50.0,
            f0_ceil: float = 1100.0, frame_period: float = 10.0):
    """Harvest F0 estimation (reference PYWORLD.harvest,
    WORLD_WRAPPER.py:32-54): dense 1/12-octave band-passed candidate
    contours, four-event agreement, instantaneous-frequency refinement,
    fixed-point contour correction at a 1 ms internal frame period, and
    zero-phase smoothing — per Morise's Harvest (INTERSPEECH 2017).
    Our own C++ implementation (native/src/worldlike.cpp
    worldlike_harvest), materially more dropout-robust than dio on
    noisy/low-pitch speech (tests/test_native.py).
    Returns (f0 (T,), time_axis (T,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    n_frames = lib.worldlike_num_frames(len(x), float(fs), float(frame_period))
    t = np.zeros(n_frames, np.float64)
    f0 = np.zeros(n_frames, np.float64)
    lib.worldlike_harvest(_dptr(x), len(x), float(fs), float(f0_floor),
                          float(f0_ceil), float(frame_period), _dptr(t),
                          _dptr(f0))
    return f0, t


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> (float32 audio in [-1,1], (T,) mono or
    (T, C), sample_rate).  Our own C++ decoder (native/src/flacdec.cpp);
    the reference reads .flac via libsndfile which this image lacks."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(data, np.uint8)
    u8 = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    total = ctypes.c_longlong()
    err = lib.flac_probe(u8, len(buf), ctypes.byref(sr), ctypes.byref(ch),
                         ctypes.byref(bps), ctypes.byref(total))
    if err:
        raise ValueError(f"not a decodable FLAC stream (err {err})")
    cap = (int(total.value) or (len(data) * 8 // max(bps.value, 1) + 65536)) \
        * ch.value + 65536 * ch.value
    out = np.zeros(cap, np.int32)
    n = lib.flac_decode(u8, len(buf),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        cap)
    if n < 0:
        raise ValueError(f"FLAC decode failed (err {-n})")
    pcm = out[:n].astype(np.float32) / float(1 << (bps.value - 1))
    if ch.value > 1:
        pcm = pcm.reshape(-1, ch.value)
    return pcm, int(sr.value)


def resample_sinc(x: np.ndarray, sr_in: int, sr_out: int, *,
                  half_width: int = 64, beta: float = 12.0) -> np.ndarray:
    """Native kaiser-sinc polyphase resample (float32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    m = lib.resample_out_len(len(x), int(sr_in), int(sr_out))
    out = np.zeros(int(m), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.resample_sinc(x.ctypes.data_as(fp), len(x), int(sr_in), int(sr_out),
                      int(half_width), float(beta), out.ctypes.data_as(fp))
    return out
