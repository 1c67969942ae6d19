"""Separation spectral utilities — full equivalent of the reference
uvr5_separator/spec_utils.py (899 lines, 66 functions).

The active demucs/MDX separation flow calls only a handful of these
(normalize, reshape_sources/to_shape, reduce_vocal_aggressively,
invert_audio / invert_stem); the rest serve the UVR ensembling /
alignment / multi-band (VR "model parameters") tooling, ported here so
the full spec_utils surface exists in this framework too.

Differences from the reference (deliberate, host-side only):
  * librosa.stft/istft  -> our own numpy STFT with identical semantics
    (centered, constant pad, periodic hann, 50% overlap normalization).
  * librosa.resample    -> polyphase kaiser resampler (utils/audio.py),
    rational-approximated for fractional ratios.
  * rubberband binary (time_stretch/pitch_shift, spec_utils.py:859-899)
    -> our phase-vocoder implementations (no external process).
  * soundfile          -> scipy.io.wavfile via utils/audio.save_wav.

Reference: main/library/uvr5_separator/spec_utils.py (line numbers cited
per function).
"""

from __future__ import annotations

import io
import logging
import math
from fractions import Fraction

import numpy as np
from scipy.signal import correlate, hilbert, resample_poly

from ..utils.audio import read_wav as _read_wav_file
from ..utils.audio import save_wav as _save_wav

logger = logging.getLogger(__name__)

N_FFT = 2048
HOP = 1024

AUTO_PHASE = "Automatic"
POSITIVE_PHASE = "Positive Phase"
NEGATIVE_PHASE = "Negative Phase"
NONE_P = ("None",)
MAX_SPEC = "Max Spec"
MIN_SPEC = "Min Spec"
LIN_ENSE = "Linear Ensemble"
MAX_WAV = MAX_SPEC
MIN_WAV = MIN_SPEC
AVERAGE = "Average"


# ---------------------------------------------------------------- STFT core


def _hann(n: int) -> np.ndarray:
    # periodic hann — matches librosa's get_window("hann", n, fftbins=True)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _stft_np(wave: np.ndarray, n_fft: int = N_FFT,
             hop: int = HOP) -> np.ndarray:
    """librosa.stft semantics (center=True, constant pad).
    (L,) -> (F, T) or (C, L) -> (C, F, T), complex64."""
    x = np.asarray(wave, np.float32)
    mono = x.ndim == 1
    if mono:
        x = x[None]
    pad = n_fft // 2
    x = np.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * _hann(n_fft).astype(np.float32)
    z = np.fft.rfft(frames, axis=-1).astype(np.complex64)
    z = z.transpose(0, 2, 1)
    return z[0] if mono else z


def _istft_np(spec: np.ndarray, hop: int = HOP,
              length: int | None = None) -> np.ndarray:
    """librosa.istft semantics (centered, squared-window normalization).
    (F, T) -> (L,) or (C, F, T) -> (C, L), float32."""
    z = np.asarray(spec)
    mono = z.ndim == 2
    if mono:
        z = z[None]
    n_fft = 2 * (z.shape[1] - 1)
    win = _hann(n_fft)
    t = np.fft.irfft(z.transpose(0, 2, 1), n=n_fft, axis=-1) * win
    frames = t.shape[1]
    total = (frames - 1) * hop + n_fft
    idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
    y = np.zeros((t.shape[0], total), np.float64)
    np.add.at(y, (slice(None), idx), t)
    norm = np.zeros((total,), np.float64)
    np.add.at(norm, idx.reshape(-1), np.tile(win ** 2, (frames, 1)).reshape(-1))
    y = y / np.maximum(norm, 1e-11)
    pad = n_fft // 2
    y = y[:, pad:-pad]
    if length is not None:
        y = y[:, :length]
    y = y.astype(np.float32)
    return y[0] if mono else y


def _resample(x: np.ndarray, orig_sr: float, target_sr: float) -> np.ndarray:
    """Polyphase resample along the LAST axis, fractional ratios via
    rational approximation (stand-in for librosa.resample/soxr)."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    frac = Fraction(float(target_sr) / float(orig_sr)).limit_denominator(1000)
    up, down = frac.numerator, frac.denominator
    out = resample_poly(np.asarray(x, np.float64), up, down,
                        axis=-1, window=("kaiser", 12.0))
    return out.astype(np.float32)


def _param(mp):
    """Accept a ModelParameters-like object (``.param`` dict) or a bare
    dict for the multi-band ``mp`` argument."""
    return mp.param if hasattr(mp, "param") else mp


class ModelParameters:
    """Minimal stand-in for UVR's VR ``ModelParameters``: wraps the
    per-band parameter dict the multi-band functions read
    (``bins``, ``band`` -> {n_fft, hl, sr, crop_start/stop, lpf/hpf_*,
    convert_channels}, ``pre_filter_start/stop``, ``reverse``,
    ``mid_side``, ``mid_side_b2``)."""

    DEFAULTS = {"reverse": False, "mid_side": False, "mid_side_b2": False,
                "pre_filter_start": 0, "pre_filter_stop": 0}

    def __init__(self, param: dict):
        merged = dict(self.DEFAULTS)
        merged.update(param)
        # JSON keys arrive as strings; band indices are 1-based ints
        band = merged.get("band", {})
        merged["band"] = {int(k): v for k, v in band.items()}
        self.param = merged


# ------------------------------------------------------- small pure helpers


def crop_center(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Center-crop h1's time axis (axis 3) to h2's (spec_utils.py:45-55)."""
    if h1.shape[3] == h2.shape[3]:
        return h1
    if h1.shape[3] < h2.shape[3]:
        raise ValueError("h1_shape[3] > h2_shape[3]")
    s_time = (h1.shape[3] - h2.shape[3]) // 2
    return h1[:, :, :, s_time:s_time + h2.shape[3]]


def preprocess(X_spec: np.ndarray):
    """(spec_utils.py:57-58)."""
    return np.abs(X_spec), np.angle(X_spec)


def make_padding(width: int, cropsize: int, offset: int):
    """(spec_utils.py:60-64)."""
    roi_size = cropsize - offset * 2
    if roi_size == 0:
        roi_size = cropsize
    return offset, roi_size - (width % roi_size) + offset, roi_size


def normalize(wave: np.ndarray, max_peak: float = 1.0) -> np.ndarray:
    """Peak-limit (spec_utils.py:66-70)."""
    maxv = np.abs(wave).max()
    if maxv > max_peak:
        wave = wave * (max_peak / maxv)
    return wave


def auto_transpose(audio_array: np.ndarray) -> np.ndarray:
    """(T, 2) -> (2, T) (spec_utils.py:72-74)."""
    if audio_array.shape[1] == 2:
        return audio_array.T
    return audio_array


def write_array_to_mem(audio_data, subtype: str = "PCM_16"):
    """WAV bytes in memory at 44100 Hz (spec_utils.py:76-85); soundfile
    subtypes map onto our scipy writer (FLOAT -> float32, else PCM16)."""
    if not isinstance(audio_data, np.ndarray):
        return audio_data
    from scipy.io import wavfile

    buf = io.BytesIO()
    if "FLOAT" in subtype.upper():
        wavfile.write(buf, 44100, np.asarray(audio_data, np.float32))
    else:
        clipped = np.clip(np.asarray(audio_data, np.float64), -1.0, 1.0)
        wavfile.write(buf, 44100, (clipped * 32767.0).astype(np.int16))
    buf.seek(0)
    return buf


def spectrogram_to_image(spec: np.ndarray, mode: str = "magnitude"):
    """uint8 image of a (C, F, T) or (F, T) spectrogram
    (spec_utils.py:87-99)."""
    if mode == "magnitude":
        y = np.log10((np.abs(spec) if np.iscomplexobj(spec) else spec) ** 2
                     + 1e-8)
    elif mode == "phase":
        y = np.angle(spec) if np.iscomplexobj(spec) else spec
    else:
        raise ValueError(mode)
    y = y - y.min()
    y = y * (255 / y.max())
    img = np.uint8(y)
    if y.ndim == 3:
        img = img.transpose(1, 2, 0)
        img = np.concatenate([np.max(img, axis=2, keepdims=True), img],
                             axis=2)
    return img


def reduce_vocal_aggressively(X: np.ndarray, y: np.ndarray,
                              softmask: float) -> np.ndarray:
    """(spec_utils.py:101-105): clamp y's magnitude where the residual
    exceeds it, keep y's phase."""
    y_mag = np.abs(y)
    v_mag = np.abs(X - y)
    return (np.clip(y_mag - v_mag * (v_mag > y_mag) * softmask, 0, np.inf)
            * np.exp(1.0j * np.angle(y)))


def merge_artifacts(y_mask: np.ndarray, thres: float = 0.01,
                    min_range: int = 64, fade_size: int = 32) -> np.ndarray:
    """Fade mask gaps between detected artifact regions
    (spec_utils.py:107-143).  On any error the input mask is returned
    unchanged, like the reference's blanket except."""
    mask = y_mask
    try:
        if min_range < fade_size * 2:
            raise ValueError("min_range >= fade_size * 2")
        idx = np.where(y_mask.min(axis=(0, 1)) > thres)[0]
        start_idx = np.insert(idx[np.where(np.diff(idx) != 1)[0] + 1], 0,
                              idx[0])
        end_idx = np.append(idx[np.where(np.diff(idx) != 1)[0]], idx[-1])
        artifact_idx = np.where(end_idx - start_idx > min_range)[0]
        weight = np.zeros_like(y_mask)
        if len(artifact_idx) > 0:
            start_idx = start_idx[artifact_idx]
            end_idx = end_idx[artifact_idx]
            old_e = None
            for s, e in zip(start_idx, end_idx):
                if old_e is not None and s - old_e < fade_size:
                    s = old_e - fade_size * 2
                if s != 0:
                    weight[:, :, s:s + fade_size] = np.linspace(0, 1,
                                                                fade_size)
                else:
                    s -= fade_size
                if e != y_mask.shape[2]:
                    weight[:, :, e - fade_size:e] = np.linspace(1, 0,
                                                                fade_size)
                else:
                    e += fade_size
                weight[:, :, s + fade_size:e - fade_size] = 1
                old_e = e
        v_mask = 1 - y_mask
        y_mask = y_mask + weight * v_mask
        mask = y_mask
    except Exception as exc:  # reference swallows all errors here
        from ..utils.i18n import tr

        logger.warning("%s", tr("merge_artifacts_failed", e=exc))
    return mask


def align_wave_head_and_tail(a: np.ndarray, b: np.ndarray):
    """(spec_utils.py:145-147).  NB: replicates the reference exactly,
    including its double-axis slice ``a[:l, :l]`` (a quirk — it crops
    the channel axis too when l < n_channels, which never happens for
    real audio)."""
    l = min([a[0].size, b[0].size])
    return a[:l, :l], b[:l, :l]


# -------------------------------------------------- multi-band (VR) helpers
#
# Channel encodes/decodes are expressed as 2x2 mixing matrices applied
# over the channel axis (out = M @ [ch0, ch1]); the reference writes each
# mode out longhand (spec_utils.py:149-163, 193-239).  The numbers are
# contractually the reference's — several decodes are deliberately NOT
# the matrix inverse of their encode.

_V51_ENCODE = {
    "mid_side":   ((0.5, 0.5), (1.0, -1.0)),
    "mid_side_c": ((1.0, 0.25), (-0.25, 1.0)),
    "stereo_n":   ((1 / 0.9375, 0.25 / 0.9375), (0.25 / 0.9375, 1 / 0.9375)),
}
_V51_DECODE = {
    "mid_side":   ((1.0, 0.5), (1.0, -0.5)),
    "mid_side_c": ((1 / 1.0625, -1 / 4.25), (1 / 4.25, 1 / 1.0625)),
    "stereo_n":   ((1.0, -0.25), (-0.25, 1.0)),
}
_LEGACY_ENCODE = {
    "mid_side":    ((0.5, 0.5), (1.0, -1.0)),
    "mid_side_b2": ((0.5, 1.0), (1.0, -0.5)),
}
_LEGACY_DECODE = {
    "mid_side":    ((1.0, 0.5), (1.0, -0.5)),
    "mid_side_b2": ((0.4, 1 / 1.25), (1 / 1.25, -0.4)),
}


def _mix2(pair: np.ndarray, m) -> np.ndarray:
    """Apply a 2x2 mixing matrix over the leading channel axis."""
    (a, b), (c, d) = m
    return np.asfortranarray([a * pair[0] + b * pair[1],
                              c * pair[0] + d * pair[1]])


def _legacy_mode(p) -> str | None:
    for mode in ("reverse", "mid_side", "mid_side_b2"):
        if p.get(mode):
            return mode
    return None


def convert_channels(spec: np.ndarray, mp, band: int) -> np.ndarray:
    """Per-band v5.1 stereo encode (spec_utils.py:149-163)."""
    mode = _param(mp)["band"][band].get("convert_channels")
    m = _V51_ENCODE.get(mode)
    return spec if m is None else _mix2(spec, m)


def _legacy_prefilter_gains(start: int, stop: int) -> np.ndarray:
    """The reference's recursive multiband pre-filter roll-off
    (spec_utils.py:184-189): each bin's dB slope depends on the previous
    bin's linear gain, so the recurrence is kept and only the multiply is
    vectorized."""
    gains = np.empty(max(stop - start - 1, 0))
    g = 1.0
    for k in range(gains.shape[0]):
        g = math.pow(10, -(k + 1) * (3.5 - g) / 20.0)
        gains[k] = g
    return gains


def combine_spectrograms(specs: dict, mp,
                         is_v51_model: bool = False) -> np.ndarray:
    """Concatenate each band's crop rows into the model's bin layout,
    then apply the pre-filter roll-off (spec_utils.py:165-191)."""
    p = _param(mp)
    n_frames = min(specs[i].shape[2] for i in specs)
    bands = [p["band"][d] for d in range(1, len(p["band"]) + 1)]
    rows = [specs[d + 1][:, b["crop_start"]:b["crop_stop"], :n_frames]
            for d, b in enumerate(bands)]
    used = sum(r.shape[1] for r in rows)
    if used > p["bins"]:
        raise ValueError("offset > mp.param['bins']")
    out = np.zeros((2, p["bins"] + 1, n_frames), dtype=np.complex64)
    out[:, :used] = np.concatenate(rows, axis=1)
    lo, hi = p["pre_filter_start"], p["pre_filter_stop"]
    if lo > 0:
        if is_v51_model:
            out *= get_lp_filter_mask(out.shape[1], lo, hi)
        elif len(bands) == 1:
            out = fft_lp_filter(out, lo, hi)
        else:
            out[:, lo + 1:hi] *= _legacy_prefilter_gains(lo, hi)[None, :,
                                                                 None]
    return np.asfortranarray(out)


def wave_to_spectrogram(wave: np.ndarray, hop_length: int = HOP,
                        n_fft: int = N_FFT, mp=None, band: int = 0,
                        is_v51_model: bool = False) -> np.ndarray:
    """Stereo STFT with the mp channel encodes (spec_utils.py:193-219).
    With ``mp=None`` this is the plain no-mp transform
    (wave_to_spectrogram_no_mp semantics, :381-385)."""
    wave = np.asarray(wave)
    if wave.ndim == 1:
        wave = np.stack([wave, wave])
    if mp is not None and not is_v51_model:
        mode = _legacy_mode(_param(mp))
        if mode == "reverse":
            wave = wave[:, ::-1]
        elif mode is not None:
            wave = _mix2(wave, _LEGACY_ENCODE[mode])
    spec = np.asfortranarray([
        _stft_np(np.asfortranarray(wave[0]), n_fft, hop_length),
        _stft_np(np.asfortranarray(wave[1]), n_fft, hop_length)])
    if is_v51_model and mp is not None:
        spec = convert_channels(spec, mp, band)
    return spec


def spectrogram_to_wave(spec: np.ndarray, hop_length: int = HOP, mp=None,
                        band: int = 0, is_v51_model: bool = True,
                        length: int | None = None) -> np.ndarray:
    """Inverse of wave_to_spectrogram incl. channel decodes
    (spec_utils.py:221-239).  ``mp=None`` -> plain iSTFT."""
    spec = np.asarray(spec)
    if spec.ndim == 2:
        spec = np.stack([spec, spec])
    pair = np.asfortranarray(
        [_istft_np(np.ascontiguousarray(spec[0]), hop_length, length),
         _istft_np(np.ascontiguousarray(spec[1]), hop_length, length)])
    if mp is None:
        return pair
    p = _param(mp)
    if is_v51_model:
        mode = p["band"][band].get("convert_channels")
        m = _V51_DECODE.get(mode)
        return pair if m is None else _mix2(pair, m)
    mode = _legacy_mode(p)
    if mode == "reverse":
        return np.asfortranarray(pair[:, ::-1])
    return pair if mode is None else _mix2(pair, _LEGACY_DECODE[mode])


def _band_rows(bands) -> list:
    """[(row0, row1)] — each band's row range inside the combined spec."""
    heights = [b["crop_stop"] - b["crop_start"] for b in bands]
    edges = np.concatenate([[0], np.cumsum(heights)])
    return list(zip(edges[:-1], edges[1:]))


def cmb_spectrogram_to_wave(spec_m: np.ndarray, mp, extra_bins_h=None,
                            extra_bins=None,
                            is_v51_model: bool = False) -> np.ndarray:
    """Multi-band combined spectrogram -> wave (spec_utils.py:241-287).

    Walks the bands bottom-up: each band's rows are re-seated at its own
    FFT size, band-filtered (low band: LPF; middle: HPF+LPF; top: HPF +
    optional grafted high-end), inverted, and the running mix is
    resampled up to the next band's rate before the next band is added.
    """
    p = _param(mp)
    bands = [p["band"][d] for d in range(1, len(p["band"]) + 1)]
    n_frames = spec_m.shape[2]
    mix = None
    for pos, (binfo, (row0, row1)) in enumerate(zip(bands,
                                                    _band_rows(bands))):
        top = pos == len(bands) - 1
        band_spec = np.zeros((2, binfo["n_fft"] // 2 + 1, n_frames),
                             dtype=complex)
        band_spec[:, binfo["crop_start"]:binfo["crop_stop"]] = \
            spec_m[:, row0:row1]

        if top and extra_bins_h:
            # graft the carried-over high-end rows under the Nyquist bin
            nyq = binfo["n_fft"] // 2
            band_spec[:, nyq - extra_bins_h:nyq] = \
                extra_bins[:, :extra_bins_h]

        hpf = (not top and pos > 0) or (top and binfo["hpf_start"] > 0)
        if hpf:
            if is_v51_model:
                band_spec *= get_hp_filter_mask(
                    band_spec.shape[1], binfo["hpf_start"],
                    binfo["hpf_stop"] - 1)
            else:
                band_spec = fft_hp_filter(band_spec, binfo["hpf_start"],
                                          binfo["hpf_stop"] - 1)
        if not top:
            if is_v51_model:
                band_spec *= get_lp_filter_mask(
                    band_spec.shape[1], binfo["lpf_start"],
                    binfo["lpf_stop"])
            else:
                band_spec = fft_lp_filter(band_spec, binfo["lpf_start"],
                                          binfo["lpf_stop"])

        band_wave = spectrogram_to_wave(band_spec, binfo["hl"], mp,
                                        pos + 1, is_v51_model)
        mix = band_wave if mix is None else np.add(mix, band_wave)
        if not top:
            mix = _resample(mix, binfo["sr"], bands[pos + 1]["sr"])
    return mix


def get_lp_filter_mask(n_bins: int, bin_start: int,
                       bin_stop: int) -> np.ndarray:
    """(spec_utils.py:289-290)."""
    return np.concatenate([
        np.ones((bin_start - 1, 1)),
        np.linspace(1, 0, bin_stop - bin_start + 1)[:, None],
        np.zeros((n_bins - bin_stop, 1)),
    ], axis=0)


def get_hp_filter_mask(n_bins: int, bin_start: int,
                       bin_stop: int) -> np.ndarray:
    """(spec_utils.py:292-293)."""
    return np.concatenate([
        np.zeros((bin_stop + 1, 1)),
        np.linspace(0, 1, 1 + bin_start - bin_stop)[:, None],
        np.ones((n_bins - bin_start - 2, 1)),
    ], axis=0)


def fft_lp_filter(spec: np.ndarray, bin_start: int,
                  bin_stop: int) -> np.ndarray:
    """Linear low-pass roll-off (1 -> 0 over [bin_start, bin_stop), zero
    above); mutates ``spec`` like the reference (spec_utils.py:295-303)."""
    span = bin_stop - bin_start
    if span > 0:
        ramp = 1.0 - np.arange(1, span + 1) / span
        spec[:, bin_start:bin_stop] *= ramp[None, :, None]
    spec[:, bin_stop:] *= 0
    return spec


def fft_hp_filter(spec: np.ndarray, bin_start: int,
                  bin_stop: int) -> np.ndarray:
    """Linear high-pass roll-off (0 -> 1 over (bin_stop, bin_start], zero
    at and below bin_stop); mutates ``spec`` (spec_utils.py:305-313)."""
    span = bin_start - bin_stop
    if span > 0:
        ramp = 1.0 - np.arange(span, 0, -1) / span
        spec[:, bin_stop + 1:bin_start + 1] *= ramp[None, :, None]
    spec[:, :bin_stop + 1] *= 0
    return spec


def spectrogram_to_wave_old(spec: np.ndarray,
                            hop_length: int = 1024) -> np.ndarray:
    """(spec_utils.py:315-319)."""
    if spec.ndim == 2:
        return _istft_np(spec, hop_length)
    return np.asfortranarray([_istft_np(np.asfortranarray(spec[0]),
                                        hop_length),
                              _istft_np(np.asfortranarray(spec[1]),
                                        hop_length)])


def wave_to_spectrogram_old(wave: np.ndarray, hop_length: int,
                            n_fft: int) -> np.ndarray:
    """(spec_utils.py:321-322)."""
    return np.asfortranarray([
        _stft_np(np.asfortranarray(wave[0]), n_fft, hop_length),
        _stft_np(np.asfortranarray(wave[1]), n_fft, hop_length)])


def mirroring(a: str, spec_m: np.ndarray, input_high_end: np.ndarray,
              mp) -> np.ndarray:
    """High-end reconstruction by mirroring the bins just below the
    pre-filter cut (spec_utils.py:324-333)."""
    p = _param(mp)
    if a == "mirroring":
        mirror = np.flip(
            np.abs(spec_m[:, p["pre_filter_start"] - 10
                          - input_high_end.shape[1]:
                          p["pre_filter_start"] - 10, :]), 1) \
            * np.exp(1.0j * np.angle(input_high_end))
        return np.where(np.abs(input_high_end) <= np.abs(mirror),
                        input_high_end, mirror)
    if a == "mirroring2":
        mi = np.multiply(
            np.flip(np.abs(spec_m[:, p["pre_filter_start"] - 10
                                  - input_high_end.shape[1]:
                                  p["pre_filter_start"] - 10, :]), 1),
            input_high_end * 1.7)
        return np.where(np.abs(input_high_end) <= np.abs(mi),
                        input_high_end, mi)
    return input_high_end


def adjust_aggr(mask: np.ndarray, is_non_accom_stem: bool,
                aggressiveness: dict) -> np.ndarray:
    """Exponent-shape the mask per channel / bin-split
    (spec_utils.py:335-354)."""
    aggr = aggressiveness["value"] * 2
    if aggr != 0:
        if is_non_accom_stem:
            aggr = 1 - aggr
        aggr = [aggr, aggr]
        if aggressiveness["aggr_correction"] is not None:
            aggr[0] += aggressiveness["aggr_correction"]["left"]
            aggr[1] += aggressiveness["aggr_correction"]["right"]
        for ch in range(2):
            mask[ch, :aggressiveness["split_bin"]] = np.power(
                mask[ch, :aggressiveness["split_bin"]], 1 + aggr[ch] / 3)
            mask[ch, aggressiveness["split_bin"]:] = np.power(
                mask[ch, aggressiveness["split_bin"]:], 1 + aggr[ch])
    return mask


def stft(wave: np.ndarray, nfft: int, hl: int) -> np.ndarray:
    """Stereo STFT pair (spec_utils.py:356-357)."""
    return np.asfortranarray([
        _stft_np(np.asfortranarray(wave[0]), nfft, hl),
        _stft_np(np.asfortranarray(wave[1]), nfft, hl)])


def istft(spec: np.ndarray, hl: int) -> np.ndarray:
    """Stereo iSTFT pair (spec_utils.py:359-360)."""
    return np.asfortranarray([
        _istft_np(np.asfortranarray(spec[0]), hl),
        _istft_np(np.asfortranarray(spec[1]), hl)])


def spec_effects(wave, algorithm: str = "Default", value=None):
    """Two-source spectral combine (spec_utils.py:362-373)."""
    wave = [np.asarray(wave[0]), np.asarray(wave[1])]
    if any(np.isnan(w).any() or np.isinf(w).any() for w in wave):
        from ..utils.i18n import tr

        logger.warning("%s", tr("spec_nonfinite",
                                shapes=[w.shape for w in wave]))
    spec = [stft(wave[0], 2048, 1024), stft(wave[1], 2048, 1024)]
    if algorithm == "Min_Mag":
        return istft(np.where(np.abs(spec[1]) <= np.abs(spec[0]), spec[1],
                              spec[0]), 1024)
    if algorithm == "Max_Mag":
        return istft(np.where(np.abs(spec[1]) >= np.abs(spec[0]), spec[1],
                              spec[0]), 1024)
    if algorithm == "Default":
        return (wave[1] * value) + (wave[0] * (1 - value))
    if algorithm == "Invert_p":
        X_mag, y_mag = np.abs(spec[0]), np.abs(spec[1])
        return istft(spec[1] - np.where(X_mag >= y_mag, X_mag, y_mag)
                     * np.exp(1.0j * np.angle(spec[0])), 1024)
    raise ValueError(algorithm)


def spectrogram_to_wave_no_mp(spec: np.ndarray, n_fft: int = N_FFT,
                              hop_length: int = HOP,
                              length: int | None = None) -> np.ndarray:
    """(spec_utils.py:375-379)."""
    wave = _istft_np(spec, hop_length, length)
    if wave.ndim == 1:
        wave = np.asfortranarray([wave, wave])
    return wave


def wave_to_spectrogram_no_mp(wave: np.ndarray) -> np.ndarray:
    """(spec_utils.py:381-385)."""
    spec = _stft_np(wave, N_FFT, HOP)
    if spec.ndim == 1:
        spec = np.asfortranarray([spec, spec])
    return spec


def invert_audio(specs: list, invert_p: bool = True) -> np.ndarray:
    """Spectral inversion of a stem against the mixture
    (spec_utils.py:387-399)."""
    ln = min(specs[0].shape[2], specs[1].shape[2])
    specs = [specs[0][:, :, :ln], specs[1][:, :, :ln]]
    if invert_p:
        x_mag, y_mag = np.abs(specs[0]), np.abs(specs[1])
        return specs[1] - (np.where(x_mag >= y_mag, x_mag, y_mag)
                           * np.exp(1.0j * np.angle(specs[0])))
    specs[1] = reduce_vocal_aggressively(specs[0], specs[1], 0.2)
    return specs[0] - specs[1]


def invert_stem(mixture: np.ndarray, stem: np.ndarray) -> np.ndarray:
    """Secondary stem by spectral subtraction (spec_utils.py:401-402).
    mixture/stem: (C, L) waves -> (L, C) inverted wave."""
    v_spec = invert_audio([wave_to_spectrogram_no_mp(mixture),
                           wave_to_spectrogram_no_mp(stem)])
    return -spectrogram_to_wave_no_mp(v_spec).T


def ensembling(a: str, inputs: list, is_wavs: bool = False) -> np.ndarray:
    """Min/Max-magnitude ensemble across spectrograms or waves
    (spec_utils.py:404-420)."""
    input = inputs[0]
    for i in range(1, len(inputs)):
        if is_wavs:
            ln = min(input.shape[1], inputs[i].shape[1])
            input = input[:, :ln]
            inputs[i] = inputs[i][:, :ln]
        else:
            ln = min(input.shape[2], inputs[i].shape[2])
            input = input[:, :, :ln]
            inputs[i] = inputs[i][:, :, :ln]
        if a == MIN_SPEC:
            input = np.where(np.abs(inputs[i]) <= np.abs(input), inputs[i],
                             input)
        if a == MAX_SPEC:
            input = np.where(np.abs(inputs[i]) >= np.abs(input), inputs[i],
                             input)
    return input


def ensemble_for_align(waves: list) -> np.ndarray:
    """Min-spec ensemble used by the aligner (spec_utils.py:422-432)."""
    specs = [wave_to_spectrogram_no_mp(wav.T) for wav in waves]
    wav_aligned = spectrogram_to_wave_no_mp(ensembling(MIN_SPEC, specs)).T
    return match_array_shapes(wav_aligned, waves[1], is_swap=True)


def ensemble_inputs(audio_input: list, algorithm: str,
                    is_normalization: bool, wav_type_set: str,
                    save_path: str, is_wave: bool = False,
                    is_array: bool = False) -> None:
    """Ensemble N audio files into one (spec_utils.py:434-454)."""
    if algorithm == AVERAGE:
        output = average_audio(audio_input)
        samplerate = 44100
    else:
        wavs_, specs = [], []
        for path in audio_input:
            wave = load_audio(path)
            wavs_.append(wave)
            specs.append(wave if is_wave else wave_to_spectrogram_no_mp(wave))
        samplerate = 44100
        wave_shapes = [w.shape[1] for w in wavs_]
        target_shape = wavs_[wave_shapes.index(max(wave_shapes))]
        output = (ensembling(algorithm, specs, is_wavs=True) if is_wave
                  else spectrogram_to_wave_no_mp(
                      ensembling(algorithm, specs)))
        output = to_shape(output, target_shape.shape)
    _write_out(save_path, normalize(output.T, is_normalization), samplerate,
               wav_type_set)


def to_shape(x: np.ndarray, target_shape) -> np.ndarray:
    """Zero-pad up to target_shape (spec_utils.py:456-462)."""
    pads = [(0, t - s) for s, t in zip(x.shape, target_shape)]
    return np.pad(x, tuple(pads), mode="constant")


def to_shape_minimize(x: np.ndarray, target_shape) -> np.ndarray:
    """(spec_utils.py:464-470 — identical body to to_shape)."""
    return to_shape(x, target_shape)


def _first_loud_sample(audio: np.ndarray, threshold: float,
                       frame: int) -> int:
    """Start index of the first frame whose peak exceeds threshold, or
    len(audio) if none does; stereo picks the louder channel (the
    reference scans frames in a Python loop, spec_utils.py:472-505)."""
    if audio.ndim == 2:
        audio = audio[np.argmax(np.sum(np.abs(audio), axis=1))]
    n = len(audio)
    if n == 0:
        return 0
    padded = np.abs(np.concatenate([audio, np.zeros((-n) % frame)]))
    loud = padded.reshape(-1, frame).max(axis=1) > threshold
    hits = np.flatnonzero(loud)
    return n if hits.size == 0 else int(hits[0]) * frame


def detect_leading_silence(audio: np.ndarray, sr: int,
                           silence_threshold: float = 0.007,
                           frame_length: int = 1024) -> float:
    """Leading-silence length in ms (spec_utils.py:472-480)."""
    return _first_loud_sample(np.asarray(audio), silence_threshold,
                              frame_length) / sr * 1000


def adjust_leading_silence(target_audio: np.ndarray,
                           reference_audio: np.ndarray,
                           silence_threshold: float = 0.01,
                           frame_length: int = 1024) -> np.ndarray:
    """Pad or trim target's head so its first sound lines up with the
    reference's (spec_utils.py:482-505)."""
    shift = (_first_loud_sample(reference_audio, silence_threshold,
                                frame_length)
             - _first_loud_sample(target_audio, silence_threshold,
                                  frame_length))
    stereo = target_audio.ndim == 2
    if shift > 0:
        pad_shape = (target_audio.shape[0], shift) if stereo else shift
        return np.hstack((np.zeros(pad_shape), target_audio))
    if shift < 0:
        return target_audio[:, -shift:] if stereo else target_audio[-shift:]
    return target_audio


def match_array_shapes(array_1: np.ndarray, array_2: np.ndarray,
                       is_swap: bool = False) -> np.ndarray:
    """Trim/zero-pad array_1's axis 1 to array_2's
    (spec_utils.py:507-518)."""
    if is_swap:
        array_1, array_2 = array_1.T, array_2.T
    if array_1.shape[1] > array_2.shape[1]:
        array_1 = array_1[:, :array_2.shape[1]]
    elif array_1.shape[1] < array_2.shape[1]:
        padding = array_2.shape[1] - array_1.shape[1]
        array_1 = np.pad(array_1, ((0, 0), (0, padding)), "constant",
                         constant_values=0)
    if is_swap:
        array_1, array_2 = array_1.T, array_2.T
    return array_1


def match_mono_array_shapes(array_1: np.ndarray,
                            array_2: np.ndarray) -> np.ndarray:
    """(spec_utils.py:520-526)."""
    if len(array_1) > len(array_2):
        array_1 = array_1[:len(array_2)]
    elif len(array_1) < len(array_2):
        array_1 = np.pad(array_1, (0, len(array_2) - len(array_1)),
                         "constant", constant_values=0)
    return array_1


def change_pitch_semitones(y: np.ndarray, sr: int, semitone_shift: float):
    """Pitch change by resampling without time correction
    (spec_utils.py:528-538)."""
    factor = 2 ** (semitone_shift / 12)
    y_pitch_tuned = [np.asarray(_resample(ch, sr, sr * factor)) for ch in y]
    return np.array(y_pitch_tuned), sr * factor


def augment_audio(export_path: str, audio_file: str, rate: float,
                  is_normalization: bool, wav_type_set: str,
                  save_format=None, is_pitch: bool = False,
                  is_time_correction: bool = True) -> None:
    """Speed/pitch augmentation of a file (spec_utils.py:540-556);
    rubberband replaced by our phase vocoder."""
    wav = load_audio(audio_file)
    sr = 44100
    if not is_time_correction:
        wav_mix = change_pitch_semitones(wav, sr, semitone_shift=-rate)[0]
    else:
        if is_pitch:
            wav_1 = pitch_shift(wav[0], sr, rate)
            wav_2 = pitch_shift(wav[1], sr, rate)
        else:
            wav_1 = time_stretch(wav[0], sr, rate)
            wav_2 = time_stretch(wav[1], sr, rate)
        if wav_1.shape > wav_2.shape:
            wav_2 = to_shape(wav_2, wav_1.shape)
        if wav_1.shape < wav_2.shape:
            wav_1 = to_shape(wav_1, wav_2.shape)
        wav_mix = np.asfortranarray([wav_1, wav_2])
    _write_out(export_path, normalize(wav_mix.T, is_normalization), sr,
               wav_type_set)
    if save_format is not None:
        save_format(export_path)


def average_audio(audio: list) -> np.ndarray:
    """Sample-mean of N files, padded to the longest
    (spec_utils.py:558-577)."""
    waves, wave_shapes, final_waves = [], [], []
    for path in audio:
        wave = load_audio(path)
        waves.append(wave)
        wave_shapes.append(wave.shape[1])
    wave_shapes_index = wave_shapes.index(max(wave_shapes))
    target_shape = waves[wave_shapes_index]
    waves.pop(wave_shapes_index)
    final_waves.append(target_shape)
    for n_array in waves:
        final_waves.append(to_shape(n_array, target_shape.shape))
    waves = sum(final_waves)
    return waves / len(audio)


def average_dual_sources(wav_1: np.ndarray, wav_2: np.ndarray,
                         value: float) -> np.ndarray:
    """(spec_utils.py:579-583)."""
    if wav_1.shape > wav_2.shape:
        wav_2 = to_shape(wav_2, wav_1.shape)
    if wav_1.shape < wav_2.shape:
        wav_1 = to_shape(wav_1, wav_2.shape)
    return (wav_1 * value) + (wav_2 * (1 - value))


def reshape_sources(wav_1: np.ndarray, wav_2: np.ndarray) -> np.ndarray:
    """Match wav_2 to wav_1's shape (spec_utils.py:585-596)."""
    if wav_1.shape > wav_2.shape:
        wav_2 = to_shape(wav_2, wav_1.shape)
    if wav_1.shape < wav_2.shape:
        ln = min(wav_1.shape[1], wav_2.shape[1])
        wav_2 = wav_2[:, :ln]
    ln = min(wav_1.shape[1], wav_2.shape[1])
    return wav_2[:, :ln]


def reshape_sources_ref(wav_1_shape, wav_2: np.ndarray) -> np.ndarray:
    """(spec_utils.py:598-600)."""
    if wav_1_shape > wav_2.shape:
        wav_2 = to_shape(wav_2, wav_1_shape)
    return wav_2


def combine_arrarys(audio_sources: list, is_swap: bool = False) -> np.ndarray:
    """Sum arrays onto the largest's shape (spec_utils.py:602-609;
    the reference's typo'd name kept for API parity)."""
    source = np.zeros_like(max(audio_sources, key=np.size))
    for v in audio_sources:
        v = match_array_shapes(v, source, is_swap=is_swap)
        source += v
    return source


def combine_audio(paths: list, audio_file_base=None,
                  wav_type_set: str = "FLOAT", save_format=None) -> None:
    """(spec_utils.py:611-615)."""
    source = combine_arrarys([load_audio(i) for i in paths])
    save_path = f"{audio_file_base}_combined.wav"
    _write_out(save_path, source.T, 44100, wav_type_set)
    if save_format is not None:
        save_format(save_path)


def reduce_mix_bv(inst_source: np.ndarray, voc_source: np.ndarray,
                  reduction_rate: float = 0.9) -> np.ndarray:
    """(spec_utils.py:617-618)."""
    return combine_arrarys([inst_source * (1 - reduction_rate), voc_source],
                           is_swap=True)


def organize_inputs(inputs: list) -> dict:
    """Classify aligner input files by suffix (spec_utils.py:620-629)."""
    input_list = {"target": None, "reference": None, "reverb": None,
                  "inst": None}
    for i in inputs:
        if i.endswith("_(Vocals).wav"):
            input_list["reference"] = i
        elif "_RVC_" in i:
            input_list["target"] = i
        elif i.endswith("reverbed_stem.wav"):
            input_list["reverb"] = i
        elif i.endswith("_(Instrumental).wav"):
            input_list["inst"] = i
    return input_list


def check_if_phase_inverted(wav1: np.ndarray, wav2: np.ndarray,
                            is_mono: bool = False) -> bool:
    """(spec_utils.py:631-636)."""
    if not is_mono:
        wav1 = np.mean(wav1, axis=0)
        wav2 = np.mean(wav2, axis=0)
    return np.corrcoef(wav1[:1000], wav2[:1000])[0, 1] < 0


# --------------------------------------------------------------- alignment
#
# Same capability as the reference aligner (spec_utils.py:638-852) but in
# this codebase's own structure: module-level lag/gain helpers, a channel
# view loop instead of duplicated mono/stereo branches, and an explicit
# progress relay object.  Numerics are unchanged (exact parity asserted
# in tests/test_spec_tools.py::test_time_correction_parity).

_SR_ALIGN = 44100


def _db_gain(db: float) -> float:
    return 10.0 ** (db / 20.0)


def _xcorr_lag(a: np.ndarray, b: np.ndarray) -> int:
    """Signed lag (samples) that best aligns b onto a (full
    cross-correlation peak)."""
    return int(np.correlate(a, b, "full").argmax()) - (b.shape[0] - 1)


def _delay(wav: np.ndarray, lag: int) -> np.ndarray:
    """Apply a signed lag along time axis 0: positive prepends silence,
    negative drops leading samples."""
    if lag > 0:
        return np.append(np.zeros((lag,) + wav.shape[1:], dtype=wav.dtype),
                         wav, axis=0)
    return wav[-lag:] if lag < 0 else wav


class _AlignProgress:
    """Relays window-loop progress into the UI callback as a saturating
    fraction in [0.1, 1.0)."""

    def __init__(self, cb):
        self.cb = cb
        self.ticks = 0

    def tick(self, expected_total: int) -> None:
        self.ticks += 1
        denom = max(expected_total, self.ticks + 1)
        if self.cb is not None:
            self.cb(0.1, 0.9 * self.ticks / denom)


def align_audio(file1: str, file2: str, file2_aligned: str,
                file_subtracted: str, wav_type_set: str,
                is_save_aligned: bool, command_Text, save_format,
                align_window: list, align_intro_val: list,
                db_analysis: tuple, set_progress_bar, phase_option: str,
                phase_shifts, is_match_silence: bool,
                is_spec_match: bool) -> None:
    """Time-align file2 against file1, write the aligned take and the
    subtraction residual (capability of spec_utils.py:638-739)."""
    emit = command_Text if command_Text is not None else (lambda *_: None)
    progress = _AlignProgress(set_progress_bar)

    wav1 = load_audio_maybe_mono(file1)
    wav2 = load_audio_maybe_mono(file2)
    is_mono = wav1.ndim == 1 and wav2.ndim == 1
    if not is_mono:
        if wav1.ndim == 1:
            wav1 = np.asfortranarray([wav1, wav1])
        if wav2.ndim == 1:
            wav2 = np.asfortranarray([wav2, wav2])

    if phase_option == AUTO_PHASE:
        if check_if_phase_inverted(wav1, wav2, is_mono=is_mono):
            wav2 = -wav2
    elif phase_option == NEGATIVE_PHASE:
        wav2 = -wav2

    if is_match_silence:
        wav2 = adjust_leading_silence(wav2, wav1)

    seconds = min(wav1.shape[-1], wav2.shape[-1]) // _SR_ALIGN
    if not is_mono:
        wav1 = wav1.transpose()     # (T, C)
        wav2 = wav2.transpose()

    emit("processing files...\n")

    # coarse pass: probe the cross-correlation lag at several points of
    # the track and keep each distinct shifted take as a candidate
    candidates: list[np.ndarray] = []
    for divisor in align_intro_val:
        probe = _SR_ALIGN * (1 if divisor == 1 else int(seconds // divisor))
        ref_seg = wav1[probe:probe + _SR_ALIGN]
        tgt_seg = wav2[probe:probe + _SR_ALIGN]
        if not is_mono:
            ref_seg, tgt_seg = ref_seg[:, 0], tgt_seg[:, 0]
        shifted = _delay(wav2, _xcorr_lag(ref_seg, tgt_seg))
        if not any(np.array_equal(shifted, c) for c in candidates):
            candidates.append(shifted)

    # fine pass per candidate; residuals keyed by mean level so
    # identical-quality duplicates collapse
    residuals: dict[float, np.ndarray] = {}
    for cand in candidates:
        cand = (match_mono_array_shapes(cand, wav1) if is_mono
                else match_array_shapes(cand, wav1, is_swap=True))
        if align_window:
            sub = time_correction(
                wav1, cand, seconds, align_window=align_window,
                db_analysis=db_analysis, progress_bar=progress.tick,
                unique_sources=len(candidates), phase_shifts=phase_shifts)
            residuals[float(np.abs(sub).mean())] = sub
        else:
            pre = cand * _db_gain(db_analysis[0])
            for db_adj in db_analysis[1]:
                sub = wav1 - pre * _db_gain(db_adj)
                residuals[float(np.abs(sub).mean())] = sub

    subs = list(residuals.values())
    wav_sub = (ensemble_for_align(subs)
               if is_spec_match and len(subs) >= 2 else ensemble_wav(subs))
    wav_sub = np.clip(wav_sub, -1, +1)

    emit("saving instrumental...\n")
    if is_save_aligned or is_spec_match:
        wav1m = (match_mono_array_shapes(wav1, wav_sub) if is_mono
                 else match_array_shapes(wav1, wav_sub, is_swap=True))
        aligned = wav1m - wav_sub
        if is_spec_match:
            if wav1m.ndim == 1:
                aligned = np.asfortranarray([aligned, aligned]).T
                wav1m = np.asfortranarray([wav1m, wav1m]).T
            aligned = ensemble_for_align([aligned, wav1m])
            wav_sub = wav1m - aligned
        if is_save_aligned:
            _write_out(file2_aligned, aligned, _SR_ALIGN, wav_type_set)
            if save_format is not None:
                save_format(file2_aligned)

    _write_out(file_subtracted, wav_sub, _SR_ALIGN, wav_type_set)
    if save_format is not None:
        save_format(file_subtracted)


def phase_shift_hilbert(signal: np.ndarray, degree: float) -> np.ndarray:
    """Constant phase rotation via the analytic signal
    (spec_utils.py:738-740)."""
    analytic_signal = hilbert(signal)
    return (np.cos(np.radians(degree)) * analytic_signal.real
            - np.sin(np.radians(degree)) * analytic_signal.imag)


def get_phase_shifted_tracks(track: np.ndarray, phase_shift: int) -> list:
    """Track + its phase rotations every `phase_shift` degrees
    (spec_utils.py:742-753)."""
    if phase_shift == 180:
        return [track, -track]
    step = phase_shift
    end = 180 - (180 % step) if 180 % step == 0 else 181
    phase_range = range(step, end, step)
    flipped_list = [track, -track]
    for i in phase_range:
        flipped_list.extend([phase_shift_hilbert(track, i),
                             phase_shift_hilbert(track, -i)])
    return flipped_list


def _realign_window(ref_win: np.ndarray, tgt_win: np.ndarray,
                    db_analysis: tuple, phase_shifts) -> np.ndarray:
    """Best gain/phase/lag variant of tgt_win against ref_win.

    Every phase variant x trim-gain step is lag-corrected at the full
    cross-correlation peak; the variant with the smallest mean absolute
    residual wins (semantics of spec_utils.py:757-771)."""
    pre = tgt_win * _db_gain(db_analysis[0])
    variants = ([pre] if phase_shifts == 190
                else get_phase_shifted_tracks(pre, phase_shifts))
    best, best_err = None, np.inf
    for db_adj in db_analysis[1]:
        for v in variants:
            cand = v * _db_gain(db_adj)
            lag = (int(np.argmax(np.abs(correlate(ref_win, cand))))
                   - (len(ref_win) - 1))
            rolled = np.roll(cand, shift=lag)
            err = np.abs(ref_win - rolled).mean()
            if err < best_err:
                best, best_err = rolled, err
    return best


def time_correction(mix: np.ndarray, instrumental: np.ndarray,
                    seconds_length: int, align_window: list,
                    db_analysis: tuple, sr: int = 44100,
                    progress_bar=None, unique_sources=None,
                    phase_shifts=NONE_P) -> np.ndarray:
    """Windowed overlap-add re-alignment of instrumental against mix
    (capability of spec_utils.py:755-819): per window the best
    gain/phase/lag variant is subtracted, passes over every window size
    in align_window are ensembled piecewise."""
    assert mix.shape == instrumental.shape, \
        f"shape mismatch: {mix.shape} vs {instrumental.shape}"

    channels = [None] if mix.ndim == 1 else list(range(mix.shape[1]))
    tick_every = 320 if len(align_window) > 2 else 120
    expected_windows = sum(
        len(range(0, mix.shape[0] - int(sr * secs), int(sr * secs) // 2))
        for secs in align_window) * len(channels)
    expected_ticks = (expected_windows // tick_every) * (unique_sources or 1)

    windows_done = 0
    results: dict[float, np.ndarray] = {}
    for secs in align_window:
        win = int(sr * secs)
        step = win // 2
        taper = np.hanning(win)
        sub = np.zeros_like(mix)
        norm = np.zeros_like(mix)
        for ch in channels:
            view_m = mix if ch is None else mix[:, ch]
            view_i = instrumental if ch is None else instrumental[:, ch]
            out_s = sub if ch is None else sub[:, ch]
            out_n = norm if ch is None else norm[:, ch]
            for start in range(0, len(view_m) - win, step):
                windows_done += 1
                if windows_done % tick_every == 0 and progress_bar is not None:
                    progress_bar(expected_ticks)
                wm = view_m[start:start + win] * taper
                wi = view_i[start:start + win] * taper
                out_s[start:start + win] += wm - _realign_window(
                    wm, wi, db_analysis, phase_shifts)
                out_n[start:start + win] += taper
        with np.errstate(divide="ignore", invalid="ignore"):
            results[float(np.abs(sub).mean())] = np.where(
                norm > 1e-6, sub / norm, sub)

    return ensemble_wav(list(results.values()), split_size=12)


def ensemble_wav(waveforms: list, split_size: int = 240) -> np.ndarray:
    """Piecewise min-energy ensemble: cut every waveform into split_size
    chunks, keep the quietest chunk at each position
    (spec_utils.py:821-827)."""
    chunked = [np.array_split(w, split_size) for w in waveforms]
    picks = [chunked[int(np.argmin([np.abs(c[j]).mean() for c in chunked]))][j]
             for j in range(split_size)]
    return np.concatenate(picks)

def ensemble_wav_min(waveforms: list) -> np.ndarray:
    """Sample-wise min-magnitude ensemble (spec_utils.py:829-837)."""
    wave = waveforms[0]
    for i in range(1, len(waveforms)):
        ln = min(len(wave), len(waveforms[i]))
        wave = wave[:ln]
        waveforms[i] = waveforms[i][:ln]
        wave = np.where(np.abs(waveforms[i]) <= np.abs(wave), waveforms[i],
                        wave)
    return wave


def align_audio_test(wav1: np.ndarray, wav2: np.ndarray,
                     sr1: int = 44100) -> np.ndarray:
    """Single-probe coarse alignment of wav2 onto wav1 (capability of
    spec_utils.py:839-852; single-column zero pad on positive lags kept
    for byte-parity with the reference)."""
    wav1, wav2 = wav1.transpose(), wav2.transpose()
    lag = _xcorr_lag(wav1[sr1:2 * sr1, 0], wav2[sr1:2 * sr1, 0])
    if lag > 0:
        return np.append(np.zeros((lag, 1)), wav2, axis=0)
    return wav2[-lag:] if lag < 0 else wav2


# ----------------------------------------------------------------- file I/O


def load_audio(audio_file: str) -> np.ndarray:
    """(C, L) stereo at 44100 (spec_utils.py:854-857)."""
    wav = load_audio_maybe_mono(audio_file)
    if wav.ndim == 1:
        wav = np.asfortranarray([wav, wav])
    return wav


def load_audio_maybe_mono(audio_file: str) -> np.ndarray:
    """librosa.load(sr=44100, mono=False) semantics on our readers:
    mono files stay 1-D, stereo -> (2, L)."""
    audio, sr = _read_wav_file(audio_file)
    if audio.ndim == 2:
        audio = audio.T  # (T, C) -> (C, T)
    if sr != 44100:
        audio = _resample(audio, sr, 44100)
    return np.asarray(audio, np.float32)


def _write_out(path: str, audio: np.ndarray, sr: int,
               wav_type_set: str) -> None:
    subtype = "float32" if "FLOAT" in (wav_type_set or "").upper() \
        else "pcm16"
    _save_wav(path, np.asarray(audio), sr, subtype=subtype)


# -------------------------------------------------- rubberband replacements


def time_stretch(y: np.ndarray, sr: int, rate: float) -> np.ndarray:
    """Tempo change without pitch change (reference shells out to the
    rubberband binary, spec_utils.py:887-893; ours is the phase vocoder
    from utils/tts.py).  rate > 1 -> shorter output."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    if rate == 1.0:
        return y
    from ..utils.tts import time_stretch as _pv_stretch

    target_duration = (len(y) / sr) / rate
    return _pv_stretch(y, sr, target_duration)


def pitch_shift(y: np.ndarray, sr: int, n_steps: float,
                rbargs=None) -> np.ndarray:
    """Pitch shift preserving duration (reference rubberband,
    spec_utils.py:895-899; ours is the STFT phase-vocoder shifter)."""
    if n_steps == 0:
        return y
    from ..utils.pitchshift import shift_pitch

    return shift_pitch(np.asarray(y, np.float64), sr,
                       factors=2.0 ** (n_steps / 12.0)).astype(np.float32)
