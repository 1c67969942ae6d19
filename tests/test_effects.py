"""Audio effects chain tests (behavioral DSP checks)."""

import numpy as np
import pytest

from rvc_maker_tpu.utils.effects import (EffectsSettings, apply_effects,
                                         bitcrush, clipping, compressor,
                                         delay, distortion, fade_in,
                                         fade_out, gain, limiter, reverb)

SR = 16000


def _tone(hz=440.0, seconds=1.0, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_gain():
    x = _tone()
    np.testing.assert_allclose(gain(x, 6.0), x * 10 ** 0.3, rtol=1e-5)


def test_clipping():
    x = _tone(amp=1.0)
    y = clipping(x, threshold_db=-6.0)
    assert np.max(np.abs(y)) <= 10 ** (-6 / 20) + 1e-6


def test_bitcrush_quantizes():
    x = _tone()
    y = bitcrush(x, 4)
    assert len(np.unique(y)) <= 17
    assert np.max(np.abs(y - x)) < 0.2


def test_distortion_saturates():
    x = _tone(amp=1.0)
    y = distortion(x, drive_db=30.0)
    assert np.max(np.abs(y)) <= 1.0
    # strong drive -> near square wave: high RMS relative to peak
    assert np.sqrt(np.mean(y ** 2)) > 0.8


def test_delay_creates_echo():
    x = np.zeros(SR, np.float32)
    x[0] = 1.0
    y = delay(x, SR, seconds=0.25, feedback=0.5, mix=1.0)
    d = int(0.25 * SR)
    assert abs(y[d] - 1.0) < 1e-6
    assert abs(y[2 * d] - 0.5) < 1e-6


def test_compressor_reduces_dynamics():
    x = np.concatenate([_tone(amp=0.05, seconds=0.5),
                        _tone(amp=0.9, seconds=0.5)])
    y = compressor(x, SR, threshold_db=-20.0, ratio=8.0)
    loud_in = np.abs(x[-2000:]).max()
    loud_out = np.abs(y[-2000:]).max()
    quiet_out = np.abs(y[3000:5000]).max()
    assert loud_out < loud_in * 0.6          # loud part compressed
    assert quiet_out > 0.03                  # quiet part mostly untouched


def test_limiter_caps_peaks():
    x = _tone(amp=1.0)
    y = limiter(x, SR, threshold_db=-6.0)
    assert np.abs(y)[1000:].max() < 10 ** (-6 / 20) * 1.2


def test_reverb_adds_tail():
    x = np.zeros(SR, np.float32)
    x[:100] = _tone(seconds=100 / SR)[:100]
    y = reverb(x, SR, wet_level=0.5, dry_level=0.5)
    # energy appears well after the dry impulse ends
    assert np.abs(y[SR // 2 :]).max() > 1e-4
    assert np.all(np.isfinite(y))


def test_fades():
    x = np.ones(SR, np.float32)
    y = fade_in(x, SR, 0.5)
    assert y[0] == 0.0 and abs(y[-1] - 1.0) < 1e-6
    z = fade_out(x, SR, 0.5)
    assert abs(z[0] - 1.0) < 1e-6 and z[-1] == 0.0


def test_full_chain_runs():
    x = _tone(seconds=1.0)
    s = EffectsSettings(chorus=True, distortion=True, reverb=True,
                        delay=True, compressor=True, limiter=True, gain=True,
                        gain_db=3.0, bitcrush=True, clipping=True,
                        phaser=True, treble_bass_boost=True,
                        bass_boost_db=3.0, treble_boost_db=3.0,
                        fade_in_out=True, fade_in_duration=0.1,
                        fade_out_duration=0.1, resample_sr=22050)
    out, sr = apply_effects(x, SR, s)
    assert sr == 22050
    assert np.all(np.isfinite(out))
    assert len(out) == pytest.approx(22050, abs=10)
