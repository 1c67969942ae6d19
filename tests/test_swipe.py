"""SWIPE' estimator tests (harmonic tones; prime-harmonic kernels)."""

import numpy as np
import pytest

from rvc_maker_tpu.f0.swipe import swipe


def _harmonic_tone(hz, sr=16000, seconds=2.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)
            + 0.25 * np.sin(2 * np.pi * 2 * hz * t)
            + 0.12 * np.sin(2 * np.pi * 3 * hz * t)).astype(np.float32)


@pytest.mark.parametrize("hz", [110.0, 220.0, 440.0])
def test_swipe_harmonic_tone(hz):
    f0, t = swipe(_harmonic_tone(hz), 16000)
    v = f0[f0 > 0]
    assert len(v) > 0.9 * len(f0)
    assert abs(np.median(v) - hz) / hz < 0.01


def test_swipe_silence_unvoiced():
    f0, _ = swipe(np.zeros(16000, np.float32), 16000)
    assert np.all(f0 == 0)


def test_swipe_frame_times():
    f0, t = swipe(_harmonic_tone(200.0, seconds=1.0), 16000,
                  frame_period=10.0)
    assert len(f0) == len(t) == 101
    np.testing.assert_allclose(t[1] - t[0], 0.01, rtol=1e-6)
