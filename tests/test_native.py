"""Native C++ library tests: WORLD-style dio/stonemask + sinc resampler."""

import numpy as np
import pytest

from rvc_maker_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _tone(hz, sr=16000, seconds=2.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float64)


@pytest.mark.parametrize("hz", [110.0, 220.0, 440.0])
def test_dio_stonemask_tone(hz):
    sr = 16000
    x = _tone(hz, sr)
    f0, t = native.dio(x, sr)
    refined = native.stonemask(x, sr, t, f0)
    voiced = refined[refined > 0]
    assert len(voiced) > 0.9 * len(refined)
    assert abs(np.median(voiced) - hz) / hz < 0.01
    # stonemask should tighten the estimate
    assert (np.std(voiced[5:-5]) <= np.std(f0[f0 > 0][5:-5]) + 1.0)


def test_dio_silence_unvoiced():
    x = np.zeros(16000 * 2)
    f0, _ = native.dio(x, 16000)
    assert np.all(f0 == 0)


def test_dio_vibrato_tracking():
    sr = 16000
    t = np.arange(sr * 2) / sr
    inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 4 * t))  # 4 Hz vibrato
    phase = 2 * np.pi * np.cumsum(inst) / sr
    x = (0.5 * np.sin(phase)).astype(np.float64)
    f0, tax = native.dio(x, sr)
    refined = native.stonemask(x, sr, tax, f0)
    voiced = refined > 0
    assert voiced.mean() > 0.8
    target = np.interp(tax, t, inst)
    err = np.abs(refined[voiced] - target[voiced]) / target[voiced]
    assert np.median(err) < 0.02


def test_harvest_alias():
    x = _tone(165.0)
    f0, t = native.harvest(x, 16000)
    assert abs(np.median(f0[f0 > 0]) - 165.0) < 3.0


def test_resample_sinc_tone():
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample_sinc(x, sr1, sr2)
    assert abs(len(y) - sr2) <= 1
    # spectral peak preserved
    spec = np.abs(np.fft.rfft(y[800:-800] * np.hanning(len(y) - 1600)))
    peak = np.fft.rfftfreq(len(y) - 1600, 1 / sr2)[np.argmax(spec)]
    assert abs(peak - 440) < 5
    # amplitude preserved
    assert abs(np.max(np.abs(y[100:-100])) - 1.0) < 0.05


def test_resample_sinc_alias_rejection():
    """Content above the target Nyquist must be suppressed (the whole
    point of the soxr-quality path): a 10 kHz tone downsampled to 16 kHz
    (Nyquist 8 kHz) should come out near silent."""
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    y = native.resample_sinc(x, sr1, sr2)
    assert np.sqrt(np.mean(y[500:-500] ** 2)) < 1e-3


def test_resample_sinc_passband_flat():
    """In-band content passes with ~unity gain across the passband."""
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1 * 2) / sr1
    for hz in (100.0, 1000.0, 5000.0):
        x = np.sin(2 * np.pi * hz * t).astype(np.float32)
        y = native.resample_sinc(x, sr1, sr2)
        rms = np.sqrt(np.mean(y[1000:-1000] ** 2))
        assert abs(rms - 1 / np.sqrt(2)) < 0.02, (hz, rms)


def test_resample_upsample_roundtrip():
    sr = 16000
    x = _tone(330.0, sr, 1.0).astype(np.float32)
    up = native.resample_sinc(x, sr, 48000)
    back = native.resample_sinc(up, 48000, sr)
    n = min(len(x), len(back))
    np.testing.assert_allclose(back[300 : n - 300], x[300 : n - 300],
                               atol=5e-3)
