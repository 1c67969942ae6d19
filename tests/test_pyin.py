"""pYIN tests: prior distributions vs scipy, tones/chirps/unvoiced."""

import numpy as np

from rvc_maker_tpu.f0.pyin import (_beta_probs, _boltzmann_pmf,
                                   _local_transition, pyin)


def test_beta_probs_match_scipy():
    from scipy.stats import beta

    x = np.linspace(0, 1, 101)
    ref = np.diff(beta.cdf(x, 2, 18))
    ours = _beta_probs(100, 2.0, 18.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)
    assert abs(ours.sum() - 1.0) < 1e-12


def test_boltzmann_matches_scipy():
    from scipy.stats import boltzmann

    n = np.array([1, 3, 5, 7])
    k = np.arange(7)[:, None]
    ref = boltzmann.pmf(k, 2.0, n[None, :])
    ref = np.where((k >= 0) & (k < n[None]), ref, 0.0)
    ours = _boltzmann_pmf(k.astype(float), 2.0, n[None].astype(float))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_local_transition_rows_stochastic():
    t = _local_transition(50, 11)
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-12)
    # banded: no mass farther than half-width
    assert t[0, 10] == 0 and t[25, 25] > t[25, 20]


def test_pyin_tone():
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    f0, voiced, vprob = pyin(y, sr, hop_length=160)
    mid = f0[10:-10]
    assert np.all(voiced[10:-10])
    np.testing.assert_allclose(mid, 220.0, rtol=0.01)


def test_pyin_unvoiced_silence_and_transition():
    sr = 16000
    t = np.arange(sr // 2) / sr
    tone = 0.5 * np.sin(2 * np.pi * 330.0 * t)
    rs = np.random.RandomState(0)
    y = np.concatenate([np.zeros(sr // 2), tone,
                        0.005 * rs.randn(sr // 2)])
    f0, voiced, _ = pyin(y, sr, hop_length=160)
    n = len(f0)
    a, b = n // 3, 2 * n // 3
    assert voiced[a + 5: b - 5].mean() > 0.9          # tone region voiced
    assert voiced[: a - 5].mean() < 0.2               # silence unvoiced
    assert np.all(np.isnan(f0[~voiced]))
    vf = f0[a + 5: b - 5][voiced[a + 5: b - 5]]
    np.testing.assert_allclose(vf, 330.0, rtol=0.01)


def test_pyin_chirp_tracks():
    sr = 16000
    t = np.arange(2 * sr) / sr
    inst = 150.0 * 2 ** (t / 2.0)                     # one octave over 2 s
    phase = 2 * np.pi * np.cumsum(inst) / sr
    y = 0.4 * np.sin(phase)
    f0, voiced, _ = pyin(y, sr, hop_length=160)
    frames = np.arange(len(f0)) * 160 / sr
    expected = 150.0 * 2 ** (frames / 2.0)
    window = (frames > 0.1) & (frames < 1.9)
    assert voiced[window].mean() > 0.9
    sel = voiced & window
    np.testing.assert_allclose(f0[sel], expected[sel], rtol=0.03)
