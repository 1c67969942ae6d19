"""Praat-AC ("pm") pitch method tests (Boersma algorithm, numpy)."""

import numpy as np
import pytest

from rvc_maker_tpu.f0 import praat_ac

SR = 16000


@pytest.mark.parametrize("hz", [110.0, 220.0, 440.0])
def test_tone(hz):
    t = np.arange(SR * 2) / SR
    x = (0.5 * np.sin(2 * np.pi * hz * t)
         + 0.25 * np.sin(2 * np.pi * 2 * hz * t)).astype(np.float32)
    f0 = praat_ac(x, SR)
    v = f0[f0 > 0]
    assert len(v) > 0.95 * len(f0)
    assert abs(np.median(v) - hz) / hz < 0.005


def test_silence_unvoiced():
    f0 = praat_ac(np.zeros(SR, np.float32), SR)
    assert np.all(f0 == 0)


def test_vibrato_tracking():
    t = np.arange(SR * 2) / SR
    inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 4 * t))
    x = (0.5 * np.sin(2 * np.pi * np.cumsum(inst) / SR)).astype(np.float32)
    f0 = praat_ac(x, SR)
    tgt = np.interp(np.arange(len(f0)) * 0.01, t, inst)
    v = f0 > 0
    assert v.mean() > 0.9
    assert np.median(np.abs(f0[v] - tgt[v]) / tgt[v]) < 0.01


def test_voicing_transition():
    """Tone / silence / tone: the gap must be unvoiced."""
    t = np.arange(SR) / SR
    tone = 0.5 * np.sin(2 * np.pi * 200 * t)
    x = np.concatenate([tone, np.zeros(SR), tone]).astype(np.float32)
    f0 = praat_ac(x, SR)
    mid = f0[120:180]  # frames 1.2-1.8 s
    assert (mid == 0).mean() > 0.8
