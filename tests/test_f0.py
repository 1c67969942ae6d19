"""F0 post-processing and YIN estimator tests."""

import numpy as np

import jax.numpy as jnp

from rvc_maker_tpu.f0 import autotune_f0, coarse_f0, shift_f0, yin
from rvc_maker_tpu.f0.common import NOTE_FREQS


def test_coarse_f0_reference_semantics():
    """Hz -> 1..255 mel bins (reference convert.py:318-323)."""
    f0 = np.array([0.0, 50.0, 220.0, 1100.0, 2000.0], np.float32)
    got = np.asarray(coarse_f0(jnp.asarray(f0)))
    # numpy transliteration of the reference formula
    f0_mel = 1127 * np.log(1 + f0 / 700)
    f0_mel_min = 1127 * np.log(1 + 50 / 700)
    f0_mel_max = 1127 * np.log(1 + 1100 / 700)
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - f0_mel_min) * 254 / (f0_mel_max - f0_mel_min) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > 255] = 255
    expect = np.rint(f0_mel).astype(np.int32)
    np.testing.assert_array_equal(got, expect)
    assert got.min() >= 1 and got.max() <= 255


def test_shift_f0():
    f0 = jnp.asarray([220.0])
    np.testing.assert_allclose(np.asarray(shift_f0(f0, 12)), [440.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(shift_f0(f0, -12)), [110.0], rtol=1e-5)


def test_autotune_snaps_to_notes():
    f0 = jnp.asarray([222.0, 0.0, 443.0])
    out = np.asarray(autotune_f0(f0, 1.0))
    assert abs(out[0] - 220.0) < 1e-3
    assert abs(out[2] - 440.0) < 1e-3
    # strength 0.5 moves halfway
    half = np.asarray(autotune_f0(f0, 0.5))
    assert abs(half[0] - 221.0) < 1e-3
    # 0 Hz snaps toward the lowest note — the reference does the same
    assert abs(out[1] - NOTE_FREQS[0]) < 1e-3


def test_yin_on_pure_tones():
    sr = 16000
    t = np.arange(sr * 2) / sr
    for hz in (110.0, 220.0, 440.0):
        audio = np.sin(2 * np.pi * hz * t).astype(np.float32)[None]
        f0 = np.asarray(yin(jnp.asarray(audio), sr=sr, hop_length=160))
        mid = f0[0, 20:-20]
        assert np.median(np.abs(mid - hz)) / hz < 0.02, (hz, np.median(mid))


def test_yin_batch_shapes():
    audio = np.zeros((3, 16000), np.float32)
    f0 = yin(jnp.asarray(audio), sr=16000, hop_length=160)
    assert f0.shape[0] == 3
    assert f0.shape[1] >= 99


def test_extract_host_f0_methods(tmp_path):
    """extract_f0 supports the full method registry (reference
    FeatureInput.compute_f0, extract.py:149-151) — host methods + hybrid
    on a synthetic tone end to end."""
    import os

    from rvc_maker_tpu.pipelines.extract import _host_f0_single, extract_f0
    from rvc_maker_tpu.utils.audio import save_wav

    sr = 16000
    t = np.arange(int(1.2 * sr)) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    for method in ("pm", "swipe", "pyin", "hybrid[pm+swipe]"):
        f0 = _host_f0_single(tone, method)
        assert len(f0) == len(tone) // 160 + 1, method
        voiced = f0[f0 > 0]
        assert len(voiced) > 20, method
        assert abs(np.median(voiced) - 220.0) < 15.0, method

    exp = str(tmp_path)
    wav_dir = os.path.join(exp, "sliced_audios_16k")
    os.makedirs(wav_dir)
    save_wav(os.path.join(wav_dir, "a.wav"), tone, sr)
    n = extract_f0(exp, method="pm")
    assert n == 1
    coarse = np.load(os.path.join(exp, "f0", "a.wav.npy"))
    hz = np.load(os.path.join(exp, "f0_voiced", "a.wav.npy"))
    assert coarse.dtype == np.int32 and coarse.max() > 1
    assert abs(np.median(hz[hz > 0]) - 220.0) < 15.0
