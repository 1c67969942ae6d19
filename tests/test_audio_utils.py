"""iSTFT, noise reduction, pitch/formant shift, resample, wav I/O tests."""

import numpy as np
import torch

import jax.numpy as jnp

from rvc_maker_tpu.ops.stft import hann_window, istft, stft_complex
from rvc_maker_tpu.utils.audio import load_audio, read_wav, resample, save_wav
from rvc_maker_tpu.utils.noisereduce import reduce_noise
from rvc_maker_tpu.utils.pitchshift import formant_shift, shift_pitch


def test_stft_istft_roundtrip():
    rs = np.random.RandomState(0)
    y = rs.randn(2, 4000).astype(np.float32)
    win = hann_window(1024)
    spec = stft_complex(jnp.asarray(y), n_fft=1024, hop_length=256,
                        win_length=1024, window=win, center=True)
    back = istft(spec, n_fft=1024, hop_length=256, win_length=1024,
                 window=win, center=True, length=4000)
    np.testing.assert_allclose(np.asarray(back), y, atol=1e-4)


def test_istft_matches_torch():
    rs = np.random.RandomState(1)
    y = torch.from_numpy(rs.randn(1, 4000).astype(np.float32))
    win_t = torch.hann_window(1024)
    spec_t = torch.stft(y, 1024, hop_length=256, win_length=1024,
                        window=win_t, center=True, return_complex=True)
    ref = torch.istft(spec_t, 1024, hop_length=256, win_length=1024,
                      window=win_t, center=True, length=4000).numpy()
    ours = istft(jnp.asarray(spec_t.numpy().transpose(0, 2, 1)),
                 n_fft=1024, hop_length=256, win_length=1024,
                 window=hann_window(1024), center=True, length=4000)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_noisereduce_matches_reference():
    """Direct parity vs the reference's vendored torch noisereduce
    (main/tools/noisereduce.py) in both gating modes."""
    import os

    from reference_util import REFERENCE_ROOT, ref_module

    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)  # reference Config() reads relative paths
    try:
        ref_nr = ref_module("main.tools.noisereduce")
    finally:
        os.chdir(cwd)

    sr = 16000
    rs = np.random.RandomState(2)
    t = np.arange(sr * 2) / sr
    noisy = (0.5 * np.sin(2 * np.pi * 440 * t)
             + rs.randn(len(t)) * 0.05).astype(np.float32)

    for stationary, prop in ((True, 1.0), (False, 0.7)):
        ref = ref_nr.reduce_noise(y=noisy.copy(), sr=sr,
                                  stationary=stationary,
                                  prop_decrease=prop, device="cpu")
        ours = reduce_noise(noisy, sr, stationary=stationary,
                            prop_decrease=prop)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=0.1)


def test_shift_pitch_octave():
    """Shifting a 220 Hz tone by 2x should move energy to ~440 Hz."""
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    out = shift_pitch(tone, sr, factors=2.0)
    assert out.shape == tone.shape
    spec = np.abs(np.fft.rfft(out[2048:-2048] * np.hanning(len(out) - 4096)))
    freqs = np.fft.rfftfreq(len(out) - 4096, 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440) < 15, peak


def test_formant_shift_preserves_pitch():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    out = formant_shift(tone, sr, quefrency=0.8, timbre=0.8)
    assert out.shape == tone.shape
    spec = np.abs(np.fft.rfft(out[2048:-2048] * np.hanning(len(out) - 4096)))
    freqs = np.fft.rfftfreq(len(out) - 4096, 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 220) < 15, peak


def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(3)
    y = (rs.randn(1600) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    save_wav(p, y, 16000, subtype="float32")
    back, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, y, atol=1e-6)
    save_wav(p, y, 16000, subtype="pcm16")
    back, _ = read_wav(p)
    np.testing.assert_allclose(back, y, atol=1e-3)


def test_resample_tone_preserved():
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1) / sr1
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, sr1, sr2)
    assert abs(len(out) - sr2) <= 2
    spec = np.abs(np.fft.rfft(out))
    peak = np.fft.rfftfreq(len(out), 1 / sr2)[np.argmax(spec)]
    assert abs(peak - 440) < 5


def test_load_audio_stereo_mono(tmp_path):
    rs = np.random.RandomState(4)
    stereo = (rs.randn(8000, 2) * 0.1).astype(np.float32)
    p = str(tmp_path / "st.wav")
    from scipy.io import wavfile
    wavfile.write(p, 32000, stereo)
    mono = load_audio(p, 16000)
    assert mono.ndim == 1
    assert abs(len(mono) - 4000) <= 2
