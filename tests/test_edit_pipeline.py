"""audioldm2 editing stage: full pipeline over the toy latent stack
(the diffusion checkpoint stack is download-gated, like the reference)."""

import numpy as np
import pytest

from rvc_maker_tpu.edit import pipeline as ep


def _tone(seconds=1.0, hz=220.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_mel_griffin_lim_roundtrip():
    stack = ep.ToyMelStack()
    audio = _tone()
    mel, dur = stack.get_mel(audio)
    assert abs(dur - 1.0) < 1e-6
    assert mel.shape[0] == ep.MEL_BINS
    back = stack.decode_to_mel(mel)
    # Griffin-Lim from a 64-mel magnitude keeps the dominant pitch
    spec = np.abs(np.fft.rfft(back[2000:-2000]
                              * np.hanning(len(back) - 4000)))
    peak_hz = np.argmax(spec) * 16000 / (len(back) - 4000)
    assert 200 < peak_hz < 240


def test_edit_end_to_end_toy(tmp_path):
    from rvc_maker_tpu.utils.audio import read_wav, save_wav

    src = str(tmp_path / "in.wav")
    save_wav(src, _tone(seconds=0.5), 16000, subtype="float32")

    out = ep.edit(src, str(tmp_path / "out.wav"), stack=ep.ToyMelStack(),
                  steps=8, t_start=50, sr=16000, source_prompt="a",
                  target_prompt="b")
    audio, sr = read_wav(out)
    assert sr == 16000
    assert audio.ndim == 2 and audio.shape[1] == 2
    assert np.isfinite(audio).all() and np.abs(audio).max() > 1e-4


def test_edit_tstart_zero_is_reconstruction(tmp_path):
    """t_start=0 starts the reverse chain at x0 itself -> output is the
    (mel->griffin-lim) reconstruction of the input, untouched by noise."""
    from rvc_maker_tpu.utils.audio import read_wav, save_wav

    src = str(tmp_path / "in.wav")
    tone = _tone(seconds=0.5)
    save_wav(src, tone, 16000, subtype="float32")

    stack = ep.ToyMelStack()
    out = ep.edit(src, str(tmp_path / "rec.wav"), stack=stack, steps=8,
                  t_start=0, sr=16000)
    got, _ = read_wav(out)
    mel, _ = stack.get_mel(tone)
    direct = stack.decode_to_mel(mel)
    direct = ep.low_pass_filter(direct, 7500.0, 16000)
    n = min(len(direct), got.shape[0])
    np.testing.assert_allclose(got[:n, 0], direct[:n], atol=2e-4)


def test_gated_loader_raises():
    with pytest.raises(RuntimeError, match="download-gated"):
        ep.load_audioldm2_stack("audioldm2-music")
    with pytest.raises(ValueError):
        ep.load_audioldm2_stack("not-a-model")
