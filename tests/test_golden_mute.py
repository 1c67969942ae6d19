"""Golden-file tests against the reference's mute fixtures
(assets/logs/mute — the only golden artifacts the reference ships;
SURVEY.md §4)."""

import os

import numpy as np
import pytest

MUTE = "/root/reference/assets/logs/mute"

if not os.path.isdir(MUTE):
    pytest.skip("reference mute fixtures unavailable", allow_module_level=True)


def test_mute_f0_coarse_golden():
    """Coarse F0 of silence == the reference's precomputed artifact
    (all bin 1, 301 frames for 3 s)."""
    from rvc_maker_tpu.f0.common import coarse_f0
    from rvc_maker_tpu.utils.audio import read_wav

    audio, sr = read_wav(os.path.join(MUTE, "sliced_audios_16k", "mute.wav"))
    assert sr == 16000 and np.abs(audio).max() == 0.0

    golden = np.load(os.path.join(MUTE, "f0", "mute.wav.npy"))
    golden_v = np.load(os.path.join(MUTE, "f0_voiced", "mute.wav.npy"))

    p_len = len(audio) // 160 + 1
    assert p_len == len(golden) == len(golden_v)

    f0 = np.zeros(p_len, np.float32)      # any method: silence -> 0 Hz
    coarse = np.asarray(coarse_f0(f0))
    np.testing.assert_array_equal(coarse, golden)
    np.testing.assert_array_equal(f0, golden_v)


@pytest.mark.parametrize("sr", [32000, 40000, 48000])
def test_mute_wav_durations(sr):
    from rvc_maker_tpu.utils.audio import read_wav

    audio, got_sr = read_wav(os.path.join(MUTE, "sliced_audios",
                                          f"mute{sr}.wav"))
    assert got_sr == sr and len(audio) == 3 * sr
    assert np.abs(audio).max() == 0.0


def test_our_mute_fixture_matches_golden_layout(tmp_path):
    """write_mute_fixture synthesizes the same artifact tree with the
    same shapes/dtypes/values as the reference's (features depend on the
    embedder weights, so only their frame count is pinned)."""
    import jax

    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.extract import write_mute_fixture

    cfg = preset("v2", 48000)
    hubert = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    exp = str(tmp_path)
    write_mute_fixture(exp, cfg, hubert, version="v2")

    f0 = np.load(os.path.join(exp, "mute", "f0", "mute.wav.npy"))
    golden = np.load(os.path.join(MUTE, "f0", "mute.wav.npy"))
    np.testing.assert_array_equal(f0, golden)

    f0v = np.load(os.path.join(exp, "mute", "f0_voiced", "mute.wav.npy"))
    assert not f0v.any() and len(f0v) == len(golden)

    feats = np.load(os.path.join(exp, "mute", "v2_extracted", "mute.npy"))
    golden_feats = np.load(os.path.join(MUTE, "v2_extracted", "mute.npy"))
    assert feats.shape == golden_feats.shape
    from rvc_maker_tpu.utils.audio import read_wav

    w48, sr48 = read_wav(os.path.join(exp, "mute", "sliced_audios",
                                      "mute48000.wav"))
    assert sr48 == 48000 and len(w48) == 3 * 48000
    assert np.abs(w48).max() == 0.0
