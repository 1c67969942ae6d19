"""Stem-separation orchestration (reference separator_music.py):
main separation -> karaoke split -> dereverb -> cleanup chain."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from rvc_maker_tpu.pipelines.separate_music import (DEMUCS_MODELS,
                                                    KARA_MODELS, MDX_MODELS,
                                                    SeparationSettings,
                                                    _resolve_model,
                                                    separate_music)


@pytest.fixture(scope="module")
def tiny_mdx_onnx(tmp_path_factory):
    """A conv net with the MDX graph contract (B, 4, F, T) -> same."""
    from rvc_maker_tpu.interop import onnx_proto as proto
    from rvc_maker_tpu.interop.onnx_export import export_onnx

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(4, 4, 3, 3).astype(np.float32) * 0.2)

    def net(spek):
        return jax.lax.conv_general_dilated(
            spek, jnp.transpose(w, (1, 0, 2, 3)), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    x = jnp.zeros((1, 4, 24, 32), jnp.float32)
    model = export_onnx(net, (x,), input_names=["input"],
                        output_names=["output"])
    path = str(tmp_path_factory.mktemp("mdx") / "tiny_mdx.onnx")
    proto.save_model(model, path)
    return path


@pytest.fixture()
def song(tmp_path):
    sr = 44100
    t = np.arange(int(0.6 * sr)) / sr
    mix = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 2.5 * 110 * t)).astype(np.float32)
    path = str(tmp_path / "song.wav")
    wavfile.write(path, sr, (mix * 32767).astype(np.int16))
    return path


def test_registries():
    assert DEMUCS_MODELS["HT-Normal"] == "htdemucs.yaml"
    assert MDX_MODELS["Kim_Vocal_1"] == "Kim_Vocal_1.onnx"
    assert KARA_MODELS["Version-2"] == "UVR_MDXNET_KARA_2.onnx"


def test_resolve_model_paths(tmp_path, monkeypatch):
    s = SeparationSettings(model_dir=str(tmp_path))
    # explicit path passes through
    p = tmp_path / "x.onnx"
    p.write_bytes(b"")
    assert _resolve_model(str(p), s) == str(p)
    # registry name triggers a download to the model dir
    calls = []

    def fake(url, path):
        calls.append(url)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        open(path, "wb").write(b"x")
        return path

    monkeypatch.setattr("rvc_maker_tpu.utils.downloads.download_url", fake)
    out = _resolve_model("Kim_Vocal_1", s)
    assert out.endswith("Kim_Vocal_1.onnx") and len(calls) == 1
    assert "uvr5/Kim_Vocal_1.onnx" in calls[0]
    with pytest.raises(ValueError):
        _resolve_model("NotAModel", s)


def test_full_chain_mdx(tmp_path, tiny_mdx_onnx, song):
    out_dir = str(tmp_path / "stems")
    s = SeparationSettings(model_name=tiny_mdx_onnx,
                           kara_model=tiny_mdx_onnx,
                           reverb_model=tiny_mdx_onnx,
                           backing=True, reverb=True, backing_reverb=True,
                           mdx_hop=16, mdx_n_fft=64)
    written = separate_music(song, out_dir, s)
    assert set(written) == {
        "Original_Vocals", "Instruments", "Main_Vocals", "Backing_Vocals",
        "Original_Vocals_No_Reverb", "Main_Vocals_No_Reverb",
        "Backing_Vocals_No_Reverb"}
    for stem, path in written.items():
        sr, data = wavfile.read(path)
        assert sr == 44100 and len(data) > 0, stem
        assert np.all(np.isfinite(data)), stem


def test_clean_audio_flag(tmp_path, tiny_mdx_onnx, song):
    out_dir = str(tmp_path / "stems2")
    s = SeparationSettings(model_name=tiny_mdx_onnx, clean_audio=True,
                           mdx_hop=16, mdx_n_fft=64)
    written = separate_music(song, out_dir, s)
    assert set(written) == {"Original_Vocals", "Instruments"}
    sr, data = wavfile.read(written["Original_Vocals"])
    assert np.all(np.isfinite(data))
