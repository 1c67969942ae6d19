"""Presets + external F0 file + conversion extras."""

import argparse
import json

import numpy as np

import jax

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings
from rvc_maker_tpu.utils.presets import (apply_preset_to_args, load_preset,
                                         save_preset)

CFG_M = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


def test_preset_roundtrip(tmp_path):
    p = str(tmp_path / "preset.json")
    save_preset(p, pitch=2, index_strength=0.6, cleaner=True,
                clean_strength=0.5, protect=0.2, bogus_key=1)
    data = load_preset(p)
    assert data == {"pitch": 2, "index_strength": 0.6, "cleaner": True,
                    "clean_strength": 0.5, "protect": 0.2}
    # raw file is reference-layout JSON
    with open(p) as f:
        assert "bogus_key" not in json.load(f)


def test_preset_applies_to_args(tmp_path):
    p = str(tmp_path / "preset.json")
    save_preset(p, pitch=-3, index_strength=0.25, autotune=True,
                formant_shifting=True, formant_qfrency=1.1)
    args = argparse.Namespace(pitch=0, index_rate=0.5, f0_autotune=False,
                              formant_shifting=False, formant_qfrency=0.8,
                              protect=0.33)
    apply_preset_to_args(args, load_preset(p))
    assert args.pitch == -3 and args.index_rate == 0.25
    assert args.f0_autotune is True and args.formant_shifting is True
    assert args.formant_qfrency == 1.1
    assert args.protect == 0.33          # untouched


def test_preset_requires_known_key(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        save_preset(str(tmp_path / "x.json"), nothing_known=1)


def test_f0_file_overrides_contour(tmp_path):
    pipe = ConvertPipeline(
        syn.init_params(jax.random.PRNGKey(0), CFG_M), CFG_M,
        hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2),
        version="v2")
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)[None]
    lengths = np.array([audio.shape[1]])

    f0_path = str(tmp_path / "contour.txt")
    with open(f0_path, "w") as f:
        for i in range(80):                    # 0.8 s of 330 Hz @ 100 fps
            f.write(f"{i / 100.0},330.0\n")

    settings = ConvertSettings(f0_method="yin", deterministic=True,
                               f0_file=f0_path, x_pad=0)
    _, pitchf = pipe.convert_batch(audio, lengths, 0, settings)
    got = np.asarray(pitchf)[0]
    np.testing.assert_allclose(got[:80], 330.0, atol=1e-3)
    # beyond the contour the computed F0 (220 Hz) remains
    assert abs(np.median(got[85:95]) - 220.0) < 10.0
