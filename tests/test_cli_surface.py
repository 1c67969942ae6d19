"""CLI surface integration: the subcommands drive real work in-process
(reference parser.py dispatches the same stages)."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax

from rvc_maker_tpu.cli import main
from rvc_maker_tpu.config import ModelConfig, RVCConfig
from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
from rvc_maker_tpu.models import synthesizer as syn

CFG_M = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


@pytest.fixture()
def no_bootstrap(monkeypatch):
    """Zero-egress: the lazy model bootstrap must fail fast and fall
    back, not hang."""
    def boom(*a, **k):
        raise RuntimeError("offline")

    monkeypatch.setattr("rvc_maker_tpu.utils.bootstrap._download", boom)


@pytest.fixture()
def tiny_model(tmp_path):
    params = syn.init_params(jax.random.PRNGKey(0), CFG_M)
    p = str(tmp_path / "tiny.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)
    return p


@pytest.fixture()
def tone_wav(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    path = str(tmp_path / "tone.wav")
    wavfile.write(path, sr,
                  (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
    return path


def test_cli_convert(tmp_path, tiny_model, tone_wav, no_bootstrap):
    out = str(tmp_path / "out.wav")
    main(["convert", "--input", tone_wav, "--output", out,
          "--model", tiny_model, "--f0-method", "yin", "--index-rate", "0"])
    sr, data = wavfile.read(out)
    assert sr == CFG_M.sr and len(data) > 0
    assert np.all(np.isfinite(data))


def test_cli_convert_flac_export(tmp_path, tiny_model, tone_wav,
                                 no_bootstrap):
    out = str(tmp_path / "out.wav")
    main(["convert", "--input", tone_wav, "--output", out,
          "--model", tiny_model, "--f0-method", "yin", "--index-rate", "0",
          "--export-format", "flac"])
    flac = str(tmp_path / "out.flac")
    assert os.path.exists(flac)
    from rvc_maker_tpu.utils.audio import read_wav

    audio, sr = read_wav(flac)
    assert sr == CFG_M.sr and np.all(np.isfinite(audio))


def test_cli_info_and_fuse(tmp_path, tiny_model, capsys):
    main(["info", "--model", tiny_model])
    info = json.loads(capsys.readouterr().out)
    assert info["sr"] == CFG_M.sr and info["version"] == "v2"

    fused = str(tmp_path / "fused.pth")
    main(["fuse", "--model-a", tiny_model, "--model-b", tiny_model,
          "--output", fused, "--ratio", "0.3"])
    assert os.path.exists(fused)


def test_cli_effects(tmp_path, tone_wav):
    out = str(tmp_path / "fx.wav")
    main(["effects", "--input", tone_wav, "--output", out,
          "--reverb", "--gain", "--gain-db", "-3"])
    sr, data = wavfile.read(out)
    assert len(data) > 0 and np.all(np.isfinite(data))


def test_cli_f0_less_model(tmp_path, tone_wav, no_bootstrap):
    import dataclasses

    cfg = dataclasses.replace(CFG_M, use_f0=False)
    params = syn.init_params(jax.random.PRNGKey(1), cfg)
    p = str(tmp_path / "f0less.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=cfg), p)
    out = str(tmp_path / "out0.wav")
    main(["convert", "--input", tone_wav, "--output", out,
          "--model", p, "--f0-method", "yin", "--index-rate", "0"])
    sr, data = wavfile.read(out)
    assert sr == cfg.sr and np.all(np.isfinite(data)) and len(data) > 0


def test_cli_edit_toy_stack(tmp_path, tone_wav):
    out = str(tmp_path / "edited.wav")
    main(["edit", "--input-path", tone_wav, "--output-path", out,
          "--toy-stack", "--steps", "6", "--t-start", "50",
          "--sample-rate", "16000"])
    sr, data = wavfile.read(out)
    assert sr == 16000 and data.ndim == 2 and np.all(np.isfinite(data))


def test_cli_edit_gated_without_weights(tmp_path, tone_wav):
    import pytest

    with pytest.raises(RuntimeError, match="download-gated"):
        main(["edit", "--input-path", tone_wav,
              "--output-path", str(tmp_path / "x.wav")])


def test_train_bf16_checkpointing_flags_reach_config(monkeypatch):
    """--bf16/--checkpointing must land in cfg.train (wiring guard)."""
    captured = {}

    def fake_train(exp_dir, cfg, **kw):
        captured["cfg"] = cfg
        return None

    monkeypatch.setattr("rvc_maker_tpu.pipelines.train_loop.train",
                        fake_train)
    main(["train", "--exp-dir", "/tmp/_cli_bf16_test", "--sample-rate",
          "48000", "--epochs", "1", "--no-pretrained", "--bf16",
          "--checkpointing"])
    cfg = captured["cfg"]
    assert cfg.train.bf16 is True
    assert cfg.train.remat is True
