"""Model-bootstrap registry (reference check_predictors/check_embedders,
library/utils.py:24-64).  Downloads mocked; URL/path construction and
hybrid parsing tested offline."""

import os

import pytest

from rvc_maker_tpu.utils import bootstrap


@pytest.fixture()
def capture_downloads(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setattr(bootstrap, "ASSETS", str(tmp_path))

    def fake(url, path):
        calls.append((url, path))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(b"x")
        return path

    monkeypatch.setattr("rvc_maker_tpu.utils.downloads.download_url", fake)
    return calls


def test_methods_of_hybrid():
    assert bootstrap.methods_of("hybrid[rmvpe+crepe-tiny]") == \
        ["rmvpe", "crepe-tiny"]
    assert bootstrap.methods_of("rmvpe") == ["rmvpe"]


def test_predictor_registry():
    assert bootstrap.PREDICTOR_FILES["rmvpe"] == "rmvpe.pt"
    assert bootstrap.PREDICTOR_FILES["mangio-crepe-tiny"] == "crepe_tiny.pth"
    assert bootstrap.PREDICTOR_FILES["fcpe-legacy"] == "fcpe_legacy.pt"
    assert bootstrap.PREDICTOR_FILES["harvest"] is None  # native here


def test_ensure_predictor_urls(capture_downloads):
    out = bootstrap.ensure_predictor("hybrid[rmvpe+fcpe]")
    assert set(out) == {"rmvpe", "fcpe"}
    urls = [u for u, _ in capture_downloads]
    assert f"{bootstrap.HF_BASE}predictors/rmvpe.pt" in urls
    assert f"{bootstrap.HF_BASE}predictors/fcpe.pt" in urls
    # yin needs no checkpoint
    assert bootstrap.ensure_predictor("yin") == {}


def test_ensure_predictor_skips_existing(capture_downloads):
    bootstrap.ensure_predictor("rmvpe")
    n = len(capture_downloads)
    bootstrap.ensure_predictor("rmvpe")   # file exists now -> no new call
    assert len(capture_downloads) == n


def test_ensure_embedder_modes(capture_downloads):
    p = bootstrap.ensure_embedder("contentvec_base", "fairseq")
    assert p.endswith("contentvec_base.pt")
    d = bootstrap.ensure_embedder("spin", "spin")   # spin -> transformers dir
    assert os.path.isdir(d)
    assert os.path.exists(os.path.join(d, "model.safetensors"))
    urls = [u for u, _ in capture_downloads]
    assert f"{bootstrap.HF_BASE}embedders/fairseq/contentvec_base.pt" in urls
    assert f"{bootstrap.HF_BASE}embedders/spin/model.safetensors" in urls
    with pytest.raises(ValueError):
        bootstrap.ensure_embedder("nonsense")


def test_ensure_spk_diarization(capture_downloads):
    out = bootstrap.ensure_spk_diarization("small")
    assert out["whisper"].endswith("small.pt")
    assert "hyperparams.yaml" in out
    assert len(capture_downloads) == 6


def test_ensure_pretrained(capture_downloads):
    g, d = bootstrap.ensure_pretrained("v2", 48000)
    assert g.endswith("G48k.pth") and d.endswith("D48k.pth")
    assert any("pretrained_v2/G48k.pth" in u for u, _ in capture_downloads)
