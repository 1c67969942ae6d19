"""Demucs checkpoint (.th) and yaml bag loading tests."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.interop.demucs_load import load_demucs_bag, load_demucs_th
from rvc_maker_tpu.models import demucs as jdemucs
from rvc_maker_tpu.pipelines.separate import apply_bag

from reference_util import REFERENCE_ROOT, ref_module


@pytest.fixture(scope="module")
def saved_ckpt(tmp_path_factory):
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        mod = ref_module("main.library.uvr5_separator.demucs.htdemucs")
    finally:
        os.chdir(cwd)
    torch.manual_seed(0)
    net = mod.HTDemucs(sources=["drums", "bass", "other", "vocals"],
                       audio_channels=2, channels=8, nfft=2048, depth=4,
                       t_layers=3, segment=0.3)
    net.eval()
    args, kwargs = net._init_args_kwargs  # captured by @capture_init
    package = {"klass": type(net), "args": args, "kwargs": kwargs,
               "state": net.state_dict()}
    path = str(tmp_path_factory.mktemp("demucs") / "abcdef12.th")
    torch.save(package, path)
    return net, path


def test_load_th_and_forward(saved_ckpt):
    net, path = saved_ckpt
    params, cfg = load_demucs_th(path)
    assert cfg.has_transformer
    assert cfg.nfft == 2048 and cfg.depth == 4
    assert abs(cfg.segment - 0.3) < 1e-9

    rs = np.random.RandomState(0)
    mix = (rs.randn(1, 2, 10000) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mix)).numpy()
    ours = np.asarray(jdemucs.apply_model_single(params, cfg, jnp.asarray(mix)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_load_bag(saved_ckpt, tmp_path):
    _, path = saved_ckpt
    import shutil

    repo = tmp_path / "repo"
    repo.mkdir()
    shutil.copy(path, repo / "abcdef12.th")
    with open(repo / "mybag.yaml", "w") as f:
        f.write("models:\n- abcdef12\nweights:\n- [1.0, 1.0, 1.0, 2.0]\n"
                "segment: 0.25\n")
    bag = load_demucs_bag(str(repo / "mybag.yaml"))
    assert len(bag) == 1
    params, cfg, weights = bag[0]
    assert weights == [1.0, 1.0, 1.0, 2.0]
    assert abs(cfg.segment - 0.25) < 1e-9

    rs = np.random.RandomState(1)
    mix = (rs.randn(1, 2, 11025) * 0.1).astype(np.float32)
    out = apply_bag(bag, mix, shifts=0)
    assert out.shape == (1, 4, 2, 11025)
    assert np.all(np.isfinite(out))
