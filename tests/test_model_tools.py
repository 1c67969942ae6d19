"""Model fusion / info tests over the interchange .pth format."""

import numpy as np
import torch

import jax

from rvc_maker_tpu.config import ModelConfig, RVCConfig
from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.utils.model_tools import fuse_models, model_info

CFG_M = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8), spk_embed_dim=4, gin_channels=16,
    sr=16000, use_f0=True, text_enc_hidden_dim=96)


def _export(tmp_path, name, seed):
    params = syn.init_params(jax.random.PRNGKey(seed), CFG_M)
    cfg = RVCConfig(version="v2", model=CFG_M)
    p = str(tmp_path / name)
    export_synthesizer_pth(params, cfg, p, epoch=seed, author="t")
    return p


def test_fuse_models(tmp_path):
    p1 = _export(tmp_path, "a.pth", 1)
    p2 = _export(tmp_path, "b.pth", 2)
    out = fuse_models(p1, p2, str(tmp_path / "fused.pth"), ratio=0.25)
    a = torch.load(p1, map_location="cpu", weights_only=False)["weight"]
    b = torch.load(p2, map_location="cpu", weights_only=False)["weight"]
    f = torch.load(out, map_location="cpu", weights_only=False)
    key = "enc_p.emb_phone.weight"
    expect = 0.25 * a[key].float() + 0.75 * b[key].float()
    np.testing.assert_allclose(f["weight"][key].float().numpy(),
                               expect.half().float().numpy(), atol=1e-3)
    assert f["sr"] == 16000 and "model_hash" in f


def test_model_info(tmp_path):
    p = _export(tmp_path, "m.pth", 3)
    info = model_info(p)
    assert info["sr"] == 16000
    assert info["version"] == "v2"
    assert info["f0"] == 1
    assert info["epoch"] == 3
    assert info["n_speakers"] == 4
    assert info["n_parameters"] > 1000
    assert info["model_hash"]
