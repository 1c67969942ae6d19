"""Offline self-test of tools/validate_real_weights.py.

Builds synthetic stand-ins for the artifact classes that can be
fabricated in this image (interchange .pth, fairseq hubert .pt,
crepe .pth, demucs .th, faiss .index + total_fea, voice .onnx,
MDX-style .onnx) and runs the validator end-to-end with --lenient
(random weights can't pass the real-weight quality gates).  Asserts
zero FAILs and that each fabricated artifact's check PASSes — so the
command is known-good before the first networked session runs it on
real checkpoints (docs/real_weights_checklist.md)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax

from reference_util import REFERENCE_ROOT, ref_module

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("real_weights_standins")
    rs = np.random.RandomState(0)

    # 1. interchange .pth (tiny synthesizer)
    from rvc_maker_tpu.config import (DataConfig, ModelConfig, RVCConfig,
                                      TrainConfig)
    from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
    from rvc_maker_tpu.models import synthesizer as syn

    cfg_m = ModelConfig(
        spec_channels=129, segment_size=16, inter_channels=64,
        hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
        kernel_size=3, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)), upsample_rates=(5, 4, 2),
        upsample_initial_channel=64, upsample_kernel_sizes=(10, 8, 4),
        spk_embed_dim=4, gin_channels=32, sr=16000, use_f0=True,
        text_enc_hidden_dim=768)   # v2 width, pairs with the hubert
                                   # stand-in in the bf16_gate check
    params = syn.init_params(jax.random.PRNGKey(3), cfg_m)
    cfg = RVCConfig(version="v2", train=TrainConfig(), data=DataConfig(),
                    model=cfg_m)
    pth = str(d / "standin_voice.pth")
    export_synthesizer_pth(params, cfg, pth, epoch=1, step=1, author="t")

    # 2. fairseq hubert .pt (reference vendored fairseq layout)
    fmod = ref_module("main.library.architectures.fairseq")
    hcfg = fmod.HubertConfig(
        _name="hubert", label_rate=50, encoder_layers_1=0,
        logit_temp_ctr=0.1, num_negatives=0, cross_sample_negatives=0,
        ctr_layers=[], encoder_layers=12, final_dim=256)
    torch.manual_seed(0)
    hnet = fmod.HubertModel(hcfg)
    torch.save({"model": hnet.state_dict()}, str(d / "hubert_base.pt"))
    del hnet

    # 3. crepe tiny .pth
    crepe_net = ref_module("main.library.predictors.CREPE").Crepe("tiny")
    torch.save(crepe_net.state_dict(), str(d / "crepe_tiny.pth"))
    del crepe_net

    # 4. demucs .th (reference HTDemucs package layout)
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
    args, kwargs = net._init_args_kwargs
    torch.save({"klass": type(net), "args": args, "kwargs": kwargs,
                "state": net.state_dict()}, str(d / "abcdef12.th"))
    del net

    # 5. faiss .index + total_fea.npy
    from rvc_maker_tpu.retrieval.ivf import build_ivf_file

    fea = rs.randn(512, 96).astype(np.float32)
    build_ivf_file(fea, str(d / "added_standin_v2.index"))
    np.save(str(d / "total_fea.npy"), fea)

    # 6. voice .onnx (our exporter; the validator's loader also covers the
    #    torch-convention fallback in test_onnx_voice)
    from rvc_maker_tpu.interop.onnx_voice import export_voice_model

    export_voice_model(pth, str(d / "standin_voice.onnx"), max_frames=24,
                       dynamic=False)

    # 7. MDX-style 4-D conv .onnx
    import jax.numpy as jnp

    from rvc_maker_tpu.interop.onnx_export import export_onnx

    w1 = jnp.asarray(rs.randn(8, 4, 3, 3).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(4, 8, 3, 3).astype(np.float32) * 0.1)

    def net_fn(spek):                       # (B, 4, F, T)
        h = jax.lax.conv_general_dilated(spek, w1, (1, 1), "SAME")
        return jax.lax.conv_general_dilated(jax.nn.relu(h), w2, (1, 1),
                                            "SAME")

    x = jnp.zeros((1, 4, 16, 8), jnp.float32)
    model = export_onnx(net_fn, (x,), input_names=["input"],
                        output_names=["output"])
    from rvc_maker_tpu.interop.onnx_proto import save_model

    save_model(model, str(d / "standin_mdx.onnx"))

    return str(d)


@pytest.mark.slow
def test_validator_end_to_end(asset_dir):
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "validate_real_weights.py"),
         asset_dir, "--lenient"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1700)
    sys.stdout.write(r.stdout)
    assert r.returncode == 0, r.stdout + r.stderr
    summary = json.loads(
        [ln for ln in r.stdout.splitlines()
         if ln.startswith('{"validate_real_weights"')][-1]
    )["validate_real_weights"]
    assert summary["fail"] == 0, r.stdout

    status = {}
    for ln in r.stdout.splitlines():
        for tag in ("PASS", "SKIP", "FAIL"):
            if ln.startswith(tag + " "):
                status[ln.split()[1].rstrip(":")] = tag
    for name in ("synth_pth", "hubert_pt", "crepe_pth", "demucs",
                 "faiss_index", "voice_onnx", "mdx_onnx", "bf16_gate"):
        assert status.get(name) == "PASS", (name, status)
    # artifact classes with no fabricable stand-in must SKIP, not FAIL
    for name in ("rmvpe_pt", "fcpe_pt", "whisper_pt", "audioldm2_dir",
                 "f0_onnx"):
        assert status.get(name) == "SKIP", (name, status)
