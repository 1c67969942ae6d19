"""Alternative vocoder parity vs the reference (noise seams zeroed)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import vocoders as voc

from reference_util import ref_module, zero_noise_torch

CFG = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=64, hidden_channels=64,
    filter_channels=128, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    upsample_rates=(5, 4, 2), upsample_initial_channel=64,
    upsample_kernel_sizes=(10, 8, 4), spk_embed_dim=4, gin_channels=32,
    sr=16000, use_f0=True, text_enc_hidden_dim=96)


def _inputs(t=19, b=2, ch=64, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(b, t, ch).astype(np.float32)
    f0 = (rs.rand(b, t).astype(np.float32) * 300 + 80)
    f0[:, :3] = 0.0
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32)
    return x, f0, g


def test_interp_linear_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 13, 5).astype(np.float32)
    for size in (26, 39, 65, 7):
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)), size=size,
            mode="linear").numpy().transpose(0, 2, 1)
        ours = np.asarray(voc.interp_linear(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mrf_hifigan_parity():
    mod = ref_module("main.library.algorithm.mrf_hifigan")
    torch.manual_seed(5)
    net = mod.HiFiGANMRFGenerator(
        in_channel=CFG.inter_channels,
        upsample_initial_channel=CFG.upsample_initial_channel,
        upsample_rates=list(CFG.upsample_rates),
        upsample_kernel_sizes=list(CFG.upsample_kernel_sizes),
        resblock_kernel_sizes=list(CFG.resblock_kernel_sizes),
        resblock_dilations=[list(d) for d in CFG.resblock_dilation_sizes],
        gin_channels=CFG.gin_channels, sample_rate=CFG.sr, harmonic_num=8)
    net.eval()
    sd = {f"dec.{k}": v for k, v in net.state_dict().items()}
    params = voc.mrf_params_from_state_dict(sd, CFG)

    x, f0, g = _inputs()
    with torch.no_grad(), zero_noise_torch():
        ref = net(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(f0),
                  g=torch.from_numpy(g.transpose(0, 2, 1))).numpy()

    b, t = f0.shape
    noise = jnp.zeros((b, t * CFG.upp, 9), jnp.float32)
    out = voc.mrf_hifigan(params, CFG, jnp.asarray(x), jnp.asarray(f0),
                          jnp.asarray(g), noise,
                          rand_ini=jnp.zeros((b, 9)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               rtol=1e-3, atol=2e-4)


def test_refinegan_parity():
    mod = ref_module("main.library.algorithm.refinegan")
    torch.manual_seed(7)
    num_mels = CFG.inter_channels
    # the reference RefineGAN hardcodes cond input to 256 channels
    # (refinegan.py:132) — gin must be 256
    net = mod.RefineGANGenerator(
        sample_rate=CFG.sr, upsample_rates=list(CFG.upsample_rates),
        num_mels=num_mels, gin_channels=256,
        upsample_initial_channel=64)
    net.eval()
    sd = {f"dec.{k}": v for k, v in net.state_dict().items()}
    params = voc.refinegan_params_from_state_dict(sd, CFG)

    mel, f0, _ = _inputs(ch=num_mels, seed=3)
    g = np.random.RandomState(9).randn(2, 1, 256).astype(np.float32)
    with torch.no_grad(), zero_noise_torch():
        ref = net(torch.from_numpy(mel.transpose(0, 2, 1)),
                  torch.from_numpy(f0),
                  g=torch.from_numpy(g.transpose(0, 2, 1))).numpy()

    b, t = f0.shape
    source_noise = jnp.zeros((b, t * CFG.upp, 1), jnp.float32)
    # zero AdaIN noises shaped per stage
    adain_noises = []
    ch = 64
    t_cur = t
    for rate in CFG.upsample_rates:
        new_ch = ch // 2
        t_cur = t_cur * rate
        z = jnp.zeros((b, t_cur, new_ch), jnp.float32)
        adain_noises.append([(z, z)] * 3)
        ch = new_ch
    out = voc.refinegan(params, CFG, jnp.asarray(mel), jnp.asarray(f0),
                        jnp.asarray(g), source_noise, adain_noises,
                        rand_ini=jnp.zeros((b, 1)))
    assert out.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               rtol=1e-3, atol=2e-4)
