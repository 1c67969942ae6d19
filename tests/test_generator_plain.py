"""f0-less (plain Generator) decode path.

The reference selects a plain HiFi-GAN Generator when use_f0 is false
(synthesizers.py:424).  NB: the reference Generator's `forward` is
accidentally indented inside `__init__` (synthesizers.py:39), so the
reference cannot actually run f0-less decode — parity here is asserted
against the reference *modules* (conv_pre/ups_and_resblocks/conv_post)
executed in the documented order, which is what that forward would do.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_util import ref_module
from rvc_maker_tpu.config import DataConfig, ModelConfig, RVCConfig, TrainConfig
from rvc_maker_tpu.interop.torch_import import synthesizer_params_from_state_dict
from rvc_maker_tpu.models import synthesizer as syn

CFG = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=64,
    hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
    kernel_size=3, p_dropout=0.0, resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)), upsample_rates=(5, 4, 2),
    upsample_initial_channel=64, upsample_kernel_sizes=(10, 8, 4),
    spk_embed_dim=4, gin_channels=32, sr=16000, use_f0=False,
    text_enc_hidden_dim=96)


@pytest.fixture(scope="module")
def ref_and_params():
    mod = ref_module("main.library.algorithm.synthesizers")
    torch.manual_seed(99)
    net = mod.Synthesizer(
        CFG.spec_channels, CFG.segment_size, CFG.inter_channels,
        CFG.hidden_channels, CFG.filter_channels, CFG.n_heads, CFG.n_layers,
        CFG.kernel_size, CFG.p_dropout, "1",
        list(CFG.resblock_kernel_sizes),
        [list(d) for d in CFG.resblock_dilation_sizes],
        list(CFG.upsample_rates), CFG.upsample_initial_channel,
        list(CFG.upsample_kernel_sizes), CFG.spk_embed_dim, CFG.gin_channels,
        CFG.sr, use_f0=False, text_enc_hidden_dim=CFG.text_enc_hidden_dim,
    )
    net.eval()
    params = synthesizer_params_from_state_dict(net.state_dict(), CFG)
    return net, params


def _ref_generator_forward(dec, x, g):
    """The reference Generator's intended forward (synthesizers.py:39-56;
    unreachable there because it is nested in __init__)."""
    lrelu = torch.nn.functional.leaky_relu
    nk = dec.num_kernels
    x = dec.conv_pre(x)
    if g is not None:
        x = x + dec.cond(g)
    idx = 0
    for _ in range(dec.num_upsamples):
        x = dec.ups_and_resblocks[idx](lrelu(x, 0.1))
        idx += 1
        xs = 0
        for _ in range(nk):
            xs = xs + dec.ups_and_resblocks[idx](x)
            idx += 1
        x = xs / nk
    return torch.tanh(dec.conv_post(lrelu(x)))


def test_plain_generator_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(0)
    b, t = 2, 23
    x = rs.randn(b, t, CFG.inter_channels).astype(np.float32) * 0.5
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32) * 0.3

    with torch.no_grad():
        ref = _ref_generator_forward(
            net.dec, torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(g.transpose(0, 2, 1))).numpy()[:, 0, :]
    got = np.asarray(syn.generator(params["dec"], CFG, jnp.asarray(x),
                                   jnp.asarray(g)))[:, :, 0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_infer_f0less_runs(ref_and_params):
    _, params = ref_and_params
    rs = np.random.RandomState(1)
    b, t = 2, 23
    phone = jnp.asarray(rs.randn(b, t, CFG.text_enc_hidden_dim), jnp.float32)
    lengths = jnp.asarray([t, t - 4], jnp.int32)
    sid = jnp.asarray([0, 2], jnp.int32)
    z_noise = jnp.zeros((b, t, CFG.inter_channels))
    # nsff0/sine_noise unused on the f0-less path
    wav, x_mask, _ = syn.infer(params, CFG, phone, lengths, None,
                               jnp.zeros((b, t)), sid, z_noise,
                               jnp.zeros((b, t * CFG.upp, 1)))
    # plain Generator convTs use symmetric padding without
    # output_padding, so the length follows torch's formula instead of
    # exactly t*upp (here t*40 + 8)
    assert wav.shape[0] == b and wav.shape[2] == 1
    assert wav.shape[1] >= t * CFG.upp
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_f0less_export_import_roundtrip(tmp_path, ref_and_params):
    from rvc_maker_tpu.interop.onnx_voice import load_voice_model
    from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth

    _, params = ref_and_params
    rvc = RVCConfig(version="v2", train=TrainConfig(), data=DataConfig(),
                    model=CFG)
    p = str(tmp_path / "f0less.pth")
    export_synthesizer_pth(params, rvc, p)
    params2, cfg2, meta = load_voice_model(p)
    assert cfg2.use_f0 is False
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 17, CFG.inter_channels), jnp.float32) * 0.5
    g = jnp.asarray(rs.randn(1, 1, CFG.gin_channels), jnp.float32) * 0.3
    a = np.asarray(syn.generator(params["dec"], CFG, x, g))
    b = np.asarray(syn.generator(params2["dec"], cfg2, x, g))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)  # fp16 interchange


def test_f0less_train_forward(ref_and_params):
    _, params = ref_and_params
    import jax.random as jr

    # training tree needs enc_q: init a fresh f0-less tree
    full = syn.init_params(jr.PRNGKey(0), CFG)
    assert "noise_convs" not in full["dec"] and "source" not in full["dec"]
    rs = np.random.RandomState(3)
    b, t = 2, 24
    y_hat, ids, x_mask, y_mask, _ = syn.train_forward(
        full, CFG,
        jnp.asarray(rs.randn(b, t, CFG.text_enc_hidden_dim), jnp.float32),
        jnp.asarray([t, t], jnp.int32),
        None, None,
        jnp.asarray(rs.randn(b, t, CFG.spec_channels), jnp.float32),
        jnp.asarray([t, t], jnp.int32),
        jnp.asarray([0, 1], jnp.int32),
        jr.PRNGKey(1))
    assert y_hat.shape[0] == b and y_hat.shape[2] == 1
    assert y_hat.shape[1] >= CFG.segment_size * CFG.upp
    assert bool(jnp.all(jnp.isfinite(y_hat)))
