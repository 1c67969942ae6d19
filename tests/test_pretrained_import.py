"""Pretrained training-checkpoint import tests (G with enc_q, D live g/v)."""

import numpy as np
import torch
from torch.nn.utils.parametrizations import weight_norm

import jax.numpy as jnp

from rvc_maker_tpu.interop.torch_import import (
    _wn_pair, discriminator_params_from_state_dict)
from rvc_maker_tpu.models import discriminator as disc
from rvc_maker_tpu.ops.nn import weight_norm_w


def test_wn_pair_matches_torch_materialization():
    torch.manual_seed(0)
    conv = weight_norm(torch.nn.Conv1d(16, 64, 41, groups=4))
    sd = {f"c.{k}": v for k, v in conv.state_dict().items()}
    p = _wn_pair(sd, "c")
    ours = np.asarray(weight_norm_w(jnp.asarray(p["g"]), jnp.asarray(p["v"])))
    with torch.no_grad():
        ref = conv.weight.detach().numpy()       # materialized by parametrize
    np.testing.assert_allclose(ours.transpose(2, 1, 0), ref, rtol=1e-5,
                               atol=1e-6)

    conv2 = weight_norm(torch.nn.Conv2d(32, 128, (5, 1), (3, 1)))
    sd2 = {f"c.{k}": v for k, v in conv2.state_dict().items()}
    p2 = _wn_pair(sd2, "c")
    ours2 = np.asarray(weight_norm_w(jnp.asarray(p2["g"]), jnp.asarray(p2["v"])))
    np.testing.assert_allclose(ours2.transpose(3, 2, 0, 1),
                               conv2.weight.detach().numpy(), rtol=1e-5,
                               atol=1e-6)


def _reference_shaped_d_state_dict(version="v2"):
    """Build a state dict with the reference MultiPeriodDiscriminator
    naming/shapes (train.py:608-674) from weight-normed torch convs."""
    periods = disc.PERIODS_V2 if version == "v2" else disc.PERIODS_V1
    sd = {}
    s_specs = [(1, 16, 15, 1, 1), (16, 64, 41, 4, 4), (64, 256, 41, 4, 16),
               (256, 1024, 41, 4, 64), (1024, 1024, 41, 4, 256),
               (1024, 1024, 5, 1, 1)]
    for j, (cin, cout, k, s, g) in enumerate(s_specs):
        conv = weight_norm(torch.nn.Conv1d(cin, cout, k, s, groups=g))
        for key, v in conv.state_dict().items():
            sd[f"discriminators.0.convs.{j}.{key}"] = v
    post = weight_norm(torch.nn.Conv1d(1024, 1, 3, 1, padding=1))
    for key, v in post.state_dict().items():
        sd[f"discriminators.0.conv_post.{key}"] = v
    for i in range(1, len(periods) + 1):
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        for j, (cin, cout) in enumerate(chans):
            conv = weight_norm(torch.nn.Conv2d(cin, cout, (5, 1), (3, 1),
                                               padding=(2, 0)))
            for key, v in conv.state_dict().items():
                sd[f"discriminators.{i}.convs.{j}.{key}"] = v
        postp = weight_norm(torch.nn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))
        for key, v in postp.state_dict().items():
            sd[f"discriminators.{i}.conv_post.{key}"] = v
    return sd


def test_discriminator_import_and_apply():
    torch.manual_seed(1)
    sd = _reference_shaped_d_state_dict("v1")
    params = discriminator_params_from_state_dict(sd, "v1")
    assert len(params["p"]) == len(disc.PERIODS_V1)

    rs = np.random.RandomState(0)
    y = jnp.asarray((rs.randn(1, 2048, 1) * 0.1).astype(np.float32))
    y_hat = jnp.asarray((rs.randn(1, 2048, 1) * 0.1).astype(np.float32))
    y_d_r, y_d_g, fmap_r, fmap_g = disc.mpd_apply(params, y, y_hat,
                                                  disc.PERIODS_V1)
    assert len(y_d_r) == 1 + len(disc.PERIODS_V1)
    for lg in y_d_r + y_d_g:
        assert np.all(np.isfinite(np.asarray(lg)))
