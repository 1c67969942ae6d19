"""Fused Pallas resblock == the XLA conv chain (interpret mode on CPU;
the same kernel compiles for TPU — exercised by bench.py/convert)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_maker_tpu.models.synthesizer import _resblock
from rvc_maker_tpu.ops.pallas_resblock import (fused_resblock, halo,
                                               pack_resblock_weights,
                                               vmem_budget_ok)

INTERPRET = jax.devices()[0].platform != "tpu"


def _params(key, k, C, D):
    keys = jax.random.split(key, 4 * D)
    p = {"convs1": [], "convs2": []}
    for d in range(D):
        p["convs1"].append({
            "w": jax.random.normal(keys[4 * d], (k, C, C)) * (0.5 / (k * C) ** 0.5),
            "b": jax.random.normal(keys[4 * d + 1], (C,)) * 0.1})
        p["convs2"].append({
            "w": jax.random.normal(keys[4 * d + 2], (k, C, C)) * (0.5 / (k * C) ** 0.5),
            "b": jax.random.normal(keys[4 * d + 3], (C,)) * 0.1})
    return p


@pytest.mark.parametrize("k,dils,C,T", [
    (3, (1, 3, 5), 32, 700),     # late NSF stage shape
    (3, (1, 3, 5), 128, 512),    # exact tile multiple
    (7, (1, 3, 5), 64, 1030),    # bigger halo, ragged T
    (11, (1, 3, 5), 32, 300),    # T smaller than a tile
    (3, (1, 2), 96, 450),        # non-lane-aligned C, 2 dilations
])
def test_matches_xla_resblock(k, dils, C, T):
    key = jax.random.PRNGKey(hash((k, C, T)) % 2**31)
    p = _params(key, k, C, len(dils))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, C)) * 0.3

    ref = _resblock(p, x, kernel_size=k, dilations=dils)
    w1, b1, w2, b2 = pack_resblock_weights(p, kernel_size=k, dilations=dils)
    got = fused_resblock(x, w1, b1, w2, b2, kernel_size=k, dilations=dils,
                         interpret=INTERPRET, t_tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_close_to_fp32():
    k, dils, C, T = 3, (1, 3, 5), 64, 600
    p = _params(jax.random.PRNGKey(7), k, C, len(dils))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, C)) * 0.3
    ref = _resblock(p, x, kernel_size=k, dilations=dils)

    w1, b1, w2, b2 = pack_resblock_weights(p, kernel_size=k, dilations=dils,
                                           dtype=jnp.bfloat16)
    got = fused_resblock(x.astype(jnp.bfloat16), w1, b1, w2, b2,
                         kernel_size=k, dilations=dils,
                         interpret=INTERPRET, t_tile=256)
    g = np.asarray(got, np.float32).ravel()
    r = np.asarray(ref, np.float32).ravel()
    corr = np.corrcoef(g, r)[0, 1]
    assert corr > 0.99, corr


def test_generator_nsf_integration():
    """Full NSF decode with use_pallas=True == plain XLA decode (the
    stage gating + weight packing path used by ConvertPipeline)."""
    from rvc_maker_tpu.config import ModelConfig
    from rvc_maker_tpu.models import synthesizer as syn

    cfg = ModelConfig(
        spec_channels=129, segment_size=8, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        kernel_size=3, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(4, 4, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4,
        gin_channels=16, sr=16000, use_f0=True, text_enc_hidden_dim=96)
    params = syn.init_params(jax.random.PRNGKey(0), cfg)

    b, t = 1, 40
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (b, t, cfg.inter_channels)) * 0.3
    f0 = jnp.full((b, t), 220.0)
    g = jax.random.normal(jax.random.PRNGKey(2), (b, 1, cfg.gin_channels)) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(3), (b, t * cfg.upp, 1))

    ref = syn.generator_nsf(params["dec"], cfg, x, f0, g, noise)
    got = syn.generator_nsf(params["dec"], cfg, x, f0, g, noise,
                            use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_halo_and_budget():
    assert halo(3, (1, 3, 5)) == 12
    assert halo(11, (1, 3, 5)) == 60
    assert vmem_budget_ok(11, (1, 3, 5), 128)
    assert not vmem_budget_ok(11, (1, 3, 5), 512)
