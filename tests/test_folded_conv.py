"""Space-to-depth folded conv (ops/folded_conv.py) == plain same-padded
conv1d / resblock, exactly (up to fp accumulation-order noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_maker_tpu.ops import nn
from rvc_maker_tpu.ops.folded_conv import (fold_time, folded_conv1d,
                                           folded_resblock, pick_fold,
                                           unfold_time)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("kernel", [3, 7, 11])
@pytest.mark.parametrize("dilation", [1, 3, 5])
@pytest.mark.parametrize("fold", [2, 4])
def test_folded_conv_matches_plain(kernel, dilation, fold):
    c = 32
    t = 96
    keys = jax.random.split(jax.random.PRNGKey(kernel * 100 + dilation), 3)
    x = _rand(keys[0], (2, t, c))
    w = _rand(keys[1], (kernel, c, c)) * 0.1
    b = _rand(keys[2], (c,)) * 0.1

    pad = (kernel * dilation - dilation) // 2
    ref = nn.conv1d(x, w, b, dilation=dilation, padding=pad)
    got = unfold_time(
        folded_conv1d(fold_time(x, fold), w, b, dilation=dilation, fold=fold),
        fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fold_unfold_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (3, 24, 32))
    y = unfold_time(fold_time(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("kernel,dilations", [(3, (1, 3, 5)), (7, (1, 3, 5)),
                                              (11, (1, 3, 5))])
def test_folded_resblock_matches_plain(kernel, dilations):
    from rvc_maker_tpu.models.synthesizer import _resblock

    c, t, fold = 32, 128, 4
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 1 + 4 * len(dilations))
    x = _rand(keys[0], (2, t, c))
    p = {"convs1": [], "convs2": []}
    ki = 1
    for _ in dilations:
        p["convs1"].append({"w": _rand(keys[ki], (kernel, c, c)) * 0.1,
                            "b": _rand(keys[ki + 1], (c,)) * 0.1})
        p["convs2"].append({"w": _rand(keys[ki + 2], (kernel, c, c)) * 0.1,
                            "b": _rand(keys[ki + 3], (c,)) * 0.1})
        ki += 4

    ref = _resblock(p, x, kernel_size=kernel, dilations=dilations)
    got = unfold_time(
        folded_resblock(p, fold_time(x, fold), kernel_size=kernel,
                        dilations=dilations, fold=fold), fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_folded_conv_bf16_smoke():
    c, t, fold = 32, 64, 4
    x = _rand(jax.random.PRNGKey(1), (1, t, c), jnp.bfloat16)
    w = _rand(jax.random.PRNGKey(2), (3, c, c), jnp.bfloat16) * 0.1
    y = folded_conv1d(fold_time(x, fold), w, None, dilation=1, fold=fold)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (1, t // fold, fold * c)
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_pick_fold():
    assert pick_fold(32, 480) == 4
    assert pick_fold(16, 480) == 8
    assert pick_fold(64, 480) == 0    # f=2 measured a net loss — don't fold
    assert pick_fold(128, 480) == 0
    assert pick_fold(32, 481) == 0    # time axis must divide
    assert pick_fold(48, 480) == 0    # channels must divide the lane width


def test_generator_nsf_folded_matches_plain(monkeypatch):
    """Full NSF decode with RVC_TPU_FOLD forced on == off (fp32).  The
    tiny config's tail stages hit C=32/16/8, exercising folds 4/8/16."""
    from rvc_maker_tpu.config import ModelConfig
    from rvc_maker_tpu.models import synthesizer as syn

    cfg = ModelConfig(
        spec_channels=129, segment_size=16, inter_channels=64,
        hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
        kernel_size=3, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)), upsample_rates=(5, 4, 2),
        upsample_initial_channel=64, upsample_kernel_sizes=(10, 8, 4),
        spk_embed_dim=4, gin_channels=32, sr=16000, use_f0=True,
        text_enc_hidden_dim=96)
    params = syn.init_params(jax.random.PRNGKey(0), cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    t = 16
    x = _rand(keys[0], (2, t, cfg.inter_channels)) * 0.3
    f0 = 100.0 + 50.0 * jax.nn.sigmoid(_rand(keys[1], (2, t)))
    g = _rand(keys[2], (2, 1, cfg.gin_channels)) * 0.1
    noise = _rand(keys[3], (2, t * cfg.upp, 1))

    monkeypatch.setenv("RVC_TPU_FOLD", "0")
    ref = syn.generator_nsf(params["dec"], cfg, x, f0, g, noise)
    monkeypatch.setenv("RVC_TPU_FOLD", "1")
    got = syn.generator_nsf(params["dec"], cfg, x, f0, g, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
