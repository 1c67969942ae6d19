"""Time-blocked conv rewrite == plain dilated conv (exact semantics,
incl. sequence-edge zero padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_maker_tpu.ops.blocked_conv import blockable, conv1d_blocked
from rvc_maker_tpu.ops.nn import conv1d


@pytest.mark.parametrize("C,blk", [(32, 4), (64, 2), (128, 1), (96, 1)])
def test_blockable(C, blk):
    assert blockable(C) == blk


@pytest.mark.parametrize("C,k,d,T", [
    (32, 3, 1, 500), (32, 3, 5, 500), (32, 11, 5, 1000),
    (64, 7, 3, 333), (64, 11, 1, 64), (32, 3, 3, 7),
])
def test_matches_conv1d(C, k, d, T):
    key = jax.random.PRNGKey(C * k * d)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, T, C)) * 0.5
    w = jax.random.normal(kw, (k, C, C)) * (1.0 / (k * C) ** 0.5)
    b = jax.random.normal(kb, (C,)) * 0.1
    ref = conv1d(x, w, b, dilation=d, padding=(k - 1) // 2 * d)
    got = conv1d_blocked(x, w, b, dilation=d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fallback_for_big_C():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 128, 128)) * 0.05
    ref = conv1d(x, w, None, dilation=2, padding=2)
    got = conv1d_blocked(x, w, None, dilation=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_resblock_blocked_matches():
    from rvc_maker_tpu.models.synthesizer import (_resblock,
                                                  _resblock_blocked)

    k, dils, C, T = 3, (1, 3, 5), 32, 700
    keys = jax.random.split(jax.random.PRNGKey(5), 13)
    p = {"convs1": [], "convs2": []}
    for d in range(3):
        p["convs1"].append({"w": jax.random.normal(keys[4 * d], (k, C, C)) * 0.1,
                            "b": jax.random.normal(keys[4 * d + 1], (C,)) * 0.1})
        p["convs2"].append({"w": jax.random.normal(keys[4 * d + 2], (k, C, C)) * 0.1,
                            "b": jax.random.normal(keys[4 * d + 3], (C,)) * 0.1})
    x = jax.random.normal(keys[-1], (2, T, C)) * 0.3
    ref = _resblock(p, x, kernel_size=k, dilations=dils)
    got = _resblock_blocked(p, x, kernel_size=k, dilations=dils)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grad_flows():
    """The rewrite must stay differentiable (train path could adopt it)."""
    C, k = 32, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, C))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, C, C)) * 0.1

    def loss(w):
        return jnp.sum(conv1d_blocked(x, w, None, dilation=3) ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape and bool(jnp.all(jnp.isfinite(g)))
