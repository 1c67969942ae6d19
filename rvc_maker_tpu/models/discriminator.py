"""Multi-period + multi-scale discriminators and GAN losses.

Reference: train.py:608-674 (MultiPeriodDiscriminator, DiscriminatorS,
DiscriminatorP) and train.py:286-325 (feature/discriminator/generator/KL
losses).  v1 periods [2,3,5,7,11,17]; v2 adds [23,37].

Weight norm stays LIVE during training (it changes optimization
dynamics): parameters are stored as (g, v, b) and materialized per
forward via ops.nn.weight_norm_w.  Activations are channels-last.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.nn import LRELU_SLOPE, conv1d, leaky_relu, weight_norm_w

Params = Any

PERIODS_V1 = (2, 3, 5, 7, 11, 17)
PERIODS_V2 = (2, 3, 5, 7, 11, 17, 23, 37)

def _s_convs(width_div: int = 1):
    """DiscriminatorS conv ladder: (cin, cout, k, stride, groups, pad).
    width_div > 1 shrinks channels/groups proportionally (tiny configs for
    dry runs and tests; 1 == reference architecture)."""
    def c(x):
        return max(x // width_div, 1)
    return (
        (1, c(16), 15, 1, 1, 7),
        (c(16), c(64), 41, 4, c(4), 20),
        (c(64), c(256), 41, 4, c(16), 20),
        (c(256), c(1024), 41, 4, c(64), 20),
        (c(1024), c(1024), 41, 4, c(256), 20),
        (c(1024), c(1024), 5, 1, 1, 2),
    )


def _p_channels(width_div: int = 1):
    """DiscriminatorP ladder (kernel (5,1) stride (3,1) pad (2,0))."""
    def c(x):
        return max(x // width_div, 1)
    return ((1, c(32)), (c(32), c(128)), (c(128), c(512)),
            (c(512), c(1024)), (c(1024), c(1024)))


def _wn_conv1d(x, p, *, stride=1, groups=1, padding=0):
    return conv1d(x, weight_norm_w(p["g"], p["v"]), p["b"], stride=stride,
                  groups=groups, padding=padding)


def _conv2d_t1(x, p, *, stride):
    """Conv2d with kernel (k,1): NHWC over (time_subsampled, period)."""
    w = weight_norm_w(p["g"], p["v"])          # (Kh, 1, Cin, Cout)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, 1),
        padding=[((w.shape[0] - 1) // 2, (w.shape[0] - 1) // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def disc_s_apply(p: Params, x, width_div: int = 1):
    """x: (B, T, 1) waveform. Returns (logits (B, n), fmaps)."""
    fmap = []
    for cp, (cin, cout, k, s, g, pad) in zip(p["convs"], _s_convs(width_div)):
        x = leaky_relu(_wn_conv1d(x, cp, stride=s, groups=g, padding=pad),
                       LRELU_SLOPE)
        fmap.append(x)
    x = _wn_conv1d(x, p["post"], padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def disc_p_apply(p: Params, x, period: int):
    """x: (B, T, 1). Reflect-pad T to a multiple of period, fold period
    into a 2nd spatial axis (reference train.py:665-667)."""
    b, t, _ = x.shape
    if t % period != 0:
        pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        t = t + pad
    x = x.reshape(b, t // period, period, 1)
    fmap = []
    for cp in p["convs"]:
        x = leaky_relu(_conv2d_t1(x, cp, stride=3), LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d_t1(x, p["post"], stride=1)
    fmap.append(x)
    return x.reshape(b, -1), fmap


def mpd_apply(params: Params, y, y_hat, periods=PERIODS_V2,
              width_div: int = 1):
    """Run all discriminators on real + generated waveforms.

    y, y_hat: (B, T, 1); periods static (pass PERIODS_V1 for v1 models).
    Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    lr, fr = disc_s_apply(params["s"], y, width_div)
    lg, fg = disc_s_apply(params["s"], y_hat, width_div)
    y_d_rs.append(lr); fmap_rs.append(fr)
    y_d_gs.append(lg); fmap_gs.append(fg)
    for dp, period in zip(params["p"], periods):
        lr, fr = disc_p_apply(dp, y, period)
        lg, fg = disc_p_apply(dp, y_hat, period)
        y_d_rs.append(lr); fmap_rs.append(fr)
        y_d_gs.append(lg); fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# losses — reference train.py:286-325
# ---------------------------------------------------------------------------

def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean(jnp.square(1.0 - dr))
        g = jnp.mean(jnp.square(dg))
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """KL(q||p) between flowed posterior and prior (train.py:317-325).

    All args (B, T, C) except z_mask (B, T, 1)."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _wn_init(key, shape_v):
    """torch weight_norm init from a kaiming-uniform conv: g = ||v||."""
    cin_k = 1
    for d in shape_v[:-1]:
        cin_k *= d
    bound = 1.0 / math.sqrt(cin_k)
    kv, kb = jax.random.split(key)
    v = jax.random.uniform(kv, shape_v, minval=-bound, maxval=bound)
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(range(len(shape_v) - 1)),
                         keepdims=True))
    b = jax.random.uniform(kb, (shape_v[-1],), minval=-bound, maxval=bound)
    return {"g": g, "v": v, "b": b}


def init_params(key, version: str = "v2", width_div: int = 1) -> Params:
    periods = PERIODS_V2 if version == "v2" else PERIODS_V1
    keys = iter(jax.random.split(key, 8 + 8 * len(periods)))
    specs = _s_convs(width_div)
    s_convs = [_wn_init(next(keys), (k, cin // g, cout))
               for (cin, cout, k, _, g, _) in specs]
    s_post = _wn_init(next(keys), (3, specs[-1][1], 1))
    p_list = []
    pch = _p_channels(width_div)
    for _ in periods:
        convs = [_wn_init(next(keys), (5, 1, cin, cout))
                 for (cin, cout) in pch]
        post = _wn_init(next(keys), (3, 1, pch[-1][1], 1))
        p_list.append({"convs": convs, "post": post})
    return {"s": {"convs": s_convs, "post": s_post}, "p": p_list}
