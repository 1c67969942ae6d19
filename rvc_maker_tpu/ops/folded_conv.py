"""Space-to-depth ("folded") 1-D convolutions for lane-starved stages.

Motivation (measured on the target TPU, see docs/perf_notes.md): XLA maps
the channel axis of an NWC conv onto the 128-wide vector lanes / MXU
columns, so a C=32 conv runs at ~(32/128)^2 = 1/16 of peak — the final
NSF-HiFiGAN decode stage (C=32 at the 48 kHz sample rate, reference
synthesizers.py:129-151) measures 5.8-10.6 TMAC/s vs ~98 peak and
dominates the resblock time despite having the fewest FLOPs.

The trick: fold time into channels.  Reshape (B, T, C) -> (B, T/f, f*C)
(phase-major: folded channel = phase*C + c) and transform each conv's
weights once so the folded conv computes EXACTLY the fold of the original
conv's output:

    out[f*u + p_out] = sum_j w[j] * x[f*u + p_out + (j - (k-1)/2) * d]

Writing s = p_out + (j - (k-1)/2) * d = f*q + p_in, every original tap
(j, p_out) becomes one block W_f[q - qmin, p_in*C:, p_out*C:] = w[j] of a
dense folded kernel of width k_f = qmax - qmin + 1.  The folded weight is
mostly zeros — FLOPs grow by k_f*f/k (~3.3x for the C=32 stage at f=4) —
but lane utilization grows by f^2 (16x), a net win.  Memory traffic is
unchanged (reshape only), and the whole resblock chain (leaky_relu,
residual adds, resblock-sum) runs in the folded domain, so a stage folds
once and unfolds once.

Unlike im2col or polyphase-transposed-conv rewrites (measured losers on
this chip — bandwidth-bound), this keeps the op a plain NWC conv that XLA
already tiles well, just at full lane width.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .nn import conv1d, leaky_relu, LRELU_SLOPE


def fold_enabled(dtype) -> bool:
    """Folding is on by default in bf16 fast mode, off in fp32 parity
    mode (exact op but different accumulation order).  RVC_TPU_FOLD=0
    disables, =1 forces (also fp32)."""
    v = os.environ.get("RVC_TPU_FOLD", "")
    if v == "0":
        return False
    if v == "1":
        return True
    return dtype == jnp.bfloat16


@functools.lru_cache(maxsize=None)
def _fold_map(kernel_size: int, dilation: int, fold: int):
    """Static tap-placement map for a centered ("same") dilated conv.

    Returns (M, qmin) where M has shape (k_f, fold, fold, kernel_size) and
    M[q - qmin, p_in, p_out, j] = 1 iff original tap j feeding output
    phase p_out reads folded offset q at input phase p_in.
    """
    half = (kernel_size - 1) // 2
    entries = []
    for p_out in range(fold):
        for j in range(kernel_size):
            s = p_out + (j - half) * dilation
            q, p_in = divmod(s, fold)  # divmod floors — correct for s < 0
            entries.append((q, p_in, p_out, j))
    qmin = min(e[0] for e in entries)
    qmax = max(e[0] for e in entries)
    m = np.zeros((qmax - qmin + 1, fold, fold, kernel_size), np.float32)
    for q, p_in, p_out, j in entries:
        m[q - qmin, p_in, p_out, j] = 1.0
    return m, qmin


def fold_conv_weights(w, b, *, dilation: int, fold: int):
    """Fold conv1d weights (K, Cin, Cout) [+ bias (Cout,)] for fold_time'd
    activations.  Returns (w_f (k_f, fold*Cin, fold*Cout), b_f, pad) with
    pad the explicit (lo, hi) padding for the folded conv.

    The transform is a 0/1-placement einsum — exact in any dtype — and
    cheap enough to run inside jit every call (k_f * fold^2 * Cin * Cout
    writes; a few hundred KB for the decode stages)."""
    k, cin, cout = w.shape
    m, qmin = _fold_map(k, dilation, fold)
    k_f = m.shape[0]
    mj = jnp.asarray(m, w.dtype)
    w_f = jnp.einsum("qabj,jio->qaibo", mj, w).reshape(
        k_f, fold * cin, fold * cout)
    b_f = None if b is None else jnp.tile(b, fold)
    return w_f, b_f, (-qmin, k_f - 1 + qmin)


def fold_time(x, fold: int):
    """(B, T, C) -> (B, T//fold, fold*C), phase-major. T % fold must be 0."""
    b, t, c = x.shape
    return x.reshape(b, t // fold, fold * c)


def unfold_time(x, fold: int):
    """Inverse of fold_time: (B, U, fold*C) -> (B, U*fold, C)."""
    b, u, fc = x.shape
    return x.reshape(b, u * fold, fc // fold)


def folded_conv1d(x_f, w, b, *, dilation: int, fold: int):
    """Same-padded dilated conv1d applied in the folded domain.

    x_f: (B, T/fold, fold*Cin) as produced by fold_time; w/b are the
    ORIGINAL (unfolded) conv weights.  Equals
    fold_time(conv1d(unfold_time(x_f), w, b, dilation=d, padding=same))."""
    w_f, b_f, pad = fold_conv_weights(w, b, dilation=dilation, fold=fold)
    return conv1d(x_f, w_f, b_f, padding=pad)


def folded_resblock(p, x_f, *, kernel_size: int, dilations, fold: int):
    """HiFi-GAN ResBlock chain (reference residuals.py:16-44) entirely in
    the folded domain.  x_f: (B, T/fold, fold*C)."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        y = leaky_relu(x_f, LRELU_SLOPE)
        y = folded_conv1d(y, c1["w"], c1["b"], dilation=d, fold=fold)
        y = leaky_relu(y, LRELU_SLOPE)
        y = folded_conv1d(y, c2["w"], c2["b"], dilation=1, fold=fold)
        x_f = y + x_f
    return x_f


def pick_fold(channels: int, t: int, *, lanes: int = 128) -> int:
    """Fold factor bringing channels up to the 128-lane width (0 = don't).

    Only folds when channels divide the lane width and the time axis
    divides evenly.  Folding C=64 by 2 measured a net loss on the target
    chip (FLOP inflation ~2.7x vs utilization gain ~4x at the C=128
    operating point), so only starved stages (C*4 <= lanes) fold."""
    if channels <= 0 or lanes % channels:
        return 0
    f = lanes // channels
    if f < 4 or t % f:
        return 0
    return f
