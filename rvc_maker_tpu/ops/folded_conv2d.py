"""Space-to-depth folding for lane-starved 2-D convs (RMVPE's U-Net).

Same trick as ops/folded_conv.py but on the W (mel) axis of NHWC 3x3
convs: reshape (B, H, W, C) -> (B, H, W/f, f*C) and fold the conv
weights once so the folded conv computes EXACTLY the fold of the
original conv's output.

Why it pays here (measured on the target chip, docs/perf_notes.md):
RMVPE's DeepUnet (reference main/library/predictors/RMVPE.py:24-135)
spends the same MACs at every level — spatial area shrinks 4x per level
while C^2 grows 4x — but XLA maps NHWC channels onto the 128-wide
vector lanes / MXU columns, so the C=16 levels run at ~(16/128)^2 of
peak.  fori_loop-timed per level (B=8, T=1024, bf16): enc0 (C=16)
12.5 ms and dec4 (C=16) 13.8 ms of ~33 ms total e2e; the C>=128
levels are ~2.5 ms each.  Folding W=128/C=16 by f=8 inflates FLOPs by
f (kw 3 -> k_f 3 at width W/f) but raises lane utilization ~f^2.

The fold map/weight transforms reuse ops/folded_conv._fold_map — the
W-axis placement of a 2-D kernel is exactly the 1-D problem per time
tap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .folded_conv import _fold_map, pick_fold  # noqa: F401  (re-exported)


def fold_w(x, fold: int):
    """(B, H, W, C) -> (B, H, W/fold, fold*C), phase-major on W."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // fold, fold * c)


def unfold_w(x, fold: int):
    """Inverse of fold_w."""
    b, h, u, fc = x.shape
    return x.reshape(b, h, u * fold, fc // fold)


def fold_conv2d_weights(w, *, fold: int, dilation: int = 1):
    """Fold HWIO conv2d weights (kh, kw, Cin, Cout) along the W axis.

    Returns (w_f (kh, k_f, fold*Cin, fold*Cout), (lo, hi) explicit W
    padding for the folded conv).  Exact in any dtype (0/1 placement).
    """
    kh, kw, cin, cout = w.shape
    m, qmin = _fold_map(kw, dilation, fold)
    k_f = m.shape[0]
    mj = jnp.asarray(m, w.dtype)
    w_f = jnp.einsum("qabj,hjio->hqaibo", mj, w).reshape(
        kh, k_f, fold * cin, fold * cout)
    return w_f, (-qmin, k_f - 1 + qmin)


def folded_conv2d(x_f, w, *, fold: int, pad_h: int = 1):
    """Same-padded 2-D conv applied in the W-folded domain.

    x_f: (B, H, W/fold, fold*Cin); w: ORIGINAL HWIO weights.  Equals
    fold_w(conv2d(unfold_w(x_f), w, same-padding), fold)."""
    w_f, pad_w = fold_conv2d_weights(w, fold=fold)
    return jax.lax.conv_general_dilated(
        x_f, w_f, window_strides=(1, 1),
        padding=[(pad_h, pad_h), pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _tile(v, fold):
    return jnp.tile(v, fold)


def folded_conv_block_res(p, x_f, *, fold: int):
    """RMVPE ConvBlockRes (reference RMVPE.py:11-22) in the folded
    domain: (conv3x3-BN-ReLU)x2 + (1x1) shortcut.  BN is pre-folded to
    per-channel scale/shift, which folds by tiling."""
    y = folded_conv2d(x_f, p["conv1"]["w"], fold=fold)
    y = jax.nn.relu(y * _tile(p["bn1"]["scale"], fold)
                    + _tile(p["bn1"]["shift"], fold))
    y = folded_conv2d(y, p["conv2"]["w"], fold=fold)
    y = jax.nn.relu(y * _tile(p["bn2"]["scale"], fold)
                    + _tile(p["bn2"]["shift"], fold))
    if "shortcut" in p:
        # 1x1 conv folds to a block-diagonal (phase-preserving) kernel.
        w_f, pad_w = fold_conv2d_weights(p["shortcut"]["w"], fold=fold)
        x_f = jax.lax.conv_general_dilated(
            x_f, w_f, window_strides=(1, 1), padding=[(0, 0), pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x_f = x_f + _tile(p["shortcut"]["b"], fold)
    return y + x_f
