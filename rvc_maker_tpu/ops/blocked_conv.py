"""Time-blocked 1-D convolution for small channel counts.

The NSF-HiFiGAN decode spends most of its time in dilated convs at the
output sample rate with 32-64 channels.  On TPU the lane dimension is
128 wide, so XLA's NWC conv leaves 3/4..15/16 of the MXU idle (measured
~20x off roofline on these shapes).  This op folds `blk = 128 // C`
consecutive time steps into the lane axis and rewrites the conv as a
small sum of dense matmuls:

    x:  (B, T, C)  ->  Xb: (B, T/blk, blk*C)
    y[t] = sum_j x[t + (j-c)*d] @ W[j]
    ==>  Yb = sum_q  shift(Xb, q) @ Wq          (Wq: (blk*C, blk*C))

where for output sub-slot s and tap offset o = (j-c)*d the source index
s + o lands in relative block q = floor((s+o)/blk) at sub-slot
r = (s+o) - blk*q, i.e. Wq[r*C:(r+1)*C, s*C:(s+1)*C] += W[j].  The
number of distinct q is ~(k*d)/blk + 1, each a (T/blk, 128) @ (128, 128)
matmul — fully MXU-shaped.  Zero-filled shifts reproduce torch's
symmetric zero padding (p = c*d) exactly.

Pure jnp: differentiable, works under pjit/shard_map and on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_LANE = 128


def blockable(C: int, lane: int = _LANE) -> int:
    """Block factor (>1 when the rewrite applies)."""
    if C >= lane or lane % C != 0:
        return 1
    return lane // C


def conv1d_blocked(x, w, b=None, *, dilation: int = 1):
    """Symmetric-SAME dilated conv (padding = (k-1)//2 * dilation, odd k)
    via the time-blocked matmul rewrite.  x: (B, T, C); w: (K, C, C)."""
    B, T, C = x.shape
    k = w.shape[0]
    assert k % 2 == 1, "blocked conv expects odd kernel size"
    blk = blockable(C)
    c = (k - 1) // 2
    d = dilation

    if blk == 1:
        from .nn import conv1d

        return conv1d(x, w, b, dilation=d, padding=c * d)

    Tb = (T + blk - 1) // blk * blk
    nb = Tb // blk
    xp = jnp.pad(x, ((0, 0), (0, Tb - T), (0, 0)))
    Xb = xp.reshape(B, nb, blk * C)

    # group taps by relative block offset q
    groups: dict[int, list[tuple[int, int, int]]] = {}
    for j in range(k):
        o = (j - c) * d
        for s in range(blk):
            q, r = divmod(s + o, blk)       # python floor-div: exact
            groups.setdefault(q, []).append((r, s, j))

    y = None
    for q, triples in sorted(groups.items()):
        Wq = jnp.zeros((blk * C, blk * C), w.dtype)
        for r, s, j in triples:
            Wq = Wq.at[r * C:(r + 1) * C, s * C:(s + 1) * C].add(w[j])
        if q == 0:
            src = Xb
        elif q > 0:
            src = jnp.concatenate(
                [Xb[:, q:], jnp.zeros((B, q, blk * C), x.dtype)], axis=1)
        else:
            src = jnp.concatenate(
                [jnp.zeros((B, -q, blk * C), x.dtype), Xb[:, :q]], axis=1)
        term = jnp.einsum("bnl,lm->bnm", src, Wq,
                          preferred_element_type=jnp.float32)
        y = term if y is None else y + term

    y = y.reshape(B, Tb, C)[:, :T].astype(x.dtype)
    if b is not None:
        y = y + b
    return y
