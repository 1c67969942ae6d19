"""Fused NSF-HiFiGAN resblock as a Pallas TPU kernel.

The HiFi-GAN resblock (reference residuals.py ResBlock; our
models/synthesizer.py _resblock) is a chain

    for d in dilations:                      # (1, 3, 5)
        x = x + conv_k1(lrelu(conv_kd(lrelu(x))))

of 1-D convolutions at the *output* sample rate — the single most
bandwidth-hungry piece of voice conversion (SURVEY.md §7 step 7 names it
the headline Pallas target).  XLA runs each conv as its own HBM->HBM
kernel: 6 convs x (read + write) of a (B, T, C) activation per resblock,
with T up to sr * seconds.  This kernel runs the whole chain per time
tile in VMEM:

  * one HBM read of the tile (+halo) and one HBM write — ~6x less HBM
    traffic per resblock;
  * each conv is ONE matmul: taps are concatenated along channels
    (im2col in VMEM), so the MXU sees (tile, k*C) @ (k*C, C) — K = k*C
    instead of C, which matters at the late stages where C is 32..128
    and a plain conv would waste most of the 128x128 systolic array;
  * the chained-halo trick: a tile loads H = sum_d c*(d+1) extra rows
    per side (c = (k-1)//2) so after the full chain the central T_tile
    rows are exact.  Out-of-sequence rows are re-zeroed after every
    residual update, reproducing torch's zero conv padding at the
    sequence edges exactly.

Used for the C <= 128 stages (where ~3/4 of the decode bandwidth lives;
weights for all dilations then fit VMEM in fp32).  Falls back to the
XLA path otherwise — numerics are identical either way (tested).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

_LANE = 128


def _roundup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def halo(kernel_size: int, dilations) -> int:
    c = (kernel_size - 1) // 2
    return sum(c * (d + 1) for d in dilations)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            x_buf, sem, *, T_tile: int, H: int, k: int, dilations,
            Cp: int, T_real: int, n_tiles: int, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)           # linearized (batch, tile) step
    n_steps = pl.num_programs(0)
    N = T_tile + 2 * H
    c = (k - 1) // 2

    def dma(step, slot):
        b = step // n_tiles
        i = step % n_tiles
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * T_tile, N), :], x_buf.at[slot], sem.at[slot])

    # double buffering: tile g lands in slot g%2 while g+1 streams into
    # the other slot — the DMA latency hides behind the conv chain
    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < n_steps)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    dma(g, g % 2).wait()

    # rows of this buffer in padded-x coordinates; the real sequence
    # occupies [H, H + T_real)
    i = g % n_tiles
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) + i * T_tile
    in_seq = (rows >= H) & (rows < H + T_real)

    y = x_buf[g % 2].astype(jnp.float32)

    def shifted(t, off):
        """t shifted by `off` rows with zero fill (static slices)."""
        if off == 0:
            return t
        z = jnp.zeros_like(t)
        if off > 0:
            return jnp.concatenate([t[off:], z[:off]], axis=0)
        return jnp.concatenate([z[off:], t[:off]], axis=0)

    def conv(t, w, bias, d):
        """k-tap dilated conv: per-tap (N, Cp) @ (Cp, Cp) MXU matmuls
        accumulated in fp32 (K = N = Cp keeps the systolic array full
        without an im2col buffer)."""
        acc = jnp.zeros((t.shape[0], Cp), jnp.float32) + bias
        for j in range(k):
            acc = acc + jnp.dot(shifted(t, (j - c) * d), w[j],
                                preferred_element_type=jnp.float32)
        return acc

    for di, d in enumerate(dilations):
        t = jnp.where(y >= 0, y, y * LRELU_SLOPE).astype(x_buf.dtype)
        t = conv(t, w1_ref[di], b1_ref[di].astype(jnp.float32), d)
        # torch pads each conv's own input with zeros at the sequence
        # edges; zero out-of-sequence rows after every conv so the next
        # conv's taps read zeros there (lrelu(0) == 0 keeps it zero)
        t = jnp.where(in_seq, t, 0.0)
        t = jnp.where(t >= 0, t, t * LRELU_SLOPE).astype(x_buf.dtype)
        t = conv(t, w2_ref[di], b2_ref[di].astype(jnp.float32), 1)
        y = jnp.where(in_seq, y + t, 0.0)

    out_ref[:] = y[H:H + T_tile].astype(out_dtype)[None]


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilations",
                                             "interpret", "t_tile"))
def fused_resblock(x, w1, b1, w2, b2, *, kernel_size: int, dilations,
                   interpret: bool = False, t_tile: int = 2048):
    """x: (B, T, C); w1/w2: (D, k, Cp, Cp) lane-padded weights (see
    `pack_resblock_weights`); b1/b2: (D, Cp).  Returns (B, T, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = kernel_size
    D = len(dilations)
    B, T, C = x.shape
    Cp = w1.shape[-1]
    H = halo(k, dilations)
    T_tile = min(t_tile, _roundup(T, 256))
    Tp = _roundup(max(T, 1), T_tile)
    N = T_tile + 2 * H
    n_tiles = Tp // T_tile

    xp = jnp.pad(x, ((0, 0), (H, H + (Tp - T)), (0, Cp - C)))

    out = pl.pallas_call(
        functools.partial(_kernel, T_tile=T_tile, H=H, k=k,
                          dilations=tuple(dilations), Cp=Cp, T_real=T,
                          n_tiles=n_tiles, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Cp), x.dtype),
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x, DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2
        ],
        out_specs=pl.BlockSpec(
            (1, T_tile, Cp),
            lambda g: (g // n_tiles, g % n_tiles, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, N, Cp), x.dtype),         # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * D * B * Tp * k * Cp * Cp,
            bytes_accessed=2 * B * Tp * Cp * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w1, b1[:, None, :], w2, b2[:, None, :])
    return out[:, :T, :C]


def pack_resblock_weights(p, *, kernel_size: int, dilations, dtype=None):
    """Stack a _resblock param dict {convs1/convs2: [{w (k,C,C), b}]} into
    the kernel's lane-padded layout: (D, k, Cp, Cp) / (D, Cp).
    Pure jnp (traceable — runs inside the jitted decode; the pads and
    reshapes are trivial next to the convs they feed)."""
    k = kernel_size
    C = p["convs1"][0]["w"].shape[-1]
    Cp = _roundup(C, _LANE)

    def pack_w(w):
        return jnp.pad(jnp.asarray(w), ((0, 0), (0, Cp - C), (0, Cp - C)))

    def pack_b(b):
        return jnp.pad(jnp.asarray(b), (0, Cp - C))

    w1 = jnp.stack([pack_w(c["w"]) for c in p["convs1"]])
    w2 = jnp.stack([pack_w(c["w"]) for c in p["convs2"]])
    b1 = jnp.stack([pack_b(c["b"]) for c in p["convs1"]])
    b2 = jnp.stack([pack_b(c["b"]) for c in p["convs2"]])
    if dtype is not None:
        w1, w2 = w1.astype(dtype), w2.astype(dtype)
        b1, b2 = b1.astype(dtype), b2.astype(dtype)
    return w1, b1, w2, b2


def vmem_budget_ok(kernel_size: int, dilations, C: int,
                   itemsize: int = 4, t_tile: int = 512) -> bool:
    """Conservative check that weights + buffers fit VMEM."""
    Cp = _roundup(C, _LANE)
    k = kernel_size
    D = len(dilations)
    N = t_tile + 2 * halo(k, dilations)
    weights = 2 * D * k * Cp * Cp * itemsize
    buffers = 2 * N * Cp * itemsize + 4 * N * Cp * 4  # 2x in + y/t fp32
    return weights + buffers < 12 * 1024 * 1024
