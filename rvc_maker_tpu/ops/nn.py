"""Core functional neural-net ops for TPU.

Layout conventions (TPU-first — the channel axis is the innermost/lane axis):
  * activations: (batch, time, channels)         ["NTC"]
  * conv weights: (kernel, in_channels, out_channels)   ["WIO"]
  * linear weights: (in_features, out_features)

Torch-layout weights (Cout, Cin, K) / (Cout, Cin) are transposed once at
import time (see rvc_maker_tpu.interop), never at run time.

All functions are pure and jittable; none allocate parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1  # reference: main/library/algorithm/residuals.py:14

def cast_floats(tree, dtype):
    """Cast floating leaves of a pytree to dtype (ints/bools untouched) —
    the one shared mixed-precision cast (train bf16 policy, inference
    compute_dtype prep)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)



def leaky_relu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


def conv1d(x, w, b=None, *, stride: int = 1, dilation: int = 1,
           padding="SAME", groups: int = 1):
    """1-D convolution on NTC activations.

    x: (B, T, Cin); w: (K, Cin//groups, Cout); padding: 'SAME', 'VALID',
    an int (symmetric) or an (lo, hi) tuple. Matches torch.nn.Conv1d
    semantics when padding == (p, p) with the torch layout transposed.
    """
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x, w, b=None, *, stride: int, padding: int = 0,
                     output_padding: int = 0):
    """Transposed 1-D convolution matching torch.nn.ConvTranspose1d.

    x: (B, T, Cin); w: (K, Cin, Cout) (torch's (Cin, Cout, K) transposed).
    Output length: (T - 1) * stride - 2 * padding + K + output_padding.

    Implemented as input-dilated convolution with a flipped kernel — the
    canonical decomposition XLA tiles well on the MXU. Asymmetric edge
    padding reproduces torch's `padding`/`output_padding` exactly
    (load-bearing for NSF-HiFiGAN upsampler parity — see SURVEY.md §7
    "Hard parts"; reference synthesizers.py:133).
    """
    k = w.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    w_flipped = jnp.flip(w, axis=0)
    y = jax.lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        y = y + b
    return y


def weight_norm_w(g, v):
    """Materialize a weight-normalized kernel: w = g * v / ||v||.

    v: (K, Cin, Cout) [or (Kh, Kw, Cin, Cout)]; norm over all axes except
    the LAST (output channels) — the layout-transposed equivalent of torch
    weight_norm(dim=0).  Used live during training; folded at import for
    inference (interop.torch_import).
    """
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return g * v / norm


def linear(x, w, b=None):
    """x: (..., Cin); w: (Cin, Cout)."""
    y = jnp.matmul(x, w)
    if b is not None:
        y = y + b
    return y


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the last axis (channels-last layout)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def embedding(table, ids):
    """table: (V, C); ids: int array."""
    return jnp.take(table, ids, axis=0)


def sequence_mask(lengths, max_length: int):
    """(B,) lengths -> (B, T) bool mask. Reference: commons.py:43-46."""
    pos = jnp.arange(max_length)[None, :]
    return pos < lengths[:, None]


def fused_gate(x, g):
    """tanh/sigmoid gated activation used by WaveNet.

    x, g: (B, T, 2H) pre-activations (g may be scalar 0 for no conditioning).
    Returns tanh(a) * sigmoid(b) where [a, b] = split(x + g, 2, axis=-1).
    Reference: commons.py:35-41 fused_add_tanh_sigmoid_multiply.
    """
    s = x + g
    a, b = jnp.split(s, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def interp_nearest_x2(x):
    """Repeat each time step twice: (B, T, C) -> (B, 2T, C).

    Matches torch F.interpolate(scale_factor=2, mode='nearest') on the
    time axis (reference convert.py:361).
    """
    b, t, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, t, 2, c)).reshape(b, 2 * t, c)


def slice_segments(x, ids_str, segment_size: int):
    """Gather fixed-size time slices per batch element.

    x: (B, T, C) or (B, T); ids_str: (B,) int32 start indices.
    Reference: commons.py:14-25 (the per-sample python loop becomes a
    vectorized dynamic-slice gather).
    """
    def one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, segment_size, axis=0)
    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(key, x, x_lengths, segment_size: int):
    """Random per-sample slices for training. Reference: commons.py:27-33."""
    b = x.shape[0]
    u = jax.random.uniform(key, (b,))
    ids_str = (u * (x_lengths - segment_size + 1)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str
