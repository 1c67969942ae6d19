"""W8A8 int8 convolution for the NSF-HiFiGAN decode resblocks.

The v5e MXU runs s8 x s8 -> s32 at up to ~1.4x the bf16 rate at our
decode shapes (measured in docs/perf_notes.md "int8 conv probe": 1.40x
at C=512, 1.27x at C=256, ~1.1x at C=128/64).  This module lands that
probe as an opt-in inference path:

  * weights: symmetric per-output-channel int8 (scale = amax/127)
  * activations: symmetric per-tensor DYNAMIC int8 (scale from the
    tensor's own amax, computed on device inside the jitted program)
  * conv accumulates in int32 (preferred_element_type), then one fused
    requant multiply back to the compute dtype

Enable with RVC_TPU_INT8=1 (bf16 fast mode only; the fp32 parity path
never quantizes).  The flag only takes effect where an inference entry
point threads use_int8=True (ConvertPipeline) — the rounding/clip ops
have ZERO gradient, so this path must never run inside a train forward.
Quality: a random-weights decode stays within a few percent relative
error of bf16 (tests/test_int8_decode.py); certifying real-checkpoint
audio quality additionally needs the bf16 mel-distance gate run on real
weights (docs/real_weights_checklist.md #10).

Measured e2e (docs/perf_notes.md): currently a 7% REGRESSION at B=128 —
the dynamic quant adds three elementwise HBM passes per conv (weight
quant also reruns per call, since pipeline weights are jit arguments,
not constants).  Kept as the starting point for a calibrated-scale /
fused-requant variant once real weights exist.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def int8_enabled(dtype) -> bool:
    """Opt-in, and only in the bf16 fast path — fp32 is the parity mode
    whose <=1e-3 waveform budget quantization would break."""
    return (os.environ.get("RVC_TPU_INT8", "0") == "1"
            and dtype == jnp.bfloat16)


def quantize_weight(w):
    """(K, Cin, Cout) float -> (int8 weights, (Cout,) float32 scales)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def conv1d_w8a8(x, w, b=None, *, dilation: int = 1, padding: int = 0):
    """Drop-in for ops.nn.conv1d on NTC activations with W8A8 quant.

    x: (B, T, Cin) bf16/f32; w: (K, Cin, Cout) float.  The weight is
    quantized here per call (pipeline weights are jit ARGUMENTS, so XLA
    cannot fold this; pre-quantizing at pipeline init is the known
    improvement if this path ever wins e2e).  Returns x.dtype.
    """
    out_dtype = x.dtype
    w_q, w_scale = quantize_weight(w)
    a_max = jnp.max(jnp.abs(x.astype(jnp.float32)))
    a_scale = jnp.maximum(a_max, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (a_scale * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
