"""W8A8 int8 convolution for the NSF-HiFiGAN decode resblocks.

The v5e MXU runs s8 x s8 -> s32 at up to ~1.4x the bf16 rate at our
decode shapes (measured in docs/perf_notes.md "int8 conv probe": 1.40x
at C=512, 1.27x at C=256, ~1.1x at C=128/64).  This module lands that
probe as an opt-in inference path:

  * weights: symmetric per-output-channel int8 (scale = amax/127),
    PRE-QUANTIZED once at pipeline construction (prequantize_decode) —
    pipeline weights are jit arguments, so per-call quantization could
    never be folded by XLA and cost two extra weight passes per conv
    (the r3 e2e regression's biggest term)
  * activations: symmetric per-tensor int8.  Scales come from a
    CALIBRATION pass (Int8Ctx "calibrate" records each site's amax on a
    voiced calibration batch inside one jitted run; "static" plays the
    recorded scales back as baked constants, so the amax reduce — a full
    extra HBM pass per conv that also blocked producer fusion —
    disappears from the hot program).  Dynamic per-call scales remain as
    the fallback mode.
  * conv accumulates in int32 (preferred_element_type), then one fused
    requant multiply back to the compute dtype

Enable with RVC_TPU_INT8=1 (bf16 fast mode only; the fp32 parity path
never quantizes).  The flag only takes effect where an inference entry
point threads use_int8 (ConvertPipeline) — the rounding/clip ops have
ZERO gradient, so this path must never run inside a train forward.
Quality: random-weights decode stays within a few percent relative
error of bf16 (tests/test_int8_decode.py); certifying real-checkpoint
audio quality additionally needs the bf16 mel-distance gate run on real
weights (docs/real_weights_checklist.md #10).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def int8_enabled(dtype) -> bool:
    """Opt-in, and only in the bf16 fast path — fp32 is the parity mode
    whose <=1e-3 waveform budget quantization would break."""
    return (os.environ.get("RVC_TPU_INT8", "0") == "1"
            and dtype == jnp.bfloat16)


def int8_scope() -> frozenset:
    """Which stages RVC_TPU_INT8=1 quantizes.  Default: all of them;
    RVC_TPU_INT8_SCOPE=decode,hubert,rmvpe subsets for A/B isolation.
    Unknown tokens are warned about (a typo would otherwise silently
    disable the stage the operator meant to quantize)."""
    s = os.environ.get("RVC_TPU_INT8_SCOPE", "all").strip()
    known = frozenset({"decode", "hubert", "rmvpe"})
    if s in ("", "all"):
        return known
    toks = frozenset(x.strip() for x in s.split(",") if x.strip())
    unknown = toks - known
    if unknown:
        import logging

        logging.getLogger(__name__).warning(
            "RVC_TPU_INT8_SCOPE: unknown stage(s) %s ignored (known: %s)",
            sorted(unknown), sorted(known))
    return toks


def quantize_weight(w):
    """(K, Cin, Cout) float -> (int8 weights, (Cout,) float32 scales)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


class Int8Ctx:
    """Trace-time context threaded through the decode in place of the
    old use_int8 bool.

    mode "dynamic":   per-call activation amax (r3 baseline)
    mode "calibrate": like dynamic, but records each site's amax tracer
                      (`collected`) so a calibration jit can return them
    mode "static":    site scales from `scales` baked as constants — no
                      amax pass in the hot program

    Site identity is trace order; `sigs` cross-checks each site's
    (K, Cin, Cout, dilation) signature between calibration and playback
    so a divergent trace fails loudly instead of mis-scaling.
    """

    def __init__(self, mode: str = "dynamic", scales=None, sigs=None):
        if mode not in ("dynamic", "calibrate", "static"):
            raise ValueError(f"unknown Int8Ctx mode {mode!r}")
        if mode == "static" and scales is None:
            raise ValueError("static Int8Ctx requires calibrated scales")
        self.mode = mode
        self.scales = scales
        self.sigs = list(sigs) if sigs is not None else None
        self.collected: list = []
        self.collected_sigs: list = []
        # per-THREAD site counter: a trace runs on one thread, but a
        # threaded server can trace two bucket lengths concurrently —
        # a shared counter would interleave and misindex the scales
        import threading

        self._tls = threading.local()

    @property
    def _i(self) -> int:
        return getattr(self._tls, "i", 0)

    @_i.setter
    def _i(self, v: int) -> None:
        self._tls.i = v

    def reset_sites(self) -> None:
        """Called at the top of each decode trace (site order restarts)."""
        self._i = 0

    def conv(self, x, c, *, dilation: int, padding: int):
        sig = (int(c["w"].shape[0]), int(c["w"].shape[1]),
               int(c["w"].shape[2]), int(dilation))
        i = self._i
        self._i += 1
        if self.mode == "static":
            # hard error (not assert: stripped under python -O) — a
            # divergent trace applying the wrong per-site scale must fail
            # loudly, as the class docstring promises
            if self.sigs is not None and (
                    i >= len(self.sigs) or self.sigs[i] != sig):
                raise ValueError(
                    f"int8 site {i} signature {sig} != calibrated "
                    f"{self.sigs[i] if i < len(self.sigs) else '<missing>'}")
            a_scale = jnp.float32(self.scales[i])
        else:
            a_max = jnp.max(jnp.abs(x.astype(jnp.float32)))
            a_scale = jnp.maximum(a_max, 1e-8) / 127.0
            if self.mode == "calibrate":
                self.collected.append(a_scale)
                self.collected_sigs.append(sig)
        return conv1d_w8a8(x, c["w"], c.get("b"), dilation=dilation,
                           padding=padding, w_q=c.get("w_q"),
                           w_scale=c.get("w_scale"), a_scale=a_scale)


def as_ctx(use_int8):
    """Normalize the threaded use_int8 value to an Int8Ctx or None."""
    if isinstance(use_int8, Int8Ctx):
        return use_int8
    return Int8Ctx("dynamic") if use_int8 else None


def prequantize_decode(params):
    """Attach w_q/w_scale to every decode resblock conv dict (in a copy
    of the tree).  Runs once at pipeline construction so the hot program
    receives quantized weights as arguments instead of re-quantizing
    ~54 conv weights per call."""
    params = dict(params)
    if "dec" not in params or "resblocks" not in params.get("dec", {}):
        return params
    dec = dict(params["dec"])
    new_rbs = []
    for rb in dec["resblocks"]:
        rb = {k: [dict(c) for c in v] if isinstance(v, list) else v
              for k, v in rb.items()}
        for key in ("convs1", "convs2"):
            for c in rb.get(key, []):
                if "w" in c and getattr(c["w"], "ndim", 0) == 3:
                    w_q, w_scale = quantize_weight(jnp.asarray(c["w"]))
                    c["w_q"], c["w_scale"] = w_q, w_scale
        new_rbs.append(rb)
    dec["resblocks"] = new_rbs
    params["dec"] = dec
    return params


def conv1d_w8a8(x, w, b=None, *, dilation: int = 1, padding: int = 0,
                w_q=None, w_scale=None, a_scale=None):
    """Drop-in for ops.nn.conv1d on NTC activations with W8A8 quant.

    x: (B, T, Cin) bf16/f32; w: (K, Cin, Cout) float.  w_q/w_scale skip
    the per-call weight quantization (prequantize_decode); a_scale skips
    the per-call activation amax (calibrated static scale).  Returns
    x.dtype.
    """
    out_dtype = x.dtype
    if w_q is None or w_scale is None:
        w_q, w_scale = quantize_weight(w)
    if a_scale is None:
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


def quantize_linear_weight(w):
    """(..., Cin, Cout) float -> (int8 weights, (..., Cout) f32 scales).

    Leading axes pass through untouched, so HuBERT's lax.scan-stacked
    layer weights (n_layers, Cin, Cout) quantize per-layer-per-column in
    one call."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]),
                   -127, 127).astype(jnp.int8)
    return w_q, scale


def linear_w8a8(x, w, b=None, *, w_q=None, w_scale=None):
    """Drop-in for ops.nn.linear with W8A8 int8 quantization.

    x: (..., Cin); w: (Cin, Cout).  Activations quantize with PER-TOKEN
    (last-axis amax) scales — the standard transformer recipe: per-tensor
    scales clip activation-outlier tokens, per-token scales track them at
    the cost of one cheap fused row-max.  Inside a lax.scan over layers
    the dynamic scales are automatically per-layer-correct, so no
    calibration pass is needed (unlike the decode convs, whose low
    arithmetic intensity made the extra amax pass worth baking away)."""
    out_dtype = x.dtype
    if w_q is None or w_scale is None:
        w_q, w_scale = quantize_linear_weight(w)
    a_max = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a_max, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (a_scale * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def prequantize_hubert(params):
    """Attach w_q/w_scale to the six transformer matmuls of a HuBERT
    param tree (stacked layer axis preserved) — one-time at pipeline
    construction, mirroring prequantize_decode."""
    if not isinstance(params, dict) or "layers" not in params:
        return params
    params = dict(params)
    layers = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params["layers"].items()}
    if isinstance(layers.get("attn"), dict):
        layers["attn"] = {k: (dict(v) if isinstance(v, dict) else v)
                          for k, v in layers["attn"].items()}
        for name in ("q", "k", "v", "o"):
            c = layers["attn"].get(name)
            if isinstance(c, dict) and "w" in c:
                c["w_q"], c["w_scale"] = quantize_linear_weight(
                    jnp.asarray(c["w"]))
    for name in ("fc1", "fc2"):
        c = layers.get(name)
        if isinstance(c, dict) and "w" in c:
            c = layers[name] = dict(c)
            c["w_q"], c["w_scale"] = quantize_linear_weight(
                jnp.asarray(c["w"]))
    params["layers"] = layers
    return params


def quantize_conv2d_weight(w):
    """(Kh, Kw, Cin, Cout) HWIO float -> int8 + per-Cout f32 scales."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def conv2d_w8a8(x, w, *, stride=(1, 1), padding=(1, 1),
                w_q=None, w_scale=None):
    """NHWC 2-D conv with W8A8 quantization (per-tensor dynamic
    activation scale).  Used by the RMVPE U-Net's C>=128 levels — the
    int8 MXU probe measured gains only there (1.1x@128 .. 1.4x@512;
    docs/perf_notes.md), and the small-C levels are already W-folded."""
    out_dtype = x.dtype
    if w_q is None or w_scale is None:
        w_q, w_scale = quantize_conv2d_weight(w)
    a_max = jnp.max(jnp.abs(x.astype(jnp.float32)))
    a_scale = jnp.maximum(a_max, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (a_scale * w_scale)).astype(out_dtype)


RMVPE_INT8_MIN_CIN = 128


def prequantize_rmvpe(params):
    """Attach w_q/w_scale to every U-Net ConvBlockRes conv with
    Cin >= RMVPE_INT8_MIN_CIN (deep copy of affected dicts)."""
    def walk(node):
        if isinstance(node, dict):
            node = {k: walk(v) for k, v in node.items()}
            for key in ("conv1", "conv2"):
                c = node.get(key)
                if (isinstance(c, dict)
                        and getattr(c.get("w"), "ndim", 0) == 4
                        and c["w"].shape[2] >= RMVPE_INT8_MIN_CIN):
                    c = dict(c)
                    c["w_q"], c["w_scale"] = quantize_conv2d_weight(
                        jnp.asarray(c["w"]))
                    node[key] = c
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def calibration_scales(collected, sigs) -> tuple[np.ndarray, list]:
    """Fetch calibration outputs -> (per-site float scales, signatures).
    A safety margin (x1.05) guards inputs slightly hotter than the
    calibration batch; int8 clips gracefully beyond it."""
    scales = np.asarray([float(s) for s in collected], np.float32) * 1.05
    return scales, list(sigs)
