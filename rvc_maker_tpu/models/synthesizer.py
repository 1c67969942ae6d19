"""VITS-RVC synthesizer as pure functional JAX — TPU-native re-design.

Re-implements the behavior of the reference Synthesizer
(reference: main/library/algorithm/synthesizers.py:396-489,
residuals.py, modules.py) with:
  * channels-last (B, T, C) activations so C rides the TPU lane axis,
  * parameters as plain pytrees (weight-norm folded at import time —
    TPU inference never re-normalizes weights),
  * explicit PRNG noise inputs replacing torch's implicit randomness
    (prior noise, SineGen dither) so fp32 parity can be asserted,
  * static shapes + masks; everything here jit-compiles to one XLA
    program per bucketed length.

Every public entry point takes `(params, cfg: ModelConfig, ...)`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.nn import (
    LRELU_SLOPE,
    conv1d,
    conv_transpose1d,
    embedding,
    fused_gate,
    layer_norm,
    leaky_relu,
    linear,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)

Params = Any  # nested dict pytree


# ---------------------------------------------------------------------------
# Relative-position multi-head attention (reference synthesizers.py:183-284)
# ---------------------------------------------------------------------------

def _get_relative_embeddings(emb, t: int, window_size: int):
    """emb: (1, 2*window+1, k) -> (1, 2t-1, k) padded/sliced for length t."""
    pad_length = max(t - (window_size + 1), 0)
    start = max((window_size + 1) - t, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * t - 1]


def _relative_to_absolute(x):
    """(B, H, T, 2T-1) -> (B, H, T, T). Reference synthesizers.py:271-274."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1 :]


def _absolute_to_relative(x):
    """(B, H, T, T) -> (B, H, T, 2T-1). Reference synthesizers.py:276-279."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


def _band_validity(t: int, width: int, dtype):
    """(T, W) mask: band entry [i, d] maps to column i + d - w; 1 if in
    [0, T)."""
    w = (width - 1) // 2
    cols = jnp.arange(t)[:, None] + jnp.arange(width)[None, :] - w
    return ((cols >= 0) & (cols < t)).astype(dtype)


def _band_to_matrix(band, t: int):
    """(B, H, T, W) banded values -> dense (B, H, T, T) with
    M[i, i + d - w] = band[i, d] (out-of-range entries dropped).

    Flat-index identity: with X = zero-pad(band) to (T, T+1) columns,
    M.flat[i] = X.flat[i + w].  One pad + one slice instead of the
    reference's (B, H, T, 2T-1) materialization
    (synthesizers.py:271-274) — the relative term is only w=10 wide.
    """
    b, h, _, width = band.shape
    w = (width - 1) // 2
    band = band * _band_validity(t, width, band.dtype)
    xp = jnp.pad(band, ((0, 0), (0, 0), (0, 0), (0, t + 1 - width)))
    flat = xp.reshape(b, h, t * (t + 1))
    return jax.lax.slice(flat, (0, 0, w), (b, h, w + t * t)).reshape(b, h, t, t)


def _matrix_to_band(m, width: int):
    """(B, H, T, T) dense -> (B, H, T, W) band: band[i, d] = M[i, i+d-w]
    (out-of-range entries zeroed).  Inverse flat trick of
    _band_to_matrix; replaces the reference's (B, H, T, 2T-1) pad/reshape
    (synthesizers.py:276-279)."""
    b, h, t, _ = m.shape
    w = (width - 1) // 2
    flat = m.reshape(b, h, t * t)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (w, t - w)))
    band = flat.reshape(b, h, t, t + 1)[:, :, :, :width]
    return band * _band_validity(t, width, m.dtype)


def multi_head_attention(p: Params, x, attn_mask, *, n_heads: int,
                         window_size: int):
    """Self-attention with windowed relative position bias.

    x: (B, T, C); attn_mask: (B, 1, T, T) with 1 = attend.

    The relative-position terms use banded forms of width 2*window+1
    (the embeddings are zero outside the window, so the products over
    the reference's zero-padded (2T-1)-wide tensors reduce exactly to
    the band — semantics of reference synthesizers.py:241-263 with
    O(T*w) instead of O(T^2) relative work).
    """
    b, t, c = x.shape
    k_ch = c // n_heads
    scale = 1.0 / math.sqrt(k_ch)
    width = 2 * window_size + 1

    q = linear(x, p["q"]["w"], p["q"]["b"]).reshape(b, t, n_heads, k_ch).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]["w"], p["k"]["b"]).reshape(b, t, n_heads, k_ch).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]["w"], p["v"]["b"]).reshape(b, t, n_heads, k_ch).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhtk,bhsk->bhts", q * scale, k)

    if t >= width:
        band_logits = jnp.einsum("bhtk,gdk->bhtd", q * scale,
                                 p["emb_rel_k"].astype(q.dtype))
        scores = scores + _band_to_matrix(band_logits, t)
    else:
        rel_k = _get_relative_embeddings(p["emb_rel_k"], t, window_size)
        rel_logits = jnp.einsum("bhtk,gsk->bhts", q * scale, rel_k)
        scores = scores + _relative_to_absolute(rel_logits)

    scores = jnp.where(attn_mask == 0, -1e4, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum("bhts,bhsk->bhtk", p_attn, v)
    if t >= width:
        band_attn = _matrix_to_band(p_attn, width)
        out = out + jnp.einsum("bhtd,gdk->bhtk", band_attn,
                               p["emb_rel_v"].astype(p_attn.dtype))
    else:
        rel_v = _get_relative_embeddings(p["emb_rel_v"], t, window_size)
        out = out + jnp.einsum("bhts,gsk->bhtk", _absolute_to_relative(p_attn), rel_v)

    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return linear(out, p["o"]["w"], p["o"]["b"])


def ffn(p: Params, x, x_mask, *, kernel_size: int):
    """Conv feed-forward with ReLU. Reference synthesizers.py:286-315.

    x: (B, T, C); x_mask: (B, T, 1).
    """
    pad = ((kernel_size - 1) // 2, kernel_size // 2)
    h = conv1d(x * x_mask, p["conv1"]["w"], p["conv1"]["b"], padding=pad)
    h = jax.nn.relu(h)
    h = conv1d(h * x_mask, p["conv2"]["w"], p["conv2"]["b"], padding=pad)
    return h * x_mask


def rel_transformer_encoder(p: Params, x, x_mask, *, n_heads: int,
                            kernel_size: int, window_size: int):
    """Stack of attention+FFN blocks. Reference synthesizers.py:317-348."""
    attn_mask = (x_mask[:, None, :, :] * x_mask[:, None, None, :, 0]).astype(x.dtype)
    # x_mask: (B, T, 1) -> attn_mask (B, 1, T, T)
    x = x * x_mask
    for lp in p["layers"]:
        y = multi_head_attention(lp["attn"], x, attn_mask, n_heads=n_heads,
                                 window_size=window_size)
        x = layer_norm(x + y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        y = ffn(lp["ffn"], x, x_mask, kernel_size=kernel_size)
        x = layer_norm(x + y, lp["norm2"]["gamma"], lp["norm2"]["beta"])
    return x * x_mask


# ---------------------------------------------------------------------------
# Text (phone) encoder — reference synthesizers.py:350-371
# ---------------------------------------------------------------------------

def text_encoder(p: Params, cfg: ModelConfig, phone, pitch, lengths):
    """phone: (B, T, emb_dim) float; pitch: (B, T) int32 or None;
    lengths: (B,) int32. Returns (m, logs, x_mask[(B,T,1)])."""
    x = linear(phone, p["emb_phone"]["w"], p["emb_phone"]["b"])
    if pitch is not None:
        x = x + embedding(p["emb_pitch"]["w"], pitch)
    x = leaky_relu(x * math.sqrt(cfg.hidden_channels), 0.1)
    x_mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None]
    x = rel_transformer_encoder(
        p["encoder"], x, x_mask,
        n_heads=cfg.n_heads, kernel_size=cfg.kernel_size,
        window_size=cfg.rel_attn_window_size,
    )
    stats = linear(x, p["proj"]["w"], p["proj"]["b"]) * x_mask
    m, logs = jnp.split(stats, 2, axis=-1)
    return m, logs, x_mask


# ---------------------------------------------------------------------------
# WaveNet core — reference modules.py:9-60
# ---------------------------------------------------------------------------

def wavenet(p: Params, x, x_mask, g, *, kernel_size: int, dilation_rate: int,
            n_layers: int):
    """Dilated gated conv stack with optional global conditioning.

    x: (B, T, H); x_mask: (B, T, 1); g: (B, 1, gin) or None.
    """
    hidden = x.shape[-1]
    cond = None
    if g is not None:
        cond = linear(g, p["cond"]["w"], p["cond"]["b"])  # (B, 1, 2H*n_layers)

    output = jnp.zeros_like(x)
    for i in range(n_layers):
        dilation = dilation_rate ** i
        pad = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(x, p["in_layers"][i]["w"], p["in_layers"][i]["b"],
                      dilation=dilation, padding=pad)
        g_l = cond[..., i * 2 * hidden : (i + 1) * 2 * hidden] if cond is not None else 0.0
        acts = fused_gate(x_in, g_l)
        res_skip = linear(acts, p["res_skip"][i]["w"], p["res_skip"][i]["b"])
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * x_mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * x_mask


# ---------------------------------------------------------------------------
# Normalizing flow — reference residuals.py:71-140
# ---------------------------------------------------------------------------

def _coupling(p: Params, x, x_mask, g, *, reverse: bool, kernel_size: int = 5,
              dilation_rate: int = 1, n_layers: int = 3):
    """Mean-only affine coupling layer (ResidualCouplingLayer)."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = linear(x0, p["pre"]["w"], p["pre"]["b"]) * x_mask
    h = wavenet(p["enc"], h, x_mask, g, kernel_size=kernel_size,
                dilation_rate=dilation_rate, n_layers=n_layers)
    m = linear(h, p["post"]["w"], p["post"]["b"]) * x_mask
    if reverse:
        x1 = (x1 - m) * x_mask
    else:
        x1 = m + x1 * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


def flow(p: Params, x, x_mask, g, *, reverse: bool):
    """4 couplings interleaved with channel flips (ResidualCouplingBlock)."""
    if not reverse:
        for lp in p["layers"]:
            x = _coupling(lp, x, x_mask, g, reverse=False)
            x = jnp.flip(x, axis=-1)
    else:
        for lp in reversed(p["layers"]):
            x = jnp.flip(x, axis=-1)
            x = _coupling(lp, x, x_mask, g, reverse=True)
    return x


# ---------------------------------------------------------------------------
# Posterior encoder — reference synthesizers.py:373-394
# ---------------------------------------------------------------------------

def posterior_encoder(p: Params, cfg: ModelConfig, y, y_lengths, g, noise):
    """y: (B, T, spec_channels); noise: (B, T, inter) standard normal.

    Returns (z, m, logs, y_mask)."""
    y_mask = sequence_mask(y_lengths, y.shape[1]).astype(y.dtype)[:, :, None]
    h = linear(y, p["pre"]["w"], p["pre"]["b"]) * y_mask
    h = wavenet(p["enc"], h, y_mask, g, kernel_size=5, dilation_rate=1,
                n_layers=16)
    stats = linear(h, p["proj"]["w"], p["proj"]["b"]) * y_mask
    m, logs = jnp.split(stats, 2, axis=-1)
    z = (m + noise * jnp.exp(logs)) * y_mask
    return z, m, logs, y_mask


# ---------------------------------------------------------------------------
# NSF source module — reference synthesizers.py:69-112
# ---------------------------------------------------------------------------

def sine_gen(f0, noise, *, upp: int, sample_rate: int, sine_amp: float = 0.1,
             noise_std: float = 0.003, voiced_threshold: float = 0.0):
    """Phase-accumulating harmonic sine source (harmonic_num=0 fundamental).

    f0: (B, T) Hz per frame; noise: (B, T*upp, 1) standard normal (the
    reference's torch.randn_like, made explicit).  Phase accumulation is a
    per-frame cumsum with fmod wrap — numerically sensitive, kept fp32
    (SURVEY.md §7 hard parts; reference synthesizers.py:82-91).
    """
    b, t = f0.shape
    f0 = f0.astype(jnp.float32)[:, :, None]                     # (B, T, 1)
    rad = f0 / sample_rate * jnp.arange(1, upp + 1, dtype=jnp.float32)  # (B,T,upp)
    # carry the end-phase of each frame into the next (mod 1)
    tmp = jnp.mod(rad[:, :-1, -1] + 0.5, 1.0) - 0.5             # (B, T-1)
    cum = jnp.mod(jnp.cumsum(tmp, axis=1), 1.0)
    offset = jnp.pad(cum, ((0, 0), (1, 0)))[:, :, None]         # (B, T, 1)
    rad = rad + offset
    rad = rad.reshape(b, t * upp, 1)
    sine = jnp.sin(2.0 * jnp.pi * rad)                          # fundamental only

    uv = (f0 > voiced_threshold).astype(jnp.float32)            # (B, T, 1)
    uv = jnp.repeat(uv, upp, axis=1)                            # (B, T*upp, 1)
    noise_amp = uv * noise_std + (1.0 - uv) * (sine_amp / 3.0)
    return sine * sine_amp * uv + noise_amp * noise


def source_module(p: Params, f0, noise, *, upp: int, sample_rate: int):
    """SourceModuleHnNSF: sine source -> 1x1 linear -> tanh."""
    s = sine_gen(f0, noise, upp=upp, sample_rate=sample_rate)
    return jnp.tanh(linear(s, p["l_linear"]["w"], p["l_linear"]["b"]))


# ---------------------------------------------------------------------------
# NSF-HiFiGAN generator — reference synthesizers.py:114-168
# ---------------------------------------------------------------------------

def _resblock(p: Params, x, *, kernel_size: int, dilations,
              use_int8: bool = False):
    # use_int8 (threaded from the INFERENCE entry points only — int8's
    # round/clip has zero gradient, so it must never reach a train
    # forward; bool or ops.int8_conv.Int8Ctx) + RVC_TPU_INT8=1 + bf16:
    # W8A8 resblock convs on the MXU int8 path.  Per-conv 1.27-1.40x at
    # C>=256; e2e needs the prequantized-weight + calibrated-scale ctx
    # (docs/perf_notes.md).  C>=64 keeps lane-starved stages on the
    # space-to-depth fold.
    from ..ops.int8_conv import as_ctx, int8_enabled

    ctx = as_ctx(use_int8)
    active = (ctx is not None and int8_enabled(x.dtype)
              and x.shape[-1] >= 64)

    def cv(y, c, d, pad):
        if active:
            return ctx.conv(y, c, dilation=d, padding=pad)
        return conv1d(y, c["w"], c["b"], dilation=d, padding=pad)

    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        pad1 = (kernel_size * d - d) // 2
        pad2 = (kernel_size - 1) // 2
        y = leaky_relu(x, LRELU_SLOPE)
        y = cv(y, c1, d, pad1)
        y = leaky_relu(y, LRELU_SLOPE)
        y = cv(y, c2, 1, pad2)
        x = y + x
    return x


def _resblock_blocked(p: Params, x, *, kernel_size: int, dilations):
    """Same chain with time-blocked convs (ops/blocked_conv.py): for
    C < 128 each conv becomes a handful of dense 128-lane matmuls
    instead of an MXU-starved NWC conv."""
    from ..ops.blocked_conv import conv1d_blocked

    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        y = leaky_relu(x, LRELU_SLOPE)
        y = conv1d_blocked(y, c1["w"], c1["b"], dilation=d)
        y = leaky_relu(y, LRELU_SLOPE)
        y = conv1d_blocked(y, c2["w"], c2["b"], dilation=1)
        x = y + x
    return x


def _stage_paddings(cfg: ModelConfig):
    """Per-stage (convT padding, output_padding) and noise-conv geometry."""
    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    n = len(rates)
    stride_f0s = [math.prod(rates[i + 1:]) if i + 1 < n else 1 for i in range(n)]
    out = []
    for i, (u, k) in enumerate(zip(rates, kernels)):
        convt_pad = ((k - u) // 2) if u % 2 == 0 else (u // 2 + u % 2)
        out_pad = u % 2
        stride = stride_f0s[i]
        nk = 1 if stride == 1 else stride * 2 - stride % 2
        npad = 0 if stride == 1 else (nk - stride) // 2
        out.append(dict(u=u, k=k, convt_pad=convt_pad, out_pad=out_pad,
                        noise_stride=stride, noise_kernel=nk, noise_pad=npad))
    return out


def use_pallas_default() -> bool:
    """Custom decode kernels (fused Pallas resblock + time-blocked conv):
    opt-in via RVC_TPU_PALLAS=1.  Measured on the tunneled v5e chip the
    XLA conv path wins end-to-end (165 vs 80 audio-sec/s/chip at B=8
    bf16), so the default stays off; the kernels remain as tested,
    benchmarkable alternatives (ops/pallas_resblock.py,
    ops/blocked_conv.py) for backends where XLA's small-channel NWC
    convs are the bottleneck."""
    import os

    return os.environ.get("RVC_TPU_PALLAS", "0") == "1"


def _fold_enabled(dtype) -> bool:
    """Space-to-depth folding of lane-starved decode stages
    (ops/folded_conv.py): on by default in bf16 fast mode (measured 1.98x
    on the C=32 stage on the target chip, exact up to accumulation
    order), off in fp32 parity mode to keep the ≤1e-3 waveform budget
    untouched.  RVC_TPU_FOLD=0 disables, =1 forces (also fp32)."""
    from ..ops.folded_conv import fold_enabled

    return fold_enabled(dtype)


def _resblock_group(p: Params, x, indices, *, kernels, dilations,
                    use_pallas: bool, use_int8: bool = False):
    """Sum/avg of the stage's resblocks (reference synthesizers.py:141-149),
    with the space-to-depth fold applied around the whole group when the
    stage is lane-starved (C*4 <= 128) — one fold + one unfold per stage."""
    from ..ops.folded_conv import (fold_time, folded_resblock, pick_fold,
                                   unfold_time)

    fold = 0
    if not use_pallas and _fold_enabled(x.dtype):
        fold = pick_fold(x.shape[-1], x.shape[1])
    if fold:
        xf = fold_time(x, fold)
        xs = None
        for idx, ks, ds in zip(indices, kernels, dilations):
            r = folded_resblock(p["resblocks"][idx], xf, kernel_size=ks,
                                dilations=ds, fold=fold)
            xs = r if xs is None else xs + r
        return unfold_time(xs / len(indices), fold)
    xs = None
    for idx, ks, ds in zip(indices, kernels, dilations):
        r = _resblock_opt(p["resblocks"][idx], x, kernel_size=ks,
                          dilations=ds, use_pallas=use_pallas,
                          use_int8=use_int8)
        xs = r if xs is None else xs + r
    return xs / len(indices)


def _resblock_opt(rb: Params, x, *, kernel_size: int, dilations,
                  use_pallas: bool, use_int8: bool = False):
    """Resblock with the optional optimized implementations (time-blocked
    conv rewrite for C < 128, fused Pallas chain for lane-multiple C)."""
    if use_pallas:
        from ..ops.blocked_conv import blockable
        from ..ops.pallas_resblock import (fused_resblock,
                                           pack_resblock_weights,
                                           vmem_budget_ok)
        if blockable(x.shape[-1]) > 1:
            return _resblock_blocked(rb, x, kernel_size=kernel_size,
                                     dilations=dilations)
        if vmem_budget_ok(kernel_size, dilations, x.shape[-1],
                          itemsize=x.dtype.itemsize):
            packed = pack_resblock_weights(rb, kernel_size=kernel_size,
                                           dilations=dilations,
                                           dtype=x.dtype)
            return fused_resblock(
                x, *packed, kernel_size=kernel_size, dilations=dilations,
                interpret=jax.default_backend() not in ("tpu", "axon"))
    return _resblock(rb, x, kernel_size=kernel_size, dilations=dilations,
                     use_int8=use_int8)


def generator(p: Params, cfg: ModelConfig, x, g, *,
              use_pallas: bool = False, use_int8: bool = False):
    """Plain HiFi-GAN decode for f0-less models (reference
    synthesizers.py:21-67 Generator; selected when use_f0 is false,
    synthesizers.py:424).  x: (B, T, inter); g: (B, 1, gin) or None."""
    x = conv1d(x, p["conv_pre"]["w"], p["conv_pre"]["b"], padding=3)
    if g is not None and "cond" in p:
        x = x + linear(g, p["cond"]["w"], p["cond"]["b"])
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        # plain Generator: symmetric padding, no output_padding (:30)
        x = conv_transpose1d(x, p["ups"][i]["w"], p["ups"][i]["b"],
                             stride=u, padding=(k - u) // 2)
        x = _resblock_group(p, x, [i * nk + j for j in range(nk)],
                            kernels=cfg.resblock_kernel_sizes,
                            dilations=cfg.resblock_dilation_sizes,
                            use_pallas=use_pallas, use_int8=use_int8)
    x = leaky_relu(x, 0.01)   # torch F.leaky_relu default (:56)
    x = conv1d(x, p["conv_post"]["w"], None, padding=3)  # bias=False
    return jnp.tanh(x)


def generator_nsf(p: Params, cfg: ModelConfig, x, f0, g, sine_noise, *,
                  use_pallas: bool = False,
                  use_int8: bool = False):
    """NSF-HiFiGAN decode. x: (B, T, inter); f0: (B, T) Hz; g: (B, 1, gin);
    sine_noise: (B, T*upp, 1). Returns waveform (B, T*upp, 1).

    use_pallas: run each resblock chain as one fused Pallas kernel
    (ops/pallas_resblock.py) on the stages whose weights fit VMEM —
    inference paths only (no VJP defined)."""
    from ..ops.int8_conv import Int8Ctx

    if isinstance(use_int8, Int8Ctx):
        use_int8.reset_sites()   # site order restarts with each decode
    har = source_module(p["source"], f0, sine_noise, upp=cfg.upp,
                        sample_rate=cfg.sr)                     # (B, T*upp, 1)
    # sine phase accumulation is fp32 regardless of compute dtype; cast
    # the source down so bf16 fast mode doesn't up-promote the conv stack
    har = har.astype(x.dtype)
    x = conv1d(x, p["conv_pre"]["w"], p["conv_pre"]["b"], padding=3)
    if g is not None:
        x = x + linear(g, p["cond"]["w"], p["cond"]["b"])

    nk = len(cfg.resblock_kernel_sizes)
    for i, st in enumerate(_stage_paddings(cfg)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(x, p["ups"][i]["w"], p["ups"][i]["b"],
                             stride=st["u"], padding=st["convt_pad"],
                             output_padding=st["out_pad"])
        x = x + conv1d(har, p["noise_convs"][i]["w"], p["noise_convs"][i]["b"],
                       stride=st["noise_stride"], padding=st["noise_pad"])
        x = _resblock_group(p, x, [i * nk + j for j in range(nk)],
                            kernels=cfg.resblock_kernel_sizes,
                            dilations=cfg.resblock_dilation_sizes,
                            use_pallas=use_pallas,
                            use_int8=use_int8)

    x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope here (ref :161)
    x = conv1d(x, p["conv_post"]["w"], None, padding=3)  # bias=False
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Full synthesizer
# ---------------------------------------------------------------------------

def infer_any(params: Params, cfg: ModelConfig, phone, phone_lengths, pitch,
              nsff0, sid, rng, *, use_pallas: bool = False,
              use_int8: bool = False):
    """Inference with decoder dispatch on cfg.vocoder (Default NSF /
    MRF HiFi-GAN / RefineGAN), PRNG-driven noise (production mode).

    Returns waveform (B, T*upp, 1)."""
    b, t = nsff0.shape
    k_z, k_src, k_ini, k_adain = jax.random.split(rng, 4)
    g = embedding(params["emb_g"]["w"], sid)[:, None, :]
    m_p, logs_p, x_mask = text_encoder(params["enc_p"], cfg, phone, pitch,
                                       phone_lengths)
    z_noise = jax.random.normal(k_z, m_p.shape, m_p.dtype)
    z_p = (m_p + jnp.exp(logs_p) * z_noise * 0.66666) * x_mask
    z = flow(params["flow"], z_p, x_mask, g, reverse=True) * x_mask

    if not cfg.use_f0:
        # f0-less models decode with the plain Generator regardless of
        # vocoder (reference synthesizers.py:424)
        return generator(params["dec"], cfg, z, g, use_pallas=use_pallas,
                         use_int8=use_int8)

    voc_name = cfg.vocoder
    if voc_name in ("MRF HiFi-GAN", "MRF-HiFi-GAN"):
        from . import vocoders as voc

        noise = jax.random.normal(k_src, (b, t * cfg.upp, 9), z.dtype)
        rand_ini = jax.random.uniform(k_ini, (b, 9)).at[:, 0].set(0.0)
        return voc.mrf_hifigan(params["dec"], cfg, z, nsff0, g, noise,
                               rand_ini)
    if voc_name == "RefineGAN":
        from . import vocoders as voc

        noise = jax.random.normal(k_src, (b, t * cfg.upp, 1), z.dtype)
        rand_ini = jax.random.uniform(k_ini, (b, 1)).at[:, 0].set(0.0)
        adain_noises = []
        ch = cfg.upsample_initial_channel
        t_cur = t
        keys = jax.random.split(k_adain, 6 * len(cfg.upsample_rates))
        ki = iter(keys)
        for rate in cfg.upsample_rates:
            ch = ch // 2
            t_cur = t_cur * rate
            stage = []
            for _ in range(3):
                stage.append((jax.random.normal(next(ki), (b, t_cur, ch), z.dtype),
                              jax.random.normal(next(ki), (b, t_cur, ch), z.dtype)))
            adain_noises.append(stage)
        return voc.refinegan(params["dec"], cfg, z, nsff0, g, noise,
                             adain_noises, rand_ini)
    sine_noise = jax.random.normal(k_src, (b, t * cfg.upp, 1), z.dtype)
    return generator_nsf(params["dec"], cfg, z, nsff0, g, sine_noise,
                         use_pallas=use_pallas, use_int8=use_int8)


def infer(params: Params, cfg: ModelConfig, phone, phone_lengths, pitch,
          nsff0, sid, z_noise, sine_noise, *, use_pallas: bool = False,
          use_int8: bool = False):
    """Inference path (reference synthesizers.py:446-465).

    phone: (B, T, emb_dim); pitch: (B, T) int or None; nsff0: (B, T) Hz;
    sid: (B,) int; z_noise: (B, T, inter) N(0,1); sine_noise: (B, T*upp, 1).
    Returns (waveform (B, T*upp, 1), x_mask, (z, z_p, m_p, logs_p)).
    """
    g = embedding(params["emb_g"]["w"], sid)[:, None, :]  # (B, 1, gin)
    m_p, logs_p, x_mask = text_encoder(params["enc_p"], cfg, phone, pitch,
                                       phone_lengths)
    z_p = (m_p + jnp.exp(logs_p) * z_noise * 0.66666) * x_mask
    z = flow(params["flow"], z_p, x_mask, g, reverse=True)
    if cfg.use_f0:
        o = generator_nsf(params["dec"], cfg, z * x_mask, nsff0, g,
                          sine_noise, use_pallas=use_pallas,
                          use_int8=use_int8)
    else:
        o = generator(params["dec"], cfg, z * x_mask, g,
                      use_pallas=use_pallas, use_int8=use_int8)
    return o, x_mask, (z, z_p, m_p, logs_p)


def _decode_train(dec: Params, cfg: ModelConfig, z_slice, pitchf_slice, g,
                  rng):
    """Training-time decode with vocoder dispatch and PRNG-driven noise
    (reference Synthesizer.forward picks self.dec, synthesizers.py:419-
    424; the alt vocoders draw their own noise via torch.randn)."""
    b, seg = pitchf_slice.shape
    voc = cfg.vocoder
    if voc in ("MRF HiFi-GAN", "MRF-HiFi-GAN"):
        from . import vocoders as voc_mod

        k_src, k_ini = jax.random.split(rng)
        noise = jax.random.normal(k_src, (b, seg * cfg.upp, 9),
                                  z_slice.dtype)
        rand_ini = jax.random.uniform(k_ini, (b, 9)).at[:, 0].set(0.0)
        return voc_mod.mrf_hifigan(dec, cfg, z_slice, pitchf_slice, g,
                                   noise, rand_ini)
    if voc == "RefineGAN":
        from . import vocoders as voc_mod

        keys = jax.random.split(rng, 2 + 6 * len(cfg.upsample_rates))
        noise = jax.random.normal(keys[0], (b, seg * cfg.upp, 1),
                                  z_slice.dtype)
        rand_ini = jax.random.uniform(keys[1], (b, 1)).at[:, 0].set(0.0)
        adain_noises = []
        ch = cfg.upsample_initial_channel
        t_cur = seg
        ki = iter(keys[2:])
        for rate in cfg.upsample_rates:
            ch = ch // 2
            t_cur = t_cur * rate
            stage = [(jax.random.normal(next(ki), (b, t_cur, ch),
                                        z_slice.dtype),
                      jax.random.normal(next(ki), (b, t_cur, ch),
                                        z_slice.dtype))
                     for _ in range(3)]
            adain_noises.append(stage)
        return voc_mod.refinegan(dec, cfg, z_slice, pitchf_slice, g, noise,
                                 adain_noises, rand_ini)
    sine_noise = jax.random.normal(rng, (b, seg * cfg.upp, 1), z_slice.dtype)
    return generator_nsf(dec, cfg, z_slice, pitchf_slice, g, sine_noise)


def train_forward(params: Params, cfg: ModelConfig, phone, phone_lengths,
                  pitch, pitchf, y, y_lengths, ds, rng):
    """Training path (reference synthesizers.py:434-443).

    y: (B, T_spec, spec_channels) linear spectrogram; pitchf: (B, T_spec) Hz.
    Returns (y_hat, ids_slice, x_mask, y_mask,
             (z, z_flowed, m_p, logs_p, m_q, logs_q)).
    """
    k_post, k_slice, k_sine = jax.random.split(rng, 3)
    g = embedding(params["emb_g"]["w"], ds)[:, None, :]
    m_p, logs_p, x_mask = text_encoder(params["enc_p"], cfg, phone, pitch,
                                       phone_lengths)
    post_noise = jax.random.normal(k_post, (y.shape[0], y.shape[1],
                                            cfg.inter_channels), y.dtype)
    z, m_q, logs_q, y_mask = posterior_encoder(params["enc_q"], cfg, y,
                                               y_lengths, g, post_noise)
    seg = cfg.segment_size
    z_slice, ids_slice = rand_slice_segments(k_slice, z, y_lengths, seg)
    if cfg.use_f0:
        pitchf_slice = slice_segments(pitchf, ids_slice, seg)
        y_hat = _decode_train(params["dec"], cfg, z_slice, pitchf_slice, g,
                              k_sine)
    else:
        y_hat = generator(params["dec"], cfg, z_slice, g)
    z_flowed = flow(params["flow"], z, y_mask, g, reverse=False)
    return y_hat, ids_slice, x_mask, y_mask, (z, z_flowed, m_p, logs_p, m_q, logs_q)


# ---------------------------------------------------------------------------
# Parameter initialization (for training from scratch)
# ---------------------------------------------------------------------------

def _torch_conv_init(key, k, cin, cout, groups=1, gain_std=None):
    """Default torch Conv1d init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in)·sqrt(3)·?,·)
    — effectively U(-b, b) with b = 1/sqrt(cin*k) * sqrt(3) * sqrt(2/(1+5)) ≈ 1/sqrt(cin*k).
    We use U(-1/sqrt(fan_in), 1/sqrt(fan_in)) which matches torch's bound."""
    fan_in = cin * k
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (k, cin // groups if groups > 1 else cin, cout),
                           minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (cout,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _normal_conv_init(key, k, cin, cout, std=0.01):
    """Reference init_weights: normal(0, 0.01) (commons.py:5-6)."""
    wkey, bkey = jax.random.split(key)
    return {"w": jax.random.normal(wkey, (k, cin, cout)) * std,
            "b": jnp.zeros((cout,))}


def _linear_init(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    wkey, bkey = jax.random.split(key)
    return {"w": jax.random.uniform(wkey, (cin, cout), minval=-bound, maxval=bound),
            "b": jax.random.uniform(bkey, (cout,), minval=-bound, maxval=bound)}


def _ln_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}


def _wavenet_init(key, hidden, kernel_size, n_layers, gin):
    keys = jax.random.split(key, 2 * n_layers + 1)
    p = {"in_layers": [], "res_skip": []}
    for i in range(n_layers):
        p["in_layers"].append(_torch_conv_init(keys[2 * i], kernel_size, hidden, 2 * hidden))
        rs = hidden if i == n_layers - 1 else 2 * hidden
        p["res_skip"].append(_linear_init(keys[2 * i + 1], hidden, rs))
    if gin:
        p["cond"] = _linear_init(keys[-1], gin, 2 * hidden * n_layers)
    return p


def init_params(key, cfg: ModelConfig) -> Params:
    """Initialize a full synthesizer parameter tree (training from scratch)."""
    h = cfg.hidden_channels
    inter = cfg.inter_channels
    keys = iter(jax.random.split(key, 256))

    # enc_p
    enc_layers = []
    k_ch = h // cfg.n_heads
    for _ in range(cfg.n_layers):
        lkey = next(keys)
        a, bk, c, d, e = jax.random.split(lkey, 5)
        attn = {
            "q": _linear_init(a, h, h), "k": _linear_init(bk, h, h),
            "v": _linear_init(c, h, h), "o": _linear_init(d, h, h),
            "emb_rel_k": jax.random.normal(e, (1, 2 * cfg.rel_attn_window_size + 1, k_ch)) * k_ch ** -0.5,
            "emb_rel_v": jax.random.normal(next(keys), (1, 2 * cfg.rel_attn_window_size + 1, k_ch)) * k_ch ** -0.5,
        }
        ffn_p = {"conv1": _torch_conv_init(next(keys), cfg.kernel_size, h, cfg.filter_channels),
                 "conv2": _torch_conv_init(next(keys), cfg.kernel_size, cfg.filter_channels, h)}
        enc_layers.append({"attn": attn, "norm1": _ln_init(h), "ffn": ffn_p,
                           "norm2": _ln_init(h)})
    enc_p = {
        "emb_phone": _linear_init(next(keys), cfg.text_enc_hidden_dim, h),
        "encoder": {"layers": enc_layers},
        "proj": _linear_init(next(keys), h, 2 * inter),
    }
    if cfg.use_f0:
        enc_p["emb_pitch"] = {"w": jax.random.normal(next(keys), (256, h))}

    # flow: 4 couplings
    flow_layers = []
    for _ in range(4):
        flow_layers.append({
            "pre": _linear_init(next(keys), inter // 2, h),
            "enc": _wavenet_init(next(keys), h, 5, 3, cfg.gin_channels),
            "post": {"w": jnp.zeros((h, inter // 2)), "b": jnp.zeros((inter // 2,))},
        })

    # enc_q
    enc_q = {
        "pre": _linear_init(next(keys), cfg.spec_channels, h),
        "enc": _wavenet_init(next(keys), h, 5, 16, cfg.gin_channels),
        "proj": _linear_init(next(keys), h, 2 * inter),
    }

    # dec — vocoder dispatch (reference synthesizers.py:419-424)
    if cfg.use_f0 and cfg.vocoder in ("MRF HiFi-GAN", "MRF-HiFi-GAN"):
        from .vocoders import mrf_init_params

        dec_override = mrf_init_params(next(keys), cfg)
    elif cfg.use_f0 and cfg.vocoder == "RefineGAN":
        from .vocoders import refinegan_init_params

        dec_override = refinegan_init_params(next(keys), cfg)
    else:
        dec_override = None

    # dec (NSF-HiFiGAN)
    uic = cfg.upsample_initial_channel
    channels = [uic // (2 ** (i + 1)) for i in range(len(cfg.upsample_rates))]
    ups, noise_convs, resblocks = [], [], []
    for i, st in enumerate(_stage_paddings(cfg)):
        cin = uic // (2 ** i)
        # torch ConvTranspose1d weight (Cin, Cout, K); ours (K, Cin, Cout);
        # reference applies init_weights (normal 0.01) to ups
        wkey = next(keys)
        ups.append({"w": jax.random.normal(wkey, (st["k"], cin, channels[i])) * 0.01,
                    "b": jnp.zeros((channels[i],))})
        noise_convs.append(_torch_conv_init(next(keys), st["noise_kernel"], 1, channels[i]))
        for ks, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            rb = {"convs1": [], "convs2": []}
            for _ in ds:
                rb["convs1"].append(_normal_conv_init(next(keys), ks, channels[i], channels[i]))
                rb["convs2"].append(_normal_conv_init(next(keys), ks, channels[i], channels[i]))
            resblocks.append(rb)
    dec = {
        "conv_pre": _torch_conv_init(next(keys), 7, inter, uic),
        "cond": _linear_init(next(keys), cfg.gin_channels, uic),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": {"w": jax.random.normal(next(keys), (7, channels[-1], 1)) * 0.01},
    }
    if cfg.use_f0:
        # harmonic source path exists only on the NSF decoder
        dec["noise_convs"] = noise_convs
        dec["source"] = {"l_linear": _linear_init(next(keys), 1, 1)}
    if dec_override is not None:
        dec = dec_override

    return {
        "enc_p": enc_p,
        "enc_q": enc_q,
        "flow": {"layers": flow_layers},
        "dec": dec,
        "emb_g": {"w": jax.random.normal(next(keys), (cfg.spk_embed_dim, cfg.gin_channels))},
    }
