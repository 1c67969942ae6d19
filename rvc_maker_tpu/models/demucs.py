"""Demucs v4 family in JAX — HDemucs / HTDemucs source separation.

Re-implements the reference's vendored demucs (main/library/uvr5_separator/
demucs/{demucs,hdemucs,htdemucs}.py) for inference over the models the
toolkit ships: htdemucs / htdemucs_ft / htdemucs_6s (hybrid transformer)
and hdemucs_mmi (hybrid spectrogram, BLSTM+LocalState dconv branches).

Layouts: frequency-domain activations (B, F, T, C) [NHWC], time-domain
(B, T, C).  Both output paths are implemented: cac (complex-as-channels,
every shipped demucs model) and magnitude-mask checkpoints via Wiener-EM
filtering (expectation_maximization / wiener / wiener_mask below).

Numerics kept from the reference: normalized STFT (1/sqrt(n_fft)),
reflect pad1d with short-input fallback, GroupNorm(1) over (C, spatial),
GLU over channels, LayerScale, frequency ScaledEmbedding, 2D/1D
sinusoidal transformer embeddings, norm-first transformer layers with
GroupNorm(1) output norms.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import linear
from ..ops.stft import hann_window

Params = Any


# ---------------------------------------------------------------------------
# spectral helpers (reference hdemucs.py spectro/ispectro/pad1d)
# ---------------------------------------------------------------------------

def _pad1d(x, pad_left: int, pad_right: int, mode: str = "constant"):
    """Reflect-safe padding on the last axis (reference pad1d)."""
    length = x.shape[-1]
    if mode == "reflect":
        max_pad = max(pad_left, pad_right)
        if length <= max_pad:
            extra = max_pad - length + 1
            extra_right = min(pad_right, extra)
            extra_left = extra - extra_right
            pads = [(0, 0)] * (x.ndim - 1) + [(extra_left, extra_right)]
            x = jnp.pad(x, pads)
            pad_left -= extra_left
            pad_right -= extra_right
    pads = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
    return jnp.pad(x, pads, mode=mode)


def _spectro(x, n_fft: int, hop: int):
    """torch.stft(normalized=True, center=True, reflect) on the last axis.
    x: (..., L) -> complex (..., F, T)."""
    shape = x.shape
    x = x.reshape(-1, shape[-1])
    p = n_fft // 2
    y = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y[:, idx] * jnp.asarray(hann_window(n_fft))
    z = jnp.fft.rfft(frames, n=n_fft, axis=-1) * (n_fft ** -0.5)
    z = z.transpose(0, 2, 1)                     # (B', F, T)
    return z.reshape(*shape[:-1], z.shape[-2], z.shape[-1])


def _ispectro(z, hop: int, length: int):
    """torch.istft(normalized=True, center=True). z: (..., F, T) -> (..., length)."""
    shape = z.shape
    freqs, frames = shape[-2], shape[-1]
    n_fft = 2 * freqs - 2
    z = z.reshape(-1, freqs, frames).transpose(0, 2, 1)   # (B', T, F)
    win = jnp.asarray(hann_window(n_fft))
    t = jnp.fft.irfft(z, n=n_fft, axis=-1) * (n_fft ** 0.5) * win
    total = (frames - 1) * hop + n_fft
    idx = jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    y = jnp.zeros((t.shape[0], total), t.dtype).at[:, idx].add(t)
    norm = jnp.zeros((total,), win.dtype).at[idx].add(jnp.square(win))
    y = y / jnp.maximum(norm, 1e-11)
    p = n_fft // 2
    y = y[:, p : p + length]
    return y.reshape(*shape[:-2], length)


# ---------------------------------------------------------------------------
# normalization / small blocks
# ---------------------------------------------------------------------------

def _group_norm1(x, gamma, beta, eps: float = 1e-5, groups: int = 1):
    """torch GroupNorm with channels LAST: per-(sample, group) stats over
    (group channels + all spatial axes)."""
    if groups == 1:
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    shape = x.shape
    c = shape[-1]
    xg = x.reshape(*shape[:-1], groups, c // groups)
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(shape) * gamma + beta


def _maybe_norm(p, x):
    if p is None:
        return x
    return _group_norm1(x, p["gamma"], p["beta"], groups=p.get("groups", 1))


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv1d_nt(x, p, *, stride=1, dilation=1, padding=0, groups=1):
    from ..ops.nn import conv1d

    return conv1d(x, p["w"], p.get("b"), stride=stride, dilation=dilation,
                  padding=padding, groups=groups)


def _conv2d_f(x, p, *, stride=(1, 1), padding=(0, 0)):
    """NHWC 2D conv; kernel already HWIO."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _convt2d_f(x, p, *, stride=(1, 1)):
    """ConvTranspose2d (no padding). kernel pre-flipped HWIO (I=Cin)."""
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _convt1d_t(x, p, *, stride=1):
    from ..ops.nn import conv_transpose1d

    return conv_transpose1d(x, p["w"], p.get("b"), stride=stride, padding=0)


# ---------------------------------------------------------------------------
# DConv branch (reference demucs.py:86-115) + LocalState + BLSTM
# ---------------------------------------------------------------------------

def _lstm_dir(x, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """x: (B, T, I) -> (B, T, H); torch LSTM gate order i, f, g, o."""
    hdim = w_hh.shape[1]
    xg = jnp.einsum("bti,gi->btg", x, w_ih) + b_ih

    def step(carry, xg_t):
        h, c = carry
        g = xg_t + h @ w_hh.T + b_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    b = x.shape[0]
    init = (jnp.zeros((b, hdim), x.dtype), jnp.zeros((b, hdim), x.dtype))
    _, ys = jax.lax.scan(step, init, xg.transpose(1, 0, 2), reverse=reverse)
    return ys.transpose(1, 0, 2)


def _blstm_apply(p, x):
    """2-layer bidirectional LSTM + linear, framed at max_steps=200 with
    half-overlap stitching (reference demucs.py BLSTM, skip=True).
    x: (B, T, C)."""
    btc = x
    b, t, c = x.shape
    max_steps = 200
    framed = t > max_steps
    if framed:
        width = max_steps
        stride = width // 2
        nframes = int(math.ceil((t - width) / stride)) + 1
        total = stride * (nframes - 1) + width
        xp = jnp.pad(x, ((0, 0), (0, total - t), (0, 0)))
        idx = jnp.arange(nframes)[:, None] * stride + jnp.arange(width)[None, :]
        x = xp[:, idx].reshape(b * nframes, width, c)

    h = x
    for layer in p["layers"]:
        fwd = _lstm_dir(h, layer["w_ih"], layer["w_hh"], layer["b_ih"],
                        layer["b_hh"], False)
        bwd = _lstm_dir(h, layer["w_ih_r"], layer["w_hh_r"], layer["b_ih_r"],
                        layer["b_hh_r"], True)
        h = jnp.concatenate([fwd, bwd], axis=-1)
    h = linear(h, p["linear"]["w"], p["linear"]["b"])

    if framed:
        frames = h.reshape(b, nframes, width, c)
        limit = stride // 2
        outs = [frames[:, 0, :-limit]]
        for k in range(1, nframes - 1):
            outs.append(frames[:, k, limit:-limit])
        if nframes > 1:
            outs.append(frames[:, nframes - 1, limit:])
        h = jnp.concatenate(outs, axis=1)[:, :t]
    return h + btc  # skip=True


def _local_state_apply(p, x, *, heads: int = 4, ndecay: int = 4):
    """LocalState decaying local attention (reference demucs.py:117-166).
    x: (B, T, C)."""
    b, t, c = x.shape
    idx = jnp.arange(t, dtype=x.dtype)
    delta = idx[:, None] - idx[None, :]

    def split_heads(v):
        return v.reshape(b, t, heads, -1).transpose(0, 2, 3, 1)  # (B,H,D,T)

    queries = split_heads(linear(x, p["query"]["w"], p["query"]["b"]))
    keys = split_heads(linear(x, p["key"]["w"], p["key"]["b"]))
    dots = jnp.einsum("bhct,bhcs->bhts", keys, queries)
    dots = dots / (keys.shape[2] ** 0.5)

    decays = jnp.arange(1, ndecay + 1, dtype=x.dtype)
    decay_q = split_heads(linear(x, p["query_decay"]["w"], p["query_decay"]["b"]))
    decay_q = jax.nn.sigmoid(decay_q) / 2.0
    decay_kernel = -decays[:, None, None] * jnp.abs(delta) / (ndecay ** 0.5)
    dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel, decay_q)

    eye = jnp.eye(t, dtype=bool)
    dots = jnp.where(eye[None, None], -100.0, dots)
    weights = jax.nn.softmax(dots, axis=2)
    content = split_heads(linear(x, p["content"]["w"], p["content"]["b"]))
    result = jnp.einsum("bhts,bhct->bhcs", weights, content)
    result = result.transpose(0, 3, 1, 2).reshape(b, t, c)
    return x + linear(result, p["proj"]["w"], p["proj"]["b"])


def _dconv_apply(p, x):
    """x: (B, T, C). Residual compressed dilated branches."""
    for layer in p["layers"]:
        y = _conv1d_nt(x, layer["conv1"], dilation=layer["dilation"],
                       padding=layer["dilation"] * (layer["kernel"] // 2))
        y = _maybe_norm(layer.get("norm1"), y)
        y = _gelu(y)
        if "lstm" in layer:
            y = _blstm_apply(layer["lstm"], y)
        if "attn" in layer:
            y = _local_state_apply(layer["attn"], y)
        y = _conv1d_nt(y, layer["conv2"])
        y = _maybe_norm(layer.get("norm2"), y)
        y = _glu(y)
        y = y * layer["scale"]
        x = x + y
    return x


# ---------------------------------------------------------------------------
# encoder / decoder layers (reference hdemucs.py HEncLayer/HDecLayer)
# ---------------------------------------------------------------------------

def _henc_apply(p, x, inject=None):
    """freq variant: x (B, F, T, C); time variant: x (B, T, C)."""
    freq = p["freq"]
    stride = p["stride"]
    if not freq and x.ndim == 4:
        # deepest layer receives the F=1 frequency branch flattened
        # (reference HEncLayer.forward view(B, -1, T))
        b, f, t, c = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(b, t, c * f)
    if freq:
        y = _conv2d_f(x, p["conv"], stride=(stride, 1), padding=(p["pad"], 0))
    else:
        le = x.shape[1]
        if le % stride != 0:
            x = jnp.pad(x, ((0, 0), (0, stride - le % stride), (0, 0)))
        y = _conv1d_nt(x, p["conv"], stride=stride, padding=p["pad"])
    if p.get("empty"):
        return y
    if inject is not None:
        if inject.ndim == 3 and y.ndim == 4:
            inject = inject[:, None]                  # (B, 1, T, C)
        y = y + inject
    y = _gelu(_maybe_norm(p.get("norm1"), y))
    if "dconv" in p:
        if freq:
            b, f, t, c = y.shape
            y2 = y.transpose(0, 1, 2, 3).reshape(b * f, t, c)
            y2 = _dconv_apply(p["dconv"], y2)
            y = y2.reshape(b, f, t, c)
        else:
            y = _dconv_apply(p["dconv"], y)
    if "rewrite" in p:
        w = p["rewrite"]["w"]
        if freq:
            z = _conv2d_f(y, p["rewrite"],
                          padding=(w.shape[0] // 2, w.shape[1] // 2))
        else:
            z = _conv1d_nt(y, p["rewrite"], padding=w.shape[0] // 2)
        z = _maybe_norm(p.get("norm2"), z)
        z = _glu(z)
    else:
        z = y
    return z


def _hdec_apply(p, x, skip, length):
    """Returns (z, pre). freq variant: x (B, F, T, C)."""
    freq = p["freq"]
    stride = p["stride"]
    if freq and x.ndim == 3:
        # reference HDecLayer.forward view(B, chin, -1, T): split channels
        # (chin-major) back into (chin, F)
        b, t, c_total = x.shape
        chin = p["chin"]
        x = x.reshape(b, t, chin, c_total // chin).transpose(0, 3, 1, 2)
    if not p.get("empty"):
        x = x + skip
        if "rewrite" in p:
            w = p["rewrite"]["w"]
            if freq:
                y = _conv2d_f(x, p["rewrite"],
                              padding=(w.shape[0] // 2, w.shape[1] // 2))
            else:
                y = _conv1d_nt(x, p["rewrite"], padding=w.shape[0] // 2)
            y = _glu(_maybe_norm(p.get("norm1"), y))
        else:
            y = x
        if "dconv" in p:
            if freq:
                b, f, t, c = y.shape
                y2 = y.reshape(b * f, t, c)
                y2 = _dconv_apply(p["dconv"], y2)
                y = y2.reshape(b, f, t, c)
            else:
                y = _dconv_apply(p["dconv"], y)
    else:
        y = x
    if freq:
        z = _convt2d_f(y, p["conv_tr"], stride=(stride, 1))
    else:
        z = _convt1d_t(y, p["conv_tr"], stride=stride)
    z = _maybe_norm(p.get("norm2"), z)
    if freq:
        if p["pad"]:
            z = z[:, p["pad"] : -p["pad"], :, :]
    else:
        z = z[:, p["pad"] : p["pad"] + length, :]
    if not p["last"]:
        z = _gelu(z)
    return z, y


# ---------------------------------------------------------------------------
# transformer (reference htdemucs.py)
# ---------------------------------------------------------------------------

def _sin_embedding_1d(length: int, dim: int, max_period: float = 10000.0):
    pos = np.arange(length)[:, None]
    adim = np.arange(dim // 2)[None, :]
    phase = pos / (max_period ** (adim / (dim // 2 - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], axis=-1).astype(np.float32)


def _sin_embedding_2d(d_model: int, height: int, width: int,
                      max_period: float = 10000.0):
    """(height*width tokens in (t, f) order, d_model) matching the
    reference create_2d_sin_embedding + '(t1 fr) c' rearrange."""
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2) * -(math.log(max_period) / half))
    pos_w = np.arange(width)[:, None]
    pos_h = np.arange(height)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div).T[:, :, None].repeat(width, axis=2)
    # (C, F, T) -> tokens (T*F, C), t-major
    return pe.transpose(2, 1, 0).reshape(height * width, d_model)


def _mha_packed(p, q_in, k_in, v_in, n_heads: int):
    """torch nn.MultiheadAttention with packed in_proj."""
    c = q_in.shape[-1]
    wq, wk, wv = p["in_w"][:c], p["in_w"][c : 2 * c], p["in_w"][2 * c :]
    bq, bk, bv = p["in_b"][:c], p["in_b"][c : 2 * c], p["in_b"][2 * c :]
    q = q_in @ wq.T + bq
    k = k_in @ wk.T + bk
    v = v_in @ wv.T + bv
    b, tq, _ = q.shape
    s = k.shape[1]
    d = c // n_heads
    qh = q.reshape(b, tq, n_heads, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    kh = k.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, n_heads, d).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", qh, kh), axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3).reshape(b, tq, c)
    return linear(out, p["out"]["w"], p["out"]["b"])


def _t_layer(p, x, n_heads: int, cross_k=None):
    """norm-first transformer layer (self or cross) with LayerScale and
    GroupNorm(1) output norm (the shipped HTDemucs configuration)."""
    from ..ops.nn import layer_norm

    src = x if cross_k is None else cross_k
    q = layer_norm(x, p["norm1"]["gamma"], p["norm1"]["beta"])
    if cross_k is None:
        k = q
    else:
        k = layer_norm(src, p["norm2k"]["gamma"], p["norm2k"]["beta"]) \
            if "norm2k" in p else src
    attn = _mha_packed(p["attn"], q, k, k, n_heads)
    x = x + attn * p["gamma1"]
    y = layer_norm(x, p["norm2"]["gamma"], p["norm2"]["beta"])
    y = linear(_gelu(linear(y, p["fc1"]["w"], p["fc1"]["b"])),
               p["fc2"]["w"], p["fc2"]["b"])
    x = x + y * p["gamma2"]
    if "norm_out" in p:
        x = _group_norm1(x, p["norm_out"]["gamma"], p["norm_out"]["beta"])
    return x


def _cross_transformer(p, x, xt, n_heads: int):
    """x: (B, F, T, C) freq tokens; xt: (B, T2, C)."""
    from ..ops.nn import layer_norm

    b, f, t1, c = x.shape
    tokens = x.transpose(0, 2, 1, 3).reshape(b, t1 * f, c)
    tokens = layer_norm(tokens, p["norm_in"]["gamma"], p["norm_in"]["beta"])
    tokens = tokens + jnp.asarray(_sin_embedding_2d(c, f, t1))

    xt = layer_norm(xt, p["norm_in_t"]["gamma"], p["norm_in_t"]["beta"])
    xt = xt + jnp.asarray(_sin_embedding_1d(xt.shape[1], c))

    for i, lp in enumerate(p["layers"]):
        if i % 2 == 0:   # classic parity (cross_first=False)
            tokens = _t_layer(lp["z"], tokens, n_heads)
            xt = _t_layer(lp["t"], xt, n_heads)
        else:
            old = tokens
            tokens = _t_layer(lp["z"], tokens, n_heads, cross_k=xt)
            xt = _t_layer(lp["t"], xt, n_heads, cross_k=old)
    x = tokens.reshape(b, t1, f, c).transpose(0, 2, 1, 3)
    return x, xt


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DemucsConfig:
    sources: tuple[str, ...] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    nfft: int = 4096
    depth: int = 4
    stride: int = 4
    kernel_size: int = 8
    time_stride: int = 2
    freq_emb_scale: float = 0.2
    cac: bool = True
    wiener_iters: int = 0
    wiener_residual: bool = False
    has_transformer: bool = True
    t_heads: int = 8
    samplerate: int = 44100
    segment: float = 40.0
    use_train_segment: bool = True


# ---------------------------------------------------------------------------
# Wiener EM filtering (non-cac checkpoints)
# ---------------------------------------------------------------------------
#
# Reference hdemucs.py:111-168 expectation_maximization and :170-188
# wiener (openunmix-style split-real complex arithmetic with per-frame
# python loops).  TPU-native: native complex dtypes, everything a single
# einsum contraction over the whole window — no per-source or
# per-channel-pair loops; frames are windowed in fixed 300-frame chunks
# (zero-padded, which provably leaves the EM statistics unchanged) so
# the program is one static-shape jit.


def _invert_2x2(m):
    """Batched complex 2x2 (or 1x1) matrix inverse, last two dims."""
    if m.shape[-1] == 1:
        return 1.0 / m
    det = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    inv_det = 1.0 / det
    row0 = jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1)
    row1 = jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1)
    return inv_det[..., None, None] * jnp.stack([row0, row1], axis=-2)


def expectation_maximization(y, x, iterations: int = 2, eps: float = 1e-10):
    """y: (T, F, C, S) complex source estimates; x: (T, F, C) complex
    mix.  Returns refined y (reference hdemucs.py:111-168)."""
    c = x.shape[-1]
    reg = jnp.sqrt(jnp.asarray(eps, jnp.float32)) * jnp.eye(c, dtype=x.dtype)
    for _ in range(iterations):
        v = jnp.mean(jnp.abs(y) ** 2, axis=2)                    # (T, F, S)
        weight = eps + jnp.sum(v, axis=0)                        # (F, S)
        cov = jnp.einsum("tfcs,tfds->fcds", y, jnp.conj(y))
        r = cov / weight[:, None, None, :]                       # (F, C, C, S)
        cxx = reg[None, None] + jnp.einsum("tfs,fcds->tfcd", v, r)
        inv = _invert_2x2(cxx)
        # y_j = v_j * (R_j @ inv_Cxx) @ x   (hdemucs.py:152-166)
        y = jnp.einsum("fcds,tfde,tfs,tfe->tfcs", r, inv, v, x)
    return y


def wiener(mag_spectrograms, mix_stft, iterations: int = 1, *,
           softmask: bool = False, residual: bool = False,
           scale_factor: float = 10.0, eps: float = 1e-10):
    """mag_spectrograms: (T, F, C, S) non-negative per-channel source
    magnitudes; mix_stft: (T, F, C) complex.  Returns
    (T, F, C, S[+1 if residual]) complex (reference hdemucs.py:170-188)."""
    if softmask:
        mask = mag_spectrograms / (eps + jnp.sum(mag_spectrograms, axis=-1,
                                                 keepdims=True))
        y = mix_stft[..., None] * mask
    else:
        angle = jnp.angle(mix_stft)[..., None]
        y = (mag_spectrograms * jnp.exp(1j * angle)).astype(mix_stft.dtype)
    if residual:
        y = jnp.concatenate(
            [y, mix_stft[..., None] - jnp.sum(y, axis=-1, keepdims=True)],
            axis=-1)
    if iterations == 0:
        return y
    max_abs = jnp.maximum(1.0, jnp.sqrt(jnp.max(jnp.abs(mix_stft) ** 2))
                          / scale_factor)
    y = expectation_maximization(y / max_abs, mix_stft / max_abs,
                                 iterations, eps=eps)
    return y * max_abs


def wiener_mask(mag_out, mix_stft, niters: int, residual: bool = False,
                win_len: int = 300):
    """Windowed wiener over a full track (reference _wiener,
    hdemucs.py:651-677).  mag_out: (B, S, C, F, T) magnitudes;
    mix_stft: (B, C, F, T) complex -> (B, S, C, F, T) complex."""
    b, s, c, fq, t = mag_out.shape
    mags = mag_out.transpose(0, 4, 3, 2, 1)          # (B, T, F, C, S)
    mix = mix_stft.transpose(0, 3, 2, 1)             # (B, T, F, C)
    outs = []
    for bi in range(b):
        chunks = []
        for pos in range(0, t, win_len):
            m_chunk = mags[bi, pos : pos + win_len]
            x_chunk = mix[bi, pos : pos + win_len]
            n = m_chunk.shape[0]
            if n < win_len:
                # zero frames add nothing to the EM covariances/weights
                # and their outputs are discarded -> exact
                m_chunk = jnp.pad(m_chunk, ((0, win_len - n),) +
                                  ((0, 0),) * 3)
                x_chunk = jnp.pad(x_chunk, ((0, win_len - n),) +
                                  ((0, 0),) * 2)
            z = _wiener_win(m_chunk, x_chunk, niters, residual)
            chunks.append(z[:n])
        outs.append(jnp.concatenate(chunks, axis=0))
    out = jnp.stack(outs, axis=0)                    # (B, T, F, C, S')
    if residual:
        out = out[..., :-1]
    return out.transpose(0, 4, 3, 2, 1)              # (B, S, C, F, T)


@partial(jax.jit, static_argnums=(2, 3))
def _wiener_win(m_chunk, x_chunk, niters, residual):
    return wiener(m_chunk, x_chunk, niters, residual=residual)


def apply_model_single(params: Params, cfg: DemucsConfig, mix):
    """mix: (B, audio_channels, L) -> (B, n_sources, audio_channels, L)."""
    length = mix.shape[-1]
    if cfg.use_train_segment:
        training_length = int(cfg.segment * cfg.samplerate)
        if length < training_length:
            mix = jnp.pad(mix, ((0, 0), (0, 0), (0, training_length - length)))
    cur_len = mix.shape[-1]

    hop = cfg.nfft // 4
    le = int(math.ceil(cur_len / hop))
    pad = hop // 2 * 3
    padded = _pad1d(mix, pad, pad + le * hop - cur_len, mode="reflect")
    z = _spectro(padded, cfg.nfft, hop)[..., :-1, :]
    z = z[..., 2 : 2 + le]

    b, c, fq, t = z.shape
    if cfg.cac:
        # complex-as-channels: (B, C, F, T) complex -> (B, F, T, 2C)
        mag = jnp.stack([z.real, z.imag], axis=2).reshape(b, c * 2, fq, t)
        x = mag.transpose(0, 2, 3, 1)               # (B, F, T, 2C)
    else:
        # magnitude input; phases return via wiener (hdemucs.py:627-649)
        x = jnp.abs(z).transpose(0, 2, 3, 1)        # (B, F, T, C)

    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1)
    x = (x - mean) / (1e-5 + std)

    xt = mix.transpose(0, 2, 1)                     # (B, L, C)
    meant = jnp.mean(xt, axis=(1, 2), keepdims=True)
    stdt = jnp.std(xt, axis=(1, 2), keepdims=True, ddof=1)
    xt = (xt - meant) / (1e-5 + stdt)

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx, enc in enumerate(params["encoder"]):
        lengths.append(x.shape[2] if x.ndim == 4 else x.shape[1])
        inject = None
        if idx < len(params["tencoder"]):
            lengths_t.append(xt.shape[1])
            tenc = params["tencoder"][idx]
            xt = _henc_apply(tenc, xt)
            if not tenc.get("empty"):
                saved_t.append(xt)
            else:
                inject = xt
        x = _henc_apply(enc, x, inject)
        if idx == 0 and "freq_emb" in params:
            emb = jnp.asarray(params["freq_emb"])    # (F, C)
            x = x + cfg.freq_emb_scale * emb[None, :, None, :]
        saved.append(x)

    if cfg.has_transformer:
        # HTDemucs: the transformer outputs feed the decoders directly
        x, xt = _cross_transformer(params["transformer"], x, xt, cfg.t_heads)
    else:
        # HDemucs: decoders accumulate from zero (reference hdemucs
        # forward zeroes both bottoms; the skip connections carry signal)
        x = jnp.zeros_like(saved[-1])
        xt = None  # first time-decoder input comes from `pre` (empty layer)

    depth = cfg.depth
    for idx, dec in enumerate(params["decoder"]):
        skip = saved.pop(-1)
        x, pre = _hdec_apply(dec, x, skip, lengths.pop(-1))
        offset = depth - len(params["tdecoder"])
        if idx >= offset:
            tdec = params["tdecoder"][idx - offset]
            length_t = lengths_t.pop(-1)
            if tdec.get("empty"):
                pre2 = pre[:, 0]                     # (B, T, C)
                xt, _ = _hdec_apply(tdec, pre2, None, length_t)
            else:
                skip_t = saved_t.pop(-1)
                xt, _ = _hdec_apply(tdec, xt, skip_t, length_t)

    s = len(cfg.sources)
    x = x * std + mean
    x = x.transpose(0, 3, 1, 2)                     # (B, S*{2C|C}, F, T)
    if cfg.cac:
        # x: (B, S*2C, F, T) -> (B, S, C, F, T) complex
        x = x.reshape(b, s, cfg.audio_channels, 2, fq, t)
        zout = x[:, :, :, 0] + 1j * x[:, :, :, 1]
    else:
        # masks/magnitudes -> complex via normalized-mix phase or
        # Wiener EM (reference _mask, hdemucs.py:636-649)
        m = x.reshape(b, s, cfg.audio_channels, fq, t)
        if cfg.wiener_iters < 0:
            zout = z[:, None] / (1e-8 + jnp.abs(z)[:, None]) * m
        else:
            zout = wiener_mask(m, z, cfg.wiener_iters,
                               cfg.wiener_residual)

    # inverse spec
    zp = jnp.pad(zout, ((0, 0),) * 3 + ((0, 1), (2, 2)))
    le2 = hop * int(math.ceil(cur_len / hop)) + 2 * pad
    xs = _ispectro(zp, hop, le2)
    xs = xs[..., pad : pad + cur_len]

    xt = xt.transpose(0, 2, 1).reshape(b, s, cfg.audio_channels, cur_len)
    xt = xt * stdt.reshape(b, 1, 1, 1) + meant.reshape(b, 1, 1, 1)
    out = xs + xt
    return out[..., :length]


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def _imp_lin(sd, prefix):
    out = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _imp_conv1d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cout, Cin, K)
    out = {"w": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _imp_conv2d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cout, Cin, Kh, Kw)
    out = {"w": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _imp_convt1d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cin, Cout, K)
    out = {"w": np.transpose(w, (2, 0, 1))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _imp_convt2d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cin, Cout, Kh, Kw)
    w = np.flip(w, axis=(2, 3))
    out = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _imp_norm(sd, prefix, groups=1):
    if f"{prefix}.weight" not in sd:
        return None
    return {"gamma": _np(sd[f"{prefix}.weight"]),
            "beta": _np(sd[f"{prefix}.bias"]), "groups": groups}


def _imp_dconv(sd, prefix):
    if f"{prefix}.layers.0.0.weight" not in sd:
        return None
    layers = []
    d = 0
    while f"{prefix}.layers.{d}.0.weight" in sd:
        lp = f"{prefix}.layers.{d}"
        w = _np(sd[f"{lp}.0.weight"])
        layer = {
            "conv1": _imp_conv1d(sd, f"{lp}.0"),
            "norm1": _imp_norm(sd, f"{lp}.1"),
            "kernel": w.shape[-1],
            "dilation": 2 ** d,
        }
        # optional BLSTM / LocalState inserted after the activation
        idx = 3
        if f"{lp}.{idx}.lstm.weight_ih_l0" in sd:
            lstm_layers = []
            li = 0
            while f"{lp}.{idx}.lstm.weight_ih_l{li}" in sd:
                lstm_layers.append({
                    "w_ih": _np(sd[f"{lp}.{idx}.lstm.weight_ih_l{li}"]),
                    "w_hh": _np(sd[f"{lp}.{idx}.lstm.weight_hh_l{li}"]),
                    "b_ih": _np(sd[f"{lp}.{idx}.lstm.bias_ih_l{li}"]),
                    "b_hh": _np(sd[f"{lp}.{idx}.lstm.bias_hh_l{li}"]),
                    "w_ih_r": _np(sd[f"{lp}.{idx}.lstm.weight_ih_l{li}_reverse"]),
                    "w_hh_r": _np(sd[f"{lp}.{idx}.lstm.weight_hh_l{li}_reverse"]),
                    "b_ih_r": _np(sd[f"{lp}.{idx}.lstm.bias_ih_l{li}_reverse"]),
                    "b_hh_r": _np(sd[f"{lp}.{idx}.lstm.bias_hh_l{li}_reverse"]),
                })
                li += 1
            layer["lstm"] = {"layers": lstm_layers,
                             "linear": _imp_lin(sd, f"{lp}.{idx}.linear")}
            idx += 1
        if f"{lp}.{idx}.content.weight" in sd:
            layer["attn"] = {
                "content": {"w": _np(sd[f"{lp}.{idx}.content.weight"])[:, :, 0].T,
                            "b": _np(sd[f"{lp}.{idx}.content.bias"])},
                "query": {"w": _np(sd[f"{lp}.{idx}.query.weight"])[:, :, 0].T,
                          "b": _np(sd[f"{lp}.{idx}.query.bias"])},
                "key": {"w": _np(sd[f"{lp}.{idx}.key.weight"])[:, :, 0].T,
                        "b": _np(sd[f"{lp}.{idx}.key.bias"])},
                "query_decay": {"w": _np(sd[f"{lp}.{idx}.query_decay.weight"])[:, :, 0].T,
                                "b": _np(sd[f"{lp}.{idx}.query_decay.bias"])},
                "proj": {"w": _np(sd[f"{lp}.{idx}.proj.weight"])[:, :, 0].T,
                         "b": _np(sd[f"{lp}.{idx}.proj.bias"])},
            }
            idx += 1
        layer["conv2"] = _imp_conv1d(sd, f"{lp}.{idx}")
        layer["norm2"] = _imp_norm(sd, f"{lp}.{idx + 1}")
        layer["scale"] = _np(sd[f"{lp}.{idx + 3}.scale"])
        layers.append(layer)
        d += 1
    return {"layers": layers}


def _geometry(depth: int, *, nfft: int = 4096, stride: int = 4,
              kernel_size: int = 8, time_stride: int = 2,
              norm_starts: int = 4):
    """Replicates the reference constructor's per-layer geometry loop."""
    freqs = nfft // 2
    plans = []
    for index in range(depth):
        norm = index >= norm_starts
        freq = freqs > 1
        stri, ker = stride, kernel_size
        if not freq:
            ker, stri = time_stride * 2, time_stride
        pad = True
        last_freq = False
        if freq and freqs <= kernel_size:
            ker = freqs
            pad = False
            last_freq = True
        plans.append(dict(ker=ker, stride=stri, freq=freq,
                          pad=(ker // 4 if pad else 0), norm=norm,
                          last_freq=last_freq))
        if freq:
            freqs = 1 if freqs <= kernel_size else freqs // stride
    return plans


def _imp_henc(sd, prefix, plan, *, freq_override=None, empty=False,
              norm_groups=4, context_enc=0):
    freq = plan["freq"] if freq_override is None else freq_override
    conv_imp = _imp_conv2d if freq else _imp_conv1d
    p = {
        "freq": freq,
        "stride": plan["stride"] if freq else 4,
        "pad": plan["pad"] if freq else 2,
        "conv": conv_imp(sd, f"{prefix}.conv"),
    }
    if not freq:
        # tencoder uses kernel_size/stride 8/4 regardless of plan
        p["stride"] = 4
        p["pad"] = 2
    if empty:
        p["empty"] = True
        return p
    if plan["norm"]:
        p["norm1"] = _imp_norm(sd, f"{prefix}.norm1", norm_groups)
    if f"{prefix}.rewrite.weight" in sd:
        p["rewrite"] = conv_imp(sd, f"{prefix}.rewrite")
        p["context"] = context_enc
        if plan["norm"]:
            p["norm2"] = _imp_norm(sd, f"{prefix}.norm2", norm_groups)
    dc = _imp_dconv(sd, f"{prefix}.dconv")
    if dc is not None:
        p["dconv"] = dc
    return p


def _imp_hdec(sd, prefix, plan, *, freq_override=None, empty=False, last=False,
              norm_groups=4, context=1, chin=None):
    freq = plan["freq"] if freq_override is None else freq_override
    p = {
        "freq": freq,
        "stride": plan["stride"] if freq else 4,
        "pad": plan["pad"] if freq else 2,
        "last": last,
        "conv_tr": (_imp_convt2d if freq else _imp_convt1d)(sd, f"{prefix}.conv_tr"),
    }
    if chin is not None:
        p["chin"] = chin
    if not freq:
        p["stride"] = 4
        p["pad"] = 2
    if empty:
        p["empty"] = True
        if plan["norm"]:
            p["norm2"] = _imp_norm(sd, f"{prefix}.norm2", norm_groups)
        return p
    if plan["norm"]:
        p["norm2"] = _imp_norm(sd, f"{prefix}.norm2", norm_groups)
    if f"{prefix}.rewrite.weight" in sd:
        p["rewrite"] = (_imp_conv2d if freq else _imp_conv1d)(sd, f"{prefix}.rewrite")
        p["context"] = context
        if plan["norm"]:
            p["norm1"] = _imp_norm(sd, f"{prefix}.norm1", norm_groups)
    dc = _imp_dconv(sd, f"{prefix}.dconv")
    if dc is not None:
        p["dconv"] = dc
    return p


def _imp_ln(sd, prefix):
    return {"gamma": _np(sd[f"{prefix}.weight"]), "beta": _np(sd[f"{prefix}.bias"])}


def _imp_t_layer(sd, prefix, cross: bool):
    attn_name = "cross_attn" if cross else "self_attn"
    p = {
        "attn": {
            "in_w": _np(sd[f"{prefix}.{attn_name}.in_proj_weight"]),
            "in_b": _np(sd[f"{prefix}.{attn_name}.in_proj_bias"]),
            "out": _imp_lin(sd, f"{prefix}.{attn_name}.out_proj"),
        },
        "fc1": _imp_lin(sd, f"{prefix}.linear1"),
        "fc2": _imp_lin(sd, f"{prefix}.linear2"),
        "norm1": _imp_ln(sd, f"{prefix}.norm1"),
        "gamma1": _np(sd[f"{prefix}.gamma_1.scale"]),
        "gamma2": _np(sd[f"{prefix}.gamma_2.scale"]),
    }
    if cross:
        p["norm2k"] = _imp_ln(sd, f"{prefix}.norm2")   # key branch norm
        p["norm2"] = _imp_ln(sd, f"{prefix}.norm3")    # ff norm
    else:
        p["norm2"] = _imp_ln(sd, f"{prefix}.norm2")
    if f"{prefix}.norm_out.weight" in sd:
        p["norm_out"] = _imp_norm(sd, f"{prefix}.norm_out")
    return p


def htdemucs_params_from_state_dict(sd, cfg: DemucsConfig) -> Params:
    """Map an HTDemucs/HDemucs state dict (reference modules) to our tree."""
    plans = _geometry(cfg.depth, nfft=cfg.nfft, stride=cfg.stride,
                      kernel_size=cfg.kernel_size,
                      time_stride=cfg.time_stride)
    p: dict = {"encoder": [], "decoder": [], "tencoder": [], "tdecoder": []}
    n_sources = len(cfg.sources)
    for i, plan in enumerate(plans):
        p["encoder"].append(_imp_henc(sd, f"encoder.{i}", plan))
        if plan["freq"]:
            p["tencoder"].append(
                _imp_henc(sd, f"tencoder.{i}", plan, freq_override=False,
                          empty=plan["last_freq"]))
    # decoder lists are stored deepest-first (reference insert(0, ...))
    for di in range(cfg.depth):
        plan = plans[cfg.depth - 1 - di]
        last = (cfg.depth - 1 - di) == 0
        chin_z = (cfg.audio_channels * n_sources * (2 if cfg.cac else 1)
                  if last else None)
        p["decoder"].append(_imp_hdec(sd, f"decoder.{di}", plan, last=last,
                                      chin=None))
    n_tdec = sum(1 for plan in plans if plan["freq"])
    for di in range(n_tdec):
        plan = plans[n_tdec - 1 - di]
        last = (n_tdec - 1 - di) == 0
        p["tdecoder"].append(
            _imp_hdec(sd, f"tdecoder.{di}", plan, freq_override=False,
                      empty=plan["last_freq"], last=last))
    if "freq_emb.embedding.weight" in sd:
        p["freq_emb"] = _np(sd["freq_emb.embedding.weight"]) * 10.0  # emb_scale
    if any(k.startswith("crosstransformer") for k in sd):
        tp: dict = {
            "norm_in": _imp_ln(sd, "crosstransformer.norm_in"),
            "norm_in_t": _imp_ln(sd, "crosstransformer.norm_in_t"),
            "layers": [],
        }
        i = 0
        while f"crosstransformer.layers.{i}.norm1.weight" in sd:
            cross = f"crosstransformer.layers.{i}.cross_attn.in_proj_weight" in sd
            tp["layers"].append({
                "z": _imp_t_layer(sd, f"crosstransformer.layers.{i}", cross),
                "t": _imp_t_layer(sd, f"crosstransformer.layers_t.{i}", cross),
            })
            i += 1
        p["transformer"] = tp
    # decoder chin for freq layers receiving flattened input
    for di, dec in enumerate(p["decoder"]):
        if dec["freq"]:
            # chin = conv_tr input channels
            dec["chin"] = dec["conv_tr"]["w"].shape[2]
    return p
