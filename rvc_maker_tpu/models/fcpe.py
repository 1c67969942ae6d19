"""FCPE pitch estimator in JAX — conformer mel PE with FAVOR+ attention.

Re-implements reference main/library/predictors/FCPE.py for inference:
  * FCPE-style mel front-end (16 kHz, 128 mels, n_fft/win 1024, hop 160,
    asymmetric (win-hop)/2 padding, eps 1e-9 magnitude, log clip 1e-5)
  * input stack: conv3 -> GroupNorm(4) -> LeakyReLU -> conv3
  * N conformer layers: x += FAVOR+ self-attention(LN(x));
    x += conv module (LN -> 1x1 -> GLU -> depthwise k31 -> SiLU -> 1x1)
  * sigmoid salience over 360 cent bins -> local-argmax cents decode ->
    f0 = 10 * 2^(cents/1200), confidence-masked to 0
  * NaN-aware linear interpolation to the requested frame count

The performer (FAVOR+) random-feature projection matrices are model
BUFFERS in the reference checkpoints (FCPE.py:563-564), so they import
like weights and inference is deterministic.  Covers both generations:
"current" (CFNaiveMelPE) and "legacy" (PCmer) — identical math, different
checkpoint key layout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv1d, layer_norm, linear
from ..ops.stft import frame_signal, hann_window, mel_filterbank

Params = Any


# ---------------------------------------------------------------------------
# mel front-end (reference MelModule / Wav2Mel numerics)
# ---------------------------------------------------------------------------

def fcpe_mel(audio_16k, *, n_mels: int = 128, n_fft: int = 1024,
             win: int = 1024, hop: int = 160, fmax: float = 8000.0):
    """(B, L) -> (B, n_frames, n_mels) log-mel, n_frames = L//hop + 1."""
    b, L = audio_16k.shape
    pad_left = (win - hop) // 2
    pad_right = max((win - hop + 1) // 2, win - L - pad_left)
    mode = "reflect" if pad_right < L else "constant"
    y = jnp.pad(audio_16k, ((0, 0), (pad_left, pad_right)), mode=mode)
    frames = frame_signal(y, n_fft, hop) * jnp.asarray(hann_window(win))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + 1e-9)
    basis = jnp.asarray(mel_filterbank(16000, n_fft, n_mels, 0.0, fmax,
                                       htk=False))
    mel = jnp.log(jnp.clip(jnp.matmul(mag, basis.T), min=1e-5))
    n_frames = L // hop + 1
    t = mel.shape[1]
    if n_frames > t:
        mel = jnp.concatenate([mel, mel[:, -1:]], axis=1)
    return mel[:, :n_frames]


# ---------------------------------------------------------------------------
# FAVOR+ (performer) attention — reference FCPE.py:87-130, 556-630
# ---------------------------------------------------------------------------

def _softmax_kernel(data, projection, is_query: bool, eps: float = 1e-4):
    """data: (B, H, T, d); projection: (m, d)."""
    normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[0] ** -0.5
    dash = jnp.einsum("bhid,jd->bhij", normalizer * data, projection)
    diag = (jnp.sum(jnp.square(data), axis=-1) / 2.0 * normalizer ** 2)[..., None]
    if is_query:
        out = ratio * (jnp.exp(dash - diag
                               - jnp.max(dash, axis=-1, keepdims=True)) + eps)
    else:
        out = ratio * jnp.exp(dash - diag + eps)
    return out


def _linear_attention(q, k, v):
    ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
    denom = 1.0 / (jnp.einsum("bhnd,bhd->bhn", q, jnp.sum(k, axis=-2)) + 1e-8)
    return jnp.einsum("bhde,bhnd,bhn->bhne", ctx, q, denom)


def _self_attention(p: Params, x, n_heads: int = 8):
    b, t, c = x.shape
    # reference SelfAttention uses dim_head=64 regardless of dim/heads
    # (inner_dim = 64*heads; FCPE.py:586-589) — derive from the weights
    inner = p["q"]["w"].shape[1]
    d = inner // n_heads
    q = linear(x, p["q"]["w"], p["q"]["b"]).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]["w"], p["k"]["b"]).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]["w"], p["v"]["b"]).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    proj = p["projection"]
    q = _softmax_kernel(q, proj, True)
    k = _softmax_kernel(k, proj, False)
    out = _linear_attention(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
    return linear(out, p["o"]["w"], p["o"]["b"])


# ---------------------------------------------------------------------------
# conformer conv module + layers
# ---------------------------------------------------------------------------

def _group_norm(x, gamma, beta, groups: int = 4, eps: float = 1e-5):
    """x: (B, T, C); stats per (group-channels x time) per sample."""
    b, t, c = x.shape
    xg = x.transpose(0, 2, 1).reshape(b, groups, (c // groups) * t)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=-1, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, t).transpose(0, 2, 1)
    return x * gamma + beta


def _conformer_conv(p: Params, x, kernel: int = 31):
    y = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"])
    y = linear(y, p["pw1"]["w"], p["pw1"]["b"])       # (B, T, 2*inner)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)                          # GLU
    pad = kernel // 2
    y = conv1d(y, p["dw"]["w"], p["dw"]["b"], padding=(pad, pad),
               groups=y.shape[-1])
    y = y * jax.nn.sigmoid(y)                          # SiLU / Swish
    return linear(y, p["pw2"]["w"], p["pw2"]["b"])


def salience(p: Params, mel):
    """mel: (B, T, input_channels) -> (B, T, out_dims) sigmoid salience."""
    x = conv1d(mel, p["in_conv1"]["w"], p["in_conv1"]["b"], padding=1)
    x = _group_norm(x, p["in_gn"]["gamma"], p["in_gn"]["beta"])
    x = jnp.where(x >= 0, x, 0.01 * x)                 # LeakyReLU default
    x = conv1d(x, p["in_conv2"]["w"], p["in_conv2"]["b"], padding=1)
    for lp in p["layers"]:
        if lp.get("attn") is not None:
            x = x + _self_attention(lp["attn"],
                                    layer_norm(x, lp["ln"]["gamma"],
                                               lp["ln"]["beta"]))
        x = x + _conformer_conv(lp["conv"], x)
    x = layer_norm(x, p["norm"]["gamma"], p["norm"]["beta"])
    return jax.nn.sigmoid(linear(x, p["out"]["w"], p["out"]["b"]))


# ---------------------------------------------------------------------------
# decode (reference cents_local_decoder + cent_to_f0)
# ---------------------------------------------------------------------------

def decode_local(y, cent_table, threshold: float = 0.05):
    """y: (B, T, out_dims) -> f0 (B, T) Hz (0 where confidence < thr)."""
    out_dims = y.shape[-1]
    conf = jnp.max(y, axis=-1)
    max_idx = jnp.argmax(y, axis=-1)
    idx = jnp.clip(max_idx[..., None] + jnp.arange(9) - 4, 0, out_dims - 1)
    y_l = jnp.take_along_axis(y, idx, axis=-1)
    c_l = cent_table[idx]
    cents = jnp.sum(c_l * y_l, axis=-1) / jnp.sum(y_l, axis=-1)
    f0 = 10.0 * jnp.power(2.0, cents / 1200.0)
    return jnp.where(conf > threshold, f0, 0.0)


def interp_to_length(f0, target_len: int):
    """Reference output_interp_target_length semantics: zeros -> NaN,
    linear interpolation, NaN -> 0 (FCPE.py:698-701)."""
    from .vocoders import interp_linear

    x = jnp.where(f0 == 0.0, jnp.nan, f0)[:, :, None]
    out = interp_linear(x, target_len)[:, :, 0]
    return jnp.where(jnp.isnan(out), 0.0, out)


def infer(params: Params, audio_16k, *, threshold: float = 0.05,
          p_len: int | None = None):
    """(B, L) 16 kHz -> f0 (B, p_len or L//160+1) Hz."""
    mel = fcpe_mel(audio_16k)
    y = salience(params, mel)
    f0 = decode_local(y, jnp.asarray(params["cent_table"]), threshold)
    if p_len is not None and p_len != f0.shape[1]:
        f0 = interp_to_length(f0, p_len)
    return f0


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def _lin(sd, prefix):
    out = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _wn_linear(sd, prefix):
    """weight-normed Linear: fold g*v/||v|| (norm per output row)."""
    if f"{prefix}.weight" in sd:
        w = _np(sd[f"{prefix}.weight"])
    else:
        if f"{prefix}.weight_g" in sd:
            g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
        else:
            g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
            v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        norm = np.sqrt(np.sum(np.square(v.astype(np.float64)), axis=1,
                              keepdims=True))
        w = (g * v / norm).astype(np.float32)
    return {"w": w.T, "b": _np(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])                    # (Cout, Cin, K)
    out = {"w": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"gamma": _np(sd[f"{prefix}.weight"]), "beta": _np(sd[f"{prefix}.bias"])}


def params_from_state_dict(sd, *, legacy: bool = False,
                           n_layers: int | None = None) -> Params:
    """Map a CFNaiveMelPE (current) or FCPE_LEGACY (PCmer) state dict.

    current keys: input_stack.{0,1,3}, net.encoder_layers.{i}.(norm|attn|
    conformer.net.{0,2,4.conv,6}), norm, output_proj, cent_table
    legacy keys: stack.{0,1,3}, decoder._layers.{i}.(norm|attn|
    conformer.net.{0,2,4.conv,6}), norm, dense_out, cent_table
    """
    stem = "stack" if legacy else "input_stack"
    layers_prefix = "decoder._layers" if legacy else "net.encoder_layers"
    out_name = "dense_out" if legacy else "output_proj"

    if n_layers is None:
        n_layers = 0
        while f"{layers_prefix}.{n_layers}.norm.weight" in sd:
            n_layers += 1

    p: dict = {
        "in_conv1": _conv(sd, f"{stem}.0"),
        "in_gn": _ln(sd, f"{stem}.1"),
        "in_conv2": _conv(sd, f"{stem}.3"),
        "norm": _ln(sd, "norm"),
        "out": _wn_linear(sd, out_name),
        "cent_table": _np(sd["cent_table"]),
        "layers": [],
    }
    for i in range(n_layers):
        lp = f"{layers_prefix}.{i}"
        has_attn = f"{lp}.attn.to_q.weight" in sd
        p["layers"].append({
            "ln": _ln(sd, f"{lp}.norm"),
            # conv_only checkpoints have no attention sub-module — the only
            # constructible configuration of the reference's current-gen
            # CFNEncoderLayer (its SelfAttention call is broken otherwise)
            "attn": None if not has_attn else {
                "q": _lin(sd, f"{lp}.attn.to_q"),
                "k": _lin(sd, f"{lp}.attn.to_k"),
                "v": _lin(sd, f"{lp}.attn.to_v"),
                "o": _lin(sd, f"{lp}.attn.to_out"),
                "projection": _np(sd[f"{lp}.attn.fast_attention.projection_matrix"]),
            },
            "conv": {
                "ln": _ln(sd, f"{lp}.conformer.net.0"),
                "pw1": {"w": _np(sd[f"{lp}.conformer.net.2.weight"])[:, :, 0].T,
                        "b": _np(sd[f"{lp}.conformer.net.2.bias"])},
                "dw": _conv(sd, f"{lp}.conformer.net.4.conv"),
                "pw2": {"w": _np(sd[f"{lp}.conformer.net.6.weight"])[:, :, 0].T,
                        "b": _np(sd[f"{lp}.conformer.net.6.bias"])},
            },
        })
    return p


def load_fcpe_ckpt(path: str) -> tuple[Params, bool]:
    """Load fcpe.pt / fcpe_legacy.pt -> (params, legacy_flag).

    The released checkpoints are AES-256-CBC encrypted at rest with the
    key the reference ships (FCPE.py:28-40); plain files load unchanged.
    """
    import io

    import torch

    from ..interop.modelcrypt import maybe_decrypt

    with open(path, "rb") as fh:
        raw = maybe_decrypt(fh.read())
    ckpt = torch.load(io.BytesIO(raw), map_location="cpu",
                      weights_only=False)
    sd = ckpt["model"]
    legacy = "config" in ckpt  # legacy ckpts carry "config", current "config_dict"
    return params_from_state_dict(sd, legacy=legacy), legacy
