"""ECAPA-TDNN speaker-embedding network in JAX (192-d embeddings).

Re-implements reference main/library/speaker_diarization/ECAPA_TDNN.py
(speechbrain's ECAPA): TDNN stem -> 3 SE-Res2Net blocks (scale 8) ->
multi-feature aggregation -> attentive statistics pooling (global
context) -> BN -> linear.  Inference-only: BatchNorms folded at import.

Layout: activations (B, T, C); 'same' convs use reflect padding of
dilation*(k-1)/2 per side (the reference's get_padding_elem reduces to
exactly this for stride 1, ECAPA_TDNN.py:19-25).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv1d

Params = Any

CHANNELS = (512, 512, 512, 512, 1536)
KERNELS = (5, 3, 3, 3, 1)
DILATIONS = (1, 2, 3, 4, 1)
RES2NET_SCALE = 8


def _same_conv(x, p, *, kernel: int, dilation: int = 1):
    pad = dilation * (kernel - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    return conv1d(x, p["w"], p.get("b"), dilation=dilation, padding=(0, 0))


def _tdnn(x, p, *, kernel: int, dilation: int = 1):
    """Conv -> ReLU -> folded BN (reference TDNNBlock)."""
    x = _same_conv(x, p["conv"], kernel=kernel, dilation=dilation)
    x = jax.nn.relu(x)
    return x * p["bn"]["scale"] + p["bn"]["shift"]


def _res2net(x, p, *, kernel: int, dilation: int):
    chunks = jnp.split(x, RES2NET_SCALE, axis=-1)
    outs = [chunks[0]]
    y = None
    for i in range(1, RES2NET_SCALE):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(inp, p["blocks"][i - 1], kernel=kernel, dilation=dilation)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _se_block(x, p):
    s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(_same_conv(s, p["conv1"], kernel=1))
    s = jax.nn.sigmoid(_same_conv(s, p["conv2"], kernel=1))
    return s * x


def _se_res2net(x, p, *, kernel: int, dilation: int):
    residual = x
    if "shortcut" in p:
        residual = _same_conv(x, p["shortcut"], kernel=1)
    y = _tdnn(x, p["tdnn1"], kernel=1)
    y = _res2net(y, p["res2net"], kernel=kernel, dilation=dilation)
    y = _tdnn(y, p["tdnn2"], kernel=1)
    return _se_block(y, p["se"]) + residual


def _asp(x, p):
    """Attentive statistics pooling with global context
    (reference AttentiveStatisticsPooling)."""
    b, t, c = x.shape
    eps = 1e-12
    mean = jnp.mean(x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.mean(jnp.square(x - mean[:, None]), axis=1), eps))
    attn = jnp.concatenate(
        [x, jnp.broadcast_to(mean[:, None], (b, t, c)),
         jnp.broadcast_to(std[:, None], (b, t, c))], axis=-1)
    attn = _tdnn(attn, p["tdnn"], kernel=1)
    attn = _same_conv(jnp.tanh(attn), p["conv"], kernel=1)
    w = jax.nn.softmax(attn, axis=1)
    mean = jnp.sum(w * x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.sum(w * jnp.square(x - mean[:, None]), axis=1), eps))
    return jnp.concatenate([mean, std], axis=-1)


def embed(params: Params, feats):
    """feats: (B, T, n_mels) -> speaker embeddings (B, lin_neurons)."""
    x = _tdnn(feats, params["blocks"][0], kernel=KERNELS[0],
              dilation=DILATIONS[0])
    xl = []
    for i in range(1, len(CHANNELS) - 1):
        x = _se_res2net(x, params["blocks"][i], kernel=KERNELS[i],
                        dilation=DILATIONS[i])
        xl.append(x)
    x = jnp.concatenate(xl, axis=-1)
    x = _tdnn(x, params["mfa"], kernel=KERNELS[-1], dilation=DILATIONS[-1])
    x = _asp(x, params["asp"])
    x = x * params["asp_bn"]["scale"] + params["asp_bn"]["shift"]
    x = x[:, None, :]
    out = _same_conv(x, params["fc"], kernel=1)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# torch import (BN folding; reference module naming)
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def _conv_from(sd, prefix):
    w = _np(sd[f"{prefix}.conv.weight"])          # (Cout, Cin, K)
    out = {"w": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.conv.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.conv.bias"])
    return out


def _bn_from(sd, prefix, eps=1e-5):
    gamma = _np(sd[f"{prefix}.norm.weight"])
    beta = _np(sd[f"{prefix}.norm.bias"])
    mean = _np(sd[f"{prefix}.norm.running_mean"])
    var = _np(sd[f"{prefix}.norm.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32),
            "shift": (beta - mean * scale).astype(np.float32)}


def _tdnn_from(sd, prefix):
    return {"conv": _conv_from(sd, f"{prefix}.conv"),
            "bn": _bn_from(sd, f"{prefix}.norm")}


def params_from_state_dict(sd) -> Params:
    p: dict = {"blocks": [_tdnn_from(sd, "blocks.0")]}
    for i in range(1, len(CHANNELS) - 1):
        bp = f"blocks.{i}"
        blk = {
            "tdnn1": _tdnn_from(sd, f"{bp}.tdnn1"),
            "res2net": {"blocks": [
                _tdnn_from(sd, f"{bp}.res2net_block.blocks.{j}")
                for j in range(RES2NET_SCALE - 1)]},
            "tdnn2": _tdnn_from(sd, f"{bp}.tdnn2"),
            "se": {"conv1": _conv_from(sd, f"{bp}.se_block.conv1"),
                   "conv2": _conv_from(sd, f"{bp}.se_block.conv2")},
        }
        if f"{bp}.shortcut.conv.weight" in sd:
            blk["shortcut"] = _conv_from(sd, f"{bp}.shortcut")
        p["blocks"].append(blk)
    p["mfa"] = _tdnn_from(sd, "mfa")
    p["asp"] = {"tdnn": _tdnn_from(sd, "asp.tdnn"),
                "conv": _conv_from(sd, "asp.conv")}
    p["asp_bn"] = _bn_from(sd, "asp_bn")
    p["fc"] = _conv_from(sd, "fc")
    return p


def load_ecapa_ckpt(path: str) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # speechbrain checkpoints may prefix with 'embedding_model.'
    if any(k.startswith("embedding_model.") for k in sd):
        sd = {k[len("embedding_model."):]: v for k, v in sd.items()
              if k.startswith("embedding_model.")}
    return params_from_state_dict(sd)
