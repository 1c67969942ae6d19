"""RMVPE pitch estimator in JAX — mel U-Net + BiGRU + salience decode.

Re-implements the behavior of reference main/library/predictors/RMVPE.py:
log-mel (128 bins, 16 kHz, win 1024 hop 160, fmin 30 fmax 8000, htk) ->
deep U-Net (5 enc/dec levels, 4 intermediates, 4 res blocks each) ->
3-channel conv -> BiGRU(256) -> 360-bin sigmoid salience ->
local-average-cents decode (f0 = 10 * 2^(cents/1200)).

TPU-first details:
  * NHWC layout — (batch, time, mel, channels); mel/channels ride lanes.
  * BatchNorm is inference-only here and folded to (scale, shift) at
    import time (RMVPE is a fixed pretrained predictor; the reference
    never trains it either).
  * The per-frame python decode loop (reference RMVPE.py:244-247)
    becomes a vectorized gather.
  * Frames padded to a multiple of 32 (five 2x poolings) statically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import rmvpe_mel

Params = Any

N_MELS = 128
N_CLASS = 360
CENTS_MAPPING = 20 * np.arange(N_CLASS) + 1997.3794084376191  # RMVPE.py:207


# ---------------------------------------------------------------------------
# building blocks (all convs 3x3 NHWC, BN pre-folded into scale/shift)
# ---------------------------------------------------------------------------

def _conv2d(x, w, *, stride=(1, 1), padding=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    return x * p["scale"] + p["shift"]


def _qconv2d(x, c):
    """conv or its W8A8 twin when w_q/w_scale were attached by
    ops.int8_conv.prequantize_rmvpe (C>=128 levels only)."""
    if "w_q" in c:
        from ..ops.int8_conv import conv2d_w8a8

        return conv2d_w8a8(x, c["w"], w_q=c["w_q"], w_scale=c["w_scale"])
    return _conv2d(x, c["w"])


def _conv_block_res(p: Params, x, use_int8: bool = False):
    """ConvBlockRes: (conv3x3-BN-ReLU)x2 + shortcut. RMVPE.py:11-22."""
    c1 = p["conv1"] if use_int8 else {"w": p["conv1"]["w"]}
    c2 = p["conv2"] if use_int8 else {"w": p["conv2"]["w"]}
    y = jax.nn.relu(_bn(_qconv2d(x, c1), p["bn1"]))
    y = jax.nn.relu(_bn(_qconv2d(y, c2), p["bn2"]))
    if "shortcut" in p:
        x = _conv2d(x, p["shortcut"]["w"], padding=(0, 0)) + p["shortcut"]["b"]
    return y + x


def _block_chain(p: Params, x, fold: int, use_int8: bool = False):
    """The level's ConvBlockRes chain, W-folded when the level is
    lane-starved (ops/folded_conv2d.py; per-level policy measured on the
    target chip, docs/perf_notes.md)."""
    if fold and x.shape[2] % fold == 0:
        from ..ops.folded_conv2d import (fold_w, folded_conv_block_res,
                                         unfold_w)

        xf = fold_w(x, fold)
        for bp in p["blocks"]:
            xf = folded_conv_block_res(bp, xf, fold=fold)
        return unfold_w(xf, fold)
    for bp in p["blocks"]:
        x = _conv_block_res(bp, x, use_int8)
    return x


def _res_encoder_block(p: Params, x, pool: bool, fold: int = 0,
                       use_int8: bool = False):
    x = _block_chain(p, x, fold, use_int8)
    if pool:
        pooled = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        return x, pooled
    return x


def _res_decoder_block(p: Params, x, skip, fold: int = 0,
                       use_int8: bool = False):
    """ConvT(3x3, stride 2, pad 1, outpad 1, no bias) + BN + ReLU, concat
    skip, then res blocks. RMVPE.py:88-106."""
    # transposed conv === input-dilated conv with flipped kernel.
    # torch convT2d weight (Cin, Cout, Kh, Kw) stored here as HWIO (flipped).
    y = jax.lax.conv_general_dilated(
        x, p["convt"]["w"], window_strides=(1, 1),
        padding=[(1, 2), (1, 2)],      # k-1-pad=1 low, k-1-pad+outpad=2 high
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(_bn(y, p["bn"]))
    y = jnp.concatenate([y, skip], axis=-1)
    return _block_chain(p, y, fold, use_int8)


# Per-level W-fold factors, A/B-measured on the target chip (bf16, B=8;
# docs/perf_notes.md): enc0 2.92x, enc2 1.44x, dec2..4 1.4-2.8x; enc1
# measured neutral (its folded INPUT side is still under-width: 16ch x4
# = 64 lanes) and the C>=128 levels are already lane-healthy.
_ENC_FOLDS = (8, 0, 2, 0, 0)
_DEC_FOLDS = (0, 0, 2, 4, 8)


def e2e_apply(p: Params, mel, use_int8: bool = False):
    """Salience network. mel: (B, n_mels, T) as the reference orients it.
    Returns (B, T, 360) sigmoid salience. T must be a multiple of 32."""
    from ..ops.folded_conv import fold_enabled

    use_fold = fold_enabled(mel.dtype)
    x = mel.transpose(0, 2, 1)[..., None]      # (B, T, 128, 1) NHWC
    x = _bn(x, p["in_bn"])

    skips = []
    for i, lp in enumerate(p["encoder"]):
        t, x = _res_encoder_block(lp, x, pool=True,
                                  fold=_ENC_FOLDS[i] if use_fold else 0,
                                  use_int8=use_int8)
        skips.append(t)
    for lp in p["intermediate"]:
        x = _res_encoder_block(lp, x, pool=False, use_int8=use_int8)
    for i, lp in enumerate(p["decoder"]):
        x = _res_decoder_block(lp, x, skips[-1 - i],
                               fold=_DEC_FOLDS[i] if use_fold else 0,
                               use_int8=use_int8)

    x = _conv2d(x, p["cnn"]["w"]) + p["cnn"]["b"]          # (B, T, 128, 3)
    b, t, f, c = x.shape
    # reference: (B,3,T,128) -> transpose(1,2) -> flatten(-2) = (B,T,3*128)
    x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    x = _bigru(p["gru"], x)
    x = x @ p["fc"]["w"] + p["fc"]["b"]
    return jax.nn.sigmoid(x)


def _bigru(p: Params, x):
    """Bidirectional GRU matching torch.nn.GRU numerics, both directions
    fused into ONE lax.scan (the backward direction rides time-reversed
    on a leading dir axis) — the scan is overhead-bound at these sizes,
    so halving the sequential step count ~halves its wall time.

    x: (B, T, I); weights in torch layout (3H, I) / (3H, H), gate order
    r,z,n.  Input gates for the whole sequence are one big matmul.
    """
    hdim = p["w_hh"].shape[1]
    xg_f = jnp.einsum("bti,gi->btg", x, p["w_ih"]) + p["b_ih"]
    xg_b = jnp.einsum("bti,gi->btg", x, p["w_ih_r"]) + p["b_ih_r"]
    xg = jnp.stack([xg_f, jnp.flip(xg_b, axis=1)], axis=0)  # (2, B, T, 3H)
    w_hh = jnp.stack([p["w_hh"], p["w_hh_r"]])              # (2, 3H, H)
    b_hh = jnp.stack([p["b_hh"], p["b_hh_r"]])[:, None]     # (2, 1, 3H)

    def step(h, xg_t):
        hg = jnp.einsum("dbh,dgh->dbg", h, w_hh) + b_hh
        xr, xz, xn = jnp.split(xg_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((2, x.shape[0], hdim), x.dtype)
    _, ys = jax.lax.scan(step, h0, xg.transpose(2, 0, 1, 3))  # (T,2,B,H)
    fwd = ys[:, 0].transpose(1, 0, 2)
    bwd = jnp.flip(ys[:, 1].transpose(1, 0, 2), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_cents(salience, thred: float = 0.03):
    """Vectorized local-average-cents decode (reference RMVPE.py:236-252).

    salience: (B, T, 360). Returns f0 (B, T) Hz with 0 = unvoiced.

    TPU note: gather-free.  The reference gathers a 9-wide window around
    the argmax; dynamic gathers along the minor (lane) axis serialize
    badly on TPU, so instead the window sums are computed for EVERY
    class with 9 static shifted slices and the argmax one is selected
    by a one-hot multiply — same terms in the same order, exact."""
    center = jnp.argmax(salience, axis=-1)                    # (B, T)
    pad = jnp.pad(salience, ((0, 0), (0, 0), (4, 4)))
    cmap = jnp.asarray(np.pad(CENTS_MAPPING, (4, 4)).astype(np.float32))

    n = salience.shape[-1]
    s_sum = 0.0
    sc_sum = 0.0
    for j in range(9):
        sl = pad[..., j : j + n]
        s_sum = s_sum + sl
        sc_sum = sc_sum + sl * cmap[j : j + n]
    onehot = jax.nn.one_hot(center, n, dtype=salience.dtype)
    cents = (jnp.sum(onehot * sc_sum, axis=-1)
             / jnp.sum(onehot * s_sum, axis=-1))
    cents = jnp.where(jnp.max(salience, axis=-1) > thred, cents, 0.0)
    f0 = 10.0 * jnp.power(2.0, cents / 1200.0)
    return jnp.where(f0 == 10.0, 0.0, f0)


def infer(params: Params, audio_16k, *, thred: float = 0.03,
          f0_min: float | None = None, f0_max: float | None = None,
          use_int8: bool = False):
    """Full F0 inference. audio_16k: (B, L) at 16 kHz -> f0 (B, T) Hz,
    T = L//160 + 1. Static shapes: frames padded to x32 and cropped."""
    mel = rmvpe_mel(audio_16k)                                # (B, 128, T)
    n_frames = mel.shape[-1]
    pad_to = 32 * ((n_frames - 1) // 32 + 1)
    # reference pads in reflect mode (RMVPE.py:213)
    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad_to - n_frames)), mode="reflect")
    # run the salience net in the params' dtype (bf16 fast mode supported);
    # the cents decode always happens in fp32
    net_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    hidden = e2e_apply(params, mel.astype(net_dtype),
                       use_int8=use_int8)[:, :n_frames]
    hidden = hidden.astype(jnp.float32)
    f0 = decode_cents(hidden, thred=thred)
    if f0_min is not None:
        f0 = jnp.where((f0 < f0_min) | (f0 > f0_max), 0.0, f0)
    return f0


# ---------------------------------------------------------------------------
# torch checkpoint import (BN folding)
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def _fold_bn(sd, prefix, eps=1e-5):
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32),
            "shift": (beta - mean * scale).astype(np.float32)}


def _conv_hwio(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cout, Cin, Kh, Kw)
    out = {"w": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _convt_hwio_flipped(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])           # (Cin, Cout, Kh, Kw)
    w = np.flip(w, axis=(2, 3))               # pre-flip for dilated-conv form
    return {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))}


def _block_from(sd, prefix):
    p = {"conv1": _conv_hwio(sd, f"{prefix}.conv.0"),
         "bn1": _fold_bn(sd, f"{prefix}.conv.1"),
         "conv2": _conv_hwio(sd, f"{prefix}.conv.3"),
         "bn2": _fold_bn(sd, f"{prefix}.conv.4")}
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = _conv_hwio(sd, f"{prefix}.shortcut")
    return p


def params_from_state_dict(sd, *, en_de_layers: int = 5, inter_layers: int = 4,
                           n_blocks: int = 4) -> Params:
    """Map the reference E2E state_dict (rmvpe.pt) onto our tree."""
    p: dict = {"in_bn": _fold_bn(sd, "unet.encoder.bn")}

    p["encoder"] = []
    for i in range(en_de_layers):
        blocks = [_block_from(sd, f"unet.encoder.layers.{i}.conv.{j}")
                  for j in range(n_blocks)]
        p["encoder"].append({"blocks": blocks})

    p["intermediate"] = []
    for i in range(inter_layers):
        blocks = [_block_from(sd, f"unet.intermediate.layers.{i}.conv.{j}")
                  for j in range(n_blocks)]
        p["intermediate"].append({"blocks": blocks})

    p["decoder"] = []
    for i in range(en_de_layers):
        dp = {"convt": _convt_hwio_flipped(sd, f"unet.decoder.layers.{i}.conv1.0"),
              "bn": _fold_bn(sd, f"unet.decoder.layers.{i}.conv1.1"),
              "blocks": [_block_from(sd, f"unet.decoder.layers.{i}.conv2.{j}")
                         for j in range(n_blocks)]}
        p["decoder"].append(dp)

    p["cnn"] = _conv_hwio(sd, "cnn")
    p["gru"] = {
        "w_ih": _np(sd["fc.0.gru.weight_ih_l0"]),
        "w_hh": _np(sd["fc.0.gru.weight_hh_l0"]),
        "b_ih": _np(sd["fc.0.gru.bias_ih_l0"]),
        "b_hh": _np(sd["fc.0.gru.bias_hh_l0"]),
        "w_ih_r": _np(sd["fc.0.gru.weight_ih_l0_reverse"]),
        "w_hh_r": _np(sd["fc.0.gru.weight_hh_l0_reverse"]),
        "b_ih_r": _np(sd["fc.0.gru.bias_ih_l0_reverse"]),
        "b_hh_r": _np(sd["fc.0.gru.bias_hh_l0_reverse"]),
    }
    p["fc"] = {"w": _np(sd["fc.1.weight"]).T, "b": _np(sd["fc.1.bias"])}
    return p


def load_rmvpe_pt(path: str) -> Params:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return params_from_state_dict(sd)
