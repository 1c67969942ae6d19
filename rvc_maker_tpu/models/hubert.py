"""HuBERT/ContentVec content encoder in JAX — the conversion feature extractor.

Re-implements the behavior of the reference's vendored fairseq HuBERT
(reference: main/library/architectures/fairseq.py — HubertModel:1326-1480,
ConvFeatureExtractionModel:1165-1195, TransformerEncoder:1059-1147,
TransformerSentenceEncoderLayer:778-815, MultiheadAttention:204-567,
make_conv_pos:585-592) for inference/feature extraction:

  * conv frontend [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2 (320x
    downsample), first layer followed by per-channel Fp32GroupNorm,
    exact (erf) GELU everywhere — fairseq's gelu is non-approximate.
  * LayerNorm on features -> post_extract_proj 512->768
  * conv positional embedding k=128 groups=16 (weight-norm dim=2 folded
    at import) + SamePad trim + GELU, residual
  * pre-stack LayerNorm (layer_norm_first=False for base models)
  * N post-LN transformer layers, run via lax.scan over stacked layer
    params (single-layer compile, 12x less XLA work)
  * v2 features = layer-12 output (768-d); v1 = layer-9 output through
    final_proj (256-d).  (reference convert.py:336-345)

Layer params are STACKED: every leaf of params['layers'] has a leading
axis of size n_layers so the whole stack scans.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv1d, layer_norm, linear

Params = Any

# (dim, kernel, stride) per conv layer — HubertConfig.conv_feature_layers
CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
               (512, 3, 2), (512, 2, 2), (512, 2, 2))
EMBED_DIM = 768
FFN_DIM = 3072
N_HEADS = 12
N_LAYERS = 12
POS_CONV_K = 128
POS_CONV_GROUPS = 16


def _gelu(x):
    # fairseq: F.gelu(x.float()).type_as(x) — exact erf gelu
    return jax.nn.gelu(x, approximate=False)


def conv_frontend(p: Params, source, lengths=None):
    """source: (B, L) -> (B, T, 512), T = frames after 320x downsample.

    lengths: (B,) valid sample counts for bucketed batches.  The first
    layer's Fp32GroupNorm(512, 512) normalizes each channel over TIME;
    with right-padding the statistics are computed over valid frames only
    (masked) so a padded batch row equals the same audio run solo — for
    unpadded input this is numerically identical to the reference."""
    x = source[:, :, None]
    fl = lengths
    for i, (dim, k, stride) in enumerate(CONV_LAYERS):
        x = conv1d(x, p["convs"][i]["w"], stride=stride, padding=(0, 0))
        if fl is not None:
            fl = (fl - k) // stride + 1
        if i == 0:
            xf = x.astype(jnp.float32)
            if fl is None:
                mean = jnp.mean(xf, axis=1, keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
            else:
                m = (jnp.arange(x.shape[1])[None, :] < fl[:, None])[..., None]
                cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1)
                mean = jnp.sum(jnp.where(m, xf, 0.0), axis=1, keepdims=True) / cnt
                var = jnp.sum(jnp.where(m, jnp.square(xf - mean), 0.0),
                              axis=1, keepdims=True) / cnt
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
                 * p["gn"]["gamma"] + p["gn"]["beta"]).astype(x.dtype)
        x = _gelu(x)
    return x


def _qlin(x, c, use_int8: bool):
    """linear() or its W8A8 int8 twin (per-token activation scales;
    w_q/w_scale attached by ops.int8_conv.prequantize_hubert)."""
    if use_int8:
        from ..ops.int8_conv import linear_w8a8

        return linear_w8a8(x, c["w"], c.get("b"), w_q=c.get("w_q"),
                           w_scale=c.get("w_scale"))
    return linear(x, c["w"], c.get("b"))


def _self_attention(lp: Params, x, attn_bias, use_int8: bool = False):
    """fairseq MultiheadAttention (self-attention, eval mode).

    x: (B, T, C); attn_bias: (B, 1, 1, T) additive or None.
    """
    b, t, c = x.shape
    h = N_HEADS
    d = c // h
    q = _qlin(x, lp["q"], use_int8) * (d ** -0.5)
    k = _qlin(x, lp["k"], use_int8)
    v = _qlin(x, lp["v"], use_int8)
    q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
    if attn_bias is not None:
        scores = scores + attn_bias
    # fairseq computes softmax in float32 (fairseq.py:39)
    p_attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return _qlin(out, lp["o"], use_int8)


def _encoder_layer(lp: Params, x, attn_bias, use_int8: bool = False):
    """Post-LN transformer layer (layer_norm_first=False branch,
    reference fairseq.py:806-812)."""
    r = x
    y = _self_attention(lp["attn"], x, attn_bias, use_int8)
    x = layer_norm(r + y, lp["ln1"]["gamma"], lp["ln1"]["beta"])
    r = x
    y = _qlin(_gelu(_qlin(x, lp["fc1"], use_int8)), lp["fc2"], use_int8)
    x = layer_norm(r + y, lp["ln2"]["gamma"], lp["ln2"]["beta"])
    return x


def extract_features(params: Params, source, lengths=None, *,
                     output_layer: int = 12, use_int8: bool = False):
    """source: (B, L) 16 kHz audio; lengths: (B,) valid samples or None.

    Returns (features (B, T, C), frame_lengths (B,)): C = 768 raw
    (output_layer=12 / v2) — apply final_proj separately for v1.
    """
    feats = conv_frontend(params["frontend"], source, lengths)  # (B, T, 512)
    t = feats.shape[1]

    if lengths is not None:
        # conv stack is VALID; frames = floor over each layer
        fl = lengths
        for (_, k, s) in CONV_LAYERS:
            fl = (fl - k) // s + 1
        frame_mask = (jnp.arange(t)[None, :] < fl[:, None])
    else:
        fl = jnp.full((feats.shape[0],), t, jnp.int32)
        frame_mask = None

    feats = layer_norm(feats, params["ln_feats"]["gamma"], params["ln_feats"]["beta"])
    x = linear(feats, params["post_proj"]["w"], params["post_proj"]["b"])

    if frame_mask is not None:
        x = x * frame_mask[:, :, None]

    # conv positional embedding (SamePad trims the trailing column)
    pos = conv1d(x, params["pos_conv"]["w"], params["pos_conv"]["b"],
                 padding=POS_CONV_K // 2, groups=POS_CONV_GROUPS)[:, :-1]
    x = x + _gelu(pos)
    x = layer_norm(x, params["ln_pre"]["gamma"], params["ln_pre"]["beta"])

    # pad to required_seq_len_multiple=2
    pad_t = (-t) % 2
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    if frame_mask is not None or pad_t:
        if frame_mask is None:
            key_mask = jnp.zeros((x.shape[0], t), bool)
        else:
            key_mask = ~frame_mask
        if pad_t:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_t)),
                               constant_values=True)
        attn_bias = jnp.where(key_mask, -jnp.inf, 0.0)[:, None, None, :]
    else:
        attn_bias = None

    layers = jax.tree_util.tree_map(lambda a: a[:output_layer], params["layers"])

    def step(carry, lp):
        return _encoder_layer(lp, carry, attn_bias, use_int8), None

    x, _ = jax.lax.scan(step, x, layers)
    if pad_t:
        x = x[:, :t]
    return x, fl


def final_proj(params: Params, feats):
    """v1 projection 768 -> 256 (reference convert.py:340)."""
    return linear(feats, params["final_proj"]["w"], params["final_proj"]["b"])


# ---------------------------------------------------------------------------
# fairseq checkpoint import
# ---------------------------------------------------------------------------

def _np(t):
    a = t.detach().cpu().numpy() if not isinstance(t, np.ndarray) else t
    return a.astype(np.float32) if a.dtype == np.float16 else a


def _lin(sd, prefix):
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"gamma": _np(sd[f"{prefix}.weight"]), "beta": _np(sd[f"{prefix}.bias"])}


def _fold_pos_conv(sd, prefix):
    """weight_norm with dim=2 (make_conv_pos, fairseq.py:592): norm over
    (Cout, Cin) per kernel position; g: (1, 1, K)."""
    if f"{prefix}.weight" in sd:
        w = _np(sd[f"{prefix}.weight"])
    else:
        if f"{prefix}.weight_g" in sd:
            g = _np(sd[f"{prefix}.weight_g"])
            v = _np(sd[f"{prefix}.weight_v"])
        else:
            g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
            v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        norm = np.sqrt(np.sum(np.square(v.astype(np.float64)), axis=(0, 1),
                              keepdims=True))
        w = (g * (v / norm)).astype(np.float32)
    # (Cout, Cin_pg, K) -> (K, Cin_pg, Cout)
    return {"w": np.transpose(w, (2, 1, 0)), "b": _np(sd[f"{prefix}.bias"])}


def params_from_fairseq_state_dict(sd) -> Params:
    p: dict = {"frontend": {"convs": [], "gn": _ln(sd, "feature_extractor.conv_layers.0.2")}}
    for i in range(len(CONV_LAYERS)):
        w = _np(sd[f"feature_extractor.conv_layers.{i}.0.weight"])  # (Cout,Cin,K)
        p["frontend"]["convs"].append({"w": np.transpose(w, (2, 1, 0))})

    p["ln_feats"] = _ln(sd, "layer_norm")
    p["post_proj"] = _lin(sd, "post_extract_proj")
    p["pos_conv"] = _fold_pos_conv(sd, "encoder.pos_conv.0")
    p["ln_pre"] = _ln(sd, "encoder.layer_norm")

    per_layer = []
    for i in range(N_LAYERS):
        lp = f"encoder.layers.{i}"
        per_layer.append({
            "attn": {
                "q": _lin(sd, f"{lp}.self_attn.q_proj"),
                "k": _lin(sd, f"{lp}.self_attn.k_proj"),
                "v": _lin(sd, f"{lp}.self_attn.v_proj"),
                "o": _lin(sd, f"{lp}.self_attn.out_proj"),
            },
            "ln1": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{lp}.fc1"),
            "fc2": _lin(sd, f"{lp}.fc2"),
            "ln2": _ln(sd, f"{lp}.final_layer_norm"),
        })
    # stack leaves along a leading layer axis for lax.scan
    p["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)

    if "final_proj.weight" in sd:
        p["final_proj"] = _lin(sd, "final_proj")
    return p


def load_fairseq_pt(path: str) -> Params:
    """Load a fairseq .pt HuBERT/ContentVec checkpoint (reference
    fairseq.py:30-36 load_model)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    return params_from_fairseq_state_dict(sd)


def params_from_transformers_state_dict(sd) -> Params:
    """Import a transformers HubertModel checkpoint (reference
    utils.py:155-166 embedders_mode="transformers"/"spin", which wraps
    transformers.HubertModel with a final_proj head).

    The HF graph is the same post-LN encoder as fairseq's; only the key
    names differ, so translate them and reuse the fairseq mapper."""
    import re

    out = {}
    for k, v in sd.items():
        if k == "masked_spec_embed" or k.startswith("encoder.pos_conv_embed"):
            nk = k.replace("encoder.pos_conv_embed.conv",
                           "encoder.pos_conv.0")
        else:
            nk = k
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.conv\.",
                    r"feature_extractor.conv_layers.\1.0.", nk)
        nk = nk.replace("feature_extractor.conv_layers.0.layer_norm.",
                        "feature_extractor.conv_layers.0.2.")
        nk = nk.replace("feature_projection.layer_norm.", "layer_norm.")
        nk = nk.replace("feature_projection.projection.",
                        "post_extract_proj.")
        nk = re.sub(r"encoder\.layers\.(\d+)\.attention\.",
                    r"encoder.layers.\1.self_attn.", nk)
        nk = re.sub(r"encoder\.layers\.(\d+)\.layer_norm\.",
                    r"encoder.layers.\1.self_attn_layer_norm.", nk)
        nk = nk.replace(".feed_forward.intermediate_dense.", ".fc1.")
        nk = nk.replace(".feed_forward.output_dense.", ".fc2.")
        out[nk] = v
    out.pop("masked_spec_embed", None)
    return params_from_fairseq_state_dict(out)


def load_transformers_dir(path: str) -> Params:
    """Load a transformers-format HuBERT directory or single weights file
    (.safetensors / pytorch_model.bin)."""
    import os

    import torch

    candidates = ([path] if os.path.isfile(path) else
                  [os.path.join(path, n) for n in
                   ("model.safetensors", "pytorch_model.bin")])
    for c in candidates:
        if not os.path.isfile(c):
            continue
        if c.endswith(".safetensors"):
            from safetensors.torch import load_file

            sd = load_file(c)
        else:
            sd = torch.load(c, map_location="cpu", weights_only=False)
        sd = {k.removeprefix("hubert."): v for k, v in sd.items()}
        return params_from_transformers_state_dict(sd)
    raise FileNotFoundError(f"no weights file found under {path}")


# ---------------------------------------------------------------------------
# init (random weights — for tests and from-scratch experiments)
# ---------------------------------------------------------------------------

def init_params(key, n_layers: int = N_LAYERS) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * n_layers))

    def lin(cin, cout):
        bound = 1.0 / math.sqrt(cin)
        return {"w": jax.random.uniform(next(keys), (cin, cout), minval=-bound, maxval=bound),
                "b": jnp.zeros((cout,))}

    p: dict = {"frontend": {"convs": [], "gn": {"gamma": jnp.ones(512), "beta": jnp.zeros(512)}}}
    cin = 1
    for (dim, k, s) in CONV_LAYERS:
        p["frontend"]["convs"].append(
            {"w": jax.random.normal(next(keys), (k, cin, dim)) * (1.0 / math.sqrt(k * cin))})
        cin = dim
    p["ln_feats"] = {"gamma": jnp.ones(512), "beta": jnp.zeros(512)}
    p["post_proj"] = lin(512, EMBED_DIM)
    p["pos_conv"] = {"w": jax.random.normal(next(keys), (POS_CONV_K, EMBED_DIM // POS_CONV_GROUPS, EMBED_DIM))
                     * math.sqrt(4.0 / (POS_CONV_K * EMBED_DIM)),
                     "b": jnp.zeros((EMBED_DIM,))}
    p["ln_pre"] = {"gamma": jnp.ones(EMBED_DIM), "beta": jnp.zeros(EMBED_DIM)}

    per_layer = []
    for _ in range(n_layers):
        per_layer.append({
            "attn": {"q": lin(EMBED_DIM, EMBED_DIM), "k": lin(EMBED_DIM, EMBED_DIM),
                     "v": lin(EMBED_DIM, EMBED_DIM), "o": lin(EMBED_DIM, EMBED_DIM)},
            "ln1": {"gamma": jnp.ones(EMBED_DIM), "beta": jnp.zeros(EMBED_DIM)},
            "fc1": lin(EMBED_DIM, FFN_DIM),
            "fc2": lin(FFN_DIM, EMBED_DIM),
            "ln2": {"gamma": jnp.ones(EMBED_DIM), "beta": jnp.zeros(EMBED_DIM)},
        })
    p["layers"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    p["final_proj"] = lin(EMBED_DIM, 256)
    return p
