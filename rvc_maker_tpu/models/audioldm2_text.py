"""AudioLDM2 text-conditioning stack in JAX.

Re-implements the three text encoders the reference's AudioLDM2 wrapper
drives through transformers/diffusers (reference
main/library/audioldm2/models.py:196-222 encode_text):

  * CLAP text branch (RoBERTa encoder + pooler + 2-layer projection) ->
    one 512-d vector per prompt (ClapTextModelWithProjection
    .get_text_features)
  * Flan-T5 encoder (relative-position buckets, RMS norms, gated-GELU
    FF) -> per-token embeddings
  * AudioLDM2 projection model: two linear projections + learned
    SOS/EOS tokens, streams concatenated
  * GPT2 language model run auto-regressively on *embeddings*
    (diffusers generate_language_model: each step appends the last
    hidden state, returns the max_new_tokens generated positions)

All parity-tested against the transformers implementations on random
tiny configs (tests/test_audioldm2_text.py); checkpoint importers accept
the transformers state_dict key layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import layer_norm, linear

Params = Any


def _gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(np.float32)))


def _gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi)
                                     * (x + 0.044715 * x ** 3)))


def _mha(q, k, v, n_heads: int, bias=None):
    """(B, T, C) attention; bias: (B, 1|H, Tq, Tk) additive."""
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // n_heads
    q = q.reshape(b, tq, n_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, tk, n_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, n_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, c)


# ---------------------------------------------------------------------------
# CLAP text branch (RoBERTa + pooler + projection)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    pad_token_id: int = 1
    projection_dim: int = 512
    layer_norm_eps: float = 1e-12


def clap_get_text_features(p: Params, cfg: ClapTextConfig, input_ids,
                           attention_mask):
    """transformers ClapTextModelWithProjection.get_text_features:
    RoBERTa encoder -> tanh pooler on token 0 -> linear/relu/linear
    projection.  input_ids/attention_mask: (B, T) int32."""
    mask = attention_mask.astype(jnp.float32)
    # roberta position ids: cumsum over mask, offset by pad_token_id
    pos_ids = (jnp.cumsum(mask, axis=1) * mask).astype(jnp.int32) \
        + cfg.pad_token_id
    emb = (p["word_emb"][input_ids] + p["pos_emb"][pos_ids]
           + p["type_emb"][0][None, None, :])
    x = layer_norm(emb, p["emb_ln"]["gamma"], p["emb_ln"]["beta"],
                   eps=cfg.layer_norm_eps)
    attn_bias = (1.0 - mask)[:, None, None, :] * -1e9
    for lp in p["layers"]:
        q = linear(x, lp["q"]["w"], lp["q"]["b"])
        k = linear(x, lp["k"]["w"], lp["k"]["b"])
        v = linear(x, lp["v"]["w"], lp["v"]["b"])
        a = _mha(q, k, v, cfg.n_heads, attn_bias)
        a = linear(a, lp["attn_out"]["w"], lp["attn_out"]["b"])
        x = layer_norm(x + a, lp["ln1"]["gamma"], lp["ln1"]["beta"],
                       eps=cfg.layer_norm_eps)
        h = _gelu(linear(x, lp["fc1"]["w"], lp["fc1"]["b"]))
        h = linear(h, lp["fc2"]["w"], lp["fc2"]["b"])
        x = layer_norm(x + h, lp["ln2"]["gamma"], lp["ln2"]["beta"],
                       eps=cfg.layer_norm_eps)
    pooled = jnp.tanh(linear(x[:, 0], p["pooler"]["w"], p["pooler"]["b"]))
    h = jax.nn.relu(linear(pooled, p["proj1"]["w"], p["proj1"]["b"]))
    return linear(h, p["proj2"]["w"], p["proj2"]["b"])


def clap_params_from_state_dict(sd) -> Params:
    """transformers ClapTextModelWithProjection state dict -> our tree."""
    def _np(t):
        import numpy as _n
        return t if isinstance(t, _n.ndarray) else t.detach().cpu().numpy()

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]).T,
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    tm = "text_model"
    p = {
        "word_emb": _np(sd[f"{tm}.embeddings.word_embeddings.weight"]),
        "pos_emb": _np(sd[f"{tm}.embeddings.position_embeddings.weight"]),
        "type_emb": _np(sd[f"{tm}.embeddings.token_type_embeddings.weight"]),
        "emb_ln": ln(f"{tm}.embeddings.LayerNorm"),
        "pooler": lin(f"{tm}.pooler.dense"),
        "proj1": lin("text_projection.linear1"),
        "proj2": lin("text_projection.linear2"),
        "layers": [],
    }
    i = 0
    while f"{tm}.encoder.layer.{i}.attention.self.query.weight" in sd:
        base = f"{tm}.encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{base}.attention.self.query"),
            "k": lin(f"{base}.attention.self.key"),
            "v": lin(f"{base}.attention.self.value"),
            "attn_out": lin(f"{base}.attention.output.dense"),
            "ln1": ln(f"{base}.attention.output.LayerNorm"),
            "fc1": lin(f"{base}.intermediate.dense"),
            "fc2": lin(f"{base}.output.dense"),
            "ln2": ln(f"{base}.output.LayerNorm"),
        })
        i += 1
    return p


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    n_layers: int = 24
    n_heads: int = 16
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6


def _t5_rms_norm(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def _t5_rel_bucket(rel_pos, num_buckets: int, max_distance: int):
    """Bidirectional relative position buckets (T5 paper / transformers
    _relative_position_bucket)."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def t5_encode(p: Params, cfg: T5Config, input_ids, attention_mask):
    """(B, T) -> (B, T, d_model) last_hidden_state of T5EncoderModel."""
    x = p["emb"][input_ids]
    t = input_ids.shape[1]
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]            # memory - query
    buckets = _t5_rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
    pos_bias = p["rel_bias"][buckets].transpose(2, 0, 1)[None]  # (1,H,T,T)
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] \
        * -1e9
    for lp in p["layers"]:
        h = _t5_rms_norm(x, lp["ln1"], cfg.layer_norm_eps)
        q = linear(h, lp["q"]["w"])
        k = linear(h, lp["k"]["w"])
        v = linear(h, lp["v"]["w"])
        # T5 does NOT scale by sqrt(d); fold the scale back in
        b, tq, _ = q.shape
        inner = cfg.n_heads * cfg.d_kv
        qh = q.reshape(b, tq, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        kh = k.reshape(b, tq, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        vh = v.reshape(b, tq, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + pos_bias + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        a = a.transpose(0, 2, 1, 3).reshape(b, tq, inner)
        x = x + linear(a, lp["o"]["w"])
        h = _t5_rms_norm(x, lp["ln2"], cfg.layer_norm_eps)
        g = _gelu_new(linear(h, lp["wi0"]["w"])) * linear(h, lp["wi1"]["w"])
        x = x + linear(g, lp["wo"]["w"])
    return _t5_rms_norm(x, p["final_ln"], cfg.layer_norm_eps)


def t5_params_from_state_dict(sd) -> Params:
    def _np(t):
        import numpy as _n
        return t if isinstance(t, _n.ndarray) else t.detach().cpu().numpy()

    def lin(prefix):
        return {"w": _np(sd[f"{prefix}.weight"]).T}

    p = {
        "emb": _np(sd["shared.weight"]),
        "rel_bias": _np(sd["encoder.block.0.layer.0.SelfAttention"
                          ".relative_attention_bias.weight"]),
        "final_ln": _np(sd["encoder.final_layer_norm.weight"]),
        "layers": [],
    }
    i = 0
    while f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        base = f"encoder.block.{i}.layer"
        p["layers"].append({
            "q": lin(f"{base}.0.SelfAttention.q"),
            "k": lin(f"{base}.0.SelfAttention.k"),
            "v": lin(f"{base}.0.SelfAttention.v"),
            "o": lin(f"{base}.0.SelfAttention.o"),
            "ln1": _np(sd[f"{base}.0.layer_norm.weight"]),
            "wi0": lin(f"{base}.1.DenseReluDense.wi_0"),
            "wi1": lin(f"{base}.1.DenseReluDense.wi_1"),
            "wo": lin(f"{base}.1.DenseReluDense.wo"),
            "ln2": _np(sd[f"{base}.1.layer_norm.weight"]),
        })
        i += 1
    return p


# ---------------------------------------------------------------------------
# GPT2 on embeddings + diffusers generate_language_model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GPT2Config:
    n_embd: int = 768
    n_layers: int = 12
    n_heads: int = 12
    layer_norm_eps: float = 1e-5


def gpt2_forward_embeds(p: Params, cfg: GPT2Config, inputs_embeds,
                        attention_mask=None):
    """GPT2Model on pre-computed input embeddings (B, T, C)."""
    b, t, c = inputs_embeds.shape
    x = inputs_embeds + p["wpe"][:t][None]
    causal = jnp.tril(jnp.ones((t, t), jnp.float32))
    bias = (1.0 - causal)[None, None] * -1e9
    if attention_mask is not None:
        bias = bias + (1.0 - attention_mask.astype(jnp.float32)
                       )[:, None, None, :] * -1e9
    for lp in p["layers"]:
        h = layer_norm(x, lp["ln1"]["gamma"], lp["ln1"]["beta"],
                       eps=cfg.layer_norm_eps)
        qkv = linear(h, lp["c_attn"]["w"], lp["c_attn"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _mha(q, k, v, cfg.n_heads, bias)
        x = x + linear(a, lp["c_proj"]["w"], lp["c_proj"]["b"])
        h = layer_norm(x, lp["ln2"]["gamma"], lp["ln2"]["beta"],
                       eps=cfg.layer_norm_eps)
        h = _gelu_new(linear(h, lp["c_fc"]["w"], lp["c_fc"]["b"]))
        x = x + linear(h, lp["mlp_proj"]["w"], lp["mlp_proj"]["b"])
    return layer_norm(x, p["ln_f"]["gamma"], p["ln_f"]["beta"],
                      eps=cfg.layer_norm_eps)


def generate_language_model(p: Params, cfg: GPT2Config, inputs_embeds,
                            attention_mask=None, max_new_tokens: int = 8):
    """diffusers AudioLDM2Pipeline.generate_language_model: each step
    feeds the running embedding sequence through GPT2 and appends the
    LAST hidden state as the next embedding; returns the generated
    max_new_tokens positions (B, max_new_tokens, C)."""
    for _ in range(max_new_tokens):
        out = gpt2_forward_embeds(p, cfg, inputs_embeds, attention_mask)
        inputs_embeds = jnp.concatenate(
            [inputs_embeds, out[:, -1:, :]], axis=1)
        if attention_mask is not None:
            attention_mask = jnp.concatenate(
                [attention_mask,
                 jnp.ones((attention_mask.shape[0], 1),
                          attention_mask.dtype)], axis=1)
    return inputs_embeds[:, -max_new_tokens:, :]


def gpt2_params_from_state_dict(sd) -> Params:
    """transformers GPT2Model state dict (Conv1D weights are stored
    (in, out) — no transpose needed for our (in, out) linear)."""
    def _np(t):
        import numpy as _n
        return t if isinstance(t, _n.ndarray) else t.detach().cpu().numpy()

    def conv1d_lin(prefix):   # GPT2 Conv1D: weight (in, out)
        return {"w": _np(sd[f"{prefix}.weight"]),
                "b": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"gamma": _np(sd[f"{prefix}.weight"]),
                "beta": _np(sd[f"{prefix}.bias"])}

    p = {"wpe": _np(sd["wpe.weight"]), "ln_f": ln("ln_f"), "layers": []}
    if "wte.weight" in sd:
        p["wte"] = _np(sd["wte.weight"])
    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        p["layers"].append({
            "ln1": ln(f"h.{i}.ln_1"),
            "c_attn": conv1d_lin(f"h.{i}.attn.c_attn"),
            "c_proj": conv1d_lin(f"h.{i}.attn.c_proj"),
            "ln2": ln(f"h.{i}.ln_2"),
            "c_fc": conv1d_lin(f"h.{i}.mlp.c_fc"),
            "mlp_proj": conv1d_lin(f"h.{i}.mlp.c_proj"),
        })
        i += 1
    return p


# ---------------------------------------------------------------------------
# AudioLDM2 projection model
# ---------------------------------------------------------------------------

def projection_forward(p: Params, hidden_states, hidden_states_1,
                       attention_mask=None, attention_mask_1=None):
    """diffusers AudioLDM2ProjectionModel: project each stream to the
    language-model width, wrap each in learned SOS/EOS tokens, concat
    streams (and masks) along the sequence axis."""
    def one(h, m, proj, sos, eos):
        h = linear(h, proj["w"], proj["b"])
        b = h.shape[0]
        h = jnp.concatenate([jnp.broadcast_to(sos, (b, 1, sos.shape[-1])),
                             h,
                             jnp.broadcast_to(eos, (b, 1, eos.shape[-1]))],
                            axis=1)
        if m is not None:
            ones = jnp.ones((b, 1), m.dtype)
            m = jnp.concatenate([ones, m, ones], axis=1)
        return h, m

    h0, m0 = one(hidden_states, attention_mask, p["proj"],
                 p["sos"], p["eos"])
    h1, m1 = one(hidden_states_1, attention_mask_1, p["proj_1"],
                 p["sos_1"], p["eos_1"])
    h = jnp.concatenate([h0, h1], axis=1)
    if m0 is not None and m1 is not None:
        return h, jnp.concatenate([m0, m1], axis=1)
    return h, None


def projection_params_from_state_dict(sd) -> Params:
    def _np(t):
        import numpy as _n
        return t if isinstance(t, _n.ndarray) else t.detach().cpu().numpy()

    return {
        "proj": {"w": _np(sd["projection.weight"]).T,
                 "b": _np(sd["projection.bias"])},
        "proj_1": {"w": _np(sd["projection_1.weight"]).T,
                   "b": _np(sd["projection_1.bias"])},
        "sos": _np(sd["sos_embed"]),
        "eos": _np(sd["eos_embed"]),
        "sos_1": _np(sd["sos_embed_1"]),
        "eos_1": _np(sd["eos_embed_1"]),
    }
