"""Whisper speech recognition in JAX — encoder/decoder + greedy transcribe.

Re-implements the reference's vendored Whisper
(main/library/speaker_diarization/whisper.py) for the diarized-conversion
flow: log-mel front-end ((x+4)/4-normalized log10 mel power), conv stem +
sinusoidal-position transformer encoder, token/learned-position decoder
with causal self-attention and cross-attention, tied output embedding.

TPU-first decoding: one jitted single-token step with a static-shape KV
cache updated via dynamic_update_slice; cross-attention K/V precomputed
once per 30 s window.  Word-level DTW alignment (reference
find_alignment) is round-2; segment-level timestamps come from the
timestamp tokens, which is what diarization consumes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv1d, layer_norm, linear
from ..ops.stft import hann_window, mel_filterbank, stft_magnitude

Params = Any

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE
N_FRAMES = N_SAMPLES // HOP_LENGTH


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 512
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6


def log_mel(audio, n_mels: int = 80):
    """(B, L) -> (B, n_mels, L//160) whisper-normalized log-mel
    (reference whisper.py:267-277; torch.stft center=True, last frame
    dropped, power spectrum, log10, max-8 floor, (x+4)/4)."""
    mag = stft_magnitude(audio, n_fft=N_FFT, hop_length=HOP_LENGTH,
                         win_length=N_FFT, window=hann_window(N_FFT),
                         center=True)
    power = jnp.square(mag[:, :-1, :])                  # drop last frame
    fb = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, n_mels, 0.0,
                                    8000.0, htk=False))
    mel = jnp.matmul(power, fb.T)                       # (B, T, n_mels)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return ((log_spec + 4.0) / 4.0).transpose(0, 2, 1)  # (B, n_mels, T)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    inc = -np.log(10000.0) / (channels // 2 - 1)
    scaled = np.arange(length)[:, None] * np.exp(inc * np.arange(channels // 2))[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _mha(p: Params, x, xa=None, *, n_head: int, causal: bool = False,
         kv_override=None, return_qk: bool = False):
    """Whisper MultiHeadAttention. kv_override: (k, v) precomputed.
    return_qk: also return the pre-softmax attention scores (the qk
    matrix whisper's word-alignment hooks capture, whisper.py:193)."""
    q = linear(x, p["q"]["w"], p["q"]["b"])
    if kv_override is not None:
        k, v = kv_override
    else:
        src = x if xa is None else xa
        k = linear(src, p["k"]["w"])                    # no bias
        v = linear(src, p["v"]["w"], p["v"]["b"])
    b, t, c = q.shape
    s = k.shape[1]
    d = c // n_head
    qh = q.reshape(b, t, n_head, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    kh = k.reshape(b, s, n_head, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, n_head, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
    if causal and t > 1:
        mask = jnp.triu(jnp.full((t, s), -jnp.inf), k=1)
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    out = linear(out, p["o"]["w"], p["o"]["b"])
    return (out, scores) if return_qk else out


def _block(p: Params, x, xa=None, *, n_head: int, causal: bool = False,
           cross_kv=None, return_cross_qk: bool = False):
    y = layer_norm(x, p["attn_ln"]["gamma"], p["attn_ln"]["beta"])
    x = x + _mha(p["attn"], y, n_head=n_head, causal=causal)
    qk = None
    if "cross_attn" in p:
        y = layer_norm(x, p["cross_ln"]["gamma"], p["cross_ln"]["beta"])
        if return_cross_qk:
            attn, qk = _mha(p["cross_attn"], y, xa, n_head=n_head,
                            kv_override=cross_kv, return_qk=True)
        else:
            attn = _mha(p["cross_attn"], y, xa, n_head=n_head,
                        kv_override=cross_kv)
        x = x + attn
    y = layer_norm(x, p["mlp_ln"]["gamma"], p["mlp_ln"]["beta"])
    y = linear(jax.nn.gelu(linear(y, p["fc1"]["w"], p["fc1"]["b"]),
                           approximate=False),
               p["fc2"]["w"], p["fc2"]["b"])
    x = x + y
    return (x, qk) if return_cross_qk else x


def encode_audio(params: Params, dims: WhisperDims, mel):
    """mel: (B, n_mels, T<=3000) -> audio features (B, T//2, n_state)."""
    x = mel.transpose(0, 2, 1)                          # (B, T, n_mels)
    x = jax.nn.gelu(conv1d(x, params["conv1"]["w"], params["conv1"]["b"],
                           padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(x, params["conv2"]["w"], params["conv2"]["b"],
                           stride=2, padding=1), approximate=False)
    x = x + jnp.asarray(params["pos"])[: x.shape[1]]
    for bp in params["blocks"]:
        x = _block(bp, x, n_head=dims.n_audio_head)
    return layer_norm(x, params["ln_post"]["gamma"], params["ln_post"]["beta"])


def decode_logits(params: Params, dims: WhisperDims, tokens, audio_features):
    """Full (non-cached) decoder pass — parity/reference path.

    tokens: (B, T) int32 -> logits (B, T, n_vocab)."""
    emb = params["tok_emb"]
    x = emb[tokens] + params["pos_emb"][: tokens.shape[1]]
    for bp in params["blocks"]:
        x = _block(bp, x, audio_features, n_head=dims.n_text_head,
                   causal=True)
    x = layer_norm(x, params["ln"]["gamma"], params["ln"]["beta"])
    return jnp.einsum("btc,vc->btv", x, emb)


def decode_logits_with_cross_qk(params: Params, dims: WhisperDims, tokens,
                                audio_features):
    """Teacher-forced decoder pass that also returns the per-layer
    cross-attention score matrices (reference whisper.py:184-193
    find_alignment hooks).

    Returns (logits (B, T, n_vocab), qk (n_layer, B, n_head, T, S))."""
    emb = params["tok_emb"]
    x = emb[tokens] + params["pos_emb"][: tokens.shape[1]]
    qks = []
    for bp in params["blocks"]:
        x, qk = _block(bp, x, audio_features, n_head=dims.n_text_head,
                       causal=True, return_cross_qk=True)
        qks.append(qk)
    x = layer_norm(x, params["ln"]["gamma"], params["ln"]["beta"])
    return jnp.einsum("btc,vc->btv", x, emb), jnp.stack(qks)


def default_alignment_heads(dims: WhisperDims) -> np.ndarray:
    """Boolean (n_text_layer, n_text_head) mask: all heads in the upper
    half of decoder layers — whisper's default when a checkpoint has no
    model-specific mask (reference whisper.py:694-695)."""
    mask = np.zeros((dims.n_text_layer, dims.n_text_head), bool)
    mask[dims.n_text_layer // 2:] = True
    return mask


def alignment_heads_from_dump(dump: bytes, dims: WhisperDims) -> np.ndarray:
    """Decode a base85+gzip alignment-head mask (the format whisper
    checkpoints' metadata uses, reference whisper.py:697-698)."""
    import base64
    import gzip

    raw = gzip.decompress(base64.b85decode(dump))
    return (np.frombuffer(raw, dtype=bool).copy()
            .reshape(dims.n_text_layer, dims.n_text_head))


# ---------------------------------------------------------------------------
# cached greedy decoding
# ---------------------------------------------------------------------------

class DecodeCache(NamedTuple):
    self_k: jnp.ndarray   # (n_layer, B, n_ctx, C)
    self_v: jnp.ndarray
    cross_k: jnp.ndarray  # (n_layer, B, S, C)
    cross_v: jnp.ndarray
    index: jnp.ndarray    # () current length


def init_cache(params: Params, dims: WhisperDims, audio_features):
    b = audio_features.shape[0]
    s = audio_features.shape[1]
    nl, ctx, c = dims.n_text_layer, dims.n_text_ctx, dims.n_text_state
    cross_k = jnp.stack([
        linear(audio_features, bp["cross_attn"]["k"]["w"])
        for bp in params["blocks"]])
    cross_v = jnp.stack([
        linear(audio_features, bp["cross_attn"]["v"]["w"],
               bp["cross_attn"]["v"]["b"])
        for bp in params["blocks"]])
    return DecodeCache(
        self_k=jnp.zeros((nl, b, ctx, c)), self_v=jnp.zeros((nl, b, ctx, c)),
        cross_k=cross_k, cross_v=cross_v, index=jnp.zeros((), jnp.int32))


def _cached_mha_step(p, x, cache_k, cache_v, index, n_head):
    """Single-token self-attention against the cache. x: (B, 1, C)."""
    b, _, c = x.shape
    d = c // n_head
    q = linear(x, p["q"]["w"], p["q"]["b"])
    k_new = linear(x, p["k"]["w"])
    v_new = linear(x, p["v"]["w"], p["v"]["b"])
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_new, (0, index, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_new, (0, index, 0))
    ctx = cache_k.shape[1]
    qh = q.reshape(b, 1, n_head, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    kh = cache_k.reshape(b, ctx, n_head, d).transpose(0, 2, 1, 3)
    vh = cache_v.reshape(b, ctx, n_head, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
    valid = jnp.arange(ctx)[None, None, None, :] <= index
    scores = jnp.where(valid, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3).reshape(b, 1, c)
    return linear(out, p["o"]["w"], p["o"]["b"]), cache_k, cache_v


@partial(jax.jit, static_argnums=(1,))
def decode_step(params: Params, dims: WhisperDims, token, cache: DecodeCache):
    """token: (B,) int32 -> (logits (B, n_vocab), new cache)."""
    emb = params["tok_emb"]
    x = emb[token][:, None, :] + jax.lax.dynamic_slice_in_dim(
        params["pos_emb"], cache.index, 1, axis=0)
    new_sk, new_sv = [], []
    for li, bp in enumerate(params["blocks"]):
        y = layer_norm(x, bp["attn_ln"]["gamma"], bp["attn_ln"]["beta"])
        attn, ck, cv = _cached_mha_step(bp["attn"], y, cache.self_k[li],
                                        cache.self_v[li], cache.index,
                                        dims.n_text_head)
        new_sk.append(ck)
        new_sv.append(cv)
        x = x + attn
        y = layer_norm(x, bp["cross_ln"]["gamma"], bp["cross_ln"]["beta"])
        x = x + _mha(bp["cross_attn"], y, None, n_head=dims.n_text_head,
                     kv_override=(cache.cross_k[li], cache.cross_v[li]))
        y = layer_norm(x, bp["mlp_ln"]["gamma"], bp["mlp_ln"]["beta"])
        y = linear(jax.nn.gelu(linear(y, bp["fc1"]["w"], bp["fc1"]["b"]),
                               approximate=False),
                   bp["fc2"]["w"], bp["fc2"]["b"])
        x = x + y
    x = layer_norm(x, params["ln"]["gamma"], params["ln"]["beta"])
    logits = jnp.einsum("bc,vc->bv", x[:, 0], emb)
    new_cache = DecodeCache(self_k=jnp.stack(new_sk), self_v=jnp.stack(new_sv),
                            cross_k=cache.cross_k, cross_v=cache.cross_v,
                            index=cache.index + 1)
    return logits, new_cache


def greedy_decode(params: Params, dims: WhisperDims, audio_features,
                  initial_tokens: list[int], *, eot: int,
                  max_tokens: int = 224, suppress=None,
                  timestamp_begin: int | None = None):
    """Greedy decoding of one window. Returns the generated token list
    (without the initial prompt, including no eot)."""
    cache = init_cache(params, dims, audio_features)
    logits = None
    for t in initial_tokens:
        logits, cache = decode_step(
            params, dims, jnp.full((audio_features.shape[0],), t, jnp.int32),
            cache)
    out = []
    cur = None
    for _ in range(max_tokens):
        lg = np.asarray(logits[0])
        if suppress is not None:
            lg[suppress] = -np.inf
        # whisper timestamp sanity: timestamps must be non-decreasing
        if timestamp_begin is not None and out:
            last_ts = [tk for tk in out if tk >= timestamp_begin]
            if last_ts:
                lg[timestamp_begin : last_ts[-1]] = -np.inf
        cur = int(np.argmax(lg))
        if cur == eot:
            break
        out.append(cur)
        logits, cache = decode_step(
            params, dims, jnp.full((audio_features.shape[0],), cur, jnp.int32),
            cache)
    return out


def decode_window(params: Params, dims: WhisperDims, audio_features,
                  initial_tokens: list[int], *, eot: int,
                  max_tokens: int = 224, suppress=None,
                  timestamp_begin: int | None = None,
                  temperature: float = 0.0, rng=None,
                  no_speech_token: int | None = None) -> dict:
    """One decoding attempt with quality statistics for temperature
    fallback (reference whisper.py decode/DecodingResult fields:
    avg_logprob, no_speech_prob).

    temperature == 0 -> greedy; > 0 -> sample from softmax(logits/t)
    (rng: np.random.Generator).  Returns {tokens, avg_logprob,
    no_speech_prob}."""
    cache = init_cache(params, dims, audio_features)
    logits = None
    no_speech_prob = 0.0
    for i, t in enumerate(initial_tokens):
        logits, cache = decode_step(
            params, dims, jnp.full((audio_features.shape[0],), t, jnp.int32),
            cache)
        if i == 0 and no_speech_token is not None:
            # probability read at the SOT position (whisper.py:346)
            p = np.asarray(jax.nn.softmax(logits[0]))
            no_speech_prob = float(p[no_speech_token])
    out: list[int] = []
    sum_logprob = 0.0
    if rng is None:
        rng = np.random.default_rng(0)
    for _ in range(max_tokens):
        lg = np.asarray(logits[0], np.float64)
        if suppress is not None:
            lg[suppress] = -np.inf
        if timestamp_begin is not None and out:
            last_ts = [tk for tk in out if tk >= timestamp_begin]
            if last_ts:
                lg[timestamp_begin: last_ts[-1]] = -np.inf
        logprobs = lg - np.log(np.sum(np.exp(lg - lg.max()))) - lg.max()
        if temperature > 0:
            z = lg / temperature
            pz = np.exp(z - z.max())
            pz = pz / pz.sum()
            cur = int(rng.choice(len(pz), p=pz))
        else:
            cur = int(np.argmax(lg))
        sum_logprob += float(logprobs[cur])
        if cur == eot:
            break
        out.append(cur)
        logits, cache = decode_step(
            params, dims, jnp.full((audio_features.shape[0],), cur, jnp.int32),
            cache)
    # whisper averages over generated tokens + eot (decoding.py semantics)
    avg_logprob = sum_logprob / (len(out) + 1)
    return {"tokens": out, "avg_logprob": avg_logprob,
            "no_speech_prob": no_speech_prob}


def _rearrange_cache(cache: DecodeCache, idx) -> DecodeCache:
    """Reorder the per-beam batch axis (reference
    whisper.py rearrange_kv_cache in BeamSearchDecoder.update)."""
    idx = jnp.asarray(idx, jnp.int32)
    return cache._replace(self_k=cache.self_k[:, idx],
                          self_v=cache.self_v[:, idx])


def beam_decode(params: Params, dims: WhisperDims, audio_features,
                initial_tokens: list[int], *, eot: int, beam_size: int = 5,
                patience: float | None = None, max_tokens: int = 224,
                suppress=None, timestamp_begin: int | None = None,
                no_speech_token: int | None = None) -> dict:
    """Beam search over one window (reference BeamSearchDecoder,
    whisper.py:886-953): per step each beam proposes its top
    beam_size+1 tokens, candidates are deduped by sequence, EOT
    candidates retire to the finished pool (capped at
    round(beam_size*patience)), the best beam_size live sequences carry
    on with the KV cache rearranged to their source beams.  Final pick =
    highest sum-logprob / length (MaximumLikelihoodRanker with no
    length penalty).  audio_features: (1, S, C)."""
    patience = patience or 1.0
    max_candidates = int(round(beam_size * patience))
    assert max_candidates > 0, (beam_size, patience)
    k = beam_size
    feats = jnp.repeat(audio_features, k, axis=0)
    cache = init_cache(params, dims, feats)
    logits = None
    no_speech_prob = 0.0
    for i, t in enumerate(initial_tokens):
        logits, cache = decode_step(
            params, dims, jnp.full((k,), t, jnp.int32), cache)
        if i == 0 and no_speech_token is not None:
            p = np.asarray(jax.nn.softmax(logits[0]))
            no_speech_prob = float(p[no_speech_token])

    beams: list[tuple[int, ...]] = [tuple() for _ in range(k)]
    sum_logprobs = np.zeros(k, np.float64)
    finished: dict[tuple[int, ...], float] = {}

    for _ in range(max_tokens):
        lg = np.asarray(logits, np.float64)            # (k, V)
        if suppress is not None:
            lg[:, suppress] = -np.inf
        if timestamp_begin is not None:
            for j, seq in enumerate(beams):
                last_ts = [tk for tk in seq if tk >= timestamp_begin]
                if last_ts:
                    lg[j, timestamp_begin : last_ts[-1]] = -np.inf
        logprobs = lg - np.log(np.sum(np.exp(lg - lg.max(axis=1,
                                                         keepdims=True)),
                                      axis=1, keepdims=True)) \
            - lg.max(axis=1, keepdims=True)

        scores: dict[tuple[int, ...], float] = {}
        sources: dict[tuple[int, ...], int] = {}
        for j in range(k):
            top = np.argsort(logprobs[j])[::-1][: k + 1]
            for tok in top:
                seq = beams[j] + (int(tok),)
                scores[seq] = sum_logprobs[j] + float(logprobs[j, tok])
                sources[seq] = j
        next_beams, src_idx = [], []
        new_sum = np.zeros(k, np.float64)
        for seq in sorted(scores, key=scores.get, reverse=True):
            if seq[-1] == eot:
                if len(finished) < max_candidates:
                    finished[seq[:-1]] = scores[seq]
            else:
                new_sum[len(next_beams)] = scores[seq]
                next_beams.append(seq)
                src_idx.append(sources[seq])
                if len(next_beams) == k:
                    break
        if len(next_beams) < k:     # degenerate: all candidates EOT
            break
        beams, sum_logprobs = next_beams, new_sum
        cache = _rearrange_cache(cache, src_idx)
        tok = jnp.asarray([seq[-1] for seq in beams], jnp.int32)
        logits, cache = decode_step(params, dims, tok, cache)
        if len(finished) >= max_candidates:
            break

    if len(finished) < beam_size:   # finalize: append EOT to live beams
        for j in np.argsort(sum_logprobs)[::-1]:
            if len(finished) >= beam_size:
                break
            finished.setdefault(beams[int(j)], float(sum_logprobs[int(j)]))

    # MaximumLikelihoodRanker (length_penalty None): score / generated
    # token count (eot excluded — DecodingTask slices it off before
    # ranking); the reported avg_logprob divides by len+1 like
    # DecodingTask.run's avg_logprobs
    def rank(item):
        seq, score = item
        return score / max(len(seq), 1)

    best_seq, best_score = max(finished.items(), key=rank)
    return {"tokens": list(best_seq),
            "avg_logprob": best_score / (len(best_seq) + 1),
            "no_speech_prob": no_speech_prob}


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


def _ln(sd, prefix):
    return {"gamma": _np(sd[f"{prefix}.weight"]), "beta": _np(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {"q": _lin(sd, f"{prefix}.query"), "k": _lin(sd, f"{prefix}.key"),
            "v": _lin(sd, f"{prefix}.value"), "o": _lin(sd, f"{prefix}.out")}


def _blocks(sd, prefix, n_layer, cross: bool):
    blocks = []
    for i in range(n_layer):
        bp = f"{prefix}.blocks.{i}"
        d = {
            "attn": _attn(sd, f"{bp}.attn"),
            "attn_ln": _ln(sd, f"{bp}.attn_ln"),
            "fc1": _lin(sd, f"{bp}.mlp.0"),
            "fc2": _lin(sd, f"{bp}.mlp.2"),
            "mlp_ln": _ln(sd, f"{bp}.mlp_ln"),
        }
        if cross:
            d["cross_attn"] = _attn(sd, f"{bp}.cross_attn")
            d["cross_ln"] = _ln(sd, f"{bp}.cross_attn_ln")
        blocks.append(d)
    return blocks


def params_from_state_dict(sd, dims: WhisperDims):
    enc = {
        "conv1": {"w": np.transpose(_np(sd["encoder.conv1.weight"]), (2, 1, 0)),
                  "b": _np(sd["encoder.conv1.bias"])},
        "conv2": {"w": np.transpose(_np(sd["encoder.conv2.weight"]), (2, 1, 0)),
                  "b": _np(sd["encoder.conv2.bias"])},
        "pos": _sinusoids(dims.n_audio_ctx, dims.n_audio_state),
        "blocks": _blocks(sd, "encoder", dims.n_audio_layer, cross=False),
        "ln_post": _ln(sd, "encoder.ln_post"),
    }
    dec = {
        "tok_emb": _np(sd["decoder.token_embedding.weight"]),
        "pos_emb": _np(sd["decoder.positional_embedding"]),
        "blocks": _blocks(sd, "decoder", dims.n_text_layer, cross=True),
        "ln": _ln(sd, "decoder.ln"),
    }
    return {"encoder": enc, "decoder": dec}


def load_whisper_pt(path: str):
    """Load a whisper checkpoint {dims, model_state_dict} ->
    (params, WhisperDims)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = WhisperDims(**ckpt["dims"])
    return params_from_state_dict(ckpt["model_state_dict"], dims), dims
