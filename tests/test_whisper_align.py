"""Word-level DTW alignment + temperature fallback tests
(reference whisper.py:175-273 find_alignment and 329-349
decode_with_fallback)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import whisper as jwhisper
from rvc_maker_tpu.speaker import align as jalign
from rvc_maker_tpu.speaker.transcribe import (compression_ratio,
                                              decode_with_fallback)
from rvc_maker_tpu.speaker.whisper_tokenizer import WhisperTokenizer

from test_whisper_parity import (DIMS, VOCAB, net_and_params,  # noqa: F401
                                 ref_mod)


def test_dtw_matches_reference(ref_mod):
    rs = np.random.RandomState(0)
    for shape in ((5, 9), (12, 30), (3, 3)):
        x = rs.randn(*shape)
        ti_ref, fi_ref = ref_mod.dtw_cpu(x.astype(np.float64))
        ti, fi = jalign.dtw(x)
        np.testing.assert_array_equal(ti, ti_ref)
        np.testing.assert_array_equal(fi, fi_ref)


def test_median_filter_matches_reference(ref_mod):
    rs = np.random.RandomState(1)
    x = rs.randn(3, 6, 40).astype(np.float32)
    ref = ref_mod.median_filter(torch.from_numpy(x), 7).numpy()
    ours = jalign.median_filter_time(x, 7)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_cross_qk_logits_consistent(net_and_params):
    _, params = net_and_params
    rs = np.random.RandomState(2)
    feats = jnp.asarray(rs.randn(1, DIMS.n_audio_ctx, DIMS.n_audio_state)
                        .astype(np.float32) * 0.3)
    tokens = jnp.asarray(rs.randint(0, 50000, (1, 9)))
    base = jwhisper.decode_logits(params["decoder"], DIMS, tokens, feats)
    logits, qk = jwhisper.decode_logits_with_cross_qk(params["decoder"],
                                                      DIMS, tokens, feats)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    assert qk.shape == (DIMS.n_text_layer, 1, DIMS.n_text_head, 9,
                        DIMS.n_audio_ctx)


class _TokAdapter:
    """Minimal tokenizer facade for the reference find_alignment."""

    def __init__(self, tok):
        self._tok = tok
        self.sot_sequence = tok.sot_sequence()
        self.no_timestamps = tok.no_timestamps
        self.eot = tok.eot

    def split_to_word_tokens(self, tokens):
        return self._tok.split_to_word_tokens(tokens)


def _patch_reference_qk(ref_mod):
    """The vendored reference attention always returns qk=None (its sdpa
    path, whisper.py:776-780) and disable_sdpa references a missing
    use_sdpa attribute — find_alignment cannot run as shipped.  Restore
    the upstream non-sdpa semantics (scale^-0.25 on q and k, qk
    returned) so the reference alignment math is executable."""
    import torch as _t

    def qkv_attention(self, q, k, v, mask=None):
        n_ctx = q.shape[1]
        scale = (q.shape[-1] // self.n_head) ** -0.25
        qh = q.view(*q.shape[:2], self.n_head, -1).permute(0, 2, 1, 3) * scale
        kh = k.view(*k.shape[:2], self.n_head, -1).permute(0, 2, 3, 1) * scale
        vh = v.view(*v.shape[:2], self.n_head, -1).permute(0, 2, 1, 3)
        qk = qh @ kh
        if mask is not None:
            qk = qk + mask[:n_ctx, :n_ctx]
        w = qk.float().softmax(dim=-1).to(q.dtype)
        return ((w @ vh).permute(0, 2, 1, 3).flatten(start_dim=2),
                qk.detach())

    ref_mod.MultiHeadAttention.use_sdpa = True
    ref_mod.MultiHeadAttention.qkv_attention = qkv_attention


def test_find_alignment_parity(ref_mod, net_and_params):
    net, params = net_and_params
    _patch_reference_qk(ref_mod)
    tok = WhisperTokenizer(VOCAB, multilingual=True, language="en")

    rs = np.random.RandomState(3)
    mel = (rs.randn(80, 2 * DIMS.n_audio_ctx) * 0.5).astype(np.float32)
    text_tokens = [int(t) for t in tok.encode(" hello world this is a test")]
    num_frames = 2 * DIMS.n_audio_ctx

    ref_words = ref_mod.find_alignment(net, _TokAdapter(tok), text_tokens,
                                       torch.from_numpy(mel), num_frames)

    feats = jwhisper.encode_audio(params["encoder"], DIMS,
                                  jnp.asarray(mel[None]))
    ours = jalign.find_alignment(params, DIMS, tok, text_tokens, feats,
                                 num_frames)

    assert [w.word for w in ours] == [w.word for w in ref_words]
    np.testing.assert_allclose([w.start for w in ours],
                               [w.start for w in ref_words], atol=1e-6)
    np.testing.assert_allclose([w.end for w in ours],
                               [w.end for w in ref_words], atol=1e-6)
    np.testing.assert_allclose([w.probability for w in ours],
                               [w.probability for w in ref_words],
                               rtol=1e-3, atol=1e-4)


def test_split_to_word_tokens_real_vocab():
    tok = WhisperTokenizer(VOCAB, multilingual=True, language="en")
    text = " Hello world, this is great."
    ids = tok.encode(text)
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert "".join(words) == text
    assert [t for w in word_tokens for t in w] == ids
    assert words[0] == " Hello"
    # punctuation splits into its own group on space splitting
    assert any(w.strip() in (",", ".") for w in words)


def test_compression_ratio_gate():
    assert compression_ratio("a a a a a a a a a a a a a a a a") > \
        compression_ratio("the quick brown fox jumps over")


def test_decode_with_fallback_escalates(net_and_params):
    _, params = net_and_params
    tok = WhisperTokenizer(VOCAB, multilingual=True, language="en")
    rs = np.random.RandomState(4)
    feats = jnp.asarray(rs.randn(1, DIMS.n_audio_ctx, DIMS.n_audio_state)
                        .astype(np.float32) * 0.3)
    r = decode_with_fallback(params, DIMS, tok, feats, suppress=None,
                             temperatures=[0.0],
                             compression_ratio_threshold=None,
                             logprob_threshold=None)
    assert r["temperature"] == 0.0
    assert {"tokens", "avg_logprob", "no_speech_prob",
            "compression_ratio", "text"} <= set(r)
    # impossible logprob gate -> escalate to the last temperature
    r2 = decode_with_fallback(params, DIMS, tok, feats, suppress=None,
                              temperatures=[0.0, 0.7],
                              compression_ratio_threshold=None,
                              logprob_threshold=1e9,
                              rng=np.random.default_rng(0))
    assert r2["temperature"] == 0.7
