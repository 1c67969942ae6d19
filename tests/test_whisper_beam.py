"""Beam-search parity vs the reference BeamSearchDecoder
(VERDICT r1 missing #6; reference whisper.py:886-953).

The same tiny Whisper model (identical weights both sides) is decoded
with our beam_decode and with the reference's actual BeamSearchDecoder
class driven by a full-forward torch loop (no KV cache, so
rearrange_kv_cache is a no-op) — chosen tokens must match exactly.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import whisper as jwhisper

from test_whisper_parity import DIMS, _install_whisper_shims
from reference_util import ref_module


@pytest.fixture(scope="module")
def nets():
    _install_whisper_shims()
    mod = ref_module("main.library.speaker_diarization.whisper")
    torch.manual_seed(3)
    net = mod.Whisper(mod.ModelDimensions(
        n_mels=DIMS.n_mels, n_audio_ctx=DIMS.n_audio_ctx,
        n_audio_state=DIMS.n_audio_state, n_audio_head=DIMS.n_audio_head,
        n_audio_layer=DIMS.n_audio_layer, n_vocab=DIMS.n_vocab,
        n_text_ctx=DIMS.n_text_ctx, n_text_state=DIMS.n_text_state,
        n_text_head=DIMS.n_text_head, n_text_layer=DIMS.n_text_layer))
    torch.nn.init.normal_(net.decoder.positional_embedding, std=0.02)
    net.eval()
    params = jwhisper.params_from_state_dict(net.state_dict(), DIMS)
    return mod, net, params


def _reference_beam(mod, net, feats_t, initial_tokens, *, beam_size, eot,
                    max_tokens, patience=None):
    """Reference BeamSearchDecoder driven by a full decoder forward each
    step (token-level equivalent of DecodingTask._main_loop)."""

    class NoCacheInference:
        def rearrange_kv_cache(self, source_indices):
            pass  # full forward below recomputes everything

    decoder = mod.BeamSearchDecoder(beam_size, eot, NoCacheInference(),
                                    patience)
    decoder.reset()
    tokens = torch.tensor([initial_tokens] * beam_size)
    sum_logprobs = torch.zeros(beam_size)
    feats_k = feats_t.repeat(beam_size, 1, 1)
    completed = False
    with torch.no_grad():
        for _ in range(max_tokens):
            logits = net.decoder(tokens, feats_k)[:, -1]
            tokens, completed = decoder.update(tokens, logits,
                                              sum_logprobs)
            if completed or tokens.shape[-1] > DIMS.n_text_ctx - 2:
                break
    pre = tokens.reshape(1, beam_size, -1)
    seq_lists, logprob_lists = decoder.finalize(pre, sum_logprobs[None])
    # DecodingTask slices prompt + eot then ranks by score/length
    seqs = [s.tolist()[len(initial_tokens):] for s in seq_lists[0]]
    seqs = [s[: s.index(eot)] if eot in s else s for s in seqs]
    scores = [lp / max(len(s), 1)
              for s, lp in zip(seqs, logprob_lists[0])]
    return seqs[int(np.argmax(scores))]


@pytest.mark.parametrize("beam_size,patience", [(2, None), (3, 1.5)])
def test_beam_tokens_match_reference(nets, beam_size, patience):
    mod, net, params = nets
    rs = np.random.RandomState(0)
    mel = rs.randn(1, DIMS.n_mels, 2 * DIMS.n_audio_ctx).astype(np.float32)
    with torch.no_grad():
        feats_t = net.encoder(torch.from_numpy(mel))
    feats = jnp.asarray(feats_t.numpy())

    sot = DIMS.n_vocab - 10
    eot = DIMS.n_vocab - 9
    initial = [sot]
    max_tokens = 12

    ref = _reference_beam(mod, net, feats_t, initial,
                          beam_size=beam_size, eot=eot,
                          max_tokens=max_tokens, patience=patience)
    ours = jwhisper.beam_decode(
        params["decoder"], DIMS, feats, initial, eot=eot,
        beam_size=beam_size, patience=patience, max_tokens=max_tokens)

    assert ours["tokens"] == ref, (ours["tokens"], ref)


def test_beam_beats_or_matches_greedy_likelihood(nets):
    """The beam result's ranked score must be >= the greedy path's —
    the defining property of beam search."""
    mod, net, params = nets
    rs = np.random.RandomState(1)
    mel = rs.randn(1, DIMS.n_mels, 2 * DIMS.n_audio_ctx).astype(np.float32)
    with torch.no_grad():
        feats_t = net.encoder(torch.from_numpy(mel))
    feats = jnp.asarray(feats_t.numpy())
    sot, eot = DIMS.n_vocab - 10, DIMS.n_vocab - 9

    beam = jwhisper.beam_decode(params["decoder"], DIMS, feats, [sot],
                                eot=eot, beam_size=3, max_tokens=10)
    greedy = jwhisper.decode_window(params["decoder"], DIMS, feats, [sot],
                                    eot=eot, max_tokens=10)
    # compare on the ranker's scale: sum_logprob / generated length
    def score(r):
        return r["avg_logprob"] * (len(r["tokens"]) + 1) \
            / max(len(r["tokens"]), 1)

    assert score(beam) >= score(greedy) - 1e-6


def test_decode_with_fallback_beam_and_best_of(nets):
    """Plumbing: beam_size engages at t=0; best_of engages at t>0."""
    from rvc_maker_tpu.speaker import transcribe as tmod

    class FakeTok:
        eot = DIMS.n_vocab - 9
        timestamp_begin = DIMS.n_vocab - 5
        no_speech = DIMS.n_vocab - 8

        def sot_sequence(self):
            return [DIMS.n_vocab - 10]

        def decode(self, ids):
            return " ".join(map(str, ids))

    mod, net, params = nets
    rs = np.random.RandomState(2)
    mel = rs.randn(1, DIMS.n_mels, 2 * DIMS.n_audio_ctx).astype(np.float32)
    with torch.no_grad():
        feats_t = net.encoder(torch.from_numpy(mel))
    feats = jnp.asarray(feats_t.numpy())

    r0 = tmod.decode_with_fallback(
        params, DIMS, FakeTok(), feats, suppress=None,
        temperatures=[0.0], compression_ratio_threshold=None,
        logprob_threshold=None, beam_size=2)
    assert isinstance(r0["tokens"], list)

    rng = np.random.default_rng(0)
    r1 = tmod.decode_with_fallback(
        params, DIMS, FakeTok(), feats, suppress=None,
        temperatures=[0.7], compression_ratio_threshold=None,
        logprob_threshold=None, rng=rng, best_of=3)
    assert isinstance(r1["tokens"], list)
