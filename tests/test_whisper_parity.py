"""Whisper parity vs the reference (random weights, tiny dims) +
tokenizer tests against the shipped tiktoken vocabularies."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import whisper as jwhisper
from rvc_maker_tpu.speaker.whisper_tokenizer import WhisperTokenizer

from reference_util import REFERENCE_ROOT, ref_module, _shim_module

VOCAB = (REFERENCE_ROOT
         + "/assets/models/speaker_diarization/assets/multilingual.tiktoken")


def _install_whisper_shims():
    if "tiktoken" not in sys.modules:
        tk = _shim_module("tiktoken")
        tk.Encoding = object
        sys.modules["tiktoken"] = tk
    if "numba" not in sys.modules:
        nb = _shim_module("numba")

        def jit(*a, **k):
            def deco(fn):
                return fn
            return deco

        nb.jit = jit
        sys.modules["numba"] = nb
    # the reference whisper imports main.library.utils (load_audio) whose
    # own imports (soundfile/pydub/Config) are unavailable — stub just the
    # symbol whisper uses
    if "main.library.utils" not in sys.modules:
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        import importlib

        importlib.import_module("main.library")
        stub = _shim_module("main.library.utils")

        def load_audio(logger, path, sample_rate=16000, **kw):
            from rvc_maker_tpu.utils.audio import load_audio as la

            return la(path, sample_rate)

        stub.load_audio = load_audio
        sys.modules["main.library.utils"] = stub


@pytest.fixture(scope="module")
def ref_mod():
    _install_whisper_shims()
    return ref_module("main.library.speaker_diarization.whisper")


DIMS = jwhisper.WhisperDims(
    n_mels=80, n_audio_ctx=100, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
    n_text_head=4, n_text_layer=2)


@pytest.fixture(scope="module")
def net_and_params(ref_mod):
    torch.manual_seed(0)
    net = ref_mod.Whisper(ref_mod.ModelDimensions(
        n_mels=DIMS.n_mels, n_audio_ctx=DIMS.n_audio_ctx,
        n_audio_state=DIMS.n_audio_state, n_audio_head=DIMS.n_audio_head,
        n_audio_layer=DIMS.n_audio_layer, n_vocab=DIMS.n_vocab,
        n_text_ctx=DIMS.n_text_ctx, n_text_state=DIMS.n_text_state,
        n_text_head=DIMS.n_text_head, n_text_layer=DIMS.n_text_layer))
    torch.nn.init.normal_(net.decoder.positional_embedding, std=0.02)
    net.eval()
    params = jwhisper.params_from_state_dict(net.state_dict(), DIMS)
    return net, params


def test_log_mel_matches_reference(ref_mod, monkeypatch):
    import os

    rs = np.random.RandomState(0)
    audio = (rs.randn(16000) * 0.2).astype(np.float32)
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)  # mel_filters.npz resolved relatively
    try:
        ref = ref_mod.log_mel_spectrogram(torch.from_numpy(audio)).numpy()
    finally:
        os.chdir(cwd)
    ours = np.asarray(jwhisper.log_mel(jnp.asarray(audio[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_encoder_parity(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(1)
    mel = rs.randn(1, 80, 2 * DIMS.n_audio_ctx).astype(np.float32)
    with torch.no_grad():
        ref = net.encoder(torch.from_numpy(mel)).numpy()
    ours = np.asarray(jwhisper.encode_audio(params["encoder"], DIMS,
                                            jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_decoder_parity(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(2)
    mel = rs.randn(1, 80, 2 * DIMS.n_audio_ctx).astype(np.float32)
    tokens = rs.randint(0, 50000, (1, 7))
    with torch.no_grad():
        ref = net(torch.from_numpy(mel), torch.from_numpy(tokens)).numpy()
    feats = jwhisper.encode_audio(params["encoder"], DIMS, jnp.asarray(mel))
    ours = np.asarray(jwhisper.decode_logits(params["decoder"], DIMS,
                                             jnp.asarray(tokens), feats))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_cached_greedy_matches_full_decode(net_and_params):
    """The KV-cache step must reproduce full-context decoding."""
    _, params = net_and_params
    rs = np.random.RandomState(3)
    feats = jnp.asarray(rs.randn(1, DIMS.n_audio_ctx, DIMS.n_audio_state)
                        .astype(np.float32) * 0.3)
    prompt = [50258, 50259, 50360]
    out_cached = jwhisper.greedy_decode(params["decoder"], DIMS, feats,
                                        prompt, eot=50257, max_tokens=6)
    # reference greedy with the full decoder each step
    tokens = list(prompt)
    out_full = []
    for _ in range(6):
        logits = jwhisper.decode_logits(params["decoder"], DIMS,
                                        jnp.asarray([tokens]), feats)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == 50257:
            break
        out_full.append(nxt)
        tokens.append(nxt)
    assert out_cached == out_full


def test_tokenizer_roundtrip_and_specials():
    tok = WhisperTokenizer(VOCAB, multilingual=True, language="en")
    # whisper multilingual layout: eot 50257, sot 50258, ts_begin 50364
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.timestamp_begin == 50364
    assert tok.language_token == 50259  # <|en|>
    for text in ("Hello world!", " hello, WORLD 123", "don't stop"):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    assert tok.sot_sequence() == [50258, 50259, tok.transcribe]
    assert abs(tok.timestamp_to_seconds(tok.timestamp_begin + 50) - 1.0) < 1e-9


def test_tokenizer_nonspeech_suppression_list():
    tok = WhisperTokenizer(VOCAB)
    ns = tok.non_speech_tokens()
    assert len(ns) > 10
    assert all(isinstance(i, int) for i in ns)
