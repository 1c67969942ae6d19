"""Dynamic convert batcher: concurrent requests ride one device batch
and each caller gets exactly its own utterance back."""

import threading

import numpy as np
import pytest

import jax

from rvc_maker_tpu.app.batcher import ConvertBatcher
from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings

CFG = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


@pytest.fixture(scope="module")
def pipeline():
    params = syn.init_params(jax.random.PRNGKey(0), CFG)
    hub = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    return ConvertPipeline(params, CFG, hub, version="v2")


def _tone(freq, secs=0.6, sr=16000):
    t = np.arange(int(secs * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_batcher_matches_direct(pipeline):
    settings = ConvertSettings(f0_method="yin", index_rate=0.0)
    batcher = ConvertBatcher(pipeline, max_batch=8, max_wait_ms=80)
    try:
        freqs = [180.0, 220.0, 260.0, 300.0]
        results = {}
        errors = []

        def worker(f):
            try:
                results[f] = batcher.convert(_tone(f), 0, settings,
                                             timeout=600)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(f,)) for f in freqs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors

        audio = np.stack([_tone(f) for f in freqs])
        lengths = np.full((len(freqs),), audio.shape[1], np.int64)
        direct, _ = pipeline.convert_batch(audio, lengths, 0, settings)
        direct = np.asarray(direct)
        upp = pipeline.cfg.upp
        for i, f in enumerate(freqs):
            got = results[f]
            assert got.shape[0] == len(got)
            # requests may split across wait windows -> different batch
            # shapes -> reduction-order noise; still the same waveform.
            # The batcher pads requests to 1 s length buckets, so the
            # decode's receptive field lets the padding bleed into the
            # last frame of output — exclude it from the strict check.
            n = len(got) - upp
            np.testing.assert_allclose(got[:n], direct[i][:n],
                                       atol=2e-3, rtol=2e-3)
            assert np.abs(got[n:]).max() < 0.5  # tail is still sane audio
    finally:
        batcher.close()


def test_batcher_mixed_lengths_and_sids(pipeline):
    settings = ConvertSettings(f0_method="yin", index_rate=0.0)
    batcher = ConvertBatcher(pipeline, max_batch=8, max_wait_ms=80)
    try:
        specs = [(200.0, 0.5, 0), (240.0, 0.8, 1), (280.0, 0.5, 0)]
        results = {}

        def worker(i, f, secs, sid):
            results[i] = batcher.convert(_tone(f, secs), sid, settings,
                                         timeout=600)

        threads = [threading.Thread(target=worker, args=(i, *s))
                   for i, s in enumerate(specs)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {0, 1, 2}
        # output lengths scale with the input lengths (upp/160 per sample)
        ratio = CFG.upp / 160.0
        for i, (f, secs, sid) in enumerate(specs):
            want = int(len(_tone(f, secs)) * ratio)
            assert abs(len(results[i]) - want) <= CFG.upp * 3
            assert np.all(np.isfinite(results[i]))
    finally:
        batcher.close()


def test_batcher_error_propagates(pipeline):
    batcher = ConvertBatcher(pipeline, max_batch=2, max_wait_ms=10)
    try:
        bad = ConvertSettings(f0_method="no-such-method", index_rate=0.0)
        with pytest.raises(Exception):
            batcher.convert(_tone(220.0, 0.3), 0, bad, timeout=120)
    finally:
        batcher.close()


def test_batcher_pow2_pad_respects_max_batch(pipeline):
    """Batch-axis pow2 padding must stay capped at max_batch: a
    non-power-of-two cap (e.g. 3) must never compile/run a larger
    device batch than the operator configured (review r5)."""

    class _Recorder:
        def __init__(self, pipe):
            self._pipe = pipe
            self.batch_sizes = []

        def __getattr__(self, name):
            return getattr(self._pipe, name)

        def convert_batch(self, audio, lengths, sid, settings):
            self.batch_sizes.append(audio.shape[0])
            return self._pipe.convert_batch(audio, lengths, sid, settings)

    rec = _Recorder(pipeline)
    batcher = ConvertBatcher(rec, max_batch=3, max_wait_ms=250)
    settings = ConvertSettings(f0_method="yin", index_rate=0.0)
    results = {}

    def call(i, freq):
        results[i] = batcher.convert(_tone(freq, 0.5), 0, settings,
                                     timeout=600)

    try:
        threads = [threading.Thread(target=call, args=(i, 200.0 + 20 * i))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        batcher.close()
    assert len(results) == 3
    for out in results.values():
        assert np.all(np.isfinite(out))
    assert rec.batch_sizes and max(rec.batch_sizes) <= 3, rec.batch_sizes
