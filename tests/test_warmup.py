"""Warm-start behavior (utils/warmup): both serve paths' buckets warm.

The two serve paths run DIFFERENT buckets for the same n-second request
(review r5): the dynamic batcher feeds convert_batch (x_pad reflected
inside the traced program -> n-second bucket) while the default path
convert_utterance reflect-pads on the host BEFORE bucketing
(-> (n + 2*x_pad)-second bucket).  warm_pipeline must precompile both,
or a warmed server still pays the full first-request compile on the
non-batcher path.
"""

import numpy as np

import jax

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings
from rvc_maker_tpu.utils.warmup import parse_warm_spec, warm_pipeline

CFG = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


class _StubPipe:
    """Records which entry points warm_pipeline exercises."""

    rmvpe_params = None

    def __init__(self):
        self.batch_shapes = []
        self.utterance_lens = []

    def convert_batch(self, audio, lengths, sid, settings):
        self.batch_shapes.append(tuple(audio.shape))
        return np.zeros((audio.shape[0], 16), np.float32), None

    def convert_utterance(self, audio, sid, settings):
        self.utterance_lens.append(len(audio))
        return np.zeros(16, np.float32)


def test_warm_covers_batch_and_utterance_paths():
    pipe = _StubPipe()
    warm_pipeline(pipe, seconds=(3,), batches=(1, 2), fetch=False)
    # convert_batch warmed at every (batch, seconds) shape
    assert pipe.batch_shapes == [(1, 48000), (2, 48000)]
    # the single-request path warmed once per batch-1 bucket (its
    # host-side x_pad means it runs a DIFFERENT program than the above)
    assert pipe.utterance_lens == [48000]


def test_warmed_pipeline_compiles_no_new_program_on_first_utterance():
    """After warm_pipeline, a real convert_utterance request of a warmed
    length must hit only cached programs (the r5 4.87 s regression was
    warmup compiling the unpadded bucket while the request ran the
    padded one)."""
    params = syn.init_params(jax.random.PRNGKey(0), CFG)
    hub = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    pipe = ConvertPipeline(params, CFG, hub, version="v2")
    settings = ConvertSettings(f0_method="yin", index_rate=0.0)

    warm_pipeline(pipe, settings, seconds=(1,), batches=(1,))
    n_programs = len(pipe._step_cache)
    assert n_programs > 0

    t = np.arange(16000) / 16000
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = pipe.convert_utterance(tone, 0, settings)
    assert np.isfinite(out).all()
    assert len(pipe._step_cache) == n_programs, (
        "convert_utterance compiled a bucket warmup missed")


def test_parse_warm_spec():
    assert parse_warm_spec("3,5") == [(1, 3), (1, 5)]
    assert parse_warm_spec("4x3, 1x10") == [(4, 3), (1, 10)]
    assert parse_warm_spec("") == []
