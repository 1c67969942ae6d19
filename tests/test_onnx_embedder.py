""".onnx embedder interchange: export HuBERT to ONNX, reload through the
JAX ONNX executor, feature parity, and ConvertPipeline equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.interop.onnx_embedder import (OnnxEmbedder,
                                                 export_embedder,
                                                 load_embedder, n_frames)
from rvc_maker_tpu.models import hubert as hubert_mod

CAP = 4000  # static graph capacity (samples)


@pytest.fixture(scope="module")
def embedder(tmp_path_factory):
    td = tmp_path_factory.mktemp("onnx_emb")
    params = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    path = str(td / "emb.onnx")
    export_embedder(params, path, version="v2", max_samples=CAP,
                    dynamic=False)
    return params, path


@pytest.fixture(scope="module")
def dyn_embedder(tmp_path_factory):
    td = tmp_path_factory.mktemp("onnx_emb_dyn")
    params = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    path = str(td / "emb_dyn.onnx")
    export_embedder(params, path, version="v2")  # dynamic default
    return params, path


def test_n_frames_matches_frontend():
    params = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    for L in (400, 3200, 4000):
        x = jnp.zeros((1, L))
        feats, _ = hubert_mod.extract_features(params, x, output_layer=2)
        assert feats.shape[1] == n_frames(L)


def test_feature_parity(embedder):
    params, path = embedder
    emb = load_embedder(path)
    assert isinstance(emb, OnnxEmbedder)
    assert emb.version == "v2" and emb.max_samples == CAP

    rs = np.random.RandomState(0)
    L = 3200  # < CAP: exercises padding + trim
    audio = jnp.asarray((rs.randn(2, L) * 0.1).astype(np.float32))
    lengths = jnp.asarray([L, L - 800], jnp.int32)
    # note: n_layers=2 graph, so layer-12 request clamps to available
    ref, _ = hubert_mod.extract_features(params, audio, lengths,
                                         output_layer=12)
    got = np.asarray(emb.features(audio, lengths))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_pipeline_equivalence(embedder):
    from rvc_maker_tpu.config import ModelConfig
    from rvc_maker_tpu.models import synthesizer as syn
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)

    params, path = embedder
    cfg = ModelConfig(
        spec_channels=129, segment_size=16, inter_channels=64,
        hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
        kernel_size=3, p_dropout=0.0, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)), upsample_rates=(5, 4, 2),
        upsample_initial_channel=64, upsample_kernel_sizes=(10, 8, 4),
        spk_embed_dim=4, gin_channels=32, sr=16000, use_f0=True,
        text_enc_hidden_dim=768)
    synth_params = syn.init_params(jax.random.PRNGKey(2), cfg)
    rs = np.random.RandomState(3)
    audio = (rs.randn(2, 3200) * 0.1).astype(np.float32)
    lengths = np.array([3200, 2400], np.int64)
    settings = ConvertSettings(pitch=0, index_rate=0.0, protect=0.5,
                               f0_method="yin", deterministic=True)

    # IMPORTANT: the pth pipeline must use the SAME 2-layer params
    pipe_pt = ConvertPipeline(synth_params, cfg, params, version="v2")
    wav_pt, _ = pipe_pt.convert_batch(audio, lengths, 0, settings)

    pipe_onnx = ConvertPipeline(synth_params, cfg, OnnxEmbedder(path),
                                version="v2")
    wav_onnx, _ = pipe_onnx.convert_batch(audio, lengths, 0, settings)
    np.testing.assert_allclose(np.asarray(wav_onnx), np.asarray(wav_pt),
                               rtol=1e-3, atol=1e-3)


def test_capacity_overflow_raises(embedder):
    _, path = embedder
    emb = OnnxEmbedder(path)
    with pytest.raises(ValueError, match="capacity"):
        emb.features(jnp.zeros((1, CAP + 320)),
                     jnp.asarray([CAP], jnp.int32))


# -- dynamic-axes embedder graphs -------------------------------------------

@pytest.mark.parametrize("L", [1600, 3200])
def test_dynamic_feature_parity_any_length(dyn_embedder, L):
    """One dynamic graph serves multiple waveform lengths exactly (no
    capacity padding, so parity is unpadded and tight)."""
    params, path = dyn_embedder
    emb = load_embedder(path)
    assert emb.dynamic and emb.max_samples is None
    rs = np.random.RandomState(L)
    audio = jnp.asarray((rs.randn(2, L) * 0.1).astype(np.float32))
    lengths = jnp.asarray([L, L - 800], jnp.int32)
    ref, _ = hubert_mod.extract_features(params, audio, lengths,
                                         output_layer=12)
    got = np.asarray(emb.features(audio, lengths))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_dynamic_no_overflow(dyn_embedder):
    """Lengths beyond any former capacity run fine on a dynamic graph."""
    _, path = dyn_embedder
    emb = OnnxEmbedder(path)
    L = CAP + 640
    got = emb.features(jnp.zeros((1, L)), jnp.asarray([L], jnp.int32))
    assert got.shape[1] == n_frames(L)
