"""Data-parallel batch conversion over the mesh == single-device output."""

import numpy as np

import jax

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.parallel import data_mesh
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings

CFG_M = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


def test_mesh_convert_matches_single_device():
    synth_params = syn.init_params(jax.random.PRNGKey(0), CFG_M)
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1), n_layers=2)
    rs = np.random.RandomState(0)
    index = rs.randn(128, 768).astype(np.float32)

    b = 8
    t = np.arange(16000) / 16000
    audio = np.stack([
        0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t) for i in range(b)
    ]).astype(np.float32)
    lengths = np.full((b,), audio.shape[1])
    settings = ConvertSettings(f0_method="yin", index_rate=0.5,
                               deterministic=True)

    single = ConvertPipeline(synth_params, CFG_M, hubert_params,
                             version="v2", index_vectors=index)
    wav1, _ = single.convert_batch(audio, lengths, 0, settings)

    mesh = data_mesh()
    parallel = ConvertPipeline(synth_params, CFG_M, hubert_params,
                               version="v2", index_vectors=index, mesh=mesh)
    wavN, _ = parallel.convert_batch(audio, lengths, 0, settings)

    np.testing.assert_allclose(np.asarray(wavN), np.asarray(wav1),
                               rtol=1e-3, atol=2e-4)
