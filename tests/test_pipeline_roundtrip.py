"""Integration: synthetic dataset -> preprocess -> extract -> index ->
train 2 steps -> convert, all on CPU with a tiny model (SURVEY.md §4.4)."""

import os

import numpy as np
import pytest

import jax

from rvc_maker_tpu.config import DataConfig, ModelConfig, RVCConfig, TrainConfig
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.pipelines import data as data_mod
from rvc_maker_tpu.pipelines import extract as extract_mod
from rvc_maker_tpu.pipelines import train as train_mod
from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings
from rvc_maker_tpu.pipelines.preprocess import preprocess_dataset
from rvc_maker_tpu.retrieval import build_index
from rvc_maker_tpu.utils.audio import save_wav

# consistent tiny model: hop == prod(upsample_rates) == sr/100 — the same
# invariant every real preset satisfies (e.g. 48k: hop 480 == 12*10*2*2)
SR = 6400
HOP = 64
SEG = 8

CFG = RVCConfig(
    version="v2",
    train=TrainConfig(segment_size=SEG * HOP),
    data=DataConfig(sample_rate=SR, filter_length=256, hop_length=HOP,
                    win_length=256, n_mel_channels=32),
    model=ModelConfig(
        spec_channels=129, segment_size=SEG, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        kernel_size=3, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8, 4, 4),
        spk_embed_dim=4, gin_channels=16, sr=SR, use_f0=True,
        text_enc_hidden_dim=768),
)


@pytest.mark.slow
def test_full_pipeline_roundtrip(tmp_path):
    dataset = tmp_path / "dataset" / "0"
    exp = tmp_path / "exp"
    os.makedirs(dataset)
    os.makedirs(exp)

    # --- synthetic voiced dataset: chirpy tones -------------------------
    rs = np.random.RandomState(0)
    for i in range(3):
        t = np.arange(SR * 4) / SR
        hz = 140 + 40 * i
        audio = (0.4 * np.sin(2 * np.pi * hz * t * (1 + 0.02 * np.sin(t)))
                 + rs.randn(len(t)) * 0.01).astype(np.float32)
        save_wav(str(tmp_path / "dataset" / "0" / f"s{i}.wav"), audio, SR)

    # --- preprocess ------------------------------------------------------
    n_seg = preprocess_dataset(str(tmp_path / "dataset"), str(exp), SR,
                               per=1.0, num_workers=1)
    assert n_seg > 0
    assert len(os.listdir(exp / "sliced_audios")) == n_seg
    assert len(os.listdir(exp / "sliced_audios_16k")) == n_seg

    # --- extract (yin f0 + random-weight tiny hubert) -------------------
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    nf = extract_mod.extract_f0(str(exp), method="yin")
    ne = extract_mod.extract_embeddings(str(exp), hubert_params, version="v2")
    assert nf == n_seg and ne == n_seg
    extract_mod.write_mute_fixture(str(exp), CFG, hubert_params, "v2")
    filelist = extract_mod.generate_filelist(str(exp), CFG, "v2")
    rows = open(filelist).read().strip().split("\n")
    assert len(rows) == n_seg + 2  # + 2 mute fixtures

    # --- index -----------------------------------------------------------
    feats = np.concatenate([
        np.load(os.path.join(exp, "v2_extracted", n))
        for n in sorted(os.listdir(exp / "v2_extracted"))], axis=0)
    index = build_index(feats, version="v2", max_rows=1e6)
    assert index.vectors.shape[1] == 768

    # --- train 2 steps ---------------------------------------------------
    dataset_obj = data_mod.TrainingDataset(filelist, CFG)
    state = train_mod.init_state(jax.random.PRNGKey(1), CFG, disc_width_div=16)
    step = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16))
    n_steps = 0
    for batch in data_mod.batches_for_epoch(dataset_obj, batch_size=2, epoch=1):
        state, metrics = step(state, batch, jax.random.PRNGKey(n_steps))
        assert np.isfinite(float(metrics["loss_g"]))
        n_steps += 1
        if n_steps >= 2:
            break
    assert n_steps >= 1

    # --- convert with the trained params --------------------------------
    pipe = ConvertPipeline(
        jax.device_get(state.params_g), CFG.model, hubert_params,
        version="v2", index_vectors=index.vectors)
    t = np.arange(16000 * 2) / 16000
    audio16 = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    out = pipe.convert_utterance(audio16, 0,
                                 ConvertSettings(f0_method="yin",
                                                 index_rate=0.5))
    assert out.ndim == 1 and len(out) > 0
    assert np.all(np.isfinite(out))
    # roughly 2 s at model sr back out (chunk trim changes length slightly)
    assert abs(len(out) / SR - 2.0) < 0.5
