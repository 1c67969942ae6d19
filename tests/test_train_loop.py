"""Full train() epoch loop: checkpointing, resume, inference-weight
export, TB eval logging (train_loop.py vs reference train.py run loop)."""

import os

import numpy as np
import pytest

import jax

from rvc_maker_tpu.config import (DataConfig, ModelConfig, RVCConfig,
                                  TrainConfig)
from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.pipelines import extract as extract_mod
from rvc_maker_tpu.pipelines.preprocess import preprocess_dataset
from rvc_maker_tpu.utils.audio import save_wav

SR = 6400
HOP = 64
SEG = 8

CFG = RVCConfig(
    version="v2",
    train=TrainConfig(segment_size=SEG * HOP, log_interval=1),
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
def test_train_loop_end_to_end(tmp_path, monkeypatch):
    dataset = tmp_path / "dataset" / "0"
    exp = str(tmp_path / "exp")
    os.makedirs(dataset)

    rs = np.random.RandomState(0)
    for i in range(2):
        t = np.arange(SR * 4) / SR
        audio = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)
                 + rs.randn(len(t)) * 0.01).astype(np.float32)
        save_wav(str(dataset / f"s{i}.wav"), audio, SR)

    preprocess_dataset(str(tmp_path / "dataset"), exp, SR, per=1.0,
                       num_workers=1)
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    extract_mod.extract_f0(exp, method="yin")
    extract_mod.extract_embeddings(exp, hubert_params, version="v2")
    extract_mod.write_mute_fixture(exp, CFG, hubert_params, "v2")
    extract_mod.generate_filelist(exp, CFG, "v2")

    # narrow discriminators for CPU speed
    from rvc_maker_tpu.pipelines import train as train_mod

    orig_init, orig_step = train_mod.init_state, train_mod.make_sharded_train_step
    monkeypatch.setattr(train_mod, "init_state",
                        lambda rng, cfg, **kw: orig_init(
                            rng, cfg, disc_width_div=16))
    monkeypatch.setattr(train_mod, "make_sharded_train_step",
                        lambda cfg, mesh, **kw: orig_step(
                            cfg, mesh, disc_width_div=16))

    from jax.sharding import Mesh

    from rvc_maker_tpu.pipelines.train_loop import train

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    state = train(exp, CFG, total_epochs=1, batch_size=2,
                  save_every_epoch=1, mesh=mesh)
    step1 = int(np.asarray(state.step))
    assert step1 > 0
    assert os.path.isdir(os.path.join(exp, "ckpt_latest"))
    # reference-style name: {model_name}_{epoch}e_{step}s.pth
    weights = [f for f in os.listdir(exp)
               if f.endswith("s.pth") and "e_" in f]
    assert weights, os.listdir(exp)

    # the exported weights load back through the interchange loader
    from rvc_maker_tpu.interop import load_synthesizer_pth

    params, cfg_loaded, meta = load_synthesizer_pth(
        os.path.join(exp, weights[0]))
    assert cfg_loaded.sr == SR and meta["version"] == "v2"

    # TB events exist (scalars + eval audio/mel from _log_eval_sample)
    tb_dir = os.path.join(exp, "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
    size = sum(os.path.getsize(os.path.join(tb_dir, f))
               for f in os.listdir(tb_dir))
    assert size > 1000  # audio + image summaries are much larger than bare scalars

    # resume: epoch 2 continues from the checkpoint
    state2 = train(exp, CFG, total_epochs=2, batch_size=2,
                   save_every_epoch=1, mesh=mesh)
    assert int(np.asarray(state2.step)) > step1

    # off-main-thread resume (the web UI runs training jobs in a worker
    # thread; r4 regression: signal.signal raised ValueError there)
    import threading

    result = {}

    def run_in_thread():
        try:
            result["state"] = train(exp, CFG, total_epochs=3, batch_size=2,
                                    save_every_epoch=1, mesh=mesh)
        except BaseException as e:  # noqa: BLE001
            result["error"] = e

    th = threading.Thread(target=run_in_thread)
    th.start()
    th.join(timeout=600)
    assert "error" not in result, result.get("error")
    assert int(np.asarray(result["state"].step)) > int(np.asarray(state2.step))


def test_overtraining_detector_matches_reference_semantics():
    """G+D EMA histories, window checks (G eps 0.01, D window 2x with
    eps 0.004), consecutive counters, JSON persistence — semantics of
    reference train.py:899-953, checked against a direct transcription
    of its check/update functions."""
    from rvc_maker_tpu.pipelines.train_loop import OvertrainingDetector

    def ref_check(history, threshold, epsilon):
        if len(history) < threshold + 1:
            return False
        for i in range(-threshold, -1):
            if history[i + 1] > history[i]:
                return True
            if abs(history[i + 1] - history[i]) >= epsilon:
                return False
        return True

    def ref_ema(history, new_value, smoothing=0.987):
        v = new_value if not history else (smoothing * history[-1]
                                           + (1 - smoothing) * new_value)
        history.append(v)
        return v

    rs = np.random.RandomState(0)
    det = OvertrainingDetector(threshold_g=4)
    sg, sd = [], []
    cg = cd = 0
    for step in range(40):
        g = 30.0 - 0.5 * step + rs.rand() * 0.001   # improving, then...
        d = 5.0 + (0.2 * step if step > 20 else -0.05 * step)
        if step > 25:
            g = 18.0 + 0.3 * step                    # ...regressing
        done = det.update(g, d)
        ref_ema(sg, float(g))
        ref_ema(sd, float(d))
        if ref_check(sg, 4, 0.01):
            cg += 1
        else:
            cg = 0
        if ref_check(sd, 8, 0.004):
            cd += 1
        else:
            cd = 0
        ref_done = cg == 4 or cd == 8
        np.testing.assert_allclose(det.smoothed_gen, sg, rtol=1e-12)
        np.testing.assert_allclose(det.smoothed_disc, sd, rtol=1e-12)
        assert (det.consecutive_gen, det.consecutive_disc) == (cg, cd)
        assert done == ref_done, step


def test_overtraining_detector_json_roundtrip(tmp_path):
    from rvc_maker_tpu.pipelines.train_loop import OvertrainingDetector

    det = OvertrainingDetector(threshold_g=3)
    for i in range(5):
        det.update(10.0 - i, 4.0 + 0.1 * i)
    path = str(tmp_path / "training_data.json")
    det.save_json(path)

    import json

    d = json.load(open(path))
    assert set(d) == {"loss_disc_history", "smoothed_loss_disc_history",
                      "loss_gen_history", "smoothed_loss_gen_history"}

    det2 = OvertrainingDetector(threshold_g=3)
    det2.load_json(path)
    assert det2.loss_gen_history == det.loss_gen_history
    assert det2.smoothed_disc == det.smoothed_disc


def test_eval_sample_logging_produces_audio_and_mel():
    """_log_eval_sample must emit both the audio and the mel image —
    a silent signature break here (caught live in r4: mel_spectrogram
    kwarg drift) would be swallowed by its never-kill-training guard."""
    from rvc_maker_tpu.pipelines import train as train_mod
    from rvc_maker_tpu.pipelines.train_loop import _log_eval_sample

    state = train_mod.init_state(jax.random.PRNGKey(0), CFG,
                                 disc_width_div=16)
    rs = np.random.RandomState(0)
    b, t = 2, 24
    batch = train_mod.Batch(
        phone=rs.randn(b, t, 768).astype(np.float32),
        phone_lengths=np.full((b,), t, np.int32),
        pitch=rs.randint(1, 256, (b, t)).astype(np.int32),
        pitchf=(rs.rand(b, t) * 200 + 80).astype(np.float32),
        spec=rs.randn(b, t, 129).astype(np.float32),
        spec_lengths=np.full((b,), t, np.int32),
        wave=(rs.randn(b, t * HOP, 1) * 0.1).astype(np.float32),
        sid=np.zeros((b,), np.int32))

    calls = []

    class FakeTB:
        def audio(self, step, tag, wav, sr):
            calls.append(("audio", tag, len(wav)))

        def mel_image(self, step, tag, mel):
            calls.append(("mel", tag, mel.shape))

        def flush(self):
            pass

    _log_eval_sample(FakeTB(), state, CFG, batch, step=1)
    kinds = [c[0] for c in calls]
    assert "audio" in kinds and "mel" in kinds, calls
