"""Epoch loop, checkpointing, resume, and inference-weight export.

Reference behavior (train.py run/train_and_evaluate): per-epoch LR decay,
G_/D_ checkpoints (latest or per-N-epochs), stripped inference weights
exported per save, overtraining detector on EMA-smoothed losses, scalar
logging every log_interval.

TPU-native: one jitted sharded train step over a Mesh; orbax checkpoints
hold the whole TrainState (params + optimizer + step + lr), so resume is
exact.  SIGTERM triggers a final checkpoint save (preemption tolerance,
SURVEY.md §5.3).
"""

from __future__ import annotations

import logging
import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from ..config import RVCConfig
from ..parallel import data_mesh, replicate
from ..parallel import distributed as dist_mod
from . import data as data_mod
from . import train as train_mod

from ..utils.i18n import tr

logger = logging.getLogger(__name__)


def _prefetch_placed(batch_iter, place, depth: int = 2):
    """Assemble + device-place batches on a background thread, `depth`
    ahead of the consumer: the host-side item decode and the
    host->device upload of batch i+1 overlap the device compute of
    step i (the feed, not the math, bounds the step rate on slow
    interconnects — docs/perf_notes.md round 4).

    Cancellation-safe: if the consumer abandons the generator early
    (SIGTERM break, a raising step), the producer is signalled and
    exits instead of blocking in q.put() holding device batches."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    cancelled = threading.Event()

    def run():
        try:
            for item in batch_iter:
                placed = place(item)
                while not cancelled.is_set():
                    try:
                        q.put(placed, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                else:
                    return
                del placed
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — surface in consumer
            if not cancelled.is_set():
                q.put(e)

    threading.Thread(target=run, daemon=True,
                     name="train-batch-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()
        while not q.empty():     # release any buffered device batches
            try:
                q.get_nowait()
            except queue.Empty:
                break


def state_params_hash(state: train_mod.TrainState) -> str:
    """sha256 over params_g leaves in deterministic (flatten) order —
    used to certify byte-exact checkpoint restore across processes."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params_g)):
        h.update(np.ascontiguousarray(leaf).tobytes())
    return h.hexdigest()


def save_checkpoint(state: train_mod.TrainState, path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, template: train_mod.TrainState):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             item=jax.device_get(template))
    return train_mod.TrainState(*restored)


class OvertrainingDetector:
    """EMA-smoothed generator AND discriminator loss watcher with JSON
    persistence (reference train.py:899-953: check_overtraining /
    update_exponential_moving_average / save_to_json).

    The discriminator runs with twice the generator's patience window
    and a tighter epsilon (0.004 vs 0.01), exactly like the reference;
    training stops when either side's consecutive-increase count hits
    its window size."""

    def __init__(self, threshold_g: int = 50, smoothing: float = 0.987):
        self.smoothing = smoothing
        self.threshold_g = threshold_g
        self.loss_gen_history: list[float] = []
        self.smoothed_gen: list[float] = []
        self.loss_disc_history: list[float] = []
        self.smoothed_disc: list[float] = []
        self.consecutive_gen = 0
        self.consecutive_disc = 0

    @staticmethod
    def _check(history: list[float], threshold: int,
               epsilon: float) -> bool:
        """reference check_overtraining (train.py:899-904): any uptick
        in the window -> overtraining; any real improvement -> fine;
        a flat window -> overtraining."""
        if len(history) < threshold + 1:
            return False
        for i in range(-threshold, -1):
            if history[i + 1] > history[i]:
                return True
            if abs(history[i + 1] - history[i]) >= epsilon:
                return False
        return True

    def _ema(self, history: list[float], new_value: float) -> float:
        s = (new_value if not history
             else self.smoothing * history[-1]
             + (1 - self.smoothing) * new_value)
        history.append(s)
        return s

    def update(self, loss_g: float, loss_d: float) -> bool:
        self.loss_gen_history.append(float(loss_g))
        self._ema(self.smoothed_gen, float(loss_g))
        self.loss_disc_history.append(float(loss_d))
        self._ema(self.smoothed_disc, float(loss_d))
        if self._check(self.smoothed_gen, self.threshold_g, 0.01):
            self.consecutive_gen += 1
        else:
            self.consecutive_gen = 0
        if self._check(self.smoothed_disc, self.threshold_g * 2, 0.004):
            self.consecutive_disc += 1
        else:
            self.consecutive_disc = 0
        return (self.consecutive_gen == self.threshold_g
                or self.consecutive_disc == self.threshold_g * 2)

    def save_json(self, path: str) -> None:
        """reference save_to_json layout (train.py:911-913)."""
        import json

        with open(path, "w") as f:
            json.dump({"loss_disc_history": self.loss_disc_history,
                       "smoothed_loss_disc_history": self.smoothed_disc,
                       "loss_gen_history": self.loss_gen_history,
                       "smoothed_loss_gen_history": self.smoothed_gen}, f)

    def load_json(self, path: str) -> None:
        """Resume histories (reference continue_overtrain_detector,
        train.py:187-190)."""
        import json

        if not os.path.isfile(path):
            return
        with open(path) as f:
            d = json.load(f)
        self.loss_disc_history = list(d.get("loss_disc_history", []))
        self.smoothed_disc = list(d.get("smoothed_loss_disc_history", []))
        self.loss_gen_history = list(d.get("loss_gen_history", []))
        self.smoothed_gen = list(d.get("smoothed_loss_gen_history", []))


def train(exp_dir: str, cfg: RVCConfig, *, total_epochs: int,
          batch_size: int = 8, save_every_epoch: int = 5,
          save_only_latest: bool = True, mesh=None,
          log_writer=None, pretrain_g: str = "",
          pretrain_d: str = "", author: str = "",
          model_name: str = "",
          overtraining_detector: bool = True,
          overtraining_threshold: int = 50,
          save_every_weights: bool = True,
          cache_data: bool = False,
          cleanup: bool = False) -> train_mod.TrainState:
    """Run training from the experiment dir (expects filelist.txt).

    pretrain_g/pretrain_d: optional reference-format pretrained
    checkpoints used as initialization when no resume checkpoint exists
    (reference train.py:778-794).  author/model_name embed in exported
    inference weights; overtraining_* mirror train.py:900-953;
    save_every_weights=False exports inference weights only at the end
    (reference --save_every_weights)."""
    dist_mod.ensure_initialized()   # BEFORE any backend touch
    from ..utils.warmup import enable_compilation_cache

    enable_compilation_cache()   # fresh processes replay prior compiles
    rank, world = dist_mod.process_index(), dist_mod.process_count()
    primary = rank == 0
    if mesh is None:
        mesh = data_mesh()   # jax.devices() is global under multi-controller
    n_dev = int(np.prod([d for d in mesh.devices.shape]))

    if cleanup and primary:
        # reference --cleanup (train.py:190-203): wipe old run artifacts
        import shutil

        for name in ("ckpt_latest", "tb"):
            shutil.rmtree(os.path.join(exp_dir, name), ignore_errors=True)
        for f in os.listdir(exp_dir) if os.path.isdir(exp_dir) else []:
            if f.startswith("ckpt_e") or f.endswith("s.pth"):
                path = os.path.join(exp_dir, f)
                (shutil.rmtree if os.path.isdir(path) else os.remove)(path)

    dataset = data_mod.TrainingDataset(os.path.join(exp_dir, "filelist.txt"),
                                       cfg, cache_in_memory=cache_data)
    logger.info("dataset: %d rows; mesh: %s devices", len(dataset), n_dev)

    tb = None
    if log_writer is None and primary:
        from .tb_logging import TensorBoardLogger

        tb = TensorBoardLogger(os.path.join(exp_dir, "tb"))

        def log_writer(step, metrics):
            tb.scalars(step, {f"loss/{k}" if k.startswith("loss") else k: v
                              for k, v in metrics.items()})
            tb.flush()

    state = train_mod.init_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    start_epoch = 1
    latest = os.path.join(exp_dir, "ckpt_latest")
    if not os.path.isdir(latest):
        if pretrain_g:
            from ..interop.torch_import import load_pretrained_g

            logger.info("initializing G from %s", pretrain_g)
            state = state._replace(
                params_g=load_pretrained_g(pretrain_g, cfg.model))
        if pretrain_d:
            from ..interop.torch_import import load_pretrained_d

            logger.info("initializing D from %s", pretrain_d)
            state = state._replace(
                params_d=load_pretrained_d(pretrain_d, cfg.version))
    if os.path.isdir(latest):
        state = load_checkpoint(latest, state)
        steps_per_epoch = max(len(dataset) // max(batch_size * n_dev, 1), 1)
        start_epoch = int(np.asarray(state.step)) // steps_per_epoch + 1
        logger.info(tr("save_checkpoint", checkpoint_path=latest,
                       checkpoint_dict=start_epoch - 1))
        if os.environ.get("RVC_TPU_RESUME_HASH"):
            # ops evidence that the restored in-process state is bit-
            # identical to the on-disk checkpoint (tools/e2e_train_tpu.py
            # computes the same digest out-of-process and compares)
            logger.info("resume params_g sha256=%s step=%d",
                        state_params_hash(state),
                        int(np.asarray(state.step)))
    # one host-side read of the (possibly resumed) step counter; the
    # epoch loop increments it locally instead of fetching state.step
    # from the device every step
    host_step = int(np.asarray(state.step))
    state = replicate(state, mesh)

    step_fn = train_mod.make_sharded_train_step(
        cfg, mesh, remat=cfg.train.remat, bf16=cfg.train.bf16)
    detector = OvertrainingDetector(threshold_g=overtraining_threshold)
    training_json = os.path.join(exp_dir, "training_data.json")
    detector.load_json(training_json)   # resume histories (train.py:187-190)

    stop = {"now": False}

    def _sigterm(signum, frame):
        logger.warning(tr("sigterm_save"))
        stop["now"] = True

    import threading as _threading

    on_main = _threading.current_thread() is _threading.main_thread()
    # signal.signal raises ValueError off the main thread (the web UI
    # runs training jobs in a worker thread); preemption tolerance is a
    # process-level concern, so only the main thread registers
    old_handler = (signal.signal(signal.SIGTERM, _sigterm)
                   if on_main else None)

    rng = jax.random.PRNGKey(cfg.train.seed + 777)
    try:
        for epoch in range(start_epoch, total_epochs + 1):
            t0 = time.time()
            n_batches = 0
            def _place(batch):
                if cfg.train.bf16:
                    # the step casts phone/wave to bf16 anyway — casting
                    # on the host first halves the host->device feed
                    # (phone alone is B x T x 768 fp32), numerically
                    # identical to the in-step cast
                    import dataclasses as _dc

                    import ml_dtypes

                    batch = _dc.replace(
                        batch,
                        phone=batch.phone.astype(ml_dtypes.bfloat16),
                        wave=batch.wave.astype(ml_dtypes.bfloat16))
                    if os.environ.get("RVC_TPU_BF16_SPEC", "0") == "1":
                        # quantized-training A/B (r5): the spec is the
                        # largest remaining fp32 feed tensor (B,T,513).
                        # The generator path casts it to bf16 anyway; the
                        # fp32 mel TARGET then computes from bf16-rounded
                        # spec values — a measured quality trade, not a
                        # default (see docs/perf_notes.md round 5)
                        batch = _dc.replace(
                            batch,
                            spec=batch.spec.astype(ml_dtypes.bfloat16))
                return dist_mod.shard_host_local(batch, mesh)

            for batch in _prefetch_placed(
                    data_mod.batches_for_epoch(
                        dataset, batch_size=batch_size * n_dev, epoch=epoch,
                        seed=cfg.train.seed, rank=rank, num_replicas=world),
                    _place):
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, replicate(step_rng, mesh))
                n_batches += 1
                # host-side step counter: fetching state.step here was a
                # PER-STEP device sync that serialized the async dispatch
                # pipeline (r5 multihost diagnosis — the exact "accidental
                # host sync in the loop" class); metrics still fetch, but
                # only every log_interval steps
                host_step += 1
                step = host_step
                if step % cfg.train.log_interval == 0:
                    m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    logger.info("epoch %d step %d: %s", epoch, step,
                                {k: round(v, 4) for k, v in m.items()})
                    if log_writer is not None:
                        log_writer(step, m)
                if stop["now"]:
                    break
            state = train_mod.decay_lr(state, cfg)
            loss_g = float(np.asarray(metrics["loss_g"])) if n_batches else 0.0
            loss_d = float(np.asarray(metrics["loss_d"])) if n_batches else 0.0
            overtrained = (overtraining_detector and epoch > 1
                           and detector.update(loss_g, loss_d))
            if overtrained:
                logger.warning(tr(
                    "overtraining_find", epoch=epoch,
                    smoothed_value_gen=f"{detector.smoothed_gen[-1]:.3f}",
                    smoothed_value_disc=f"{detector.smoothed_disc[-1]:.3f}"))
                stop["now"] = True    # reference done=True: save and stop
            if overtraining_detector and primary:
                # every epoch, not just save epochs: the histories are the
                # only epoch-resolution loss record when log_interval (200)
                # exceeds the steps in a short run
                detector.save_json(training_json)
            logger.info("epoch %d done (%d batches, %.1fs) loss_g %.4f "
                        "loss_d %.4f", epoch, n_batches, time.time() - t0,
                        loss_g, loss_d)
            if epoch % save_every_epoch == 0 or stop["now"] or epoch == total_epochs:
                # params are fully replicated, so only the primary writes
                # (reference rank-0 guard, train.py:919-924); barrier keeps
                # non-primaries from racing ahead into the next epoch
                dist_mod.sync_global("pre-save")
                if primary:
                    save_checkpoint(state, latest)
                if primary and not save_only_latest:
                    save_checkpoint(state, os.path.join(exp_dir, f"ckpt_e{epoch}"))
                if primary and (save_every_weights or epoch == total_epochs
                                or stop["now"]):
                    name = model_name or os.path.basename(
                        os.path.normpath(exp_dir))
                    step_n = int(np.asarray(state.step))
                    export_inference_weights(
                        state, cfg,
                        os.path.join(exp_dir,
                                     f"{name}_{epoch}e_{step_n}s.pth"),
                        epoch=epoch, author=author)
                if primary and tb is not None and n_batches:
                    _log_eval_sample(tb, state, cfg, batch,
                                     int(np.asarray(state.step)))
                dist_mod.sync_global("post-save")
            if stop["now"]:
                break
    finally:
        if on_main:
            signal.signal(signal.SIGTERM, old_handler)
        if tb is not None:
            tb.close()
    return state


def _log_eval_sample(tb, state: train_mod.TrainState, cfg: RVCConfig,
                     batch: train_mod.Batch, step: int) -> None:
    """Generated audio + mel image for the first item of the last batch
    (reference train_and_evaluate eval block, train.py:883-895)."""
    try:
        import jax.numpy as jnp

        from ..models import synthesizer as syn
        from ..ops.stft import mel_spectrogram

        params = jax.device_get(state.params_g)
        m = cfg.model
        phone = jnp.asarray(np.asarray(batch.phone)[:1])
        t = phone.shape[1]
        lengths = jnp.minimum(jnp.asarray(np.asarray(batch.phone_lengths)[:1]),
                              t)
        pitch = (jnp.asarray(np.asarray(batch.pitch)[:1]) if m.use_f0
                 else None)
        pitchf = jnp.asarray(np.asarray(batch.pitchf)[:1])
        sid = jnp.asarray(np.asarray(batch.sid)[:1])
        z = jnp.zeros((1, t, m.inter_channels), jnp.float32)
        sn = jnp.zeros((1, t * m.upp, 1), jnp.float32)
        wav, _, _ = syn.infer(params, m, phone, lengths, pitch, pitchf,
                              sid, z, sn)
        wav_np = np.asarray(wav)[0, :, 0]
        tb.audio(step, "eval/generated", wav_np, m.sr)
        mel = np.asarray(mel_spectrogram(
            jnp.asarray(wav_np[None]), n_fft=cfg.data.filter_length,
            num_mels=cfg.data.n_mel_channels, sample_rate=m.sr,
            hop_length=cfg.data.hop_length,
            win_length=cfg.data.win_length, fmin=0.0, fmax=None))[0]
        tb.mel_image(step, "eval/mel_generated", mel)
        tb.flush()
    except Exception:  # noqa: BLE001 — eval logging must never kill training
        logger.exception("eval sample logging failed")


def export_inference_weights(state: train_mod.TrainState, cfg: RVCConfig,
                             path: str, *, epoch: int = 0,
                             author: str = "") -> None:
    """Write reference-interchange inference weights (.pth): fp16 state
    dict minus enc_q + config list + metadata (train.py:724-744)."""
    from ..interop.torch_export import export_synthesizer_pth

    params = jax.device_get(state.params_g)
    export_synthesizer_pth(params, cfg, path, epoch=epoch,
                           step=int(np.asarray(state.step)), author=author)
