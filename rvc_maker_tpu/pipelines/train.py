"""GAN training — TPU-native re-design of the reference trainer.

Reference behavior (train.py:746-986): per-batch D step then G step,
AdamW(0.8, 0.99, eps 1e-9), ExponentialLR 0.999875/epoch, losses =
LSGAN adv + 2x feature-matching + 45x mel L1 + 1x KL.

TPU-first differences (SURVEY.md §2.8):
  * no process-per-device forking / DDP: ONE jitted train_step over a
    jax.sharding.Mesh — batch sharded on 'data', params replicated, XLA
    inserts the gradient psums.
  * no GradScaler: bf16 has fp32 range; mixed precision is a dtype policy,
    not a scaler loop.  (fp32 default here; bf16 fast path later.)
  * the G forward is computed once; the D step consumes y_hat through a
    stop_gradient, the G step re-uses the same program's VJP.
  * weight-norm stays live (g, v) for weight-normed convs — but note the
    synthesizer param tree stores materialized weights; the reference's
    exact optimizer-dynamics of weight-norm are approximated by plain
    parametrization for the generator in round 1 (discriminators keep
    live (g, v)).

The data pipeline (filelists, bucketing) lives in pipelines/data.py.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RVCConfig
from ..models import discriminator as disc
from ..models import synthesizer as syn
from ..ops.nn import cast_floats as _cast_floats
from ..ops.nn import slice_segments
from ..ops.stft import mel_spectrogram, spec_to_mel


class TrainState(NamedTuple):
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    lr: jnp.ndarray  # current learning rate (decayed per epoch)


def make_optimizer(cfg: RVCConfig):
    # torch.optim.AdamW defaults: weight_decay=0.01
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.train.learning_rate,
        b1=cfg.train.betas[0], b2=cfg.train.betas[1],
        eps=cfg.train.eps, weight_decay=0.01)


def init_state(rng, cfg: RVCConfig, disc_width_div: int = 1) -> TrainState:
    kg, kd = jax.random.split(rng)
    params_g = syn.init_params(kg, cfg.model)
    params_d = disc.init_params(kd, cfg.version, disc_width_div)
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=opt.init(params_g),
        opt_d=opt.init(params_d),
        lr=jnp.asarray(cfg.train.learning_rate, jnp.float32),
    )


def decay_lr(state: TrainState, cfg: RVCConfig) -> TrainState:
    """Per-epoch exponential decay (reference train.py:796)."""
    return state._replace(lr=state.lr * cfg.train.lr_decay)


def _global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


@dataclasses.dataclass(frozen=True)
class Batch:
    """One training batch (padded static shapes, like the reference's
    bucketed collate train.py:541-606)."""
    phone: Any          # (B, T_spec, emb_dim) — features repeated x2 on host
    phone_lengths: Any  # (B,)
    pitch: Any          # (B, T_spec) int32 coarse
    pitchf: Any         # (B, T_spec) float Hz
    spec: Any           # (B, T_spec, spec_channels)
    spec_lengths: Any   # (B,)
    wave: Any           # (B, T_spec * hop, 1)
    sid: Any            # (B,)


def make_train_step(cfg: RVCConfig, disc_width_div: int = 1,
                    remat: bool = False, bf16: bool = False,
                    share_fwd: bool | None = None):
    """Returns jittable train_step(state, batch, rng) -> (state, metrics).

    disc_width_div shrinks discriminator channels for dry runs/tests
    (1 == reference architecture).  remat=True rematerializes the
    generator forward and discriminator applications during backprop
    (jax.checkpoint — the reference's torch.utils.checkpoint equivalent,
    train.py:619-623; trades FLOPs for HBM on long segments).

    bf16=True is the TPU-native mixed-precision mode (the reference's
    fp16 autocast + GradScaler, train.py:799,842): fp32 master params
    and optimizer state; forward/backward run with params and float
    inputs cast to bfloat16 (the cast happens inside the differentiated
    function, so grads land in fp32); the mel/KL losses compute in fp32
    (mel L1 x45 is the dominant term).  No loss scaling — bf16 has fp32
    exponent range.  SineGen phase accumulation stays fp32 inside
    generator_nsf regardless of dtype (models/synthesizer.py:305)."""
    mcfg = cfg.model
    dcfg = cfg.data
    seg_frames = cfg.train.segment_size // dcfg.hop_length
    periods = disc.PERIODS_V2 if cfg.version == "v2" else disc.PERIODS_V1
    opt = make_optimizer(cfg)
    half = jnp.bfloat16 if bf16 else None
    if share_fwd is None:
        # explicit single generator forward shared between the D and G
        # steps (jax.vjp) — RVC_TPU_SHARE_FWD=0 restores the legacy
        # two-call structure (XLA-CSE dependent)
        share_fwd = os.environ.get("RVC_TPU_SHARE_FWD", "1") == "1"

    def _forward_g_raw(params_g, batch: Batch, rng):
        if half is not None:
            params_g = _cast_floats(params_g, half)
            batch = _cast_floats(batch, half)
        y_hat, ids_slice, x_mask, y_mask, latents = syn.train_forward(
            params_g, mcfg, batch.phone, batch.phone_lengths,
            batch.pitch if mcfg.use_f0 else None, batch.pitchf,
            batch.spec, batch.spec_lengths, batch.sid, rng)
        if half is not None:
            # latents feed the fp32 KL loss; y_mask multiplies there too
            latents = _cast_floats(latents, jnp.float32)
            y_mask = y_mask.astype(jnp.float32)
        return y_hat, ids_slice, y_mask, latents

    forward_g = jax.checkpoint(_forward_g_raw) if remat else _forward_g_raw
    mpd = (jax.checkpoint(disc.mpd_apply, static_argnums=(3, 4))
           if remat else disc.mpd_apply)

    def d_loss_fn(params_d, wave_slice, y_hat):
        if half is not None:
            params_d = _cast_floats(params_d, half)
            wave_slice = wave_slice.astype(half)
            y_hat = y_hat.astype(half)
        y_d_r, y_d_g, _, _ = mpd(params_d, wave_slice,
                                 jax.lax.stop_gradient(y_hat),
                                 periods, disc_width_div)
        if half is not None:
            y_d_r = _cast_floats(y_d_r, jnp.float32)
            y_d_g = _cast_floats(y_d_g, jnp.float32)
        loss_d, r_losses, g_losses = disc.discriminator_loss(y_d_r, y_d_g)
        return loss_d, (r_losses, g_losses)

    def g_loss_fn(params_g, params_d, batch: Batch, rng):
        """Legacy combined loss (share_fwd=False): re-runs the generator
        forward inside the grad and defers to the shared post-decode
        loss for everything after it."""
        y_hat, ids_slice, y_mask, latents = forward_g(params_g, batch, rng)
        return _post_g_loss(y_hat, latents, y_mask, ids_slice, params_d,
                            batch)

    def _post_g_loss(y_hat, latents, y_mask, ids_slice, params_d,
                     batch: Batch):
        """G loss from a given generator forward (y_hat + latents) —
        the post-decode half of g_loss_fn, differentiated wrt
        (y_hat, latents) so the generator backward runs through ONE
        jax.vjp instead of re-running the forward inside value_and_grad."""
        z, z_p, m_p, logs_p, m_q, logs_q = latents
        y_hat32 = y_hat.astype(jnp.float32)
        mel = spec_to_mel(batch.spec.astype(jnp.float32),
                          n_fft=dcfg.filter_length,
                          n_mels=dcfg.n_mel_channels,
                          sample_rate=dcfg.sample_rate, fmin=dcfg.mel_fmin,
                          fmax=dcfg.mel_fmax)
        y_mel = slice_segments(mel, ids_slice, seg_frames)
        y_hat_mel = mel_spectrogram(
            y_hat32[:, :, 0], n_fft=dcfg.filter_length,
            num_mels=dcfg.n_mel_channels, sample_rate=dcfg.sample_rate,
            hop_length=dcfg.hop_length, win_length=dcfg.win_length,
            fmin=dcfg.mel_fmin, fmax=dcfg.mel_fmax)
        wave_slice = slice_segments(batch.wave, ids_slice * dcfg.hop_length,
                                    cfg.train.segment_size)
        d_params = (_cast_floats(params_d, half) if half is not None
                    else params_d)
        y_d_r, y_d_g, fmap_r, fmap_g = mpd(
            d_params,
            wave_slice.astype(half) if half is not None else wave_slice,
            y_hat, periods, disc_width_div)
        if half is not None:
            y_d_g = _cast_floats(y_d_g, jnp.float32)
            fmap_r = _cast_floats(fmap_r, jnp.float32)
            fmap_g = _cast_floats(fmap_g, jnp.float32)
        loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * cfg.train.c_mel
        loss_kl = disc.kl_loss(z_p, logs_q, m_p, logs_p,
                               y_mask) * cfg.train.c_kl
        loss_fm = disc.feature_loss(fmap_r, fmap_g)
        loss_adv, _ = disc.generator_loss(y_d_g)
        loss = loss_adv + loss_fm + loss_mel + loss_kl
        aux = dict(loss_mel=loss_mel, loss_kl=loss_kl, loss_fm=loss_fm,
                   loss_adv=loss_adv)
        return loss, aux

    def train_step(state: TrainState, batch: Batch, rng):
        rng_fwd, _ = jax.random.split(rng)

        if share_fwd:
            # ---- ONE generator forward, reused everywhere ---------------
            # The legacy step ran forward_g twice (D step + inside the G
            # value_and_grad) and relied on XLA CSE to dedupe; sharing it
            # explicitly via jax.vjp guarantees 1 forward + 1 backward.
            def fwd_wrap(pg):
                y_hat, ids_slice, y_mask, latents = forward_g(pg, batch,
                                                              rng_fwd)
                return (y_hat, latents), (ids_slice, y_mask)

            y_lat, g_vjp, fwd_aux = jax.vjp(fwd_wrap, state.params_g,
                                            has_aux=True)
            y_hat, latents = y_lat
            ids_slice, y_mask = fwd_aux

            # ---- D step (stop_gradient on the shared y_hat) -------------
            wave_slice = slice_segments(batch.wave,
                                        ids_slice * dcfg.hop_length,
                                        cfg.train.segment_size)
            (loss_d, _), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d, wave_slice, y_hat)
            d_updates, opt_d = opt.update(
                d_grads, _with_lr(state.opt_d, state.lr), state.params_d)
            params_d = optax.apply_updates(state.params_d, d_updates)

            # ---- G step vs the UPDATED D, backward through the vjp ------
            (loss_g, aux), (cot_y, cot_lat) = jax.value_and_grad(
                _post_g_loss, argnums=(0, 1), has_aux=True)(
                    y_hat, latents, y_mask, ids_slice, params_d, batch)
            (g_grads,) = g_vjp((cot_y, cot_lat))
        else:
            # ---- D step (generator output through stop_gradient) --------
            y_hat, ids_slice, _, _ = forward_g(state.params_g, batch,
                                               rng_fwd)
            wave_slice = slice_segments(batch.wave,
                                        ids_slice * dcfg.hop_length,
                                        cfg.train.segment_size)
            (loss_d, _), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d, wave_slice, y_hat)
            d_updates, opt_d = opt.update(
                d_grads, _with_lr(state.opt_d, state.lr), state.params_d)
            params_d = optax.apply_updates(state.params_d, d_updates)

            # ---- G step (against the UPDATED D, as the reference does) --
            (loss_g, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params_g, params_d, batch,
                                         rng_fwd)

        g_updates, opt_g = opt.update(
            g_grads, _with_lr(state.opt_g, state.lr), state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)

        metrics = dict(
            loss_g=loss_g, loss_d=loss_d,
            loss_mel=aux["loss_mel"], loss_kl=aux["loss_kl"],
            loss_fm=aux["loss_fm"], loss_adv=aux["loss_adv"],
            grad_norm_g=_global_norm(g_grads), grad_norm_d=_global_norm(d_grads),
            lr=state.lr,
        )
        new_state = TrainState(step=state.step + 1, params_g=params_g,
                               params_d=params_d, opt_g=opt_g, opt_d=opt_d,
                               lr=state.lr)
        return new_state, metrics

    # expose the building blocks for stage-level profiling
    # (bench_train.py BENCH_TRAIN_STAGED=1) without changing the fused
    # step's structure
    train_step.parts = dict(forward_g=forward_g, d_loss_fn=d_loss_fn,
                            g_loss_fn=g_loss_fn, opt=opt,
                            seg_frames=seg_frames)
    return train_step


def _with_lr(opt_state, lr):
    """Inject the current (epoch-decayed) learning rate into an
    inject_hyperparams optimizer state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


# ---------------------------------------------------------------------------
# sharded training (data-parallel over a mesh)
# ---------------------------------------------------------------------------

def make_sharded_train_step(cfg: RVCConfig, mesh, disc_width_div: int = 1,
                            remat: bool = False, bf16: bool = False):
    """jit the train step with batch sharded over 'data', params/opt
    replicated. XLA inserts the grad all-reduce (SURVEY.md §2.8).

    The returned step DONATES its input state (arg 0): the caller must
    rebind (``state, m = step(state, ...)``) and must not reuse the old
    state afterwards.  Beware that on the CPU backend ``device_put`` can
    alias the source buffers, so donating a replicated state can also
    invalidate the pre-replication arrays — pass a copy if you need to
    keep them (tests/test_train_step.py does)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(cfg, disc_width_div, remat, bf16)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    batch_spec = Batch(
        phone=batch_sh, phone_lengths=batch_sh, pitch=batch_sh,
        pitchf=batch_sh, spec=batch_sh, spec_lengths=batch_sh,
        wave=batch_sh, sid=batch_sh)

    return jax.jit(
        step,
        in_shardings=(repl, batch_spec, repl),
        out_shardings=(repl, repl),
        # donate the input state: without this every step materializes a
        # full second copy of params+optimizer (HBM traffic and, under
        # multi-controller, extra per-step allocation latency); the
        # single-device bench step (bench_train.py) already donates
        donate_argnums=(0,),
    )


jax.tree_util.register_pytree_node(
    Batch,
    lambda b: ((b.phone, b.phone_lengths, b.pitch, b.pitchf, b.spec,
                b.spec_lengths, b.wave, b.sid), None),
    lambda _, c: Batch(*c),
)
