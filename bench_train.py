#!/usr/bin/env python
"""Training-step throughput on the real chip (BASELINE r3, VERDICT #5).

Full v2-48k GAN train step (G forward incl. 17280-sample NSF decode,
MPD+MSD discriminator, both losses, both AdamW updates — the loop the
reference runs in train.py:811-986) at production model dims.  Prints ONE
JSON line: steps/s plus audio-hours-trained/day/chip (batch * segment
seconds * steps/day).

Env knobs: BENCH_TRAIN_BATCH (8), BENCH_TRAIN_ITERS (10),
BENCH_TRAIN_REMAT (0), BENCH_TRAIN_SPEC_FRAMES (200 — ~2 s utterances,
the bucket center; decode cost is segment-sliced so this mostly sizes
enc_q/flow/disc inputs).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _staged_profile(raw_step, cfg, state, batch_data, rng, log,
                    iters: int = 5):
    """Fenced per-stage device timings for the GAN step (VERDICT r3 #2).

    Re-runs the step's building blocks (exposed as raw_step.parts) as
    SEPARATE jitted programs with a host fetch after each, so every wall
    number is true serial device time for that stage.  The sum exceeds
    the fused step (no overlap, duplicate G forward runs visibly twice);
    the deltas still rank the stages.
    """
    import jax
    import jax.numpy as jnp

    from rvc_maker_tpu.ops.nn import slice_segments

    p = raw_step.parts
    hop = cfg.data.hop_length

    fwd = jax.jit(lambda pg, b, r: p["forward_g"](pg, b, r))

    def d_value_grad(pd, wave_slice, y_hat):
        return jax.value_and_grad(p["d_loss_fn"], has_aux=True)(
            pd, wave_slice, y_hat)

    def g_value_grad(pg, pd, b, r):
        return jax.value_and_grad(p["g_loss_fn"], has_aux=True)(pg, pd, b, r)

    d_vg = jax.jit(d_value_grad)
    g_vg = jax.jit(g_value_grad)

    def time_stage(name, fn, *args, fetch):
        fetch(fn(*args))       # compile
        times = []
        for _ in range(iters):
            t0 = time.time()
            fetch(fn(*args))
            times.append(time.time() - t0)
        log(f"stage {name}: best {min(times)*1e3:.1f} ms "
            f"({[f'{t*1e3:.0f}' for t in times]})")
        return min(times)

    rng_fwd, _ = jax.random.split(rng)
    y_hat, ids_slice, _, _ = fwd(state.params_g, batch_data, rng_fwd)
    wave_slice = slice_segments(jnp.asarray(batch_data.wave),
                                ids_slice * hop, cfg.train.segment_size)
    jax.block_until_ready(wave_slice)

    t_fwd = time_stage("G_forward", fwd, state.params_g, batch_data,
                       rng_fwd,
                       fetch=lambda o: float(np.asarray(o[0]).sum()))
    t_d = time_stage("D_value_and_grad", d_vg, state.params_d, wave_slice,
                     y_hat,
                     fetch=lambda o: float(np.asarray(o[0][0])))
    t_g = time_stage("G_value_and_grad(incl fwd)", g_vg, state.params_g,
                     state.params_d, batch_data, rng_fwd,
                     fetch=lambda o: float(np.asarray(o[0][0])))
    log(f"staged sum: fwd {t_fwd*1e3:.0f} + D-vg {t_d*1e3:.0f} + "
        f"G-vg {t_g*1e3:.0f} = {(t_fwd+t_d+t_g)*1e3:.0f} ms "
        f"(G backward ~= G-vg - fwd = {(t_g-t_fwd)*1e3:.0f} ms)")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rvc_tpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.pipelines import train as train_mod

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))
    remat = os.environ.get("BENCH_TRAIN_REMAT", "0") == "1"
    bf16 = os.environ.get("BENCH_TRAIN_BF16", "0") == "1"
    t_frames = int(os.environ.get("BENCH_TRAIN_SPEC_FRAMES", "200"))

    cfg = preset("v2", 48000)
    model = cfg.model
    hop = cfg.data.hop_length
    log(f"devices: {jax.devices()}  batch={batch} remat={remat} bf16={bf16} "
        f"spec_frames={t_frames} (segment {model.segment_size * model.upp} "
        f"samples)")

    state = jax.jit(lambda k: train_mod.init_state(k, cfg))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(state.params_g)

    rs = np.random.RandomState(0)
    batch_data = train_mod.Batch(
        phone=rs.randn(batch, t_frames,
                       model.text_enc_hidden_dim).astype(np.float32),
        phone_lengths=np.full((batch,), t_frames, np.int32),
        pitch=rs.randint(1, 256, (batch, t_frames)).astype(np.int32),
        pitchf=(rs.rand(batch, t_frames) * 200 + 80).astype(np.float32),
        spec=rs.randn(batch, t_frames,
                      model.spec_channels).astype(np.float32),
        spec_lengths=np.full((batch,), t_frames, np.int32),
        wave=(rs.randn(batch, t_frames * hop, 1) * 0.1).astype(np.float32),
        sid=rs.randint(0, model.spk_embed_dim, (batch,)).astype(np.int32),
    )

    # pre-stage the batch on device: phone+spec+wave at B=32 is ~360 MB,
    # a per-call host upload that would otherwise sit inside every timed
    # iteration (through the tunnel: ~0.3 s of the step wall)
    if bf16:
        # the bf16 step casts phone/wave to bf16 internally anyway —
        # feeding them bf16 (as train_loop._place does) removes the fp32
        # read inside the step.  BENCH_TRAIN_BF16_SPEC=1 additionally
        # feeds the spec bf16 (quantized-training A/B, r5: the mel
        # TARGET then derives from bf16-rounded spec).
        import dataclasses as _dc

        import ml_dtypes

        batch_data = _dc.replace(
            batch_data,
            phone=batch_data.phone.astype(ml_dtypes.bfloat16),
            wave=batch_data.wave.astype(ml_dtypes.bfloat16))
        if os.environ.get("BENCH_TRAIN_BF16_SPEC", "0") == "1":
            batch_data = _dc.replace(
                batch_data,
                spec=batch_data.spec.astype(ml_dtypes.bfloat16))
    batch_data = jax.device_put(batch_data)
    jax.block_until_ready(batch_data.phone)

    raw_step = train_mod.make_train_step(cfg, remat=remat, bf16=bf16)
    step = jax.jit(raw_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)

    # XLA's own cost model for the whole fused step: MAC accounting for
    # the MFU line (VERDICT r3 #2) without hand-counting conv shapes
    flops = None
    hbm_bytes = None
    try:
        ca = step.lower(state, batch_data, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        hbm_bytes = float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — cost model optional
        log(f"cost_analysis unavailable: {e}")

    log("compiling train step ...")
    # float() fetches to host: through the axon tunnel
    # block_until_ready returns early and produces fictional timings
    t0 = time.time()
    state, metrics = step(state, batch_data, rng)
    float(metrics["loss_g"])
    log(f"compile+first step: {time.time() - t0:.1f}s  "
        f"loss_g={float(metrics['loss_g']):.3f} "
        f"loss_d={float(metrics['loss_d']):.3f}")

    if os.environ.get("BENCH_TRAIN_STAGED", "0") == "1":
        _staged_profile(raw_step, cfg, state, batch_data, rng, log)

    times = []
    for _ in range(iters):
        t0 = time.time()
        state, metrics = step(state, batch_data, rng)
        float(metrics["loss_g"])
        times.append(time.time() - t0)
    best = min(times)
    steps_per_s = 1.0 / best
    # each step trains batch random slices of segment_size*upp samples
    seg_sec = model.segment_size * model.upp / model.sr
    audio_hours_per_day = steps_per_s * batch * seg_sec * 86400 / 3600
    log(f"times: {[f'{t:.3f}' for t in times]}  -> {steps_per_s:.2f} steps/s, "
        f"{audio_hours_per_day:.1f} audio-hours-trained/day/chip")

    out = {
        "metric": "train_steps_per_s_per_chip",
        "value": round(steps_per_s, 3),
        "unit": f"v2-48k GAN steps/s (B={batch}, remat={int(remat)}, bf16={int(bf16)})",
        "audio_hours_trained_per_day_per_chip": round(audio_hours_per_day, 1),
        "loss_finite": bool(np.isfinite(float(metrics["loss_g"]))),
    }
    if flops:
        # v5e peak: ~197 TFLOP/s bf16 (98.5 TMAC/s); XLA's flop count for
        # the WHOLE step (both forwards, both backwards, both optimizers)
        achieved = flops / best
        out["step_tflops"] = round(flops / 1e12, 2)
        out["achieved_tflops_per_s"] = round(achieved / 1e12, 2)
        out["mfu_pct_bf16_peak"] = round(100 * achieved / 197e12, 1)
        log(f"XLA flop count: {flops/1e12:.2f} TFLOP/step -> "
            f"{achieved/1e12:.1f} TFLOP/s = "
            f"{100*achieved/197e12:.1f}% of bf16 peak")
    if hbm_bytes:
        # roofline: v5e HBM bandwidth ~819 GB/s.  When achieved GB/s is
        # near that, the step is bandwidth-bound and the MFU ceiling is
        # real (cost_analysis 'bytes accessed' counts ideal-fusion HBM
        # traffic, so this is a LOWER bound on true traffic)
        gbs = hbm_bytes / best / 1e9
        out["step_gb_accessed"] = round(hbm_bytes / 1e9, 2)
        out["achieved_gb_per_s"] = round(gbs, 1)
        out["hbm_bw_util_pct"] = round(100 * gbs / 819.0, 1)
        log(f"bytes accessed: {hbm_bytes/1e9:.2f} GB/step -> "
            f"{gbs:.0f} GB/s = {100*gbs/819.0:.0f}% of HBM bandwidth")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
