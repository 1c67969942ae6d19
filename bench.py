#!/usr/bin/env python
"""Benchmark: audio-seconds-converted / s / chip on the full RVC path
(RMVPE pitch + ContentVec-768 features + retrieval blend + NSF-HiFiGAN).

BASELINE.md config 3/4 shape: batch of 10 s utterances, v2 48 kHz model,
one host.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 50 (the ≥50 audio-sec/s/chip target; the reference
publishes no numbers of its own — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rvc_tpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod
    from rvc_maker_tpu.models import synthesizer as syn
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings

    # default batch 128: per-dispatch overhead amortizes over the same
    # per-microbatch (mdb=16) program — measured 385.7 vs 324 audio-sec/s
    # at B=32 (BASELINE.md r2)
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    seconds = float(os.environ.get("BENCH_SECONDS", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    index_rows = int(os.environ.get("BENCH_INDEX_ROWS", "10000"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")  # bf16 | fp32
    mdb = int(os.environ.get("BENCH_MDB", "16"))
    rmvpe_mb = int(os.environ.get("BENCH_RMVPE_MB", "8"))

    log(f"devices: {jax.devices()}")
    cfg = preset("v2", 48000).model

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    log("initializing params (random weights; pretrained ckpts load the same trees)")
    # each init as ONE jitted program: eager per-layer jax.random calls
    # would each remote-compile through the tunnel (~150 tiny programs,
    # none persisted by the 1 s cache threshold)
    synth_params = jax.jit(lambda k: syn.init_params(k, cfg))(k1)
    hubert_params = jax.jit(hubert_mod.init_params)(k2)
    rmvpe_params = _random_rmvpe(k3)   # pure numpy, no device work
    index_vectors = np.asarray(jax.jit(
        lambda k: jax.random.normal(k, (index_rows, 768)))(k4), np.float32)
    jax.block_until_ready(synth_params)

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    log(f"compute dtype: {dtype_name}")
    pipe = ConvertPipeline(synth_params, cfg, hubert_params, version="v2",
                           rmvpe_params=rmvpe_params,
                           index_vectors=index_vectors,
                           compute_dtype=compute_dtype,
                           max_device_batch=mdb,
                           rmvpe_microbatch=rmvpe_mb)
    settings = ConvertSettings(index_rate=0.5, f0_method="rmvpe")

    L = int(16000 * seconds)
    rs = np.random.RandomState(0)
    # pre-staged device inputs: one upload, device-side slicing per
    # microbatch — host->device feed stays out of the timed region
    audio = jax.device_put((rs.randn(batch, L) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((batch,), L, np.int64))
    jax.block_until_ready(audio)

    def fence(x):
        # block_until_ready returns EARLY through the axon tunnel, which
        # smears iteration boundaries (r3 spread was ±22%); fetching one
        # device-reduced scalar is a true completion fence
        return float(jnp.sum(x))

    log(f"compiling fused convert step (B={batch}, L={L}) ...")
    t0 = time.time()
    wav, _ = pipe.convert_batch(audio, lengths, 0, settings)
    fence(wav)
    log(f"compile+first run: {time.time() - t0:.1f}s; wav shape {wav.shape}")

    times = []
    for i in range(iters):
        t0 = time.time()
        wav, _ = pipe.convert_batch(audio, lengths, 0, settings)
        fence(wav)
        times.append(time.time() - t0)
    best = min(times)
    audio_sec = batch * seconds
    value = audio_sec / best
    log(f"times: {[f'{t:.3f}' for t in times]}; audio {audio_sec}s -> {value:.2f} audio-sec/s/chip")

    out = {
        "metric": "audio_sec_converted_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / 50.0, 3),
    }
    if os.environ.get("BENCH_ROOFLINE", "1") == "1":
        try:
            out.update(_roofline(pipe, settings, mdb, L, batch, best, log))
        except Exception as e:  # noqa: BLE001 — never lose the headline
            log(f"roofline accounting failed: {e}")
    print(json.dumps(out))


# v5e single-chip peaks (same constants as bench_train.py): bf16 matmul
# ~197 TFLOP/s (XLA counts one MAC as 2 flops), HBM ~819 GB/s.  int8
# convs lift the MXU ceiling ~2x but XLA's cost model still counts their
# flops at the bf16 rate, so %MFU is reported bf16-comparable.
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def _roofline(pipe, settings, mdb, L, batch, best, log):
    """XLA cost-analysis accounting for the fused convert step AND its
    three stages (VERDICT r4 weak #1: training got MFU/roofline numbers
    and found 7-11x hidden headroom; the headline path deserves the same).

    Per-stage programs are lowered with ShapeDtypeStructs (abstract — no
    execution); compile() may compile them fresh the first time, which the
    persistent cache amortizes.  Numbers are ideal-fusion estimates from
    XLA's cost model, not measurements — their role is to bound how far
    the measured step is from the hardware ceiling and rank the stages."""
    import jax
    import jax.numpy as jnp

    def cost(jit_fn, *args):
        ca = jit_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    sds = jax.ShapeDtypeStruct
    f32, i32 = jnp.float32, jnp.int32
    sp = jax.tree_util.tree_map(
        lambda a: sds(a.shape, a.dtype), pipe.synth_params)
    hp = jax.tree_util.tree_map(
        lambda a: sds(a.shape, a.dtype), pipe.hubert_params)
    rp = jax.tree_util.tree_map(
        lambda a: sds(a.shape, a.dtype), pipe.rmvpe_params)
    iv = sds(pipe.index_vectors.shape, pipe.index_vectors.dtype)
    a = sds((mdb, L), f32)
    lens = sds((mdb,), i32)
    scalar = sds((), f32)
    sid = sds((mdb,), i32)
    key = sds((2,), jnp.uint32)

    out = {}
    try:
        fl, by = cost(pipe._stage_fused(settings.f0_method, True),
                      sp, hp, iv, rp, a, lens, scalar, scalar, scalar,
                      sid, scalar, key)
    except Exception as e:  # noqa: BLE001
        log(f"roofline: fused cost_analysis unavailable: {e}")
        return out
    n_mb = int(np.ceil(batch / mdb))
    ach_fl = fl * n_mb / best
    ach_by = by * n_mb / best
    out["fused_tflops_per_microbatch"] = round(fl / 1e12, 3)
    out["fused_gb_per_microbatch"] = round(by / 1e9, 3)
    out["achieved_tflops_per_s"] = round(ach_fl / 1e12, 2)
    out["mfu_pct"] = round(100 * ach_fl / PEAK_FLOPS, 1)
    out["hbm_bw_util_pct"] = round(100 * ach_by / PEAK_HBM, 1)
    # ideal time if the program ran at whichever ceiling binds it
    ideal = max(fl / PEAK_FLOPS, by / PEAK_HBM)
    out["roofline_attainment_pct"] = round(100 * ideal * n_mb / best, 1)
    log(f"roofline[fused x{n_mb}]: {fl/1e12:.3f} TFLOP + {by/1e9:.2f} GB "
        f"per microbatch -> achieved {ach_fl/1e12:.1f} TFLOP/s "
        f"({out['mfu_pct']}% MFU), {ach_by/1e9:.0f} GB/s "
        f"({out['hbm_bw_util_pct']}% HBM bw); "
        f"roofline attainment {out['roofline_attainment_pct']}%")

    # per-stage split: which stage owns the flops/bytes, and what its
    # roofline-ideal time would be (ranks the next optimization target)
    stages = {}
    try:
        import rvc_maker_tpu.pipelines.convert as cv

        p_len = L // cv.WINDOW
        feats = sds((mdb, p_len, 768), pipe.compute_dtype or f32)
        f0s = sds((mdb, p_len), f32)
        stages["f0:" + settings.f0_method] = cost(
            pipe._stage_f0(settings.f0_method), rp, a, scalar, scalar)
        stages["features+index"] = cost(
            pipe._stage_features(True), hp, iv, a, lens, scalar)
        stages["synth+decode"] = cost(
            pipe._stage_synth(), sp, feats, feats, f0s, lens, sid,
            scalar, key)
    except Exception as e:  # noqa: BLE001
        log(f"roofline: per-stage cost_analysis unavailable: {e}")
    if stages:
        out["stages"] = {}
        for name, (sfl, sby) in stages.items():
            s_ideal = max(sfl / PEAK_FLOPS, sby / PEAK_HBM)
            bound = "mxu" if sfl / PEAK_FLOPS >= sby / PEAK_HBM else "hbm"
            out["stages"][name] = {
                "tflop": round(sfl / 1e12, 3),
                "gb": round(sby / 1e9, 3),
                "ideal_ms": round(1e3 * s_ideal, 2),
                "bound": bound,
            }
            log(f"roofline[{name}]: {sfl/1e12:.3f} TFLOP, {sby/1e9:.2f} GB "
                f"-> ideal {1e3*s_ideal:.1f} ms/microbatch ({bound}-bound)")
    return out


def _random_rmvpe(key):
    """Random-weight RMVPE param tree with the real architecture shapes
    (driver hosts have no model downloads; real rmvpe.pt loads via
    rvc_maker_tpu.models.rmvpe.load_rmvpe_pt into the same tree).
    Pure-numpy init: device placement happens once in ConvertPipeline
    (per-leaf jax.random would remote-compile hundreds of tiny programs
    through the tunnel)."""
    from rvc_maker_tpu.models.rmvpe import N_CLASS

    del key
    rs = np.random.RandomState(1234)

    def conv(cin, cout, k=3):
        return {"w": rs.randn(k, k, cin, cout).astype(np.float32)
                * (1.0 / np.sqrt(k * k * cin))}

    def bn(c):
        return {"scale": np.ones((c,), np.float32),
                "shift": np.zeros((c,), np.float32)}

    def block(cin, cout):
        p = {"conv1": conv(cin, cout), "bn1": bn(cout),
             "conv2": conv(cout, cout), "bn2": bn(cout)}
        if cin != cout:
            p["shortcut"] = {"w": conv(cin, cout, 1)["w"],
                             "b": np.zeros((cout,), np.float32)}
        return p

    def enc_layer(cin, cout, n_blocks=4):
        return {"blocks": [block(cin, cout)] + [block(cout, cout)
                                                for _ in range(n_blocks - 1)]}

    p = {"in_bn": bn(1), "encoder": [], "intermediate": [], "decoder": []}
    chans = [(1, 16), (16, 32), (32, 64), (64, 128), (128, 256)]
    for cin, cout in chans:
        p["encoder"].append(enc_layer(cin, cout))
    p["intermediate"].append(enc_layer(256, 512))
    for _ in range(3):
        p["intermediate"].append(enc_layer(512, 512))
    dec_chans = [(512, 256), (256, 128), (128, 64), (64, 32), (32, 16)]
    for cin, cout in dec_chans:
        p["decoder"].append({
            "convt": conv(cin, cout),  # (3,3,cin,cout) pre-flipped layout
            "bn": bn(cout),
            "blocks": [block(cout * 2, cout)] + [block(cout, cout)
                                                 for _ in range(3)],
        })
    p["cnn"] = {"w": conv(16, 3)["w"], "b": np.zeros((3,), np.float32)}
    h = 256
    p["gru"] = {
        "w_ih": rs.randn(3 * h, 384).astype(np.float32) * 0.05,
        "w_hh": rs.randn(3 * h, h).astype(np.float32) * 0.05,
        "b_ih": np.zeros((3 * h,), np.float32),
        "b_hh": np.zeros((3 * h,), np.float32),
        "w_ih_r": rs.randn(3 * h, 384).astype(np.float32) * 0.05,
        "w_hh_r": rs.randn(3 * h, h).astype(np.float32) * 0.05,
        "b_ih_r": np.zeros((3 * h,), np.float32),
        "b_hh_r": np.zeros((3 * h,), np.float32),
    }
    p["fc"] = {"w": rs.randn(2 * h, N_CLASS).astype(np.float32) * 0.05,
               "b": np.zeros((N_CLASS,), np.float32)}
    return p


if __name__ == "__main__":
    main()
