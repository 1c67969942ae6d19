#!/usr/bin/env python
"""Interactive (B=1) conversion latency on the real chip (BASELINE
configs 1-2, VERDICT r2 missing #4).

Measures end-to-end single-utterance latency of ConvertPipeline
.convert_batch with batch 1 — cold (compile + first run) and warm — for
two pitch variants:
  * rmvpe — the on-device hot path (config 2)
  * pm    — host-side Praat AC pitch through the staged path (config 1's
            CPU-runnable pitch), showing the host-F0 + device split

Prints ONE JSON line with both variants.  Env: BENCH_LAT_SECONDS (10),
BENCH_LAT_ITERS (10), BENCH_LAT_DTYPE (bf16).
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

    import jax.numpy as jnp

    from bench import _random_rmvpe
    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.models import synthesizer as syn
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline, ConvertSettings

    seconds = float(os.environ.get("BENCH_LAT_SECONDS", "10"))
    iters = int(os.environ.get("BENCH_LAT_ITERS", "10"))
    dtype_name = os.environ.get("BENCH_LAT_DTYPE", "bf16")

    cfg = preset("v2", 48000).model
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    synth_params = jax.jit(lambda k: syn.init_params(k, cfg))(k1)
    hubert_params = jax.jit(hubert_mod.init_params)(k2)
    rmvpe_params = _random_rmvpe(k3)
    jax.block_until_ready(synth_params)

    compute_dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    pipe = ConvertPipeline(synth_params, cfg, hubert_params, version="v2",
                           rmvpe_params=rmvpe_params,
                           compute_dtype=compute_dtype, max_device_batch=1)

    L = int(16000 * seconds)
    t = np.arange(L) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 180 * t)
             + 0.05 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)[None, :]
    lengths = np.array([L], np.int64)

    results = {}
    for method in ("rmvpe", "pm"):
        settings = ConvertSettings(f0_method=method, index_rate=0.0)
        # np.asarray forces the host round trip: through the axon tunnel
        # block_until_ready alone returns early (impossible 2 ms readings)
        t0 = time.time()
        wav, _ = pipe.convert_batch(audio, lengths, 0, settings)
        np.asarray(wav)
        cold = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            wav, _ = pipe.convert_batch(audio, lengths, 0, settings)
            np.asarray(wav)
            times.append(time.time() - t0)
        warm = min(times)
        med = sorted(times)[len(times) // 2]
        results[method] = {"cold_s": round(cold, 2),
                           "warm_best_s": round(warm, 3),
                           "warm_median_s": round(med, 3),
                           "rtf": round(seconds / warm, 1)}
        log(f"{method}: cold {cold:.2f}s, warm best {warm:.3f}s "
            f"median {med:.3f}s ({seconds / warm:.1f}x realtime)")

    print(json.dumps({
        "metric": "b1_convert_latency",
        "value": results["rmvpe"]["warm_best_s"],
        "unit": f"s per {seconds:.0f}s utterance (B=1, warm, rmvpe)",
        "variants": results,
    }))


if __name__ == "__main__":
    main()
