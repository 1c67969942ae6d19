#!/usr/bin/env python
"""Served-path latency: request -> response through app/server.py.

bench_latency.py measures the bare pipeline at B=1; this measures the
PRODUCT surface the reference exposes through its Gradio app
(app.py:841-999 convert flow): HTTP POST /api/convert with a wav, model
load + pipeline build on first request, then warm request latency, and
concurrent requests through the dynamic batcher (RVC_TPU_BATCH_SERVE=1).

The bench process itself never touches the TPU: the model file is built
in a CPU subprocess and the server subprocess owns the chip.  Prints ONE
JSON line.

Env knobs: BENCH_SERVED_SECS (5), BENCH_SERVED_WARM (5),
BENCH_SERVED_CONC (4).
"""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_model(path: str) -> None:
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
from rvc_maker_tpu.config import preset, RVCConfig
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
cfg = preset("v2", 48000)
params = syn.init_params(jax.random.PRNGKey(0), cfg.model)
export_synthesizer_pth(params, cfg, {path!r}, epoch=1, step=1,
                       author="bench")
print("model written")
"""
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])


def tone_b64(secs: float, sr: int = 16000, freq: float = 220.0) -> str:
    from scipy.io import wavfile

    t = np.arange(int(sr * secs)) / sr
    vib = 1 + 0.02 * np.sin(2 * np.pi * 5 * t)
    tone = (0.4 * np.sin(2 * np.pi * freq * np.cumsum(vib) / sr)
            * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sr, tone)
    return base64.b64encode(buf.getvalue()).decode()


def post(port: int, path: str, payload: dict, timeout: float = 3600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    secs = float(os.environ.get("BENCH_SERVED_SECS", "5"))
    warm_n = int(os.environ.get("BENCH_SERVED_WARM", "5"))
    conc = int(os.environ.get("BENCH_SERVED_CONC", "4"))

    model = "/tmp/bench_served_model.pth"
    if not os.path.exists(model):
        log("building v2-48k model file (CPU subprocess) ...")
        make_model(model)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rvc_tpu_jax_cache")
    env["RVC_TPU_BATCH_SERVE"] = "1"
    srv = subprocess.Popen(
        [sys.executable, "-u", "-m", "rvc_maker_tpu.app.server",
         "--port", str(port)],
        cwd=REPO, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT)
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/i18n", timeout=2)
                break
            except Exception:  # noqa: BLE001
                time.sleep(0.5)
        audio = tone_b64(secs)
        payload = {"audio_b64": audio, "model": model,
                   "f0_method": "yin", "index_rate": 0.0}

        log("cold request (model load + compile through the tunnel) ...")
        t0 = time.time()
        r = post(port, "/api/convert", payload)
        cold = time.time() - t0
        assert "audio_b64" in r, r
        log(f"cold: {cold:.1f}s")

        lat = []
        for _ in range(warm_n):
            t0 = time.time()
            post(port, "/api/convert", payload)
            lat.append(time.time() - t0)
        warm = min(lat)
        log(f"warm sequential: best {warm*1e3:.0f} ms "
            f"({[f'{x*1e3:.0f}' for x in lat]})")

        # concurrent requests ride one device dispatch via the batcher
        results = [None] * conc
        payloads = [{"audio_b64": tone_b64(secs, freq=180 + 30 * i),
                     "model": model, "f0_method": "yin", "index_rate": 0.0}
                    for i in range(conc)]
        for p in payloads:          # warm each distinct request shape
            post(port, "/api/convert", p)

        def worker(i):
            t0 = time.time()
            post(port, "/api/convert", payloads[i])
            results[i] = time.time() - t0

        def burst():
            t0 = time.time()
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(conc)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            return time.time() - t0

        cold_burst = burst()   # first burst compiles the batched shape
        wall = min(burst(), burst())
        log(f"concurrent x{conc}: first burst {cold_burst:.1f}s (batched-"
            f"shape compile), warm wall {wall*1e3:.0f} ms, per-request "
            f"{[f'{x*1e3:.0f}' for x in results]}")

        out = {
            "metric": "served_convert_latency_warm_s",
            "value": round(warm, 3),
            "unit": f"s per {secs:.0f}s utterance (POST /api/convert, "
                    "bf16, yin)",
            "cold_s": round(cold, 1),
            "concurrent_n": conc,
            "concurrent_wall_s": round(wall, 3),
            "concurrent_speedup_vs_serial": round(
                conc * warm / max(wall, 1e-9), 2),
            "realtime_factor": round(secs / warm, 1),
        }
        load_secs = float(os.environ.get("BENCH_SERVED_LOAD_SECS", "60"))
        if load_secs > 0:
            out.update(sustained_load(port, model, load_secs))
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()

    # fresh-process warm start (VERDICT r4 #2): a NEW server process with
    # --warm-* precompiles its buckets from the persistent cache BEFORE
    # accepting traffic; the first real request must then be warm-fast.
    # Runs on the DEFAULT (non-batcher) serve path — the stricter case:
    # convert_utterance host-pads x_pad before bucketing, so warmup must
    # cover the (n + 2*x_pad)-second program, not just the batcher's
    # n-second one (review r5; utils/warmup.py warms both).
    env_default = dict(env)
    env_default.pop("RVC_TPU_BATCH_SERVE", None)
    t0 = time.time()
    srv = subprocess.Popen(
        [sys.executable, "-u", "-m", "rvc_maker_tpu.app.server",
         "--port", str(port), "--warm-model", model,
         "--warm-buckets", f"{int(secs)}"],
        cwd=REPO, env=env_default, stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT)
    try:
        ready = None
        for _ in range(600):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/i18n", timeout=2)
                ready = time.time() - t0
                break
            except Exception:  # noqa: BLE001
                time.sleep(0.5)
        if ready is None:
            # warmed server never came up within the wait budget — keep
            # the already-measured phases instead of crashing the print
            log("fresh warmed process: NOT ready within the wait budget; "
                "skipping the first-request measurement")
            out["fresh_process_ready_s"] = None
        else:
            payload = {"audio_b64": tone_b64(secs), "model": model,
                       "f0_method": "yin", "index_rate": 0.0}
            t0 = time.time()
            r = post(port, "/api/convert", payload)
            first = time.time() - t0
            assert "audio_b64" in r, r
            log(f"fresh warmed process: ready in {ready:.1f}s, "
                f"first request {first:.3f}s")
            out["fresh_process_ready_s"] = round(ready, 1)
            out["fresh_process_first_request_s"] = round(first, 3)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()
    print(json.dumps(out))


def sustained_load(port: int, model: str, load_secs: float) -> dict:
    """60 s of mixed-length traffic from 3 client threads + periodic
    malformed requests (VERDICT r4 #6: one happy request is not a load
    story).  Returns p50/p95 latency + error accounting."""
    import random
    import urllib.error

    lengths = [2.0, 3.0, 5.0]
    tones = {s: tone_b64(s, freq=200 + 40 * i)
             for i, s in enumerate(lengths)}
    # pre-warm each bucket (and the batched pow2 shapes ride the same
    # bucket program)
    for s in lengths:
        post(port, "/api/convert", {"audio_b64": tones[s], "model": model,
                                    "f0_method": "yin", "index_rate": 0.0})
    lat: list = []
    errors: list = []
    bad_ok = [0, 0]      # [accepted-as-400, other]
    stop = time.time() + load_secs

    def client(seed: int):
        rng = random.Random(seed)
        while time.time() < stop:
            s = rng.choice(lengths)
            t0 = time.time()
            try:
                post(port, "/api/convert",
                     {"audio_b64": tones[s], "model": model,
                      "f0_method": "yin", "index_rate": 0.0})
                lat.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    def saboteur():
        while time.time() < stop:
            try:
                post(port, "/api/convert",
                     {"audio_b64": "!!notb64!!", "model": model})
                bad_ok[1] += 1
            except urllib.error.HTTPError as e:
                bad_ok[0 if e.code == 400 else 1] += 1
            except Exception:  # noqa: BLE001
                bad_ok[1] += 1
            time.sleep(5.0)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=saboteur))
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0
    lat.sort()
    p50 = lat[len(lat) // 2] if lat else float("nan")
    p95 = lat[int(len(lat) * 0.95)] if lat else float("nan")
    log(f"sustained {wall:.0f}s: {len(lat)} ok, {len(errors)} errors, "
        f"p50 {p50*1e3:.0f} ms p95 {p95*1e3:.0f} ms; malformed -> "
        f"{bad_ok[0]} x 400, {bad_ok[1]} other")
    if errors:
        log("errors sample:", errors[:3])
    return {
        "load_requests_ok": len(lat),
        "load_errors": len(errors),
        "load_p50_s": round(p50, 3),
        "load_p95_s": round(p95, 3),
        "load_rps": round(len(lat) / wall, 2),
        "load_malformed_400": bad_ok[0],
        "load_malformed_other": bad_ok[1],
    }


if __name__ == "__main__":
    main()
