"""Multi-host scaling harness (BASELINE config 5).

Measures audio-seconds-converted/s/chip for the flagship synthesizer
decode path SPMD-sharded over a global mesh spanning N host processes,
and reports scaling efficiency vs the single-process run.

Runs TODAY on CPU (jax.distributed supports CPU backends) as N localhost
processes with virtual devices, and unchanged on a TPU pod slice where
each process is one host (drop --force-cpu; jax.distributed.initialize
auto-detects via RVC_MULTIHOST=1).

Parent mode (default):
    python bench_multihost.py --nprocs 2 --devices-per-proc 4
  spawns the single-process baseline, then the N-process fleet, and
  prints ONE JSON line:
    {"metric": "scaling_efficiency", "value": .., "unit": "frac",
     "nprocs": N, "thr1": .., "thrN": .., "vs_baseline": ../0.85}

Worker mode (RVC_PROCESS_ID env set): joins the rendezvous, runs the
workload, rank 0 prints its JSON result.

Replaces: reference single-node DDP spawn (train.py:144-178) — there is
no multi-host path to port; this harness is the reference-absent
capability the BASELINE demands.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def worker(args) -> None:
    import numpy as np

    import jax

    if os.environ.get("RVC_FORCE_CPU") == "1":
        # the surrounding environment may pin jax_platforms programmatically
        # (sitecustomize), overriding JAX_PLATFORMS — force CPU before the
        # backend initializes (same dance as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rvc_maker_tpu.config import preset, ModelConfig
    from rvc_maker_tpu.models import synthesizer as syn
    from rvc_maker_tpu.parallel import distributed as dist

    dist.ensure_initialized()
    rank, world = dist.process_index(), dist.process_count()
    mesh = dist.global_data_mesh()
    n_dev = len(jax.devices())

    if args.mode == "train":
        _worker_train(args, dist, mesh, rank, world, n_dev)
        return

    if args.full:
        cfg = preset("v2", 48000).model
        t = 1000
    else:  # tiny config: same code path, CPU-friendly
        cfg = ModelConfig(
            spec_channels=129, segment_size=8, inter_channels=32,
            hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
            kernel_size=3, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2, 2),
            upsample_initial_channel=32, upsample_kernel_sizes=(8, 8, 4, 4),
            spk_embed_dim=4, gin_channels=16, sr=16000, use_f0=True,
            text_enc_hidden_dim=96)
        t = 200

    params = syn.init_params(jax.random.PRNGKey(0), cfg)
    params = _replicate_global(params, mesh)

    b_global = args.batch_per_dev * n_dev
    b_local = b_global // world
    rs = np.random.RandomState(1000 + rank)
    local = {
        "phone": rs.randn(b_local, t, cfg.text_enc_hidden_dim).astype(np.float32),
        "lengths": np.full((b_local,), t, np.int32),
        "pitch": rs.randint(1, 256, (b_local, t)).astype(np.int32),
        "nsff0": (rs.rand(b_local, t) * 200 + 80).astype(np.float32),
        "sid": np.zeros((b_local,), np.int32),
        "zn": np.zeros((b_local, t, cfg.inter_channels), np.float32),
        "sn": np.zeros((b_local, t * cfg.upp, 1), np.float32),
    }
    gbatch = dist.shard_host_local(local, mesh)

    import functools

    @functools.partial(jax.jit, out_shardings=None)
    def step(p, b):
        wav, _, _ = syn.infer(p, cfg, b["phone"], b["lengths"], b["pitch"],
                              b["nsff0"], b["sid"], b["zn"], b["sn"])
        return jnp.sum(jnp.square(wav))

    # compile + warm
    jax.block_until_ready(step(params, gbatch))
    dist.sync_global("warm")
    t0 = time.time()
    acc = None
    for _ in range(args.iters):
        acc = step(params, gbatch)
    jax.block_until_ready(acc)
    dt = time.time() - t0
    audio_sec = args.iters * b_global * t * cfg.upp / cfg.sr
    thr = audio_sec / dt
    if rank == 0:
        print(json.dumps({"thr": thr, "n_dev": n_dev, "world": world,
                          "thr_per_dev": thr / n_dev}), flush=True)


def _worker_train(args, dist, mesh, rank: int, world: int,
                  n_dev: int) -> None:
    """GAN train-step leg: full sharded train step (G fwd, D step, G step,
    optimizer) over the global mesh — the pod-ready counterpart of the
    reference's single-node DDP training (train.py:144-178)."""
    import numpy as np

    import jax

    from rvc_maker_tpu.config import (DataConfig, ModelConfig, RVCConfig,
                                      TrainConfig, preset)
    from rvc_maker_tpu.parallel import replicate
    from rvc_maker_tpu.pipelines import train as train_mod

    if args.full:
        cfg = preset("v2", 48000)
        disc_div = 1
        t = 400
    else:  # tiny config: identical code path + shardings, CPU-friendly
        hop = 64
        seg = 8
        cfg = RVCConfig(
            version="v2", train=TrainConfig(segment_size=seg * hop),
            data=DataConfig(sample_rate=16000, filter_length=256,
                            hop_length=hop, win_length=256,
                            n_mel_channels=32),
            model=ModelConfig(
                spec_channels=129, segment_size=seg, inter_channels=32,
                hidden_channels=32, filter_channels=64, n_heads=2,
                n_layers=1, kernel_size=3, resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 3),),
                upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
                upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4,
                gin_channels=16, sr=16000, use_f0=True,
                text_enc_hidden_dim=96))
        disc_div = 16
        t = 100

    model = cfg.model
    hop = cfg.data.hop_length
    state = train_mod.init_state(jax.random.PRNGKey(0), cfg,
                                 disc_width_div=disc_div)
    state = replicate(state, mesh)

    b_global = args.batch_per_dev * n_dev
    b_local = b_global // world
    rs = np.random.RandomState(1000 + rank)
    local = train_mod.Batch(
        phone=rs.randn(b_local, t, model.text_enc_hidden_dim).astype(
            np.float32),
        phone_lengths=np.full((b_local,), t, np.int32),
        pitch=rs.randint(1, 256, (b_local, t)).astype(np.int32),
        pitchf=(rs.rand(b_local, t) * 200 + 80).astype(np.float32),
        spec=rs.randn(b_local, t, model.spec_channels).astype(np.float32),
        spec_lengths=np.full((b_local,), t, np.int32),
        wave=rs.randn(b_local, t * hop, 1).astype(np.float32) * 0.1,
        sid=rs.randint(0, 4, (b_local,)).astype(np.int32),
    )
    gbatch = dist.shard_host_local(local, mesh)
    rng = replicate(jax.random.PRNGKey(1), mesh)

    step = train_mod.make_sharded_train_step(cfg, mesh,
                                             disc_width_div=disc_div)
    # compile + warm
    state, metrics = step(state, gbatch, rng)
    jax.block_until_ready(metrics["loss_g"])
    dist.sync_global("warm")
    t0 = time.time()
    for _ in range(args.iters):
        state, metrics = step(state, gbatch, rng)
    # fetch a scalar: block_until_ready alone can return early (tunnel)
    loss = float(np.asarray(metrics["loss_g"]))
    dt = time.time() - t0
    steps_s = args.iters / dt
    audio_h_day = (steps_s * b_global * cfg.train.segment_size
                   / cfg.data.sample_rate * 86400 / 3600)
    out = {"thr": steps_s, "n_dev": n_dev, "world": world,
           "thr_per_dev": steps_s * b_global / n_dev,
           "steps_per_s": steps_s,
           "audio_h_day": audio_h_day,
           "loss_g": loss}
    if args.diag:
        out.update(_train_diag_terms(args, dist, mesh, state, gbatch, rng,
                                     step))
    if rank == 0:
        print(json.dumps(out), flush=True)


def _train_diag_terms(args, dist, mesh, state, gbatch, rng, step) -> dict:
    """Per-term breakdown of the multi-controller train-step gap
    (VERDICT r4 #3: 0.889 efficiency, no diagnosis):

      fenced_steps_per_s  — per-step host fence kills dispatch
                            pipelining; the delta vs the async loop is
                            the DISPATCH/pipelining term
      allreduce_ms        — grad-sized psum over the mesh, fenced; the
                            COLLECTIVE term (one G+D grad set per step)
      metrics_fetch_ms    — cost of one metrics host fetch (the
                            production loop pays this every log_interval)
    """
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import time as _t

    terms = {}
    # (1) fenced loop
    n = max(2, args.iters // 2)
    t0 = _t.time()
    s = state
    for _ in range(n):
        s, m = step(s, gbatch, rng)
        float(np.asarray(m["loss_g"]))
    terms["fenced_steps_per_s"] = round(n / (_t.time() - t0), 4)

    # (2) collective microbench: one psum of a grad-sized float tree
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(s.params_g)
                   if hasattr(l, "shape")) + sum(
                       int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(s.params_d)
                       if hasattr(l, "shape"))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    n_dev_total = int(np.prod(list(mesh.devices.shape)))
    x = jax.device_put(
        np.ones((n_dev_total, max(n_params // n_dev_total, 1)), np.float32),
        shard)

    @jax.jit
    def allreduce(v):
        return jnp.sum(v * 2.0)     # cross-shard reduce -> replicated scalar

    float(allreduce(x))             # compile
    dist.sync_global("diag-ar")
    t0 = _t.time()
    reps = 10
    for _ in range(reps):
        r = allreduce(x)
    float(r)
    terms["allreduce_ms"] = round((_t.time() - t0) / reps * 1e3, 2)
    terms["grad_mbytes"] = round(n_params * 4 / 1e6, 1)

    # (3) one metrics fetch
    s, m = step(s, gbatch, rng)
    t0 = _t.time()
    _ = {k: float(np.asarray(v)) for k, v in m.items()}
    terms["metrics_fetch_ms"] = round((_t.time() - t0) * 1e3, 2)

    # (4) MANY-BUFFER all-reduce: same bytes as (2) but split across 256
    # operands.  The train step's grad all-reduce is 3 combined tuple
    # ops with ~530 operand buffers (one per param leaf); if the
    # backend pays a fixed per-OPERAND latency (gloo does), this term
    # — not bytes, not op count — is the multi-controller residual.
    nbuf = 256
    per = max(n_params // nbuf // n_dev_total, 1)
    xs = tuple(jax.device_put(np.ones((n_dev_total, per), np.float32),
                              shard) for _ in range(nbuf))

    @jax.jit
    def allreduce_many(vs):
        return jnp.stack([jnp.sum(v) for v in vs])

    np.asarray(allreduce_many(xs))   # compile
    dist.sync_global("diag-ar-many")
    t0 = _t.time()
    for _ in range(4):
        r = allreduce_many(xs)
    np.asarray(r)
    terms["allreduce_many_ms"] = round((_t.time() - t0) / 4 * 1e3, 2)
    terms["allreduce_many_nbuf"] = nbuf
    return terms


def _replicate_global(tree, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def _spawn_fleet(nprocs: int, args, port: int) -> dict:
    """Launch nprocs workers on localhost, return rank-0's JSON result."""
    procs = []
    outs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "RVC_COORDINATOR_ADDRESS": f"localhost:{port}",
            "RVC_NUM_PROCESSES": str(nprocs),
            "RVC_PROCESS_ID": str(pid),
        })
        if args.force_cpu:
            env["JAX_PLATFORMS"] = "cpu"
            env["RVC_FORCE_CPU"] = "1"
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={args.devices_per_proc} "
                + env.get("XLA_FLAGS", ""))
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--iters", str(args.iters),
               "--batch-per-dev", str(args.batch_per_dev),
               "--mode", args.mode]
        if getattr(args, "eigen1", False):
            # single-threaded eigen on BOTH legs: each process's XLA
            # intra-op pool otherwise sizes itself to ALL host cores, so
            # an nprocs fleet on one machine runs nprocs*ncores threads
            # on ncores cores — oversubscription that a real pod (one
            # process per host) never sees
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_cpu_multi_thread_eigen=false")
        if getattr(args, "pin", False):
            # disjoint cores per worker, ALL cores for a 1-proc control
            # leg: equal total CPU on both legs, so the efficiency
            # isolates multi-controller overhead from core
            # oversubscription (each real pod host owns its own CPUs)
            ncores = os.cpu_count() or 1
            if nprocs > 1:
                per = max(1, ncores // nprocs)
                lo = (pid * per) % ncores
                cores = f"{lo}-{lo + per - 1}" if per > 1 else str(lo)
                cmd = ["taskset", "-c", cores] + cmd
        if args.full:
            cmd.append("--full")
        if args.diag:
            cmd.append("--diag")
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True, cwd=REPO)
        procs.append(p)
    result = None
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        outs.append((pid, p.returncode, out, err))
        if p.returncode != 0:
            for q in procs:
                q.poll() is None and q.kill()
            raise RuntimeError(
                f"worker {pid} failed rc={p.returncode}\n{err[-3000:]}")
        if pid == 0:
            for line in out.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    result = json.loads(line)
    assert result is not None, outs[0][2]
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch-per-dev", type=int, default=1)
    ap.add_argument("--mode", choices=["infer", "train"], default="infer",
                    help="infer: synthesizer decode leg; train: full GAN "
                         "train step over the global mesh")
    ap.add_argument("--full", action="store_true",
                    help="full v2/48k model (for real TPU hosts)")
    ap.add_argument("--no-force-cpu", dest="force_cpu", action="store_false",
                    help="let workers use the platform default (TPU pod)")
    ap.add_argument("--diag", action="store_true",
                    help="train mode: per-term breakdown (fenced loop, "
                         "grad-sized all-reduce, metrics fetch)")
    ap.add_argument("--eigen1", action="store_true",
                    help="single-threaded eigen on both legs — removes "
                         "intra-op pool oversubscription when several "
                         "worker processes share one machine's cores")
    ap.add_argument("--pin", action="store_true",
                    help="pin each worker to disjoint CPU cores (control "
                         "leg keeps all cores) — models per-host CPUs on "
                         "a CPU-virtualized fleet")
    args = ap.parse_args()

    if args.worker or os.environ.get("RVC_PROCESS_ID"):
        worker(args)
        return

    import socket

    def free_port():
        with socket.socket() as s:
            s.bind(("localhost", 0))
            return s.getsockname()[1]

    # control: SAME total device count in one process vs split across
    # nprocs processes, so on a single machine the efficiency isolates the
    # multi-controller/collective overhead rather than CPU-core
    # oversubscription.  On a real pod run each process owns distinct
    # chips and the same formula measures true scaling.
    baseline_args = argparse.Namespace(**vars(args))
    baseline_args.devices_per_proc = args.devices_per_proc * args.nprocs
    r1 = _spawn_fleet(1, baseline_args, free_port())
    rN = _spawn_fleet(args.nprocs, args, free_port())
    eff = rN["thr_per_dev"] / r1["thr_per_dev"]
    out = {
        "metric": ("train_scaling_efficiency" if args.mode == "train"
                   else "scaling_efficiency"),
        "value": round(eff, 4),
        "unit": "frac",
        "nprocs": args.nprocs,
        "devices_per_proc": args.devices_per_proc,
        "thr1_per_dev": round(r1["thr_per_dev"], 2),
        "thrN_per_dev": round(rN["thr_per_dev"], 2),
        "thrN_total": round(rN["thr"], 2),
        "vs_baseline": round(eff / 0.85, 3),
    }
    if args.mode == "train":
        out["steps_per_s_N"] = round(rN["steps_per_s"], 4)
        out["audio_h_day_N"] = round(rN["audio_h_day"], 2)
        for k in ("fenced_steps_per_s", "allreduce_ms", "grad_mbytes",
                  "metrics_fetch_ms", "allreduce_many_ms",
                  "allreduce_many_nbuf"):
            if k in rN:
                out[k + "_N"] = rN[k]
            if k in r1:
                out[k + "_1"] = r1[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
