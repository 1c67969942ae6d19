#!/usr/bin/env python
"""Quantized-training A/B with loss-trajectory overlay (VERDICT r4 #4).

Trains the same tiny dataset twice — baseline bf16 vs a feed variant
(default: RVC_TPU_BF16_SPEC=1, the bf16 spec feed whose mel TARGET then
derives from bf16-rounded spec values) — and overlays the per-epoch
G/D loss trajectories to show training quality is unaffected (or to
quantify the damage).  Each arm runs the real CLI trainer in its own
subprocess so the env toggle applies cleanly; preprocess/extract run
once and are shared.

CPU (tiny run, ~15 min):
  python tools/train_ab_overlay.py --workdir /tmp/ab_overlay \
      --files 6 --epochs 8 --batch-size 4 --cpu
TPU (production dims; never while another TPU process runs):
  python tools/train_ab_overlay.py --workdir /tmp/ab_overlay_tpu \
      --files 24 --epochs 12 --batch-size 16

Writes <workdir>/overlay.json (full trajectories) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 32000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cli(args, log_path, a, extra_env=None):
    cmd = [sys.executable, "-u", "-m", "rvc_maker_tpu.cli"] + args
    env = dict(os.environ)
    if a.cpu:
        env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                    "RVC_FORCE_CPU": "1"})
    if extra_env:
        env.update(extra_env)
    with open(log_path, "ab") as out:
        rc = subprocess.run(cmd, cwd=REPO, env=env, stdout=out,
                            stderr=subprocess.STDOUT, timeout=7200
                            ).returncode
    if rc != 0:
        tail = open(log_path, errors="replace").read()[-4000:]
        raise RuntimeError(f"CLI {' '.join(args[:2])} rc={rc}\n{tail}")


def run_arm(name: str, a, extra_env: dict) -> dict:
    exp = os.path.join(a.workdir, f"exp_{name}")
    if os.path.isdir(exp):
        shutil.rmtree(exp)
    shutil.copytree(os.path.join(a.workdir, "exp_shared"), exp)
    tlog = os.path.join(exp, "train.log")
    log(f"arm {name}: training {a.epochs} epochs (env {extra_env}) ...")
    cli(["train", "--exp-dir", exp, "--sample-rate", str(SR),
         "--epochs", str(a.epochs), "--batch-size", str(a.batch_size),
         "--bf16", "--no-pretrained", "--save-every-epoch", "1000"],
        tlog, a, extra_env)
    txt = open(tlog, errors="replace").read()
    out = {}
    for key in ("loss_g", "loss_d", "loss_mel"):
        out[key] = [float(m) for m in
                    re.findall(rf"'{key}': ([0-9.]+)", txt)]
    # short runs never reach log_interval (200) steps — the per-epoch
    # histories in training_data.json (overtraining detector, written
    # every epoch) are the authoritative record there
    tdj = os.path.join(exp, "training_data.json")
    if os.path.exists(tdj):
        d = json.load(open(tdj))
        if len(d.get("loss_gen_history", [])) >= len(out["loss_g"]):
            out["loss_g"] = [float(x) for x in d["loss_gen_history"]]
            out["loss_d"] = [float(x) for x in d["loss_disc_history"]]
    if not out["loss_g"]:
        # epoch-done log lines carry G/D too
        out["loss_g"] = [float(m) for m in
                         re.findall(r"loss_g ([0-9.]+)", txt)]
        out["loss_d"] = [float(m) for m in
                         re.findall(r"loss_d ([0-9.]+)", txt)]
    if not out["loss_g"]:
        raise RuntimeError(f"arm {name}: no loss lines in {tlog}\n"
                           f"{txt[-2000:]}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ab_overlay")
    ap.add_argument("--files", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--env", default="RVC_TPU_BF16_SPEC=1",
                    help="variant arm env toggle, KEY=VAL")
    a = ap.parse_args()

    os.makedirs(a.workdir, exist_ok=True)
    shared = os.path.join(a.workdir, "exp_shared")
    if not os.path.isdir(shared):
        log("shared prep: dataset gen + preprocess + extract ...")
        from tools.e2e_train_tpu import gen_dataset

        ds = os.path.join(a.workdir, "dataset")
        gen_dataset(ds, a.files, seconds=6.0)
        os.makedirs(shared, exist_ok=True)
        cli(["preprocess", "--dataset", ds, "--exp-dir", shared,
             "--sample-rate", str(SR)],
            os.path.join(a.workdir, "prep.log"), a)
        cli(["extract", "--exp-dir", shared, "--sample-rate", str(SR),
             "--f0-method", "yin"],
            os.path.join(a.workdir, "prep.log"), a)

    key, val = a.env.split("=", 1)
    base = run_arm("base", a, {key: "0"})
    var = run_arm("variant", a, {key: val})

    n = min(len(base["loss_g"]), len(var["loss_g"]))
    bg, vg = np.asarray(base["loss_g"][:n]), np.asarray(var["loss_g"][:n])
    k = max(1, n // 4)
    tail_delta = float(vg[-k:].mean() - bg[-k:].mean())
    rel = float(abs(tail_delta) / max(bg[-k:].mean(), 1e-9))
    out = {
        "metric": "train_ab_loss_overlay",
        "env": a.env,
        "points_compared": n,
        "loss_g_tail_base": round(float(bg[-k:].mean()), 3),
        "loss_g_tail_variant": round(float(vg[-k:].mean()), 3),
        "tail_delta": round(tail_delta, 3),
        "tail_rel": round(rel, 4),
        "both_decreasing": bool(bg[-1] < bg[0] and vg[-1] < vg[0]),
    }
    with open(os.path.join(a.workdir, "overlay.json"), "w") as f:
        json.dump({**out, "base": base, "variant": var}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
