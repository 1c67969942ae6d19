"""Feature extraction: F0 + HuBERT embeddings for every sliced segment.

Reference: main/inference/extract.py.  Behavior:
  * stage A: F0 per 16 kHz slice -> `f0/` (coarse 1..255 int) and
    `f0_voiced/` (float Hz)
  * stage B: content features -> `{v1,v2}_extracted/*.npy`
    (T x 256 for v1 via final_proj, T x 768 for v2), NaN-checked
  * `config.json` (the sample-rate preset) copied into the experiment dir
  * `filelist.txt`: `wav|feature.npy|f0|f0nsf|sid` rows over the
    intersection of produced stems, plus 2 copies of a MUTE fixture row
    (training stability padding, extract.py:66-73), shuffled.

TPU-first: device work is BATCHED — segments are bucketed by padded
length and run through the jitted F0/HuBERT programs in batches, instead
of the reference's one-file-at-a-time thread pool.
"""

from __future__ import annotations

import json
import logging
import os
import random

import numpy as np

from ..config import RVCConfig
from ..f0.common import coarse_f0
from ..f0.yin import yin
from ..models import hubert as hubert_mod
from ..models import rmvpe as rmvpe_mod
from ..utils.audio import load_audio, save_wav

logger = logging.getLogger(__name__)

SR16K = 16000
WINDOW = 160


def _bucket(n: int, step: int = SR16K) -> int:
    return int(np.ceil(max(n, step) / step)) * step


def _batched(items, batch_size):
    for i in range(0, len(items), batch_size):
        yield items[i : i + batch_size]


def extract_f0(exp_dir: str, *, method: str = "rmvpe", rmvpe_params=None,
               batch_size: int = 8) -> int:
    """Stage A. Returns number of segments processed."""
    import jax.numpy as jnp

    wav_dir = os.path.join(exp_dir, "sliced_audios_16k")
    f0_dir = os.path.join(exp_dir, "f0")
    f0v_dir = os.path.join(exp_dir, "f0_voiced")
    os.makedirs(f0_dir, exist_ok=True)
    os.makedirs(f0v_dir, exist_ok=True)

    names = [n for n in sorted(os.listdir(wav_dir)) if n.endswith(".wav")
             if not os.path.exists(os.path.join(f0v_dir, n + ".npy"))]
    # group by bucketed length so each batch is one compiled shape
    audios = {}
    for n in names:
        a = load_audio(os.path.join(wav_dir, n), SR16K)
        audios[n] = a
    by_bucket: dict[int, list[str]] = {}
    for n, a in audios.items():
        by_bucket.setdefault(_bucket(len(a)), []).append(n)

    done = 0
    for L, group in sorted(by_bucket.items()):
        for chunk in _batched(group, batch_size):
            batch = np.zeros((len(chunk), L), np.float32)
            for i, n in enumerate(chunk):
                batch[i, : len(audios[n])] = audios[n]
            if method == "rmvpe":
                f0 = rmvpe_mod.infer(rmvpe_params, jnp.asarray(batch))
            else:
                f0 = yin(jnp.asarray(batch), sr=SR16K, hop_length=WINDOW)
            coarse = np.asarray(coarse_f0(f0))
            f0 = np.asarray(f0)
            for i, n in enumerate(chunk):
                p_len = len(audios[n]) // WINDOW
                np.save(os.path.join(f0_dir, n + ".npy"), coarse[i, :p_len],
                        allow_pickle=False)
                np.save(os.path.join(f0v_dir, n + ".npy"), f0[i, :p_len],
                        allow_pickle=False)
                done += 1
    logger.info("extracted f0 for %d segments", done)
    return done


def extract_embeddings(exp_dir: str, hubert_params, *, version: str = "v2",
                       batch_size: int = 8) -> int:
    """Stage B. Returns number of segments processed."""
    import jax.numpy as jnp

    wav_dir = os.path.join(exp_dir, "sliced_audios_16k")
    out_dir = os.path.join(exp_dir, f"{version}_extracted")
    os.makedirs(out_dir, exist_ok=True)

    names = [n for n in sorted(os.listdir(wav_dir)) if n.endswith(".wav")
             if not os.path.exists(os.path.join(out_dir, n.replace(".wav", ".npy")))]
    audios = {n: load_audio(os.path.join(wav_dir, n), SR16K) for n in names}
    by_bucket: dict[int, list[str]] = {}
    for n, a in audios.items():
        by_bucket.setdefault(_bucket(len(a)), []).append(n)

    done = 0
    for L, group in sorted(by_bucket.items()):
        for chunk in _batched(group, batch_size):
            batch = np.zeros((len(chunk), L), np.float32)
            lengths = np.zeros((len(chunk),), np.int32)
            for i, n in enumerate(chunk):
                batch[i, : len(audios[n])] = audios[n]
                lengths[i] = len(audios[n])
            feats, fl = hubert_mod.extract_features(
                hubert_params, jnp.asarray(batch), jnp.asarray(lengths),
                output_layer=12 if version == "v2" else 9)
            if version == "v1":
                feats = hubert_mod.final_proj(hubert_params, feats)
            feats = np.asarray(feats)
            fl = np.asarray(fl)
            for i, n in enumerate(chunk):
                out = feats[i, : fl[i]]
                if np.isnan(out).any():
                    logger.warning("NaN features in %s — skipped", n)
                    continue
                np.save(os.path.join(out_dir, n.replace(".wav", ".npy")),
                        out, allow_pickle=False)
                done += 1
    logger.info("extracted embeddings for %d segments", done)
    return done


def write_mute_fixture(exp_dir: str, cfg: RVCConfig, hubert_params,
                       version: str = "v2") -> None:
    """Generate the silent fixture row set (the reference ships these as
    prebuilt assets, assets/logs/mute*; we synthesize them)."""
    sr = cfg.data.sample_rate
    mute_dir = os.path.join(exp_dir, "mute")
    for sub in ("sliced_audios", "sliced_audios_16k", f"{version}_extracted",
                "f0", "f0_voiced"):
        os.makedirs(os.path.join(mute_dir, sub), exist_ok=True)
    n16 = SR16K * 3
    save_wav(os.path.join(mute_dir, "sliced_audios", f"mute{sr}.wav"),
             np.zeros(sr * 3, np.float32), sr, subtype="float32")
    save_wav(os.path.join(mute_dir, "sliced_audios_16k", "mute.wav"),
             np.zeros(n16, np.float32), SR16K, subtype="float32")
    # the reference's shipped artifact has L//160 + 1 frames (RMVPE frame
    # convention) — match it exactly (golden test vs assets/logs/mute)
    p_len = n16 // WINDOW + 1
    np.save(os.path.join(mute_dir, "f0", "mute.wav.npy"),
            np.ones(p_len, np.int32), allow_pickle=False)
    np.save(os.path.join(mute_dir, "f0_voiced", "mute.wav.npy"),
            np.zeros(p_len, np.float64), allow_pickle=False)
    import jax.numpy as jnp
    feats, fl = hubert_mod.extract_features(
        hubert_params, jnp.zeros((1, n16)),
        output_layer=12 if version == "v2" else 9)
    if version == "v1":
        feats = hubert_mod.final_proj(hubert_params, feats)
    np.save(os.path.join(mute_dir, f"{version}_extracted", "mute.npy"),
            np.asarray(feats[0]), allow_pickle=False)


def generate_filelist(exp_dir: str, cfg: RVCConfig, version: str = "v2") -> str:
    """Intersect stems across artifact dirs, append 2 mute rows, shuffle,
    write filelist.txt + config.json (reference extract.py:52-77)."""
    gt_dir = os.path.join(exp_dir, "sliced_audios")
    feat_dir = os.path.join(exp_dir, f"{version}_extracted")
    f0_dir = os.path.join(exp_dir, "f0")
    f0v_dir = os.path.join(exp_dir, "f0_voiced")

    gt = {n[:-4] for n in os.listdir(gt_dir) if n.endswith(".wav")}
    feat = {n[:-4] for n in os.listdir(feat_dir) if n.endswith(".npy")}
    f0s = {n[: -len(".wav.npy")] for n in os.listdir(f0_dir)}
    f0vs = {n[: -len(".wav.npy")] for n in os.listdir(f0v_dir)}
    names = sorted(gt & feat & f0s & f0vs)

    rows = []
    for n in names:
        sid = n.split("_")[0]
        rows.append("|".join([
            os.path.join(gt_dir, n + ".wav"),
            os.path.join(feat_dir, n + ".npy"),
            os.path.join(f0_dir, n + ".wav.npy"),
            os.path.join(f0v_dir, n + ".wav.npy"),
            sid,
        ]))

    mute_dir = os.path.join(exp_dir, "mute")
    if os.path.isdir(mute_dir):
        sr = cfg.data.sample_rate
        mute_row = "|".join([
            os.path.join(mute_dir, "sliced_audios", f"mute{sr}.wav"),
            os.path.join(mute_dir, f"{version}_extracted", "mute.npy"),
            os.path.join(mute_dir, "f0", "mute.wav.npy"),
            os.path.join(mute_dir, "f0_voiced", "mute.wav.npy"),
            "0",
        ])
        rows += [mute_row, mute_row]

    random.shuffle(rows)
    path = os.path.join(exp_dir, "filelist.txt")
    with open(path, "w") as f:
        f.write("\n".join(rows))
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    logger.info("wrote %s (%d rows)", path, len(rows))
    return path
