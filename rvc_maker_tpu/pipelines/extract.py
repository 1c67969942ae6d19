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

from ..utils.i18n import tr

logger = logging.getLogger(__name__)

SR16K = 16000
WINDOW = 160


def _bucket(n: int, step: int = SR16K) -> int:
    return int(np.ceil(max(n, step) / step)) * step


def _batched(items, batch_size):
    for i in range(0, len(items), batch_size):
        yield items[i : i + batch_size]


def _host_f0_single(audio: np.ndarray, method: str, *,
                    crepe_params=None, fcpe_params=None,
                    hop_length: int = 160) -> np.ndarray:
    """One utterance, one method -> f0 Hz resampled to L//WINDOW + 1.

    Mirrors the convert-side dispatcher; the reference keeps this same
    registry duplicated between convert.py:304-323 and
    extract.py:149-151, and so do we (extract has no ConvertPipeline)."""
    import re as _re

    m = _re.search(r"hybrid\[(.+)\]", method)
    if m:
        parts = [s.strip() for s in m.group(1).split("+")]
        stack = []
        for part in parts:
            f0 = _host_f0_single(audio, part, crepe_params=crepe_params,
                                 fcpe_params=fcpe_params,
                                 hop_length=hop_length)
            stack.append(np.where(f0 < 0.001, np.nan, f0))
        return np.nan_to_num(np.nanmedian(np.vstack(stack), axis=0))

    import jax.numpy as jnp

    if method in ("dio", "harvest"):
        from .. import native

        if method == "harvest":
            f0, t = native.harvest(audio.astype(np.float64), SR16K)
        else:
            f0, t = native.dio(audio.astype(np.float64), SR16K)
            f0 = native.stonemask(audio.astype(np.float64), SR16K, t, f0)
    elif method == "swipe":
        from ..f0.swipe import swipe as swipe_fn

        f0, _ = swipe_fn(audio, SR16K, f0_floor=50.0, f0_ceil=1100.0)
    elif method == "pm":
        from ..f0.praat_ac import praat_ac

        f0 = praat_ac(audio, SR16K, f0_floor=50.0, f0_ceil=1100.0,
                      voicing_threshold=0.6)
    elif method == "pyin":
        from ..f0.pyin import pyin as pyin_fn

        f0 = pyin_fn(audio, SR16K, fmin=50.0, fmax=1100.0,
                     hop_length=hop_length)[0]
        f0 = np.nan_to_num(np.where(f0 < 0.001, np.nan, f0))
    elif method.startswith(("crepe", "mangio-crepe")):
        from ..models import crepe as crepe_mod

        if crepe_params is None:
            raise ValueError("crepe method needs crepe_params")
        if method.startswith("mangio"):
            x = audio / np.quantile(np.abs(audio) + 1e-9, 0.999)
            probs = crepe_mod.predict_probs(crepe_params,
                                            jnp.asarray(x[None]),
                                            hop_length=hop_length)
            f0 = crepe_mod.decode(np.asarray(probs), 50.0, 1100.0)[0]
            f0 = np.nan_to_num(np.where(f0 < 0.001, np.nan, f0))
        else:
            probs = crepe_mod.predict_probs(crepe_params,
                                            jnp.asarray(audio[None]),
                                            hop_length=WINDOW)
            f0, pd = crepe_mod.decode(np.asarray(probs), 50.0, 1100.0,
                                      return_periodicity=True)
            f0 = crepe_mod.mean_filter(f0, 3)
            pd = crepe_mod.median_filter(pd, 3)
            f0[pd < 0.1] = 0.0
            f0 = f0[0]
    elif method in ("fcpe", "fcpe-legacy"):
        from ..models import fcpe as fcpe_mod

        if fcpe_params is None:
            raise ValueError("fcpe method needs fcpe_params")
        f0 = np.asarray(fcpe_mod.infer(fcpe_params, jnp.asarray(audio[None]),
                                       threshold=0.03))[0]
    else:
        raise ValueError(f"unknown f0 method {method!r}")

    f0 = np.asarray(f0, np.float64).ravel()
    p_len = len(audio) // WINDOW + 1
    return np.interp(np.linspace(0, len(f0) - 1, p_len),
                     np.arange(len(f0)), f0)


def extract_f0(exp_dir: str, *, method: str = "rmvpe", rmvpe_params=None,
               crepe_params=None, fcpe_params=None,
               hop_length: int = 160, batch_size: int = 8) -> int:
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
            if method in ("rmvpe", "rmvpe-legacy"):
                kw = ({"f0_min": 50.0, "f0_max": 1100.0}
                      if method == "rmvpe-legacy" else {})
                f0 = rmvpe_mod.infer(rmvpe_params, jnp.asarray(batch), **kw)
            elif method == "yin":
                f0 = yin(jnp.asarray(batch), sr=SR16K, hop_length=WINDOW)
            else:
                # host-side methods, one utterance at a time (reference
                # FeatureInput.compute_f0, extract.py:149-151)
                f0 = np.stack([
                    _host_f0_single(batch[i], method,
                                    crepe_params=crepe_params,
                                    fcpe_params=fcpe_params,
                                    hop_length=hop_length)
                    for i in range(len(chunk))])
            coarse = np.asarray(coarse_f0(f0))
            f0 = np.asarray(f0)
            for i, n in enumerate(chunk):
                p_len = len(audios[n]) // WINDOW
                np.save(os.path.join(f0_dir, n + ".npy"), coarse[i, :p_len],
                        allow_pickle=False)
                np.save(os.path.join(f0v_dir, n + ".npy"), f0[i, :p_len],
                        allow_pickle=False)
                done += 1
    logger.info("%s [f0: %d segments]", tr("extract_done"), done)
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
                    logger.warning("%s %s", n, tr("NaN"))
                    continue
                np.save(os.path.join(out_dir, n.replace(".wav", ".npy")),
                        out, allow_pickle=False)
                done += 1
    logger.info("%s [%d segments]", tr("extract_success"), done)
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
