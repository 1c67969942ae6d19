#!/usr/bin/env python
"""int8 quality-gate rehearsal on REAL TRAINED weights (VERDICT r4 #7).

The int8 default stays off pending a mel-distance gate on real released
checkpoints (docs/real_weights_checklist.md #10).  This tool rehearses
that exact gate using the nearest thing this offline image has to real
weights: the synthesizer trained end-to-end ON THE CHIP in round 4
(docs/evidence/e2e_train_r4, /tmp/e2e_r4/exp/*.pth) and the real speech
of its training set as input.

For each requested int8 scope it converts the same utterance bf16 vs
int8 and reports log-mel L1 distance + waveform SNR between the arms —
the same metric the real-weights gate will use
(tools/validate_real_weights.py bf16_gate).

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/int8_gate_rehearsal.py \
      --pth /tmp/e2e_r4/exp/e2e_r4_120e_601s.pth \
      --wav /tmp/e2e_r4/dataset/f1.wav --cpu \
      --out docs/evidence/int8_gate_r5.json
(omit --cpu to run on the TPU; never while another TPU process runs)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def log_mel(wav: np.ndarray, sr: int) -> np.ndarray:
    # SAME mel parameters as the real-weights gate
    # (tools/validate_real_weights.py check_bf16): n_fft 1024, 80 mels,
    # hop 256 — so the rehearsal number is directly comparable to the
    # gate's <1.0 threshold
    import jax.numpy as jnp

    from rvc_maker_tpu.ops.stft import mel_spectrogram

    m = mel_spectrogram(jnp.asarray(wav[None], jnp.float32), n_fft=1024,
                        num_mels=80, sample_rate=sr, hop_length=256,
                        win_length=1024, fmin=0.0, fmax=None)
    return np.asarray(m[0])


def build_pipeline(pth: str, compute_dtype, seed: int = 0):
    import jax

    from rvc_maker_tpu.interop.onnx_voice import load_voice_model
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import ConvertPipeline

    synth_params, cfg, meta = load_voice_model(pth)
    hubert_params = jax.jit(hubert_mod.init_params)(jax.random.PRNGKey(seed))
    sys.path.insert(0, REPO)
    import bench

    rmvpe_params = bench._random_rmvpe(None)
    return ConvertPipeline(synth_params, cfg, hubert_params,
                           version=meta.get("version", "v2"),
                           rmvpe_params=rmvpe_params,
                           compute_dtype=compute_dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--scopes", default="decode,all")
    ap.add_argument("--f0-method", default="rmvpe")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    if a.cpu:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rvc_maker_tpu.pipelines.convert import ConvertSettings
    from rvc_maker_tpu.utils.audio import load_audio

    audio = load_audio(a.wav, 16000)[: int(a.seconds * 16000)]
    settings = ConvertSettings(f0_method=a.f0_method, index_rate=0.0,
                               deterministic=True)

    os.environ.pop("RVC_TPU_INT8", None)
    log("arm A: bf16 (no int8) ...")
    pipe = build_pipeline(a.pth, jnp.bfloat16)
    ref = np.asarray(pipe.convert_utterance(audio, 0, settings))
    sr = pipe.cfg.sr
    mel_ref = log_mel(ref, sr)
    del pipe

    results = {"pth": a.pth, "wav": a.wav, "sr": sr,
               "seconds": float(len(audio) / 16000), "scopes": {}}
    for scope in [s for s in a.scopes.split(",") if s]:
        os.environ["RVC_TPU_INT8"] = "1"
        os.environ["RVC_TPU_INT8_SCOPE"] = (
            "decode,hubert,rmvpe" if scope == "all" else scope)
        log(f"arm B: int8 scope={scope} (calibration + convert) ...")
        pipe = build_pipeline(a.pth, jnp.bfloat16)
        got = np.asarray(pipe.convert_utterance(audio, 0, settings))
        del pipe
        n = min(len(ref), len(got))
        mel_got = log_mel(got[:n], sr)
        m = min(mel_ref.shape[-1], mel_got.shape[-1])
        mel_l1 = float(np.mean(np.abs(mel_ref[..., :m] - mel_got[..., :m])))
        mel_max = float(np.max(np.abs(mel_ref[..., :m] - mel_got[..., :m])))
        err = ref[:n] - got[:n]
        snr = float(10 * np.log10(
            np.mean(ref[:n] ** 2) / max(np.mean(err ** 2), 1e-12)))
        # the real-weights gate (validate_real_weights bf16_gate) passes
        # fp32<->bf16 at mel-L1 < 1.0; int8<->bf16 must land in the same
        # regime to ship as a default
        results["scopes"][scope] = {
            "mel_l1": round(mel_l1, 4), "mel_max": round(mel_max, 3),
            "snr_db": round(snr, 2), "passes_gate": mel_l1 < 1.0}
        log(f"scope={scope}: mel L1 {mel_l1:.4f}, mel max {mel_max:.3f}, "
            f"SNR {snr:.1f} dB")
    os.environ.pop("RVC_TPU_INT8", None)

    print(json.dumps(results))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)
        log(f"written {a.out}")


if __name__ == "__main__":
    main()
