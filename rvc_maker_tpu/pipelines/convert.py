"""Voice conversion pipeline — the north-star hot path (SURVEY.md §3.1).

Reference behavior (convert.py VC.pipeline / voice_conversion) redesigned
TPU-first: everything from F0 through the vocoder runs as ONE jitted XLA
program per (batch, bucket-length) shape:

    audio16k (B, L) --> RMVPE/YIN f0 --> HuBERT feats --> retrieval blend
        --> x2 frame interp --> protect mix --> synthesizer.infer --> wav

Host side keeps only what belongs there: file I/O, the 48 Hz butter
high-pass (scipy filtfilt over the full utterance), long-audio split-point
search, reflect padding, and RMS envelope mixing.  Chunks become a batch
axis (SURVEY.md §5.7): N chunks of one bucket length convert in a single
device program — data-parallel over chips when a mesh is active.

Length bucketing: audio is right-padded to the next bucket so one
compiled program serves all inputs of that bucket (recompilation control,
SURVEY.md §7).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal

from ..config import ModelConfig
from ..f0.common import autotune_f0, coarse_f0, shift_f0
from ..f0.yin import yin
from ..models import fcpe as fcpe_mod
from ..models import hubert as hubert_mod
from ..models import rmvpe as rmvpe_mod
from ..models import synthesizer as syn
from ..ops.nn import interp_nearest_x2
from ..retrieval.index import retrieval_blend
from ..utils.audio import resample

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000
WINDOW = 160
# 48 Hz 5th-order butterworth high-pass (reference convert.py:30)
_BH, _AH = sp_signal.butter(N=5, Wn=48, btype="high", fs=SAMPLE_RATE)


@dataclasses.dataclass(frozen=True)
class ConvertSettings:
    """User-facing conversion knobs (reference convert.py CLI flags)."""

    pitch: int = 0                     # transpose semitones
    index_rate: float = 0.0
    protect: float = 0.33
    f0_method: str = "rmvpe"           # rmvpe | yin
    f0_autotune: bool = False
    f0_autotune_strength: float = 1.0
    volume_envelope: float = 1.0       # RMS mix rate
    resample_sr: int = 0
    # chunk budget, seconds (reference x_pad/x_query/x_center/x_max fp32)
    x_pad: int = 1
    x_query: int = 6
    x_center: int = 38
    x_max: int = 41
    filter_radius: int = 3
    hop_length: int = 160              # mangio-crepe / pyin frame hop
    f0_file: str = ""                  # external "time,f0" contour file
    deterministic: bool = False        # zero noise (parity mode)


def _bucket_length(n: int, bucket: int = SAMPLE_RATE) -> int:
    """Round up to a whole bucket (default: 1 s of 16 kHz samples)."""
    return int(np.ceil(max(n, bucket) / bucket)) * bucket


class ConvertPipeline:
    """Holds model params + per-bucket compiled convert step."""

    def __init__(self, synth_params: Any, model_cfg: ModelConfig,
                 hubert_params: Any, version: str = "v2",
                 rmvpe_params: Any = None, fcpe_params: Any = None,
                 crepe_params: Any = None,
                 index_vectors: Optional[np.ndarray] = None,
                 rmvpe_microbatch: int = 8, max_device_batch: int = 8,
                 compute_dtype=None, mesh=None, use_pallas=None):
        """compute_dtype: None (fp32 parity) or jnp.bfloat16 fast mode —
        model weights and activations run bf16 while F0 decode, sine
        phase accumulation and STFTs stay fp32.

        mesh: optional jax.sharding.Mesh — params replicate, conversion
        batches shard over the 'data' axis and each jitted stage runs
        SPMD across the mesh (chunks-as-batch data parallelism,
        SURVEY.md §5.7; BASELINE config 5)."""
        # persistent compile cache BEFORE the first jit: a fresh process
        # replays prior compiles from disk instead of paying the 30-50 s
        # cold XLA compile (productized r5; benches used to env-inject it)
        from ..utils.warmup import enable_compilation_cache

        enable_compilation_cache()
        self.rmvpe_microbatch = rmvpe_microbatch
        self.mesh = mesh
        self._n_mesh = 1
        if mesh is not None:
            import numpy as _np

            self._n_mesh = int(_np.prod(list(mesh.devices.shape)))
        self.max_device_batch = max_device_batch * self._n_mesh
        self.compute_dtype = compute_dtype
        # fused Pallas resblocks in the NSF decode (auto: on for TPU;
        # RVC_TPU_PALLAS overrides — see synthesizer.use_pallas_default)
        from ..models.synthesizer import use_pallas_default
        from ..ops.int8_conv import int8_enabled, int8_scope

        self.use_pallas = (use_pallas_default() if use_pallas is None
                           else bool(use_pallas))
        # W8A8 is INFERENCE-ONLY (zero-gradient rounding): the pipeline
        # is the sole place the flag activates.  Scope splits the flag
        # per stage: "decode" = NSF resblock convs (calibrated static
        # scales), "hubert" = transformer matmuls (per-token dynamic
        # scales), "rmvpe" = U-Net convs.
        _i8 = int8_enabled(compute_dtype)
        _scope = int8_scope()
        self.use_int8 = _i8 and "decode" in _scope
        self.use_int8_hubert = _i8 and "hubert" in _scope
        self.use_int8_rmvpe = _i8 and "rmvpe" in _scope
        if mesh is not None:
            # pallas_call needs explicit partitioning rules under pjit;
            # the mesh path stays on the XLA convs (single-chip keeps
            # the fused kernel)
            self.use_pallas = False

        def _prep(tree):
            if tree is None:
                return None
            if hasattr(tree, "graph"):
                return tree  # OnnxVoiceModel / OnnxEmbedder: ONNX graph
            if compute_dtype is not None:
                from ..ops.nn import cast_floats

                tree = cast_floats(tree, compute_dtype)
            # device_put once: params passed as numpy would otherwise be
            # re-uploaded host->device on EVERY call (catastrophic through
            # a tunneled backend — observed 9 s/call for RMVPE's ~300 MB)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(
                    tree, NamedSharding(mesh, P()))
            return jax.device_put(tree)

        self.synth_params = _prep(synth_params)
        if (self.use_int8 and not hasattr(self.synth_params, "graph")
                and isinstance(self.synth_params, dict)):
            # one-time per-channel weight quantization: the hot program
            # then receives w_q/w_scale as arguments instead of
            # re-quantizing ~54 conv weights every call (the r3 e2e
            # regression's biggest term, docs/perf_notes.md int8 A/B)
            from ..ops.int8_conv import prequantize_decode

            self.synth_params = jax.device_put(
                jax.jit(prequantize_decode)(self.synth_params))
        self.cfg = model_cfg
        self.hubert_params = _prep(hubert_params)
        self.version = version
        if (self.use_int8_hubert
                and not hasattr(self.hubert_params, "graph")
                and isinstance(self.hubert_params, dict)):
            from ..ops.int8_conv import prequantize_hubert

            self.hubert_params = jax.device_put(
                jax.jit(prequantize_hubert)(self.hubert_params))
        self.rmvpe_params = _prep(rmvpe_params)
        if (self.use_int8_rmvpe and self.rmvpe_params is not None
                and not hasattr(self.rmvpe_params, "input_names")):
            # AFTER _prep, like the hubert path: _prep's cast_floats would
            # otherwise round the freshly computed f32 dequant scales
            # (w_scale) to bf16, adding systematic per-channel gain error
            from ..ops.int8_conv import prequantize_rmvpe

            self.rmvpe_params = jax.device_put(
                jax.jit(prequantize_rmvpe)(self.rmvpe_params))
        self.fcpe_params = _prep(fcpe_params)
        # crepe decodes on host (Viterbi); params stay fp32 for parity
        # (.onnx predictor graphs pass through — reference --f0_onnx)
        self.crepe_params = (crepe_params
                             if crepe_params is None
                             or hasattr(crepe_params, "input_names")
                             else jax.device_put(crepe_params))
        self.index_vectors = (_prep(jnp.asarray(index_vectors))
                              if index_vectors is not None else None)
        self._step_cache: dict = {}
        if (self.use_int8 and not hasattr(self.synth_params, "graph")
                and self.cfg.vocoder == "Default" and self.cfg.use_f0
                and jax.process_count() == 1
                and os.environ.get("RVC_TPU_INT8_DYNAMIC", "0") != "1"):
            # calibrated static activation scales: one jitted pass over a
            # voiced calibration batch records each conv site's amax, then
            # the hot program bakes the scales as constants — the dynamic
            # amax reduce (an extra HBM pass per conv) disappears.
            # RVC_TPU_INT8_DYNAMIC=1 keeps the r3 per-call behavior (A/B).
            try:
                self._int8_calibrate()
            except Exception as e:  # noqa: BLE001 — fall back to dynamic
                import logging

                from ..ops.int8_conv import Int8Ctx
                from ..utils.i18n import tr

                logging.getLogger(__name__).warning(
                    "%s", tr("int8_calibration_failed", e=e))
                # a half-initialized calibrate ctx would keep collecting
                # escaped tracers on every future trace
                self.use_int8 = Int8Ctx("dynamic")

    @staticmethod
    def _calibration_audio() -> np.ndarray:
        """(2, 1 s) speech-like calibration battery.

        Per-site activation ranges depend on the INPUT's spectral shape,
        not just its level — pure tones under-estimate amax on sites fed
        by broadband/transient content (advisor r4 finding).  Window 1 is
        a glottal-pulse train (rich harmonics, speech crest factor) with
        a 120->260 Hz pitch glide plus vibrato, band-shaped by two
        formant-like resonators; window 2 is fricative-style noise bursts
        over a full-band chirp with click transients at 0.95 amplitude —
        a deliberate worst case for the wideband sites.  RVC_TPU_INT8_
        CALIB_WAV overrides with real user audio (hottest 1 s windows)."""
        path = os.environ.get("RVC_TPU_INT8_CALIB_WAV", "")
        if path:
            from ..utils.audio import load_audio

            wav = np.asarray(load_audio(path, SAMPLE_RATE), np.float32)
            if wav.size < 2 * SAMPLE_RATE:
                wav = np.pad(wav, (0, 2 * SAMPLE_RATE - wav.size))
            win = wav[:wav.size - wav.size % SAMPLE_RATE]
            win = win.reshape(-1, SAMPLE_RATE)
            # the two highest-energy windows bound the site amax best
            order = np.argsort((win ** 2).sum(axis=1))[::-1]
            return np.ascontiguousarray(win[order[:2]])

        tt = np.arange(SAMPLE_RATE) / SAMPLE_RATE
        rng = np.random.default_rng(0)
        # window 1: formant-shaped glottal pulses, gliding pitch + vibrato
        f0 = 120.0 * (260.0 / 120.0) ** tt * (1 + 0.03 * np.sin(
            2 * np.pi * 5 * tt))
        phase = np.cumsum(f0) / SAMPLE_RATE
        pulses = np.zeros(SAMPLE_RATE, np.float32)
        pulses[np.nonzero(np.diff(np.floor(phase)) > 0)[0]] = 1.0
        voiced = pulses
        for fc, bw in ((700.0, 130.0), (1800.0, 160.0)):
            r = np.exp(-np.pi * bw / SAMPLE_RATE)
            b, a = [1.0], [1.0, -2 * r * np.cos(
                2 * np.pi * fc / SAMPLE_RATE), r * r]
            voiced = sp_signal.lfilter(b, a, voiced)
        voiced = 0.9 * voiced / max(np.abs(voiced).max(), 1e-6)
        # window 2: chirp + noise bursts + clicks (broadband transients)
        chirp = sp_signal.chirp(tt, 80.0, 1.0, 6000.0).astype(np.float32)
        burst_env = (np.sin(2 * np.pi * 4 * tt) > 0.6).astype(np.float32)
        noise = rng.standard_normal(SAMPLE_RATE).astype(np.float32)
        wide = 0.5 * chirp + 0.5 * burst_env * noise
        wide[::2000] += 1.0     # click transients
        wide = 0.95 * wide / max(np.abs(wide).max(), 1e-6)
        return np.stack([voiced, wide]).astype(np.float32)

    def _int8_scale_pass(self, audio: np.ndarray):
        """Run a (2, 1 s) batch through the real f0+features+synth path
        with a calibrate-mode Int8Ctx; return (per-site scales, sigs).
        The jitted pass is cached so audits of later audio reuse it."""
        from ..ops.int8_conv import Int8Ctx, calibration_scales

        ctx = Int8Ctx("calibrate")
        # the calibrate ctx is only read at TRACE time; the pass is built
        # (and traced, on its first call below) exactly once — at
        # construction, before any traffic thread exists.  Later audits
        # reuse the cached program without touching self.use_int8, so a
        # concurrent request tracing a new bucket can never capture the
        # ephemeral calibrate ctx in its hot program (review r5).
        first = "_int8_pass" not in self._step_cache
        prev = self.use_int8
        if first:
            self.use_int8 = ctx  # _synth_raw trace-time
        try:
            if first:
                f0_fn = self._f0_raw("yin")
                feat_fn = self._features_raw(False)
                synth_fn = self._synth_raw()
                dummy_index = jnp.zeros(
                    (1, 256 if self.version == "v1" else 768), jnp.float32)

                def run(sp, hp, audio_in, lengths):
                    f0 = f0_fn(None, audio_in, jnp.float32(0.0),
                               jnp.float32(0.0))
                    feats, feats0 = feat_fn(hp, dummy_index, audio_in,
                                            lengths, jnp.float32(0.0))
                    wav, _ = synth_fn(sp, feats, feats0, f0, lengths,
                                      jnp.zeros((2,), jnp.int32),
                                      jnp.float32(0.5),
                                      jax.random.PRNGKey(0))
                    return wav, tuple(ctx.collected)

                self._step_cache["_int8_pass"] = (jax.jit(run),
                                                  ctx.collected_sigs)
            run_jit, sigs_ref = self._step_cache["_int8_pass"]
            sp = (None if hasattr(self.synth_params, "graph")
                  else self.synth_params)
            hp = (None if hasattr(self.hubert_params, "graph")
                  else self.hubert_params)
            lens = jnp.full((audio.shape[0],), audio.shape[1], jnp.int32)
            _, collected = run_jit(sp, hp, jnp.asarray(audio), lens)
        finally:
            if first:
                self.use_int8 = prev
        return calibration_scales(collected, sigs_ref)

    def _int8_calibrate(self) -> None:
        """Record per-site activation scales on the calibration battery
        (or RVC_TPU_INT8_CALIB_WAV audio) through the real
        f0+features+synth path, then switch self.use_int8 to a
        static-scale Int8Ctx."""
        from ..ops.int8_conv import Int8Ctx

        scales, sigs = self._int8_scale_pass(self._calibration_audio())
        # from here every jitted stage traces with baked static scales
        # (calibration ran before any hot jit was created)
        self.use_int8 = Int8Ctx("static", scales, sigs)

    def audit_int8_scales(self, audio: np.ndarray) -> np.ndarray:
        """Compare real audio's per-site amax against the baked static
        scales; log a warning for any site where the input runs hotter
        than calibration (it would clip in int8).  Returns the per-site
        observed/baked ratio.  RVC_TPU_INT8_AUDIT=1 runs this on the
        first convert() input automatically."""
        from ..ops.int8_conv import Int8Ctx

        if not isinstance(self.use_int8, Int8Ctx) \
                or self.use_int8.mode != "static":
            raise ValueError("audit requires a calibrated static Int8Ctx")
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = 2 * SAMPLE_RATE
        if audio.size < n:
            audio = np.pad(audio, (0, n - audio.size))
        win = audio[:audio.size - audio.size % SAMPLE_RATE]
        win = win.reshape(-1, SAMPLE_RATE)
        order = np.argsort((win ** 2).sum(axis=1))[::-1]
        baked = self.use_int8
        observed, _ = self._int8_scale_pass(
            np.ascontiguousarray(win[order[:2]]))
        ratio = observed / np.maximum(np.asarray(baked.scales), 1e-12)
        hot = np.nonzero(ratio > 1.0)[0]
        if hot.size:
            from ..utils.i18n import tr

            logger.warning("%s", tr(
                "int8_audit_hot", hot=int(hot.size), total=int(ratio.size),
                ratio=f"{float(ratio.max()):.2f}",
                site=int(ratio.argmax())))
        self.use_int8 = baked
        return ratio

    # -- staged device programs ------------------------------------------
    #
    # Three jitted stages (f0 / features / synth) instead of one mega-jit:
    # intermediate arrays stay on device and the calls dispatch
    # asynchronously, so there is no host round-trip between stages — but
    # each stage compiles alone (minutes faster on the remote-compile
    # tunnel) and is reused across setting variants independently.

    def _f0_raw(self, f0_method: str):
        key = ("f0_raw", f0_method)
        if key not in self._step_cache:
            if (f0_method in ("rmvpe", "rmvpe-legacy")
                    and hasattr(self.rmvpe_params, "input_names")):
                # .onnx rmvpe through the JAX ONNX executor
                # (reference --f0_onnx, RMVPE.py:214)
                from ..f0.onnx_predictor import rmvpe_onnx_infer

                graph = self.rmvpe_params
                kw = ({"f0_min": 50.0, "f0_max": 1100.0}
                      if f0_method == "rmvpe-legacy" else {})

                def f0_fn(_rmvpe_params, audio, pitch_shift,
                          autotune_strength):
                    f0 = rmvpe_onnx_infer(graph, audio, **kw)
                    f0 = shift_f0(f0, pitch_shift)
                    return jnp.where(autotune_strength > 0,
                                     autotune_f0(f0, autotune_strength), f0)
            elif (f0_method in ("fcpe", "fcpe-legacy")
                    and hasattr(self.fcpe_params, "input_names")):
                from ..f0.onnx_predictor import fcpe_onnx_infer

                graph = self.fcpe_params

                def f0_fn(_rmvpe_params, audio, pitch_shift,
                          autotune_strength):
                    p_len = audio.shape[1] // WINDOW + 1
                    f0 = fcpe_onnx_infer(graph, audio, threshold=0.03,
                                         p_len=p_len)
                    f0 = shift_f0(f0, pitch_shift)
                    return jnp.where(autotune_strength > 0,
                                     autotune_f0(f0, autotune_strength), f0)
            elif f0_method in ("rmvpe", "rmvpe-legacy"):
                mb_size = self.rmvpe_microbatch
                # legacy: band-reject outside [50, 1100] Hz (reference
                # RMVPE.py:228-234 infer_from_audio_with_pitch)
                kw = ({"f0_min": 50.0, "f0_max": 1100.0}
                      if f0_method == "rmvpe-legacy" else {})
                if self.use_int8_rmvpe:
                    kw = dict(kw, use_int8=True)

                def f0_fn(rmvpe_params, audio, pitch_shift, autotune_strength):
                    b, L = audio.shape
                    if b > mb_size and b % mb_size == 0:
                        # microbatch the U-Net: its skip activations are
                        # the peak HBM temp (B=32 x 10 s OOMs a v5e);
                        # lax.map keeps one microbatch of temps live
                        f0 = jax.lax.map(
                            lambda chunk: rmvpe_mod.infer(rmvpe_params, chunk,
                                                          **kw),
                            audio.reshape(b // mb_size, mb_size, L)
                        ).reshape(b, -1)
                    else:
                        f0 = rmvpe_mod.infer(rmvpe_params, audio, **kw)
                    f0 = shift_f0(f0, pitch_shift)
                    return jnp.where(autotune_strength > 0,
                                     autotune_f0(f0, autotune_strength), f0)
            elif f0_method in ("fcpe", "fcpe-legacy"):
                fcpe_params = self.fcpe_params

                def f0_fn(_rmvpe_params, audio, pitch_shift, autotune_strength):
                    p_len = audio.shape[1] // WINDOW + 1
                    f0 = fcpe_mod.infer(fcpe_params, audio, threshold=0.03,
                                        p_len=p_len)
                    f0 = shift_f0(f0, pitch_shift)
                    return jnp.where(autotune_strength > 0,
                                     autotune_f0(f0, autotune_strength), f0)
            else:
                def f0_fn(rmvpe_params, audio, pitch_shift, autotune_strength):
                    f0 = yin(audio, sr=SAMPLE_RATE, fmin=50.0, fmax=1100.0,
                             hop_length=WINDOW)
                    f0 = shift_f0(f0, pitch_shift)
                    return jnp.where(autotune_strength > 0,
                                     autotune_f0(f0, autotune_strength), f0)
            self._step_cache[key] = f0_fn
        return self._step_cache[key]

    def _stage_f0(self, f0_method: str):
        key = ("f0", f0_method)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(self._f0_raw(f0_method))
        return self._step_cache[key]

    def _features_raw(self, use_index: bool):
        key = ("feat_raw", use_index)
        if key not in self._step_cache:
            version = self.version
            cdtype = self.compute_dtype
            i8_hubert = self.use_int8_hubert
            onnx_emb = (self.hubert_params
                        if hasattr(self.hubert_params, "graph") else None)

            def feat_fn(hubert_params, index_vectors, audio, lengths,
                        index_rate):
                if cdtype is not None:
                    audio = audio.astype(cdtype)
                    index_rate = index_rate.astype(cdtype)
                if onnx_emb is not None:
                    # .onnx embedder: the graph runs inside this jitted
                    # stage (closed over, already projected for v1)
                    feats = onnx_emb.features(audio, lengths)
                else:
                    feats, _ = hubert_mod.extract_features(
                        hubert_params, audio, lengths,
                        output_layer=12 if version == "v2" else 9,
                        use_int8=i8_hubert)
                    if version == "v1":
                        feats = hubert_mod.final_proj(hubert_params, feats)
                feats0 = feats
                if use_index:
                    feats = retrieval_blend(feats, index_vectors, index_rate)
                return interp_nearest_x2(feats), interp_nearest_x2(feats0)

            self._step_cache[key] = feat_fn
        return self._step_cache[key]

    def _stage_features(self, use_index: bool):
        key = ("feat", use_index)
        if key not in self._step_cache:
            jitted = jax.jit(self._features_raw(use_index))
            if hasattr(self.hubert_params, "graph"):
                # the OnnxEmbedder is closed over, not traceable — swap
                # the params argument for an empty pytree
                self._step_cache[key] = (
                    lambda _hp, *a: jitted(None, *a))
            else:
                self._step_cache[key] = jitted
        return self._step_cache[key]

    def _synth_raw(self):
        key = ("synth_raw",)
        if key not in self._step_cache:
            cfg = self.cfg
            cdtype = self.compute_dtype or jnp.float32
            onnx_vm = (self.synth_params
                       if hasattr(self.synth_params, "graph") else None)

            def synth_fn(synth_params, feats, feats0, f0, lengths, sid,
                         protect, rng):
                b = feats.shape[0]
                p_len = feats.shape[1]
                pitchf = f0[:, :p_len]                        # fp32 Hz
                pitch = coarse_f0(pitchf)
                # protect: restore original feats on unvoiced frames
                # (reference convert.py:372-378)
                pitchff = jnp.where(pitchf > 0, 1.0, protect)[:, :, None]
                feats = jnp.where(protect < 0.5,
                                  feats * pitchff.astype(feats.dtype)
                                  + feats0 * (1.0 - pitchff).astype(feats.dtype),
                                  feats)
                frame_lengths = jnp.minimum(lengths // WINDOW, p_len)
                if onnx_vm is not None:
                    # .onnx voice model: the graph executes inside this
                    # same jitted stage (closed over, not a traced arg)
                    k1, k2 = jax.random.split(rng)
                    z_noise = jax.random.normal(
                        k1, (b, p_len, cfg.inter_channels), jnp.float32)
                    sine_noise = jax.random.normal(
                        k2, (b, p_len * cfg.upp, 1), jnp.float32)
                    wav = onnx_vm.synth(
                        feats.astype(jnp.float32), frame_lengths,
                        pitch if cfg.use_f0 else None, pitchf,
                        sid, z_noise, sine_noise)
                    return wav.astype(jnp.float32), pitchf
                if cfg.vocoder != "Default":
                    wav = syn.infer_any(synth_params, cfg, feats,
                                        frame_lengths,
                                        pitch if cfg.use_f0 else None,
                                        pitchf, sid, rng,
                                        use_pallas=self.use_pallas,
                                        use_int8=self.use_int8)
                    return wav[:, :, 0].astype(jnp.float32), pitchf
                k1, k2 = jax.random.split(rng)
                z_noise = jax.random.normal(k1, (b, p_len, cfg.inter_channels),
                                            cdtype)
                sine_noise = jax.random.normal(k2, (b, p_len * cfg.upp, 1),
                                               cdtype)
                wav, _, _ = syn.infer(synth_params, cfg, feats, frame_lengths,
                                      pitch if cfg.use_f0 else None, pitchf,
                                      sid, z_noise, sine_noise,
                                      use_pallas=self.use_pallas,
                                      use_int8=self.use_int8)
                return wav[:, :, 0].astype(jnp.float32), pitchf

            self._step_cache[key] = synth_fn
        return self._step_cache[key]

    def _stage_synth(self):
        key = ("synth",)
        if key not in self._step_cache:
            jitted = jax.jit(self._synth_raw())
            if hasattr(self.synth_params, "graph"):
                # the OnnxVoiceModel is closed over, not traceable — swap
                # the params argument for an empty pytree
                self._step_cache[key] = (
                    lambda _sp, *a: jitted(None, *a))
            else:
                self._step_cache[key] = jitted
        return self._step_cache[key]

    def _stage_fused(self, f0_method: str, use_index: bool):
        """All three stages composed into ONE jitted program.

        Dispatching through the tunneled backend costs far more than the
        stage boundaries save: the fenced per-stage profile reads
        ~660 ms device-side per 16-microbatch while the true fori_loop
        compute is ~350 ms — the rest is per-call dispatch/sync latency
        (3 stage calls + the eager slicing ops between them).  One
        program per microbatch removes all internal round-trips; the
        persistent compilation cache amortizes the bigger compile.

        The staged path remains for host-side F0 methods, --f0-file and
        RVC_TPU_PROFILE=1 (per-stage fenced timings)."""
        key = ("fused", f0_method, use_index)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                self._fused_raw(f0_method, use_index))
        return self._step_cache[key]

    def _fused_raw(self, f0_method: str, use_index: bool):
        f0_fn = self._f0_raw(f0_method)
        feat_fn = self._features_raw(use_index)
        synth_fn = self._synth_raw()

        def fused(synth_params, hubert_params, index_vectors,
                  rmvpe_params, audio, lengths, pitch,
                  autotune_strength, index_rate, sid, protect, rng):
            f0 = f0_fn(rmvpe_params, audio, pitch, autotune_strength)
            feats, feats0 = feat_fn(hubert_params, index_vectors,
                                    audio, lengths, index_rate)
            p_len = min(audio.shape[1] // WINDOW, feats.shape[1])
            return synth_fn(synth_params, feats[:, :p_len],
                            feats0[:, :p_len], f0[:, :p_len], lengths,
                            sid, protect, rng)

        return fused

    def _stage_fused_scan(self, f0_method: str, use_index: bool):
        """The fused microbatch program `lax.map`-ed over all microbatches
        of a large batch: ONE dispatch for the whole batch instead of one
        per microbatch.

        The map is a sequential XLA While over the SAME fused body, so
        only one microbatch of NSF output-rate activations is live at a
        time (identical HBM profile to the Python loop).

        MEASURED SLOWER than the loop and therefore OFF by default
        (RVC_TPU_SCAN_MB=1 to enable): B=128 bench reads 269 vs 381
        audio-sec/s/chip.  JAX's async dispatch already pipelines the
        Python loop — the host enqueues microbatch i+1 while the device
        crunches i, so per-call dispatch latency is hidden — while the
        While body pays dynamic-update-slice gathers of the large
        output per iteration.  Kept as an option for backends where
        dispatch is synchronous.  Never used for meshes (the data axis
        shards rows, it does not microbatch), host-F0 methods or
        profiling."""
        key = ("fused_scan", f0_method, use_index)
        if key not in self._step_cache:
            fused = self._fused_raw(f0_method, use_index)

            def scanned(synth_params, hubert_params, index_vectors,
                        rmvpe_params, audio3, lengths3, sid3, pitch,
                        autotune_strength, index_rate, protect, rng):
                def one(xs):
                    a, ln, s = xs
                    return fused(synth_params, hubert_params,
                                 index_vectors, rmvpe_params, a, ln,
                                 pitch, autotune_strength, index_rate,
                                 s, protect, rng)

                return jax.lax.map(one, (audio3, lengths3, sid3))

            self._step_cache[key] = jax.jit(scanned)
        return self._step_cache[key]

    # -- host-side F0 methods (native C++ WORLD-style, hybrid) -----------

    def _host_f0(self, method: str, audio_batch: np.ndarray,
                 settings: ConvertSettings) -> np.ndarray:
        """F0 for methods that run on host (dio/harvest via the native
        C++ library; hybrid[...] combinations — reference convert.py
        get_f0/get_f0_hybrid:283-323). Returns (B, L//160 + 1) Hz."""
        from .. import native
        from ..f0.common import NOTE_FREQS

        b, L = audio_batch.shape
        p_len = L // WINDOW + 1
        out = np.zeros((b, p_len), np.float32)

        methods = ([m.strip() for m in
                    method[len("hybrid["):-1].split("+")]
                   if method.startswith("hybrid[") else [method])

        for i in range(b):
            stack = []
            for m in methods:
                if m in ("dio", "harvest"):
                    fn = native.harvest if m == "harvest" else native.dio
                    f0, t = fn(audio_batch[i].astype(np.float64), SAMPLE_RATE,
                               f0_floor=50.0, f0_ceil=1100.0,
                               frame_period=10.0)
                    if m == "dio":
                        f0 = native.stonemask(audio_batch[i].astype(np.float64),
                                              SAMPLE_RATE, t, f0)
                elif m == "swipe":
                    from ..f0.swipe import swipe as swipe_fn
                    f0, _ = swipe_fn(audio_batch[i], SAMPLE_RATE,
                                     f0_floor=50.0, f0_ceil=1100.0)
                elif m == "pm":
                    from ..f0.praat_ac import praat_ac
                    f0 = praat_ac(audio_batch[i], SAMPLE_RATE,
                                  f0_floor=50.0, f0_ceil=1100.0,
                                  voicing_threshold=0.6)
                elif m.startswith("crepe") or m.startswith("mangio-crepe"):
                    # capacity suffix selects the checkpoint loaded into
                    # crepe_params at pipeline construction
                    from ..models import crepe as crepe_mod
                    if self.crepe_params is None:
                        raise ValueError("crepe_params not loaded")
                    def _probs(audio_b1, hop):
                        if hasattr(self.crepe_params, "input_names"):
                            # .onnx crepe (reference --f0_onnx, CREPE.py:95)
                            frames = crepe_mod.frame_audio(audio_b1, hop)[0]
                            out = self.crepe_params.run(
                                {self.crepe_params.input_names[0]:
                                 jnp.asarray(frames, jnp.float32)})[0]
                            return jnp.asarray(out)[None]
                        return crepe_mod.predict_probs(
                            self.crepe_params, audio_b1, hop_length=hop)

                    if m.startswith("mangio"):
                        # reference convert.py:215-228 (mangio): quantile
                        # normalize, custom hop, viterbi, NaN-gate
                        x = audio_batch[i].astype(np.float32)
                        x = x / np.quantile(np.abs(x), 0.999)
                        probs = _probs(jnp.asarray(x[None]),
                                       settings.hop_length)
                        f0 = crepe_mod.decode(np.asarray(probs), 50.0,
                                              1100.0)[0]
                        f0 = np.where(f0 < 0.001, np.nan, f0)
                    else:
                        # reference convert.py:230-237: hop=window,
                        # mean(f0,3)/median(pd,3), gate pd < 0.1
                        probs = _probs(jnp.asarray(audio_batch[i : i + 1]),
                                       WINDOW)
                        f0, pd = crepe_mod.decode(np.asarray(probs), 50.0,
                                                  1100.0,
                                                  return_periodicity=True)
                        f0 = crepe_mod.mean_filter(f0, 3)
                        pd = crepe_mod.median_filter(pd, 3)
                        f0[pd < 0.1] = 0.0
                        f0 = f0[0]
                elif m == "pyin":
                    from ..f0.pyin import pyin as pyin_fn
                    f0 = pyin_fn(audio_batch[i], SAMPLE_RATE,
                                 fmin=50.0, fmax=1100.0,
                                 hop_length=settings.hop_length)[0]
                    f0 = np.where(f0 < 0.001, np.nan, f0)
                elif m in ("rmvpe", "rmvpe-legacy", "yin", "fcpe",
                           "fcpe-legacy"):
                    f0 = np.asarray(self._stage_f0(m)(
                        self.rmvpe_params, jnp.asarray(audio_batch[i : i + 1]),
                        jnp.float32(0.0), jnp.float32(0.0)))[0]
                else:
                    raise ValueError(f"unknown f0 method {m!r}")
                # resample to p_len (reference convert.py:299-300)
                stack.append(np.interp(np.linspace(0, len(f0) - 1, p_len),
                                       np.arange(len(f0)), f0))
            f0 = (stack[0] if len(stack) == 1
                  else np.nanmedian(np.vstack(stack), axis=0))
            out[i] = np.nan_to_num(f0)  # reference convert.py:281 nan_to_num
        out = out * (2.0 ** (settings.pitch / 12.0))
        if settings.f0_autotune:
            notes = NOTE_FREQS
            nearest = notes[np.argmin(np.abs(out[..., None] - notes), axis=-1)]
            out = out + (nearest - out) * settings.f0_autotune_strength
        return out

    # -- device batch conversion of equal-bucket chunks ------------------

    def _convert_batch_scanned(self, audio_batch: np.ndarray,
                               lengths: np.ndarray, sid: int,
                               settings: ConvertSettings,
                               rng: Optional[jax.Array]):
        """Whole-batch single-dispatch path (see _stage_fused_scan).

        A non-multiple tail is padded with copies of row 0 (well-behaved
        values, no NaN risk) and sliced off the outputs."""
        b_total, L = audio_batch.shape
        mdb = self.max_device_batch
        use_index = (self.index_vectors is not None
                     and settings.index_rate > 0)
        if rng is None or settings.deterministic:
            rng = jax.random.PRNGKey(0)
        nmb = -(-b_total // mdb)
        pad = nmb * mdb - b_total
        if pad:
            audio_batch = np.concatenate(
                [audio_batch, np.repeat(audio_batch[:1], pad, 0)], 0)
            lengths = np.concatenate(
                [lengths, np.repeat(lengths[:1], pad, 0)], 0)
        audio3 = jnp.asarray(audio_batch, jnp.float32).reshape(nmb, mdb, L)
        lengths3 = jnp.asarray(lengths, jnp.int32).reshape(nmb, mdb)
        sid3 = jnp.full((nmb, mdb), sid, jnp.int32)
        dummy_index = jnp.zeros((1, 256 if self.version == "v1" else 768),
                                jnp.float32)
        sp = (None if hasattr(self.synth_params, "graph")
              else self.synth_params)
        hp = (None if hasattr(self.hubert_params, "graph")
              else self.hubert_params)
        rp = (None if hasattr(self.rmvpe_params, "input_names")
              else self.rmvpe_params)
        wav, pf = self._stage_fused_scan(settings.f0_method, use_index)(
            sp, hp, self.index_vectors if use_index else dummy_index,
            rp, audio3, lengths3, sid3, jnp.float32(settings.pitch),
            jnp.float32(settings.f0_autotune_strength
                        if settings.f0_autotune else 0.0),
            jnp.float32(settings.index_rate),
            jnp.float32(settings.protect), rng)
        wav = wav.reshape(nmb * mdb, *wav.shape[2:])[:b_total]
        pf = pf.reshape(nmb * mdb, *pf.shape[2:])[:b_total]
        return wav, pf

    def convert_batch(self, audio_batch: np.ndarray, lengths: np.ndarray,
                      sid: int, settings: ConvertSettings,
                      rng: Optional[jax.Array] = None):
        """audio_batch: (B, L) float32 @16 kHz (already padded to bucket).
        Returns (wav (B, L//160 * upp_sr_samples), pitchf) on device.

        Batches larger than max_device_batch are split into device-sized
        microbatches (the NSF stack's output-rate activations are the
        peak HBM cost; 32 x 10 s in one program exceeds a v5e's 16 GB)."""
        b_total = audio_batch.shape[0]
        mdb = self.max_device_batch
        if b_total > mdb:
            from ..utils.profiling import profiling_enabled

            scan_ok = (self.mesh is None
                       and settings.f0_method in ("rmvpe", "rmvpe-legacy",
                                                  "yin", "fcpe",
                                                  "fcpe-legacy")
                       and not settings.f0_file
                       and not profiling_enabled()
                       and os.environ.get("RVC_TPU_SCAN_MB", "0") == "1")
            if scan_ok:
                return self._convert_batch_scanned(audio_batch, lengths,
                                                   sid, settings, rng)
            outs = []
            pitchfs = []
            for i in range(0, b_total, mdb):
                w, pf = self.convert_batch(audio_batch[i : i + mdb],
                                           lengths[i : i + mdb], sid,
                                           settings, rng)
                outs.append(w)
                pitchfs.append(pf)
            return jnp.concatenate(outs, 0), jnp.concatenate(pitchfs, 0)

        use_index = (self.index_vectors is not None
                     and settings.index_rate > 0)
        if rng is None or settings.deterministic:
            rng = jax.random.PRNGKey(0)
        b, L = audio_batch.shape
        trim_to = b           # multi-controller padding may grow b
        audio = jnp.asarray(audio_batch, jnp.float32)
        lengths_d = jnp.asarray(lengths, jnp.int32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(self.mesh, P("data"))
            # the 'data' axis shards rows, so the batch must divide the
            # mesh; uneven batches (B=1 utterance chunks, microbatch
            # tails) pad by repeating the last row and the pads are
            # sliced off the results (trim_to)
            pad_rows = (-b) % self._n_mesh
            a_np = np.asarray(audio, np.float32)
            l_np = np.asarray(lengths_d, np.int32)
            if pad_rows:
                a_np = np.concatenate(
                    [a_np, np.repeat(a_np[-1:], pad_rows, 0)])
                l_np = np.concatenate(
                    [l_np, np.repeat(l_np[-1:], pad_rows, 0)])
                trim_to, b = b, b + pad_rows
            if jax.process_count() > 1:
                # multi-controller mesh: every process passes the SAME
                # global batch; each contributes its row-slice to the
                # global jax.Array (mirrors data.batches_for_epoch +
                # distributed.shard_host_local on the train side)
                rank, world = jax.process_index(), jax.process_count()
                rows = slice(rank * (b // world), (rank + 1) * (b // world))
                audio = jax.make_array_from_process_local_data(
                    bsh, a_np[rows])
                lengths_d = jax.make_array_from_process_local_data(
                    bsh, l_np[rows])
            else:
                audio = jax.device_put(jnp.asarray(a_np), bsh)
                lengths_d = jax.device_put(jnp.asarray(l_np), bsh)
        dummy_index = jnp.zeros((1, 256 if self.version == "v1" else 768),
                                jnp.float32)

        from ..utils.profiling import profiling_enabled, stage_timer

        prof = profiling_enabled()  # RVC_TPU_PROFILE=1: fenced timings
        device_f0 = settings.f0_method in ("rmvpe", "rmvpe-legacy", "yin",
                                           "fcpe", "fcpe-legacy")
        if device_f0 and not settings.f0_file and not prof:
            # hot path: ONE dispatch for f0+features+synth (see
            # _stage_fused) — graph-valued param trees swap to None
            # exactly like the staged wrappers do
            sp = (None if hasattr(self.synth_params, "graph")
                  else self.synth_params)
            hp = (None if hasattr(self.hubert_params, "graph")
                  else self.hubert_params)
            rp = (None if hasattr(self.rmvpe_params, "input_names")
                  else self.rmvpe_params)
            wav_f, pf_f = self._stage_fused(settings.f0_method, use_index)(
                sp, hp, self.index_vectors if use_index else dummy_index,
                rp, audio, lengths_d, jnp.float32(settings.pitch),
                jnp.float32(settings.f0_autotune_strength
                            if settings.f0_autotune else 0.0),
                jnp.float32(settings.index_rate),
                jnp.full((b,), sid, jnp.int32),
                jnp.float32(settings.protect), rng)
            return wav_f[:trim_to], pf_f[:trim_to]

        with stage_timer(f"f0:{settings.f0_method}") if prof \
                else contextlib.nullcontext() as tm:
            if device_f0:
                f0 = self._stage_f0(settings.f0_method)(
                    self.rmvpe_params, audio, jnp.float32(settings.pitch),
                    jnp.float32(settings.f0_autotune_strength
                                if settings.f0_autotune else 0.0))
            else:
                f0 = jnp.asarray(self._host_f0(settings.f0_method,
                                               audio_batch, settings))
                if f0.shape[0] < b:   # multi-controller row padding
                    f0 = jnp.concatenate(
                        [f0, jnp.repeat(f0[-1:], b - f0.shape[0], 0)])
            if settings.f0_file:
                f0 = jnp.asarray(_apply_f0_file(np.asarray(f0), settings))
            if prof:
                tm.result(f0)
        with stage_timer("features") if prof \
                else contextlib.nullcontext() as tm:
            feats, feats0 = self._stage_features(use_index)(
                self.hubert_params,
                self.index_vectors if use_index else dummy_index,
                audio, lengths_d, jnp.float32(settings.index_rate))
            if prof:
                tm.result(feats)
        # align features to f0 frames (reference convert.py:364-370):
        # p_len = min(L // window, feature frames) — both static
        p_len = min(L // WINDOW, feats.shape[1])
        with stage_timer("synth") if prof \
                else contextlib.nullcontext() as tm:
            out = self._stage_synth()(
                self.synth_params, feats[:, :p_len], feats0[:, :p_len],
                f0[:, :p_len], lengths_d, jnp.full((b,), sid, jnp.int32),
                jnp.float32(settings.protect), rng)
            if prof:
                tm.result(out)
        return out[0][:trim_to], out[1][:trim_to]

    # -- full single-utterance conversion (reference VC.pipeline) --------

    def convert_utterance(self, audio16k: np.ndarray, sid: int,
                          settings: ConvertSettings) -> np.ndarray:
        """One utterance end-to-end with chunking + padding semantics of
        the reference (convert.py:388-458). Returns waveform at model sr."""
        s = settings
        if (os.environ.get("RVC_TPU_INT8_AUDIT", "0") == "1"
                and not getattr(self, "_int8_audited", False)
                and getattr(self.use_int8, "mode", None) == "static"
                and np.abs(audio16k).max() > 1e-6):
            # one-shot clip audit of the real input vs the baked scales
            # (silence — e.g. warmup zeros — must not consume the shot)
            self._int8_audited = True
            self.audit_int8_scales(audio16k)
        tgt_sr = self.cfg.sr
        t_pad = SAMPLE_RATE * s.x_pad
        t_pad_tgt = tgt_sr * s.x_pad
        t_pad2 = t_pad * 2
        t_query = SAMPLE_RATE * s.x_query
        t_center = SAMPLE_RATE * s.x_center
        t_max = SAMPLE_RATE * s.x_max

        audio = sp_signal.filtfilt(_BH, _AH, audio16k).astype(np.float32)
        opt_ts = []
        audio_pad = np.pad(audio, (WINDOW // 2, WINDOW // 2), mode="reflect")
        if audio_pad.shape[0] > t_max:
            audio_sum = np.zeros_like(audio)
            for i in range(WINDOW):
                audio_sum += audio_pad[i : i - WINDOW]
            for t in range(t_center, audio.shape[0], t_center):
                w = np.abs(audio_sum[t - t_query : t + t_query])
                opt_ts.append(t - t_query + int(np.where(w == w.min())[0][0]))

        audio_pad = np.pad(audio, (t_pad, t_pad), mode="reflect")

        # cut into chunks at the low-energy split points
        bounds = []
        sstart = 0
        tcur = None
        for t in opt_ts:
            tcur = t // WINDOW * WINDOW
            bounds.append((sstart, tcur + t_pad2 + WINDOW))
            sstart = tcur
        bounds.append((sstart if tcur is not None else 0, audio_pad.shape[0]))

        pieces = []
        for (lo, hi) in bounds:
            chunk = audio_pad[lo:hi]
            L = _bucket_length(len(chunk))
            padded = np.zeros((1, L), np.float32)
            padded[0, : len(chunk)] = chunk
            wav, _ = self.convert_batch(padded, np.asarray([len(chunk)]),
                                        sid, s)
            wav = np.asarray(wav[0])
            # valid decoded samples: upp output samples per 100 Hz frame
            # (upp == tgt_sr/100 for all reference presets)
            n_out = (len(chunk) // WINDOW) * self.cfg.upp
            n_out = min(n_out, wav.shape[0])
            pieces.append(wav[:n_out][t_pad_tgt:-t_pad_tgt]
                          if n_out > 2 * t_pad_tgt else wav[:n_out])

        out = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]

        if s.volume_envelope != 1.0:
            out = change_rms(audio, SAMPLE_RATE, out, tgt_sr, s.volume_envelope)
        peak = np.abs(out).max() / 0.99
        if peak > 1:
            out = out / peak
        if s.resample_sr not in (0, tgt_sr) and s.resample_sr >= SAMPLE_RATE:
            out = resample(out, tgt_sr, s.resample_sr)
        return out.astype(np.float32)


SPLIT_DB_THRESH = -60
SPLIT_MIN_INTERVAL_MS = 500


def _apply_f0_file(f0: np.ndarray, settings: ConvertSettings) -> np.ndarray:
    """Overwrite the computed contour with an external "time,f0" file
    (reference convert.py:314-316: values interpolated to 100 fps and
    written after the x_pad reflect-pad region)."""
    with open(settings.f0_file) as f:
        rows = [[float(v) for v in line.split(",")]
                for line in f.read().strip().split("\n") if line.strip()]
    inp = np.asarray(rows, np.float32)
    tf0 = SAMPLE_RATE // WINDOW                          # 100 frames/s
    n = int(np.round((inp[:, 0].max() - inp[:, 0].min()) * tf0 + 1))
    replace = np.interp(np.arange(n), inp[:, 0] * tf0, inp[:, 1])
    start = settings.x_pad * tf0
    stop = min(start + len(replace), f0.shape[1])
    out = np.array(f0)
    out[:, start:stop] = replace[: stop - start]
    return out


def convert_split(pipe: "ConvertPipeline", audio16k: np.ndarray, sid: int,
                  settings: ConvertSettings) -> np.ndarray:
    """split_audio mode (reference convert.py:497-510): silence-cut the
    utterance, convert each voiced chunk, reassemble at scaled positions
    with silence in the gaps."""
    from .preprocess import cut_with_positions, restore_positions

    chunks = cut_with_positions(audio16k, SAMPLE_RATE,
                                db_thresh=SPLIT_DB_THRESH,
                                min_interval_ms=SPLIT_MIN_INTERVAL_MS)
    scale = pipe.cfg.sr / SAMPLE_RATE
    converted = []
    for chunk, start, end in chunks:
        out = pipe.convert_utterance(chunk, sid, settings)
        converted.append((int(start * scale), int(start * scale) + len(out), out))
    return restore_positions(converted, int(len(audio16k) * scale))


def _frame_rms(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Center-padded frame RMS (librosa.feature.rms numerics)."""
    pad = frame_length // 2
    xp = np.pad(x.astype(np.float64), (pad, pad))
    n = 1 + (len(xp) - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return np.sqrt(np.mean(np.square(xp[idx]), axis=1))


def _interp_half_pixel(v: np.ndarray, t: int) -> np.ndarray:
    """Linear resample of v to t samples with half-pixel coordinates —
    torch F.interpolate(mode="linear", align_corners=False) numerics."""
    n = len(v)
    x = np.clip((np.arange(t) + 0.5) * (n / t) - 0.5, 0.0, n - 1.0)
    i0 = np.floor(x).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    w = x - i0
    return v[i0] * (1.0 - w) + v[i1] * w


def change_rms(source: np.ndarray, source_sr: int, target: np.ndarray,
               target_sr: int, rate: float) -> np.ndarray:
    """RMS volume-envelope mixing (reference convert.py:150-152): frame
    RMS of source and target, half-pixel linear upsample to waveform
    length, scale by rms1^(1-rate) * rms2^(rate-1); only rms2 floored."""
    rms1 = _frame_rms(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = _frame_rms(target, target_sr // 2 * 2, target_sr // 2)
    t = len(target)
    x1 = _interp_half_pixel(rms1.astype(np.float32), t)
    x2 = np.maximum(_interp_half_pixel(rms2.astype(np.float32), t), 1e-6)
    return (target * (np.power(x1, 1 - rate) * np.power(x2, rate - 1))).astype(np.float32)
