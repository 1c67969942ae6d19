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

import dataclasses
import logging
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal

from ..config import ModelConfig
from ..f0.common import autotune_f0, coarse_f0, shift_f0
from ..f0.yin import yin
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
    deterministic: bool = False        # zero noise (parity mode)


def _bucket_length(n: int, bucket: int = SAMPLE_RATE) -> int:
    """Round up to a whole bucket (default: 1 s of 16 kHz samples)."""
    return int(np.ceil(max(n, bucket) / bucket)) * bucket


class ConvertPipeline:
    """Holds model params + per-bucket compiled convert step."""

    def __init__(self, synth_params: Any, model_cfg: ModelConfig,
                 hubert_params: Any, version: str = "v2",
                 rmvpe_params: Any = None,
                 index_vectors: Optional[np.ndarray] = None,
                 rmvpe_microbatch: int = 8):
        self.rmvpe_microbatch = rmvpe_microbatch
        self.synth_params = synth_params
        self.cfg = model_cfg
        self.hubert_params = hubert_params
        self.version = version
        self.rmvpe_params = rmvpe_params
        self.index_vectors = (jnp.asarray(index_vectors)
                              if index_vectors is not None else None)
        self._step_cache: dict = {}

    # -- the single-program device step ----------------------------------

    def _build_step(self, use_index: bool, f0_method: str):
        cfg = self.cfg
        version = self.version

        def step(synth_params, hubert_params, rmvpe_params, index_vectors,
                 audio, lengths, sid, pitch_shift, index_rate, protect,
                 autotune_strength, rng):
            # audio: (B, L) padded 16k; lengths: (B,) valid samples
            b, L = audio.shape

            # ---- F0 ----------------------------------------------------
            if f0_method == "rmvpe":
                # microbatch the U-Net: its skip activations are the peak
                # HBM temp (B=32 x 10 s OOMs a v5e otherwise); lax.map
                # keeps one microbatch of temps live at a time
                mb = self.rmvpe_microbatch
                if b > mb and b % mb == 0:
                    f0 = jax.lax.map(
                        lambda chunk: rmvpe_mod.infer(rmvpe_params, chunk),
                        audio.reshape(b // mb, mb, L)).reshape(b, -1)
                else:
                    f0 = rmvpe_mod.infer(rmvpe_params, audio)   # (B, L//160+1)
            else:
                f0 = yin(audio, sr=SAMPLE_RATE, fmin=50.0, fmax=1100.0,
                         hop_length=WINDOW)
            f0 = shift_f0(f0, pitch_shift)
            f0 = jnp.where(autotune_strength > 0,
                           autotune_f0(f0, autotune_strength), f0)

            # ---- content features -------------------------------------
            feats, _ = hubert_mod.extract_features(
                hubert_params, audio, lengths, output_layer=12 if version == "v2" else 9)
            if version == "v1":
                feats = hubert_mod.final_proj(hubert_params, feats)

            feats0 = feats
            if use_index:
                feats = retrieval_blend(feats, index_vectors, index_rate)

            feats = interp_nearest_x2(feats)                    # ~100 Hz frames
            feats0 = interp_nearest_x2(feats0)

            # ---- align f0 to feature frames (reference convert.py:364-370)
            p_len = min(L // WINDOW, feats.shape[1])
            feats = feats[:, :p_len]
            feats0 = feats0[:, :p_len]
            pitchf = f0[:, :p_len]
            pitch = coarse_f0(pitchf)

            # ---- protect: restore original feats on unvoiced frames ----
            pitchff = jnp.where(pitchf > 0, 1.0, protect)[:, :, None]
            do_protect = protect < 0.5
            feats = jnp.where(do_protect,
                              feats * pitchff + feats0 * (1.0 - pitchff),
                              feats)

            # ---- synthesize -------------------------------------------
            frame_lengths = jnp.minimum(lengths // WINDOW, p_len)
            k1, k2 = jax.random.split(rng)
            z_noise = jax.random.normal(k1, (b, p_len, cfg.inter_channels))
            sine_noise = jax.random.normal(k2, (b, p_len * cfg.upp, 1))
            wav, _, _ = syn.infer(synth_params, cfg, feats, frame_lengths,
                                  pitch if cfg.use_f0 else None, pitchf,
                                  sid, z_noise, sine_noise)
            return wav[:, :, 0], pitchf

        return jax.jit(step)

    def _get_step(self, use_index: bool, f0_method: str):
        key = (use_index, f0_method)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(use_index, f0_method)
        return self._step_cache[key]

    # -- device batch conversion of equal-bucket chunks ------------------

    def convert_batch(self, audio_batch: np.ndarray, lengths: np.ndarray,
                      sid: int, settings: ConvertSettings,
                      rng: Optional[jax.Array] = None):
        """audio_batch: (B, L) float32 @16 kHz (already padded to bucket).
        Returns (wav (B, L//160 * upp_sr_samples), pitchf) on device."""
        use_index = (self.index_vectors is not None
                     and settings.index_rate > 0)
        step = self._get_step(use_index, settings.f0_method)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if settings.deterministic:
            rng = jax.random.PRNGKey(0)  # fixed; noise still sampled
        b = audio_batch.shape[0]
        return step(
            self.synth_params, self.hubert_params, self.rmvpe_params,
            self.index_vectors if use_index else jnp.zeros((1, 256 if self.version == "v1" else 768), jnp.float32),
            jnp.asarray(audio_batch), jnp.asarray(lengths),
            jnp.full((b,), sid, jnp.int32),
            jnp.float32(settings.pitch), jnp.float32(settings.index_rate),
            jnp.float32(settings.protect),
            jnp.float32(settings.f0_autotune_strength if settings.f0_autotune else 0.0),
            rng)

    # -- full single-utterance conversion (reference VC.pipeline) --------

    def convert_utterance(self, audio16k: np.ndarray, sid: int,
                          settings: ConvertSettings) -> np.ndarray:
        """One utterance end-to-end with chunking + padding semantics of
        the reference (convert.py:388-458). Returns waveform at model sr."""
        s = settings
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
            # valid decoded samples for this chunk
            n_out = (len(chunk) // WINDOW) * (tgt_sr // 100)
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


def _frame_rms(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Center-padded frame RMS (librosa.feature.rms numerics)."""
    pad = frame_length // 2
    xp = np.pad(x.astype(np.float64), (pad, pad))
    n = 1 + (len(xp) - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return np.sqrt(np.mean(np.square(xp[idx]), axis=1))


def change_rms(source: np.ndarray, source_sr: int, target: np.ndarray,
               target_sr: int, rate: float) -> np.ndarray:
    """RMS volume-envelope mixing (reference convert.py:150-152)."""
    rms1 = _frame_rms(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = _frame_rms(target, target_sr // 2 * 2, target_sr // 2)
    t = len(target)
    x1 = np.interp(np.linspace(0, len(rms1) - 1, t), np.arange(len(rms1)), rms1)
    x2 = np.interp(np.linspace(0, len(rms2) - 1, t), np.arange(len(rms2)), rms2)
    x2 = np.maximum(x2, 1e-6)
    return (target * (np.power(x1, 1 - rate) * np.power(x2, rate - 1))).astype(np.float32)
