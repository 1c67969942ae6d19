"""Prompt-based audio editing pipeline — the reference's audioldm2 stage
(main/inference/audioldm2.py: parse_arguments:46-62, edit:122-128,
invert:88-94, sample:100-120) on our edit-friendly DDPM inversion core.

The reference drives a diffusers AudioLDM2 checkpoint (VAE + CLAP + T5 +
GPT2 + UNet), lazily downloaded from HuggingFace.  This image has no
diffusers and no network, so the checkpoint stack is **load-gated**
behind ``load_audioldm2_stack`` exactly as the reference is
download-gated; the surrounding pipeline (audio -> mel -> latent ->
inversion -> prompt-swap reverse -> mel -> audio with low-pass polish +
resample + export) is fully implemented and tested against a toy latent
stack (``ToyMelStack``) that exercises every step offline.

A model stack is any object with:
    get_mel(audio_16k)   -> (latent-domain x0, duration_s)
    vae_encode(mel)      -> latent w0
    make_eps_fn(prompt, cfg_ignored) -> eps_fn(x, t) -> (uncond, cond)
    vae_decode(w)        -> mel
    decode_to_mel(mel)   -> audio @ 16 kHz   (vocoder / mel inversion)
"""

from __future__ import annotations

import logging
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm_inversion import (DDIMSchedule, inversion_forward,
                             inversion_reverse, low_pass_filter,
                             make_schedule)

logger = logging.getLogger(__name__)

AUDIOLDM2_MODELS = ("audioldm2", "audioldm2-large", "audioldm2-music")


def load_audioldm2_stack(model_id: str = "audioldm2-music", device=None):
    """Load the AudioLDM2 checkpoint stack (reference
    library/audioldm2/models.py load_model:321-329).

    The model stack itself is implemented in JAX (models/audioldm2*.py,
    edit/stack.py: VAE + CLAP + T5 + GPT2 + projection + dual-stream
    UNet + vocoder); checkpoints are download-gated like the reference's
    lazy HF fetch.  A locally-provided diffusers checkpoint directory at
    assets/models/audioldm2/<model_id> (reference load_model path) is
    picked up automatically."""
    if model_id not in AUDIOLDM2_MODELS:
        raise ValueError(f"unknown audioldm2 model {model_id!r}; "
                         f"expected one of {AUDIOLDM2_MODELS}")
    import os

    from .stack import AudioLDM2Stack

    local_dir = os.path.join("assets", "models", "audioldm2", model_id)
    return AudioLDM2Stack.load_from_dir(local_dir)


# --------------------------------------------------------------- mel tools


MEL_BINS = 64
MEL_NFFT = 1024
MEL_HOP = 160
MEL_SR = 16000


def _mel_filterbank(sr=MEL_SR, n_fft=MEL_NFFT, n_mels=MEL_BINS,
                    fmin=0.0, fmax=8000.0) -> np.ndarray:
    """Slaney-style triangular mel filterbank (F, n_mels)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp((m - 15.0)
                                                    * (np.log(6.4) / 27.0)),
                        f)

    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                    n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[:, i] *= enorm
    return fb.astype(np.float32)


def _stft_mag(audio: np.ndarray, n_fft=MEL_NFFT, hop=MEL_HOP) -> np.ndarray:
    x = np.asarray(audio, np.float32)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)) \
        .astype(np.float32)
    return np.abs(np.fft.rfft(x[idx] * win, axis=-1)).T  # (F, T)


def griffin_lim(mag: np.ndarray, n_fft=MEL_NFFT, hop=MEL_HOP,
                iters: int = 32, seed: int = 0) -> np.ndarray:
    """Phase reconstruction from a magnitude spectrogram (F, T)."""
    rs = np.random.RandomState(seed)
    angles = np.exp(2j * np.pi * rs.rand(*mag.shape))
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))

    def istft(spec):
        t = np.fft.irfft(spec.T, n=n_fft, axis=-1) * win
        frames = t.shape[0]
        total = (frames - 1) * hop + n_fft
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        y = np.zeros(total)
        np.add.at(y, idx.reshape(-1), t.reshape(-1))
        norm = np.zeros(total)
        np.add.at(norm, idx.reshape(-1),
                  np.tile(win ** 2, (frames, 1)).reshape(-1))
        y = y / np.maximum(norm, 1e-11)
        return y[n_fft // 2:-(n_fft // 2)]

    def stft(y):
        ypad = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
        frames = 1 + (len(ypad) - n_fft) // hop
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        return np.fft.rfft(ypad[idx] * win, axis=-1).T

    spec = mag * angles
    for _ in range(iters):
        y = istft(spec)
        rebuilt = stft(y)
        rebuilt = rebuilt[:, :mag.shape[1]]
        if rebuilt.shape[1] < mag.shape[1]:
            rebuilt = np.pad(rebuilt,
                             ((0, 0), (0, mag.shape[1] - rebuilt.shape[1])))
        angles = np.exp(1j * np.angle(rebuilt))
        spec = mag * angles
    return istft(spec).astype(np.float32)


class ToyMelStack:
    """Self-contained latent stack: log-mel "latents" with an identity
    VAE and a zero eps-predictor.  Exercises the full edit pipeline
    (scheduler math, noise-map extraction, reverse chain, mel inversion)
    without any pretrained weights; also useful as the protocol spec for
    a real checkpoint stack."""

    def __init__(self, n_mels: int = MEL_BINS):
        self.n_mels = n_mels
        self._fb = _mel_filterbank(n_mels=n_mels)
        self._pinv = np.linalg.pinv(self._fb)    # (n_mels, F)

    def get_mel(self, audio_16k: np.ndarray):
        mag = _stft_mag(audio_16k)                         # (F, T)
        mel = np.log(np.maximum(self._fb.T @ mag, 1e-5))   # (M, T)
        dur = len(audio_16k) / MEL_SR
        return jnp.asarray(mel), dur

    def vae_encode(self, mel):
        return mel

    def make_eps_fn(self, prompt: str, cfg_scale: float) -> Callable:
        del prompt, cfg_scale

        def eps_fn(x, t):
            return jnp.zeros_like(x), None

        return eps_fn

    def vae_decode(self, w):
        return w

    def decode_to_mel(self, mel) -> np.ndarray:
        mel = np.asarray(mel, np.float64)
        mag = np.maximum(self._pinv.T @ np.exp(mel), 0.0)  # (F, T)
        return griffin_lim(mag)


# ------------------------------------------------------------- edit driver


def edit(input_path: str, output_path: str, *,
         model_id: str = "audioldm2-music", source_prompt: str = "",
         target_prompt: str = "", steps: int = 50,
         cfg_scale_src: float = 3.5, cfg_scale_tar: float = 12.0,
         t_start: int = 45, save_compute: bool = True, sr: int = 44100,
         export_format: str = "wav", stack=None, seed: int = 0,
         schedule: DDIMSchedule | None = None) -> str:
    """Invert the input under the source prompt, re-run the reverse
    chain under the target prompt, decode + polish + export (reference
    audioldm2.py edit:122-128 / invert:88-94 / sample:100-120).

    t_start is a percentage (reference: tstart = t_start/100 * steps).
    Returns the written output path."""
    from ..utils.audio import load_audio as load_wav
    from ..utils.audio import save_audio

    if stack is None:
        stack = load_audioldm2_stack(model_id)  # gated: raises offline
    del save_compute  # shared-forward optimisation: N/A without a UNet

    audio = load_wav(input_path, target_sr=MEL_SR)
    x0, duration = stack.get_mel(np.asarray(audio))
    w0 = stack.vae_encode(x0)

    sched = schedule or make_schedule(steps)
    rng = jax.random.PRNGKey(seed)
    eps_src = stack.make_eps_fn(source_prompt, cfg_scale_src)
    _, zs, wts = inversion_forward(eps_src, w0, sched,
                                   cfg_scale=cfg_scale_src, etas=1.0,
                                   rng=rng, numerical_fix=True)

    tstart = int(t_start / 100 * steps)
    eps_tar = stack.make_eps_fn(target_prompt, cfg_scale_tar)
    w_edit = inversion_reverse(eps_tar, wts, zs, sched, tstart=tstart,
                               cfg_scale=cfg_scale_tar, etas=1.0)

    mel = stack.vae_decode(w_edit)
    out = np.asarray(stack.decode_to_mel(mel), np.float32)

    orig_sr = MEL_SR
    if sr != MEL_SR and sr > 0:
        from ..utils.audio import resample

        out = resample(out, orig_sr, sr)
        orig_sr = sr
    out = low_pass_filter(out, 7500.0, orig_sr)
    # reference writes a stereo tile (audioldm2.py:119)
    stereo = np.tile(out, (2, 1)).T
    written = save_audio(output_path, stereo, orig_sr,
                         export_format=export_format)
    logger.info("edited %s -> %s (%.2fs source)", input_path, written,
                duration)
    return written
