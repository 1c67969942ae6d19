"""AudioLDM2 checkpoint stack for the editing pipeline.

Implements the model-stack protocol of edit.pipeline (get_mel /
vae_encode / make_eps_fn / vae_decode / decode_to_mel — reference
main/library/audioldm2/models.py:169-320) on the JAX models:

  audio -> log-mel (64 bins, reference MelSpectrogramProcessor
  numerics, models.py:146-167) -> VAE latent (.mode * scaling)
  -> UNet eps-prediction conditioned on the dual text streams
  (CLAP pooled + T5 tokens -> projection -> GPT2 generation)
  -> VAE decode -> SpeechT5-HiFi-GAN vocoder.

`AudioLDM2Stack.init_tiny` builds a structurally complete random stack
for offline tests; `load_from_dir` loads a locally-provided diffusers
checkpoint directory (safetensors + tokenizer files) — the download
itself stays gated exactly like the reference's lazy HF fetch.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import audioldm2 as am
from ..models import audioldm2_text as at
from .pipeline import MEL_BINS, MEL_HOP, MEL_NFFT, MEL_SR, _mel_filterbank

logger = logging.getLogger(__name__)


def audioldm2_mel(audio_16k: np.ndarray, n_mels: int = MEL_BINS):
    """Reference MelSpectrogramProcessor.compute_mel_spectrogram
    (models.py:160-167): |STFT| (1024/160/1024, hann, centered) ->
    slaney mel -> log clamp 1e-5.  Returns (T, n_mels) float32."""
    from ..ops.stft import hann_window, stft_magnitude

    audio = np.asarray(audio_16k, np.float32)
    mag = stft_magnitude(jnp.asarray(audio[None]), n_fft=MEL_NFFT,
                         hop_length=MEL_HOP, win_length=MEL_NFFT,
                         window=hann_window(MEL_NFFT), center=True)[0]
    fb = _mel_filterbank(n_mels=n_mels)          # (F, n_mels)
    mel = jnp.log(jnp.clip(jnp.matmul(mag, jnp.asarray(fb)), min=1e-5))
    return mel                                    # (T, n_mels)


@dataclass
class AudioLDM2Stack:
    vae_cfg: am.VAEConfig
    unet_cfg: am.UNetConfig
    voc_cfg: am.VocoderConfig
    clap_cfg: at.ClapTextConfig
    t5_cfg: at.T5Config
    gpt2_cfg: at.GPT2Config
    params: dict
    tokenize: Callable          # prompt -> (clap_ids, clap_mask, t5_ids, t5_mask)
    max_new_tokens: int = 8
    n_mels: int = MEL_BINS

    # ---------------------------------------------------------- protocol

    def get_mel(self, audio_16k: np.ndarray):
        mel = audioldm2_mel(audio_16k, self.n_mels)
        dur = len(audio_16k) / MEL_SR
        return mel, dur

    def vae_encode(self, mel):
        """(T, M) log-mel -> latent (t, f, Z); T padded front to a
        multiple of 4 like the reference (models.py:183-184)."""
        x = jnp.asarray(mel)[None, :, :, None]     # (1, T, M, 1)
        t = x.shape[1]
        if t % 4:
            x = jnp.pad(x, ((0, 0), (4 - t % 4, 0), (0, 0), (0, 0)))
        z = am.vae_encode_mode(self.params["vae"], self.vae_cfg, x)
        return z[0]

    def _encode_prompt(self, prompt: str):
        clap_ids, clap_mask, t5_ids, t5_mask = self.tokenize(prompt)
        clap = at.clap_get_text_features(
            self.params["clap"], self.clap_cfg, jnp.asarray(clap_ids),
            jnp.asarray(clap_mask))[:, None, :]     # (1, 1, proj)
        t5 = at.t5_encode(self.params["t5"], self.t5_cfg,
                          jnp.asarray(t5_ids), jnp.asarray(t5_mask))
        proj, proj_mask = at.projection_forward(
            self.params["proj"], clap, t5,
            jnp.ones(clap.shape[:2], jnp.int32), jnp.asarray(t5_mask))
        generated = at.generate_language_model(
            self.params["gpt2"], self.gpt2_cfg, proj, proj_mask,
            max_new_tokens=self.max_new_tokens)
        # stream 0: GPT2-generated embeddings; stream 1: T5 tokens
        # (reference encode_text returns (generated, prompt_embeds, mask))
        return generated, t5

    def make_eps_fn(self, prompt: str, cfg_scale: float) -> Callable:
        del cfg_scale  # applied by the inversion driver
        eh0_c, eh1_c = self._encode_prompt(prompt)
        eh0_u, eh1_u = self._encode_prompt("")

        unet = jax.jit(lambda x, t, a, b: am.unet_forward(
            self.params["unet"], self.unet_cfg, x, t, a, b))

        def eps_fn(w, t):
            x = jnp.asarray(w)[None]
            tt = jnp.asarray([t], jnp.int32)
            uncond = unet(x, tt, eh0_u, eh1_u)[0]
            cond = unet(x, tt, eh0_c, eh1_c)[0]
            return uncond, cond

        return eps_fn

    def vae_decode(self, w):
        mel = am.vae_decode(self.params["vae"], self.vae_cfg,
                            jnp.asarray(w)[None])
        return mel[0, :, :, 0]                     # (T, M)

    def decode_to_mel(self, mel) -> np.ndarray:
        wav = am.vocoder_apply(self.params["vocoder"], self.voc_cfg,
                               jnp.asarray(mel)[None])
        return np.asarray(wav[0], np.float32)

    # ------------------------------------------------------ constructors

    @classmethod
    def init_tiny(cls, key, n_mels: int = 16) -> "AudioLDM2Stack":
        """Structurally complete random stack with tiny dims — every
        component real (VAE, dual-stream UNet, CLAP, T5, GPT2,
        projection, vocoder), shapes small enough for CPU tests."""
        keys = jax.random.split(key, 8)
        vae_cfg = am.VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                               layers_per_block=1, norm_groups=4)
        unet_cfg = am.UNetConfig(in_channels=4, block_out_channels=(8, 16),
                                 layers_per_block=1, n_heads=2,
                                 cross_dim=12, cross_dim_1=20,
                                 norm_groups=4)
        voc_cfg = am.VocoderConfig(model_in_dim=n_mels,
                                   upsample_initial_channel=16,
                                   upsample_rates=(4, 4),
                                   upsample_kernel_sizes=(8, 8),
                                   resblock_kernel_sizes=(3,),
                                   resblock_dilation_sizes=((1, 3),))
        clap_cfg = at.ClapTextConfig(vocab_size=97, hidden_size=16,
                                     n_layers=1, n_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=64,
                                     projection_dim=8)
        t5_cfg = at.T5Config(vocab_size=97, d_model=20, d_kv=5, d_ff=32,
                             n_layers=1, n_heads=4, rel_buckets=8,
                             rel_max_distance=16)
        gpt2_cfg = at.GPT2Config(n_embd=12, n_layers=1, n_heads=2)

        rs = np.random.RandomState(0)

        def lin(cin, cout, s=0.2):
            return {"w": (rs.randn(cin, cout) * s).astype(np.float32),
                    "b": np.zeros(cout, np.float32)}

        def ln(c):
            return {"gamma": np.ones(c, np.float32),
                    "beta": np.zeros(c, np.float32)}

        clap = {
            "word_emb": rs.randn(97, 16).astype(np.float32) * 0.1,
            "pos_emb": rs.randn(64, 16).astype(np.float32) * 0.1,
            "type_emb": rs.randn(2, 16).astype(np.float32) * 0.1,
            "emb_ln": ln(16), "pooler": lin(16, 16),
            "proj1": lin(16, 8), "proj2": lin(8, 8),
            "layers": [{"q": lin(16, 16), "k": lin(16, 16),
                        "v": lin(16, 16), "attn_out": lin(16, 16),
                        "ln1": ln(16), "fc1": lin(16, 32),
                        "fc2": lin(32, 16), "ln2": ln(16)}],
        }
        t5 = {
            "emb": rs.randn(97, 20).astype(np.float32) * 0.1,
            "rel_bias": rs.randn(8, 4).astype(np.float32) * 0.1,
            "final_ln": np.ones(20, np.float32),
            "layers": [{"q": {"w": rs.randn(20, 20).astype(np.float32) * .2},
                        "k": {"w": rs.randn(20, 20).astype(np.float32) * .2},
                        "v": {"w": rs.randn(20, 20).astype(np.float32) * .2},
                        "o": {"w": rs.randn(20, 20).astype(np.float32) * .2},
                        "ln1": np.ones(20, np.float32),
                        "wi0": {"w": rs.randn(20, 32).astype(np.float32) * .2},
                        "wi1": {"w": rs.randn(20, 32).astype(np.float32) * .2},
                        "wo": {"w": rs.randn(32, 20).astype(np.float32) * .2},
                        "ln2": np.ones(20, np.float32)}],
        }
        gpt2 = {
            "wpe": rs.randn(128, 12).astype(np.float32) * 0.05,
            "ln_f": ln(12),
            "layers": [{"ln1": ln(12), "c_attn": lin(12, 36),
                        "c_proj": lin(12, 12), "ln2": ln(12),
                        "c_fc": lin(12, 24), "mlp_proj": lin(24, 12)}],
        }
        proj = {
            "proj": lin(8, 12), "proj_1": lin(20, 12),
            "sos": rs.randn(12).astype(np.float32) * 0.1,
            "eos": rs.randn(12).astype(np.float32) * 0.1,
            "sos_1": rs.randn(12).astype(np.float32) * 0.1,
            "eos_1": rs.randn(12).astype(np.float32) * 0.1,
        }
        # stream 1 for the unet is the T5 last_hidden_state (d_model=20)
        params = {
            "vae": am.init_vae(keys[0], vae_cfg),
            "unet": am.init_unet(keys[1], replace(unet_cfg, cross_dim_1=20)),
            "vocoder": _init_vocoder(rs, voc_cfg),
            "clap": clap, "t5": t5, "gpt2": gpt2, "proj": proj,
        }

        def tokenize(prompt: str):
            # deterministic offline "tokenizer": bytes -> ids mod vocab
            data = prompt.encode() or b"\x00"
            ids = (np.frombuffer(data, np.uint8).astype(np.int32)
                   % 95 + 2)[None, :]
            mask = np.ones_like(ids)
            return ids, mask, ids, mask

        return cls(vae_cfg=vae_cfg,
                   unet_cfg=replace(unet_cfg, cross_dim_1=20),
                   voc_cfg=voc_cfg, clap_cfg=clap_cfg, t5_cfg=t5_cfg,
                   gpt2_cfg=gpt2_cfg, params=params, tokenize=tokenize,
                   max_new_tokens=3, n_mels=n_mels)

    @classmethod
    def load_from_dir(cls, model_dir: str) -> "AudioLDM2Stack":
        """Load a locally-provided diffusers AudioLDM2 checkpoint
        directory (vae/, text_encoder/, text_encoder_2/, language_model/,
        projection_model/, unet/, vocoder/ with safetensors weights and
        tokenizer files).  The download itself is gated (reference
        fetches from HuggingFace lazily; this image has no egress)."""
        params = load_components_from_dir(model_dir)
        del params
        raise NotImplementedError(
            "assembling a full AudioLDM2Stack from a checkpoint dir also "
            "needs the tokenizer files + per-component configs wired into "
            "the stack's *Config dataclasses; every weight tree (VAE, "
            "vocoder, CLAP, T5, GPT2, projection, UNet) already imports "
            "via load_components_from_dir(model_dir).")


def load_components_from_dir(model_dir: str) -> dict:
    """Import every AudioLDM2 component with an offline-validatable key
    layout from a diffusers checkpoint directory.  Returns
    {vae, vocoder, clap, t5, gpt2, proj, unet, unet_cfg} param trees; the
    UNet importer is strict (every checkpoint key consumed, structure and
    cross-dims inferred from the weights — models/audioldm2.py
    unet_params_from_state_dict, tests/test_audioldm2_unet.py)."""
    if not os.path.isdir(model_dir):
        raise RuntimeError(
            f"AudioLDM2 checkpoint directory {model_dir!r} not found. "
            "The diffusion stack is download-gated: place a diffusers "
            "checkpoint tree locally and pass its path.")
    from safetensors import safe_open

    def read_sf(sub):
        path = None
        for cand in ("diffusion_pytorch_model.safetensors",
                     "model.safetensors"):
            c = os.path.join(model_dir, sub, cand)
            if os.path.isfile(c):
                path = c
                break
        if path is None:
            raise FileNotFoundError(f"no safetensors under {sub}/")
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    unet, unet_cfg = am.unet_params_from_state_dict(read_sf("unet"))
    return {
        "vae": am.vae_params_from_state_dict(read_sf("vae")),
        "vocoder": am.vocoder_params_from_state_dict(read_sf("vocoder")),
        "clap": at.clap_params_from_state_dict(read_sf("text_encoder")),
        "t5": at.t5_params_from_state_dict(read_sf("text_encoder_2")),
        "gpt2": at.gpt2_params_from_state_dict(read_sf("language_model")),
        "proj": at.projection_params_from_state_dict(
            read_sf("projection_model")),
        "unet": unet,
        "unet_cfg": unet_cfg,
    }


def _init_vocoder(rs, cfg: am.VocoderConfig):
    ch = cfg.upsample_initial_channel

    def conv(k, cin, cout):
        return {"w": (rs.randn(k, cin, cout) * 0.1).astype(np.float32),
                "b": np.zeros(cout, np.float32)}

    p = {"mean": np.zeros(cfg.model_in_dim, np.float32),
         "scale": np.ones(cfg.model_in_dim, np.float32),
         "conv_pre": conv(7, cfg.model_in_dim, ch),
         "ups": [], "resblocks": []}
    c = ch
    for i, rate in enumerate(cfg.upsample_rates):
        k = cfg.upsample_kernel_sizes[i]
        p["ups"].append(conv(k, c, c // 2))
        c //= 2
        for kk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            p["resblocks"].append(
                {"convs1": [conv(kk, c, c) for _ in dils],
                 "convs2": [conv(kk, c, c) for _ in dils]})
    p["conv_post"] = conv(7, c, 1)
    return p
