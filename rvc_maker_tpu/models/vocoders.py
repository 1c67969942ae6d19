"""Alternative vocoders: MRF-HiFi-GAN and RefineGAN.

Reference: main/library/algorithm/mrf_hifigan.py (harmonic source with
cumsum-wrap phase accumulation, harmonic_num=8, MRF residual stacks) and
refinegan.py (source-waveform branch + mel branch, parallel ResBlocks
with AdaIN noise injection, linear-interpolation upsampling).

Selected by ModelConfig.vocoder ("MRF HiFi-GAN" | "RefineGAN"); the
default NSF-HiFiGAN lives in models/synthesizer.py.  Explicit noise
inputs replace torch's hidden randomness (rand_ini, AdaIN randn) for
parity testing.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.nn import conv1d, conv_transpose1d, leaky_relu, linear

Params = Any


def interp_linear(x, size: int):
    """torch F.interpolate(mode='linear', align_corners=False) on the
    time axis. x: (B, T, C) -> (B, size, C)."""
    t_in = x.shape[1]
    pos = (jnp.arange(size) + 0.5) * (t_in / size) - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


def _upsample_nearest(x, factor: int):
    b, t, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, t, factor, c)).reshape(b, t * factor, c)


def cumsum_sine(f0_buf, rand_ini, *, sample_rate: int):
    """Phase accumulation used by both alt vocoders (mrf_hifigan.py:58-68):
    rad = (f0/sr) % 1 with random initial phase per harmonic (0 for the
    fundamental), cumulative sum with wrap-shift correction.

    f0_buf: (B, T, H) per-harmonic Hz; rand_ini: (B, H) phases or None.
    """
    rad = jnp.mod(f0_buf / sample_rate, 1.0)
    if rand_ini is not None:
        rad = rad.at[:, 0, :].add(rand_ini)
    tmp = jnp.mod(jnp.cumsum(rad, axis=1), 1.0)
    wrap = (tmp[:, 1:, :] - tmp[:, :-1, :]) < 0
    shift = jnp.pad(jnp.where(wrap, -1.0, 0.0), ((0, 0), (1, 0), (0, 0)))
    return jnp.sin(jnp.cumsum(rad + shift, axis=1) * 2.0 * jnp.pi)


def _harmonic_source(f0, n_harmonics: int, noise, rand_ini, *,
                     sample_rate: int, sine_amp: float = 0.1,
                     noise_std: float = 0.003):
    """f0: (B, T) Hz -> sine bank (B, T, n_harmonics+1)."""
    h = jnp.arange(1, n_harmonics + 2, dtype=f0.dtype)
    f0_buf = f0[:, :, None] * h
    sines = cumsum_sine(f0_buf, rand_ini, sample_rate=sample_rate) * sine_amp
    uv = (f0 > 0).astype(f0.dtype)[:, :, None]
    amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    return sines * uv + amp * noise


# ---------------------------------------------------------------------------
# MRF-HiFi-GAN
# ---------------------------------------------------------------------------

def _mrf_block(p: Params, x, *, kernel: int, dilations):
    for lp, d in zip(p["layers"], dilations):
        y = leaky_relu(x, 0.1)
        y = conv1d(y, lp["conv1"]["w"], lp["conv1"]["b"], dilation=d,
                   padding=(kernel * d - d) // 2)
        y = leaky_relu(y, 0.1)
        y = conv1d(y, lp["conv2"]["w"], lp["conv2"]["b"], padding=kernel // 2)
        x = x + y
    return x


def mrf_hifigan(p: Params, cfg: ModelConfig, x, f0, g, source_noise,
                rand_ini=None, *, harmonic_num: int = 8):
    """x: (B, T, C); f0: (B, T) Hz; source_noise: (B, T*upp, H+1)."""
    upp = cfg.upp
    f0_up = _upsample_nearest(f0[:, :, None], upp)[:, :, 0]
    sines = _harmonic_source(f0_up, harmonic_num, source_noise, rand_ini,
                             sample_rate=cfg.sr)
    har = jnp.tanh(linear(sines, p["source"]["l_linear"]["w"],
                          p["source"]["l_linear"].get("b")))
    har = har.astype(x.dtype)

    x = conv1d(x, p["conv_pre"]["w"], p["conv_pre"]["b"], padding=3)
    if g is not None:
        x = x + linear(g, p["cond"]["w"], p["cond"]["b"])

    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    n = len(rates)
    stride_f0s = [math.prod(rates[i + 1:]) if i + 1 < n else 1 for i in range(n)]
    for i, (u, k) in enumerate(zip(rates, kernels)):
        x = leaky_relu(x, 0.1)
        pad = ((k - u) // 2) if u % 2 == 0 else (u // 2 + u % 2)
        x = conv_transpose1d(x, p["ups"][i]["w"], p["ups"][i]["b"], stride=u,
                             padding=pad, output_padding=u % 2)
        stride = stride_f0s[i]
        nk = 1 if stride == 1 else stride * 2 - stride % 2
        npad = 0 if stride == 1 else (nk - stride) // 2
        x = x + conv1d(har, p["noise_convs"][i]["w"], p["noise_convs"][i]["b"],
                       stride=stride, padding=npad)
        xs = None
        for mp, ks, ds in zip(p["mrfs"][i], cfg.resblock_kernel_sizes,
                              cfg.resblock_dilation_sizes):
            r = _mrf_block(mp, x, kernel=ks, dilations=ds)
            xs = r if xs is None else xs + r
        x = xs / len(cfg.resblock_kernel_sizes)

    # reference uses F.leaky_relu default slope (0.01) before conv_post
    # (mrf_hifigan.py:139) — same quirk as the NSF generator
    x = leaky_relu(x, 0.01)
    return jnp.tanh(conv1d(x, p["conv_post"]["w"], p["conv_post"]["b"],
                           padding=3))


# ---------------------------------------------------------------------------
# RefineGAN
# ---------------------------------------------------------------------------

def _refine_resblock(p: Params, x, *, kernel: int, dilations=(1, 3, 5),
                     slope: float = 0.2):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        y = leaky_relu(x, slope)
        y = conv1d(y, c1["w"], c1["b"], dilation=d, padding=(kernel * d - d) // 2)
        y = leaky_relu(y, slope)
        y = conv1d(y, c2["w"], c2["b"], padding=(kernel - 1) // 2)
        x = y + x
    return x


def _adain(p: Params, x, noise, slope: float = 0.2):
    return leaky_relu(x + noise * p["weight"], slope)


def _parallel_resblock(p: Params, x, noises, *, kernels=(3, 7, 11),
                       slope: float = 0.2):
    x = conv1d(x, p["input_conv"]["w"], p["input_conv"]["b"], padding=3)
    outs = []
    for bp, ks, (n1, n2) in zip(p["blocks"], kernels, noises):
        y = _adain(bp["adain1"], x, n1, slope)
        y = _refine_resblock(bp["res"], y, kernel=ks, slope=slope)
        y = _adain(bp["adain2"], y, n2, slope)
        outs.append(y)
    return sum(outs) / len(outs)


def refinegan(p: Params, cfg: ModelConfig, mel, f0, g, source_noise,
              adain_noises, rand_ini=None, *, slope: float = 0.2):
    """mel: (B, T, num_mels); f0: (B, T) Hz; source_noise: (B, T*upp, 1);
    adain_noises: per-stage list of per-kernel (n1, n2) noise pairs
    shaped like the stage activations (pass zeros for parity mode)."""
    upp = cfg.upp
    t_mel = mel.shape[1]
    f0_up = interp_linear(f0[:, :, None], t_mel * upp)[:, :, 0]
    sines = _harmonic_source(f0_up, 0, source_noise, rand_ini,
                             sample_rate=cfg.sr)
    har = jnp.tanh(linear(sines, p["source"]["merge"]["w"]))
    har = har.astype(mel.dtype)

    x = conv1d(har, p["pre_conv"]["w"], p["pre_conv"]["b"], padding=3)
    x = interp_linear(x, t_mel)

    m = conv1d(mel, p["mel_conv"]["w"], p["mel_conv"]["b"], padding=3)
    if g is not None:
        m = m + linear(g, p["cond"]["w"], p["cond"]["b"])
    x = jnp.concatenate([m, x], axis=-1)

    for i, rate in enumerate(cfg.upsample_rates):
        x = leaky_relu(x, slope)
        x = interp_linear(x, x.shape[1] * rate)
        stride = math.prod(cfg.upsample_rates[i + 1:]) if i + 1 < len(cfg.upsample_rates) else 1
        nk = 1 if stride == 1 else stride * 2 - stride % 2
        npad = 0 if stride == 1 else (nk - stride) // 2
        down = conv1d(har, p["downsample_blocks"][i]["w"],
                      p["downsample_blocks"][i]["b"], stride=stride,
                      padding=npad)
        x = jnp.concatenate([x, down], axis=-1)
        x = _parallel_resblock(p["upsample_conv_blocks"][i], x,
                               adain_noises[i], slope=slope)

    x = leaky_relu(x, slope)
    return jnp.tanh(conv1d(x, p["conv_post"]["w"], None, padding=3))


# ---------------------------------------------------------------------------
# torch import
# ---------------------------------------------------------------------------

def mrf_params_from_state_dict(sd, cfg: ModelConfig, prefix: str = "dec.") -> Params:
    from ..interop.torch_import import conv_from, conv1x1_as_linear, convt_from, linear_from

    n = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)
    p: dict = {
        "source": {"l_linear": linear_from(sd, f"{prefix}m_source.l_linear")},
        "conv_pre": conv_from(sd, f"{prefix}conv_pre"),
        "ups": [convt_from(sd, f"{prefix}upsamples.{i}") for i in range(n)],
        "noise_convs": [conv_from(sd, f"{prefix}noise_convs.{i}") for i in range(n)],
        "conv_post": conv_from(sd, f"{prefix}conv_post"),
        "mrfs": [],
    }
    if f"{prefix}cond.weight" in sd:
        p["cond"] = conv1x1_as_linear(sd, f"{prefix}cond")
    for i in range(n):
        stage = []
        for j in range(nk):
            layers = []
            for l in range(len(cfg.resblock_dilation_sizes[j])):
                lp = f"{prefix}mrfs.{i}.{j}.layers.{l}"
                layers.append({"conv1": conv_from(sd, f"{lp}.conv1"),
                               "conv2": conv_from(sd, f"{lp}.conv2")})
            stage.append({"layers": layers})
        p["mrfs"].append(stage)
    return p


def refinegan_params_from_state_dict(sd, cfg: ModelConfig,
                                     prefix: str = "dec.") -> Params:
    import numpy as np

    from ..interop.torch_import import (conv_from, conv1x1_as_linear,
                                        linear_from, _folded_weight, _to_numpy)

    n = len(cfg.upsample_rates)
    p: dict = {
        "source": {"merge": {"w": np.transpose(
            _folded_weight(sd, f"{prefix}m_source.merge.0"))}},
        "pre_conv": conv_from(sd, f"{prefix}pre_conv"),
        "mel_conv": conv_from(sd, f"{prefix}mel_conv"),
        "conv_post": conv_from(sd, f"{prefix}conv_post"),
        "downsample_blocks": [conv_from(sd, f"{prefix}downsample_blocks.{i}")
                              for i in range(n)],
        "upsample_conv_blocks": [],
    }
    if f"{prefix}cond.weight" in sd:
        p["cond"] = conv1x1_as_linear(sd, f"{prefix}cond")
    for i in range(n):
        bp = f"{prefix}upsample_conv_blocks.{i}"
        blocks = []
        for j in range(3):  # kernel sizes (3, 7, 11)
            res = {"convs1": [], "convs2": []}
            for l in range(3):
                res["convs1"].append(conv_from(sd, f"{bp}.blocks.{j}.1.convs1.{l}"))
                res["convs2"].append(conv_from(sd, f"{bp}.blocks.{j}.1.convs2.{l}"))
            blocks.append({
                "adain1": {"weight": _to_numpy(sd[f"{bp}.blocks.{j}.0.weight"])},
                "res": res,
                "adain2": {"weight": _to_numpy(sd[f"{bp}.blocks.{j}.2.weight"])},
            })
        p["upsample_conv_blocks"].append(
            {"input_conv": conv_from(sd, f"{bp}.input_conv"), "blocks": blocks})
    return p


# ---------------------------------------------------------------------------
# init (training alt-vocoder models from scratch)
# ---------------------------------------------------------------------------

def mrf_init_params(key, cfg: ModelConfig, *, harmonic_num: int = 8) -> Params:
    """Random MRF HiFi-GAN decoder tree (reference mrf_hifigan.py:96-125;
    weight-norm folded — we train plain kernels)."""
    import jax

    from .synthesizer import _linear_init, _normal_conv_init, _torch_conv_init

    keys = iter(jax.random.split(key, 4096))
    uic = cfg.upsample_initial_channel
    n = len(cfg.upsample_rates)
    p: dict = {
        "source": {"l_linear": _linear_init(next(keys), harmonic_num + 1, 1)},
        "conv_pre": _torch_conv_init(next(keys), 7, cfg.inter_channels, uic),
        "cond": _linear_init(next(keys), cfg.gin_channels, uic),
        "ups": [], "noise_convs": [], "mrfs": [],
    }
    stride_f0s = [math.prod(cfg.upsample_rates[i + 1:])
                  if i + 1 < n else 1 for i in range(n)]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = uic // (2 ** i), uic // (2 ** (i + 1))
        p["ups"].append({
            "w": jax.random.normal(next(keys), (k, cin, cout)) * 0.01,
            "b": jnp.zeros((cout,))})
        stride = stride_f0s[i]
        nk_noise = 1 if stride == 1 else stride * 2 - stride % 2
        p["noise_convs"].append(_torch_conv_init(next(keys), nk_noise, 1, cout))
        stage = []
        for ks, ds in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes):
            layers = [{"conv1": _normal_conv_init(next(keys), ks, cout, cout),
                       "conv2": _normal_conv_init(next(keys), ks, cout, cout)}
                      for _ in ds]
            stage.append({"layers": layers})
        p["mrfs"].append(stage)
    p["conv_post"] = _torch_conv_init(next(keys), 7, uic // (2 ** n), 1)
    return p


def refinegan_init_params(key, cfg: ModelConfig) -> Params:
    """Random RefineGAN decoder tree (reference refinegan.py:109-170)."""
    import jax

    from .synthesizer import _linear_init, _normal_conv_init, _torch_conv_init

    keys = iter(jax.random.split(key, 4096))
    uic = cfg.upsample_initial_channel
    n = len(cfg.upsample_rates)
    p: dict = {
        "source": {"merge": {
            "w": jax.random.normal(next(keys), (1, 1)) * 0.5}},
        "pre_conv": _torch_conv_init(next(keys), 7, 1, uic // 2),
        "mel_conv": _normal_conv_init(next(keys), 7, cfg.inter_channels,
                                      uic // 2),
        "cond": _linear_init(next(keys), cfg.gin_channels, uic // 2),
        "downsample_blocks": [], "upsample_conv_blocks": [],
    }
    channels = uic
    for i, rate in enumerate(cfg.upsample_rates):
        stride = (math.prod(cfg.upsample_rates[i + 1:])
                  if i + 1 < n else 1)
        nk_noise = 1 if stride == 1 else stride * 2 - stride % 2
        p["downsample_blocks"].append(
            _torch_conv_init(next(keys), nk_noise, 1, uic // (2 ** (i + 2))))
        new_channels = channels // 2
        in_ch = channels + channels // 4
        blocks = []
        for ks in (3, 7, 11):
            res = {"convs1": [], "convs2": []}
            for _ in (1, 3, 5):
                res["convs1"].append(
                    _torch_conv_init(next(keys), ks, new_channels, new_channels))
                res["convs2"].append(
                    _torch_conv_init(next(keys), ks, new_channels, new_channels))
            blocks.append({"adain1": {"weight": jnp.ones((new_channels,))},
                           "res": res,
                           "adain2": {"weight": jnp.ones((new_channels,))}})
        p["upsample_conv_blocks"].append({
            "input_conv": _normal_conv_init(next(keys), 7, in_ch, new_channels),
            "blocks": blocks})
        channels = new_channels
    p["conv_post"] = {"w": jax.random.normal(next(keys),
                                             (7, channels, 1)) * 0.01}
    return p
