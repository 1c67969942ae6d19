"""Export our synthesizer params to the reference interchange .pth format.

Inverse of torch_import: our (K, Cin, Cout) trees -> torch-layout state
dict with the reference's module names, so a model trained here loads in
the reference toolkit (convert.py:554-571) and vice versa.

Weight-normed modules in the reference expect parametrized keys
(`.parametrizations.weight.original0/1`).  We emit g = per-outchannel
norm of w and v = w, which reconstructs w exactly under
w = g * v / ||v||.  Metadata mirrors extract_model (train.py:724-744):
config list, sr, f0, version, vocoder, epoch/step, sha256 hash.
"""

from __future__ import annotations

import datetime
import hashlib
from collections import OrderedDict

import numpy as np

from ..config import ModelConfig, RVCConfig, model_config_to_ckpt_list


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _conv_to_torch(p, weight_normed=False):
    """ours (K, Cin, Cout) -> torch Conv1d (Cout, Cin, K)."""
    w = np.transpose(_t(p["w"]), (2, 1, 0))
    return _emit(w, p.get("b"), weight_normed)


def _convt_to_torch(p, weight_normed=False):
    """ours (K, Cin, Cout) -> torch ConvTranspose1d (Cin, Cout, K)."""
    w = np.transpose(_t(p["w"]), (1, 2, 0))
    return _emit(w, p.get("b"), weight_normed)


def _linear_as_conv1x1(p, weight_normed=False):
    """ours (Cin, Cout) -> torch Conv1d (Cout, Cin, 1)."""
    w = np.transpose(_t(p["w"]))[:, :, None]
    return _emit(w, p.get("b"), weight_normed)


def _linear_to_torch(p):
    return _emit(np.transpose(_t(p["w"])), p.get("b"), False)


def _emit(w, b, weight_normed):
    out = {}
    if weight_normed:
        axes = tuple(range(1, w.ndim))
        g = np.sqrt(np.sum(np.square(w), axis=axes, keepdims=True))
        out["parametrizations.weight.original0"] = g.astype(np.float32)
        out["parametrizations.weight.original1"] = w.astype(np.float32)
    else:
        out["weight"] = w.astype(np.float32)
    if b is not None:
        out["bias"] = _t(b)
    return out


def _add(sd, prefix, tensors):
    for k, v in tensors.items():
        sd[f"{prefix}.{k}"] = v


def _wavenet_to_torch(sd, prefix, p):
    for i, lp in enumerate(p["in_layers"]):
        _add(sd, f"{prefix}.in_layers.{i}", _conv_to_torch(lp, True))
    for i, lp in enumerate(p["res_skip"]):
        _add(sd, f"{prefix}.res_skip_layers.{i}", _linear_as_conv1x1(lp, True))
    if "cond" in p:
        _add(sd, f"{prefix}.cond_layer", _linear_as_conv1x1(p["cond"], True))


def synthesizer_state_dict(params, cfg: ModelConfig) -> "OrderedDict":
    sd: OrderedDict = OrderedDict()
    enc_p = params["enc_p"]
    _add(sd, "enc_p.emb_phone", _linear_to_torch(enc_p["emb_phone"]))
    if "emb_pitch" in enc_p:
        sd["enc_p.emb_pitch.weight"] = _t(enc_p["emb_pitch"]["w"])
    for i, lp in enumerate(enc_p["encoder"]["layers"]):
        ap = f"enc_p.encoder.attn_layers.{i}"
        _add(sd, f"{ap}.conv_q", _linear_as_conv1x1(lp["attn"]["q"]))
        _add(sd, f"{ap}.conv_k", _linear_as_conv1x1(lp["attn"]["k"]))
        _add(sd, f"{ap}.conv_v", _linear_as_conv1x1(lp["attn"]["v"]))
        _add(sd, f"{ap}.conv_o", _linear_as_conv1x1(lp["attn"]["o"]))
        sd[f"{ap}.emb_rel_k"] = _t(lp["attn"]["emb_rel_k"])
        sd[f"{ap}.emb_rel_v"] = _t(lp["attn"]["emb_rel_v"])
        sd[f"enc_p.encoder.norm_layers_1.{i}.gamma"] = _t(lp["norm1"]["gamma"])
        sd[f"enc_p.encoder.norm_layers_1.{i}.beta"] = _t(lp["norm1"]["beta"])
        _add(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1", _conv_to_torch(lp["ffn"]["conv1"]))
        _add(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2", _conv_to_torch(lp["ffn"]["conv2"]))
        sd[f"enc_p.encoder.norm_layers_2.{i}.gamma"] = _t(lp["norm2"]["gamma"])
        sd[f"enc_p.encoder.norm_layers_2.{i}.beta"] = _t(lp["norm2"]["beta"])
    _add(sd, "enc_p.proj", _linear_as_conv1x1(enc_p["proj"]))

    for i, lp in enumerate(params["flow"]["layers"]):
        fp = f"flow.flows.{i * 2}"
        _add(sd, f"{fp}.pre", _linear_as_conv1x1(lp["pre"]))
        _wavenet_to_torch(sd, f"{fp}.enc", lp["enc"])
        _add(sd, f"{fp}.post", _linear_as_conv1x1(lp["post"]))

    dec = params["dec"]
    if "mrfs" in dec:
        _export_mrf_dec(sd, dec)
        sd["emb_g.weight"] = _t(params["emb_g"]["w"])
        return sd
    if "upsample_conv_blocks" in dec:
        _export_refinegan_dec(sd, dec)
        sd["emb_g.weight"] = _t(params["emb_g"]["w"])
        return sd
    _add(sd, "dec.conv_pre", _conv_to_torch(dec["conv_pre"]))
    if "source" in dec:
        # NSF decoder layout (use_f0 models)
        for i, lp in enumerate(dec["ups"]):
            _add(sd, f"dec.ups.{i}", _convt_to_torch(lp, True))
        for i, lp in enumerate(dec["noise_convs"]):
            _add(sd, f"dec.noise_convs.{i}", _conv_to_torch(lp))
        for j, rb in enumerate(dec["resblocks"]):
            for k, c in enumerate(rb["convs1"]):
                _add(sd, f"dec.resblocks.{j}.convs1.{k}", _conv_to_torch(c, True))
            for k, c in enumerate(rb["convs2"]):
                _add(sd, f"dec.resblocks.{j}.convs2.{k}", _conv_to_torch(c, True))
        _add(sd, "dec.m_source.l_linear",
             _linear_to_torch(dec["source"]["l_linear"]))
    else:
        # plain Generator: interleaved ups_and_resblocks ModuleList
        # (reference synthesizers.py:27-33)
        nk = len(dec["resblocks"]) // len(dec["ups"])
        stride = 1 + nk
        for i, lp in enumerate(dec["ups"]):
            _add(sd, f"dec.ups_and_resblocks.{i * stride}",
                 _convt_to_torch(lp, True))
        for j, rb in enumerate(dec["resblocks"]):
            i_stage, j_in = divmod(j, nk)
            base = f"dec.ups_and_resblocks.{i_stage * stride + 1 + j_in}"
            for k, c in enumerate(rb["convs1"]):
                _add(sd, f"{base}.convs1.{k}", _conv_to_torch(c, True))
            for k, c in enumerate(rb["convs2"]):
                _add(sd, f"{base}.convs2.{k}", _conv_to_torch(c, True))
    _add(sd, "dec.conv_post", _conv_to_torch(dec["conv_post"]))
    if "cond" in dec:
        _add(sd, "dec.cond", _linear_as_conv1x1(dec["cond"]))
    sd["emb_g.weight"] = _t(params["emb_g"]["w"])
    return sd


def _export_mrf_dec(sd, dec):
    """MRF HiFi-GAN decoder -> reference mrf_hifigan.py module names."""
    _add(sd, "dec.m_source.l_linear", _linear_to_torch(dec["source"]["l_linear"]))
    _add(sd, "dec.conv_pre", _conv_to_torch(dec["conv_pre"], True))
    for i, lp in enumerate(dec["ups"]):
        _add(sd, f"dec.upsamples.{i}", _convt_to_torch(lp, True))
    for i, lp in enumerate(dec["noise_convs"]):
        _add(sd, f"dec.noise_convs.{i}", _conv_to_torch(lp))
    for i, stage in enumerate(dec["mrfs"]):
        for j, blk in enumerate(stage):
            for l, layer in enumerate(blk["layers"]):
                _add(sd, f"dec.mrfs.{i}.{j}.layers.{l}.conv1",
                     _conv_to_torch(layer["conv1"], True))
                _add(sd, f"dec.mrfs.{i}.{j}.layers.{l}.conv2",
                     _conv_to_torch(layer["conv2"], True))
    _add(sd, "dec.conv_post", _conv_to_torch(dec["conv_post"], True))
    if "cond" in dec:
        _add(sd, "dec.cond", _linear_as_conv1x1(dec["cond"]))


def _export_refinegan_dec(sd, dec):
    """RefineGAN decoder -> reference refinegan.py module names."""
    sd["dec.m_source.merge.0.weight"] = np.transpose(
        _t(dec["source"]["merge"]["w"]))
    _add(sd, "dec.pre_conv", _conv_to_torch(dec["pre_conv"], True))
    _add(sd, "dec.mel_conv", _conv_to_torch(dec["mel_conv"], True))
    for i, lp in enumerate(dec["downsample_blocks"]):
        _add(sd, f"dec.downsample_blocks.{i}", _conv_to_torch(lp, True))
    for i, blk in enumerate(dec["upsample_conv_blocks"]):
        bp = f"dec.upsample_conv_blocks.{i}"
        _add(sd, f"{bp}.input_conv", _conv_to_torch(blk["input_conv"]))
        for j, b2 in enumerate(blk["blocks"]):
            sd[f"{bp}.blocks.{j}.0.weight"] = _t(b2["adain1"]["weight"])
            sd[f"{bp}.blocks.{j}.2.weight"] = _t(b2["adain2"]["weight"])
            for l, c in enumerate(b2["res"]["convs1"]):
                _add(sd, f"{bp}.blocks.{j}.1.convs1.{l}", _conv_to_torch(c, True))
            for l, c in enumerate(b2["res"]["convs2"]):
                _add(sd, f"{bp}.blocks.{j}.1.convs2.{l}", _conv_to_torch(c, True))
    _add(sd, "dec.conv_post", _conv_to_torch(dec["conv_post"], True))
    if "cond" in dec:
        _add(sd, "dec.cond", _linear_as_conv1x1(dec["cond"]))


def export_synthesizer_pth(params, cfg: RVCConfig, path: str, *,
                           epoch: int = 0, step: int = 0,
                           author: str = "") -> None:
    """Write the interchange .pth (fp16 tensors, enc_q stripped)."""
    import torch

    sd = synthesizer_state_dict(params, cfg.model)
    sd_t = OrderedDict((k, torch.from_numpy(np.ascontiguousarray(v)).half())
                       for k, v in sd.items())
    ckpt = {
        "weight": sd_t,
        "config": model_config_to_ckpt_list(cfg.model),
        "sr": cfg.model.sr,
        "f0": int(cfg.model.use_f0),
        "version": cfg.version,
        "vocoder": cfg.model.vocoder,
        "epoch": epoch,
        "step": step,
        "author": author,
        "creation_date": datetime.datetime.now().isoformat(),
    }
    hasher = hashlib.sha256()
    for k in sorted(sd):
        hasher.update(k.encode())
        hasher.update(np.ascontiguousarray(sd[k]).tobytes())
    ckpt["model_hash"] = hasher.hexdigest()
    torch.save(ckpt, path)
