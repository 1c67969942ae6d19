"""Import reference-format PyTorch checkpoints into rvc_maker_tpu pytrees.

Handles the RVC interchange `.pth` format (reference: train.py:724-744
`extract_model` writes {"weight": state_dict, "config": [...18 hparams],
"sr", "f0", "version", "vocoder", ...}; convert.py:554-571 loads it).

Weight-norm is folded at import time (w = g * v / ||v||, norm over all
dims except dim 0 — the numerics of torch remove_weight_norm), because a
TPU program should never re-normalize static weights at run time.  Both
parametrization spellings are accepted:
  * new: `{p}.parametrizations.weight.original0/original1`
  * old: `{p}.weight_g` / `{p}.weight_v`
(reference handles the same renaming in train.py:257-272.)

Layout conversions (torch -> ours):
  * Conv1d  weight (Cout, Cin, K)  -> (K, Cin, Cout)
  * ConvT1d weight (Cin, Cout, K)  -> (K, Cin, Cout)
  * Linear  weight (Cout, Cin)     -> (Cin, Cout)
  * 1x1 Conv1d -> Linear (Cin, Cout)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import ModelConfig, model_config_from_ckpt_list

Params = Any


def _to_numpy(t) -> np.ndarray:
    # torch tensor (possibly fp16) -> float32 numpy, without importing torch
    # at module scope (torch only needed when actually reading .pth files).
    if isinstance(t, np.ndarray):
        arr = t
    else:
        arr = t.detach().cpu().numpy()
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    return arr


def _folded_weight(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Effective weight in torch layout, folding weight-norm if present."""
    if f"{prefix}.weight" in sd:
        return _to_numpy(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g = _to_numpy(sd[f"{prefix}.weight_g"])
        v = _to_numpy(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _to_numpy(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _to_numpy(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight found for {prefix!r}")
    # norm over all dims except 0, keepdims (torch norm_except_dim(v, 2, 0))
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(np.square(v.astype(np.float64)), axis=axes, keepdims=True))
    return (g * (v / norm)).astype(np.float32)


def _bias(sd, prefix):
    key = f"{prefix}.bias"
    return _to_numpy(sd[key]) if key in sd else None


def conv_from(sd, prefix) -> dict:
    w = _folded_weight(sd, prefix)          # (Cout, Cin, K)
    out = {"w": np.transpose(w, (2, 1, 0))}  # (K, Cin, Cout)
    b = _bias(sd, prefix)
    if b is not None:
        out["b"] = b
    return out


def convt_from(sd, prefix) -> dict:
    w = _folded_weight(sd, prefix)          # (Cin, Cout, K)
    out = {"w": np.transpose(w, (2, 0, 1))}  # (K, Cin, Cout)
    b = _bias(sd, prefix)
    if b is not None:
        out["b"] = b
    return out


def linear_from(sd, prefix) -> dict:
    w = _folded_weight(sd, prefix)          # (Cout, Cin)
    out = {"w": np.transpose(w)}
    b = _bias(sd, prefix)
    if b is not None:
        out["b"] = b
    return out


def conv1x1_as_linear(sd, prefix) -> dict:
    w = _folded_weight(sd, prefix)          # (Cout, Cin, 1)
    out = {"w": np.transpose(w[:, :, 0])}   # (Cin, Cout)
    b = _bias(sd, prefix)
    if b is not None:
        out["b"] = b
    return out


def _ln_from(sd, prefix) -> dict:
    return {"gamma": _to_numpy(sd[f"{prefix}.gamma"]),
            "beta": _to_numpy(sd[f"{prefix}.beta"])}


def _wavenet_from(sd, prefix, n_layers: int) -> dict:
    p = {"in_layers": [], "res_skip": []}
    for i in range(n_layers):
        p["in_layers"].append(conv_from(sd, f"{prefix}.in_layers.{i}"))
        p["res_skip"].append(conv1x1_as_linear(sd, f"{prefix}.res_skip_layers.{i}"))
    if any(k.startswith(f"{prefix}.cond_layer.") for k in sd):
        p["cond"] = conv1x1_as_linear(sd, f"{prefix}.cond_layer")
    return p


def synthesizer_params_from_state_dict(sd: Mapping[str, Any],
                                       cfg: ModelConfig) -> Params:
    """Map a reference Synthesizer state_dict onto our parameter tree.

    Key names follow reference synthesizers.py module attributes;
    enc_q is optional (stripped from inference weights, train.py:731).
    """
    # --- enc_p -----------------------------------------------------------
    enc_layers = []
    for i in range(cfg.n_layers):
        ap = f"enc_p.encoder.attn_layers.{i}"
        attn = {
            "q": conv1x1_as_linear(sd, f"{ap}.conv_q"),
            "k": conv1x1_as_linear(sd, f"{ap}.conv_k"),
            "v": conv1x1_as_linear(sd, f"{ap}.conv_v"),
            "o": conv1x1_as_linear(sd, f"{ap}.conv_o"),
            "emb_rel_k": _to_numpy(sd[f"{ap}.emb_rel_k"]),
            "emb_rel_v": _to_numpy(sd[f"{ap}.emb_rel_v"]),
        }
        enc_layers.append({
            "attn": attn,
            "norm1": _ln_from(sd, f"enc_p.encoder.norm_layers_1.{i}"),
            "ffn": {"conv1": conv_from(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                    "conv2": conv_from(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2")},
            "norm2": _ln_from(sd, f"enc_p.encoder.norm_layers_2.{i}"),
        })
    enc_p = {
        "emb_phone": linear_from(sd, "enc_p.emb_phone"),
        "encoder": {"layers": enc_layers},
        "proj": conv1x1_as_linear(sd, "enc_p.proj"),
    }
    if "enc_p.emb_pitch.weight" in sd:
        enc_p["emb_pitch"] = {"w": _to_numpy(sd["enc_p.emb_pitch.weight"])}

    # --- flow ------------------------------------------------------------
    flow_layers = []
    for i in range(4):
        fp = f"flow.flows.{i * 2}"
        flow_layers.append({
            "pre": conv1x1_as_linear(sd, f"{fp}.pre"),
            "enc": _wavenet_from(sd, f"{fp}.enc", n_layers=3),
            "post": conv1x1_as_linear(sd, f"{fp}.post"),
        })

    params: dict = {
        "enc_p": enc_p,
        "flow": {"layers": flow_layers},
        "emb_g": {"w": _to_numpy(sd["emb_g.weight"])},
    }

    # --- enc_q (training checkpoints only) -------------------------------
    if "enc_q.pre.weight" in sd:
        params["enc_q"] = {
            "pre": conv1x1_as_linear(sd, "enc_q.pre"),
            "enc": _wavenet_from(sd, "enc_q.enc", n_layers=16),
            "proj": conv1x1_as_linear(sd, "enc_q.proj"),
        }

    # --- dec (vocoder dispatch) -----------------------------------------
    if cfg.vocoder in ("MRF HiFi-GAN", "MRF-HiFi-GAN"):
        from ..models.vocoders import mrf_params_from_state_dict

        params["dec"] = mrf_params_from_state_dict(sd, cfg)
        return params
    if cfg.vocoder == "RefineGAN":
        from ..models.vocoders import refinegan_params_from_state_dict

        params["dec"] = refinegan_params_from_state_dict(sd, cfg)
        return params

    # --- dec (NSF-HiFiGAN, the default) ---------------------------------
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)
    dec = {
        "conv_pre": conv_from(sd, "dec.conv_pre"),
        "resblocks": [],
        "conv_post": conv_from(sd, "dec.conv_post"),
    }
    if "dec.m_source.l_linear.weight" in sd:
        # NSF decoder (use_f0 models)
        dec["ups"] = [convt_from(sd, f"dec.ups.{i}") for i in range(n_up)]
        dec["noise_convs"] = [conv_from(sd, f"dec.noise_convs.{i}")
                              for i in range(n_up)]
        dec["source"] = {"l_linear": linear_from(sd, "dec.m_source.l_linear")}
        resblock_key = "dec.resblocks.{j}.convs{c}.{k}"
    else:
        # plain Generator (f0-less): ups and resblocks interleave in one
        # ModuleList `ups_and_resblocks` (reference synthesizers.py:27-33)
        stride = 1 + nk
        dec["ups"] = [convt_from(sd, f"dec.ups_and_resblocks.{i * stride}")
                      for i in range(n_up)]
        resblock_key = None
    if "dec.cond.weight" in sd:
        dec["cond"] = conv1x1_as_linear(sd, "dec.cond")
    for j in range(n_up * nk):
        rb = {"convs1": [], "convs2": []}
        n_d = len(cfg.resblock_dilation_sizes[j % nk])
        if resblock_key is None:
            # interleaved index: stage i occupies [i*(1+nk)], resblock j'
            # of stage i sits at i*(1+nk) + 1 + j'
            i_stage, j_in = divmod(j, nk)
            base = f"dec.ups_and_resblocks.{i_stage * (1 + nk) + 1 + j_in}"
        else:
            base = f"dec.resblocks.{j}"
        for k in range(n_d):
            rb["convs1"].append(conv_from(sd, f"{base}.convs1.{k}"))
            rb["convs2"].append(conv_from(sd, f"{base}.convs2.{k}"))
        dec["resblocks"].append(rb)
    params["dec"] = dec
    return params


def load_synthesizer_pth(path: str):
    """Load a reference interchange .pth -> (params, ModelConfig, meta dict)."""
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt["weight"]
    version = cpt.get("version", "v1")
    use_f0 = bool(cpt.get("f0", 1))
    vocoder = cpt.get("vocoder", "Default")
    cfg_list = list(cpt["config"])
    # reference patches spk_embed_dim from the actual embedding table
    # (convert.py:558) before constructing the model
    cfg_list[-3] = sd["emb_g.weight"].shape[0]
    cfg = model_config_from_ckpt_list(cfg_list, use_f0=use_f0, version=version,
                                      vocoder=vocoder)
    # trust the weights over the version heuristic for the embedding width
    # (reference uses 768-v2/256-v1, but the true dim is in emb_phone)
    emb_dim = int(sd["enc_p.emb_phone.weight"].shape[1])
    if emb_dim != cfg.text_enc_hidden_dim:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, text_enc_hidden_dim=emb_dim)
    params = synthesizer_params_from_state_dict(sd, cfg)
    meta = {k: v for k, v in cpt.items() if k != "weight"}
    return params, cfg, meta


# ---------------------------------------------------------------------------
# training-side importers (pretrained G/D init — reference train.py:778-794)
# ---------------------------------------------------------------------------

def _wn_pair(sd, prefix):
    """Return live (g, v, b) for a weight-normed conv, layout-transposed.

    Training keeps the weight-norm parametrization (it shapes optimizer
    dynamics), so g/v import unfolded: torch g (Cout,1,..) -> ours
    (1,..,Cout); v transposed like a plain kernel."""
    if f"{prefix}.weight_g" in sd:
        g = _to_numpy(sd[f"{prefix}.weight_g"])
        v = _to_numpy(sd[f"{prefix}.weight_v"])
    else:
        g = _to_numpy(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _to_numpy(sd[f"{prefix}.parametrizations.weight.original1"])
    if v.ndim == 3:      # Conv1d (Cout, Cin, K)
        v_t = np.transpose(v, (2, 1, 0))
        g_t = np.transpose(g, (2, 1, 0))
    else:                # Conv2d (Cout, Cin, Kh, Kw)
        v_t = np.transpose(v, (2, 3, 1, 0))
        g_t = np.transpose(g, (2, 3, 1, 0))
    out = {"g": g_t.astype(np.float32), "v": v_t.astype(np.float32)}
    b = _bias(sd, prefix)
    if b is not None:
        out["b"] = b
    return out


def discriminator_params_from_state_dict(sd, version: str = "v2"):
    """Map a reference MultiPeriodDiscriminator state dict (training
    checkpoint 'model' entry) to our live-weight-norm tree."""
    from ..models.discriminator import PERIODS_V1, PERIODS_V2

    periods = PERIODS_V2 if version == "v2" else PERIODS_V1
    s_convs = [_wn_pair(sd, f"discriminators.0.convs.{j}") for j in range(6)]
    s_post = _wn_pair(sd, "discriminators.0.conv_post")
    p_list = []
    for i in range(1, len(periods) + 1):
        convs = [_wn_pair(sd, f"discriminators.{i}.convs.{j}") for j in range(5)]
        post = _wn_pair(sd, f"discriminators.{i}.conv_post")
        p_list.append({"convs": convs, "post": post})
    return {"s": {"convs": s_convs, "post": s_post}, "p": p_list}


def load_pretrained_g(path: str, cfg):
    """Load a training checkpoint G_*.pth / pretrained G (with enc_q) as
    generator init."""
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt["model"] if "model" in cpt else cpt["weight"]
    return synthesizer_params_from_state_dict(sd, cfg)


def load_pretrained_d(path: str, version: str = "v2"):
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt["model"] if "model" in cpt else cpt["weight"]
    return discriminator_params_from_state_dict(sd, version)
