"""Load demucs-format checkpoints (.th) and yaml bags into our trees.

Reference: demucs/states.py load_model (torch pickle holding
{klass, args, kwargs, state}) and demucs_separator.py LocalRepo /
BagOnlyRepo (signature .th files + .yaml bags with per-source weights).

The pickled `klass` references the original demucs package module path
(e.g. demucs.htdemucs.HTDemucs) — stub modules are registered so
unpickling resolves to lightweight markers instead of requiring the
torch implementation; the architecture is identified from the class
name and the state dict is mapped through
models.demucs.htdemucs_params_from_state_dict.
"""

from __future__ import annotations

import os
import sys
import types
from typing import Any

from ..models.demucs import DemucsConfig, htdemucs_params_from_state_dict


class _ArchMarker:
    """Placeholder for a pickled demucs model class."""

    arch = "unknown"

    def __init__(self, *a, **k):  # pragma: no cover - never constructed
        pass


def _marker(name):
    return type(name, (_ArchMarker,), {"arch": name})


def _install_demucs_shims():
    """Make pickled demucs classes loadable without their packages.
    Covers both upstream paths (demucs.htdemucs.HTDemucs) and the
    reference's vendored paths
    (main.library.uvr5_separator.demucs.htdemucs.HTDemucs)."""
    arch_mods = {"htdemucs": ["HTDemucs"], "hdemucs": ["HDemucs"],
                 "demucs": ["Demucs"]}
    roots = ("demucs", "main.library.uvr5_separator.demucs")
    for root_name in roots:
        if (root_name.split(".")[0] in sys.modules
                and not getattr(sys.modules[root_name.split(".")[0]],
                                "_rvc_shim", False)):
            continue  # a real package owns this namespace; let it win
        parts = root_name.split(".")
        for i in range(len(parts)):
            name = ".".join(parts[: i + 1])
            if name not in sys.modules:
                m = types.ModuleType(name)
                m._rvc_shim = True
                sys.modules[name] = m
        root = sys.modules[root_name]
        for mod_name, classes in arch_mods.items():
            full = f"{root_name}.{mod_name}"
            m = sys.modules.get(full) or types.ModuleType(full)
            for c in classes:
                setattr(m, c, _marker(c))
            setattr(root, mod_name, m)
            sys.modules[full] = m


def _config_from(klass, kwargs: dict) -> DemucsConfig:
    name = getattr(klass, "arch", None) or getattr(klass, "__name__", "")
    has_transformer = "HT" in name or kwargs.get("t_layers", 0) > 0
    return DemucsConfig(
        sources=tuple(kwargs.get("sources", ("drums", "bass", "other", "vocals"))),
        audio_channels=kwargs.get("audio_channels", 2),
        nfft=kwargs.get("nfft", 4096),
        depth=kwargs.get("depth", 4 if has_transformer else 6),
        stride=kwargs.get("stride", 4),
        kernel_size=kwargs.get("kernel_size", 8),
        time_stride=kwargs.get("time_stride", 2),
        freq_emb_scale=kwargs.get("freq_emb", 0.2),
        cac=kwargs.get("cac", True),
        wiener_iters=kwargs.get("wiener_iters", 0),
        wiener_residual=kwargs.get("wiener_residual", False),
        has_transformer=has_transformer,
        t_heads=kwargs.get("t_heads", 8),
        samplerate=kwargs.get("samplerate", 44100),
        segment=float(kwargs.get("segment", 40.0)),
        use_train_segment=kwargs.get("use_train_segment", True)
        if has_transformer else False,
    )


def load_demucs_th(path_or_package) -> tuple[Any, DemucsConfig]:
    """Load a demucs .th checkpoint -> (params, DemucsConfig)."""
    import torch

    _install_demucs_shims()
    if isinstance(path_or_package, dict):
        package = path_or_package
    else:
        package = torch.load(path_or_package, map_location="cpu",
                             weights_only=False)
    cfg = _config_from(package["klass"], dict(package.get("kwargs", {})))
    state = package["state"]
    if state.get("__quantized"):
        raise NotImplementedError("quantized demucs checkpoints not supported")
    params = htdemucs_params_from_state_dict(state, cfg)
    return params, cfg


def load_demucs_bag(yaml_path: str, repo_dir: str | None = None):
    """Load a yaml bag -> [(params, cfg, per_source_weights), ...] for
    pipelines.separate.apply_bag (reference BagOnlyRepo/BagOfModels)."""
    import yaml

    with open(yaml_path) as f:
        bag = yaml.safe_load(f)
    repo = repo_dir or os.path.dirname(yaml_path)
    out = []
    n_models = len(bag["models"])
    weights = bag.get("weights")
    for i, sig in enumerate(bag["models"]):
        matches = [fn for fn in os.listdir(repo)
                   if fn.startswith(sig) and fn.endswith(".th")]
        if not matches:
            raise FileNotFoundError(f"model {sig}.th not found in {repo}")
        params, cfg = load_demucs_th(os.path.join(repo, matches[0]))
        if "segment" in bag:
            cfg = DemucsConfig(**{**cfg.__dict__, "segment": float(bag["segment"])})
        w = weights[i] if weights else [1.0] * len(cfg.sources)
        out.append((params, cfg, w))
    return out
