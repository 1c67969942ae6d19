"""hyperpyyaml-lite: load speechbrain model directories.

Reference: speechbrain.py Pretrained.from_hparams:185-196 loads a
`hyperparams.yaml` written in HyperPyYAML (tags `!new:pkg.Class`,
`!name:pkg.fn`, `!ref <key>`, plus plain YAML) and a Pretrainer that
copies `embedding_model.ckpt` etc.  hyperpyyaml isn't in this image, so
this implements the subset those model dirs actually use:

- `!new:x.y.Class`  -> {"_new": "x.y.Class", **mapping-or-args}
- `!name:x.y.fn`    -> {"_name": "x.y.fn"}
- `!ref <key>` / strings containing `<key>` -> top-level substitution
  (recursively resolved; arithmetic refs are NOT supported — the
  speaker-embedding hparams files don't use them)

and `load_speechbrain_ecapa(dir)` builds our ECAPA params from such a
directory (hyperparams.yaml + embedding_model.ckpt).
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

_REF = re.compile(r"<([^<>]+)>")


def _make_loader():
    class _Loader(yaml.SafeLoader):
        pass

    def new_ctor(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            data = loader.construct_mapping(node, deep=True)
        elif isinstance(node, yaml.SequenceNode):
            data = {"_args": loader.construct_sequence(node, deep=True)}
        else:
            data = {}
        data["_new"] = tag_suffix
        return data

    def name_ctor(loader, tag_suffix, node):
        return {"_name": tag_suffix}

    def ref_ctor(loader, node):
        return loader.construct_scalar(node)   # resolved in a second pass

    _Loader.add_multi_constructor("!new:", new_ctor)
    _Loader.add_multi_constructor("!name:", name_ctor)
    _Loader.add_constructor("!ref", ref_ctor)
    _Loader.add_multi_constructor(
        "!apply:", lambda l, s, n: {"_apply": s})
    return _Loader


def _resolve(value: Any, root: dict) -> Any:
    if isinstance(value, str):
        m = _REF.fullmatch(value.strip())
        if m and m.group(1) in root:
            return _resolve(root[m.group(1)], root)

        def sub(match):
            key = match.group(1)
            return str(_resolve(root[key], root)) if key in root \
                else match.group(0)

        return _REF.sub(sub, value)
    if isinstance(value, dict):
        return {k: _resolve(v, root) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve(v, root) for v in value]
    return value


def load_hyperpyyaml_lite(path: str) -> dict:
    with open(path) as f:
        raw = yaml.load(f, Loader=_make_loader())
    return {k: _resolve(v, raw) for k, v in raw.items()}


def load_speechbrain_ecapa(model_dir: str):
    """speechbrain spkrec-ecapa dir -> (params, info dict).

    Reads hyperparams.yaml to locate the embedding model entry and its
    feature config, then imports embedding_model.ckpt through
    models.ecapa_tdnn (reference EncoderClassifier.from_hparams +
    Pretrainer collect semantics)."""
    from ..models.ecapa_tdnn import load_ecapa_ckpt

    h = load_hyperpyyaml_lite(os.path.join(model_dir, "hyperparams.yaml"))
    emb = h.get("embedding_model")
    if not (isinstance(emb, dict) and
            emb.get("_new", "").endswith("ECAPA_TDNN")):
        raise ValueError("hyperparams.yaml has no ECAPA_TDNN "
                         "embedding_model entry")
    feats = h.get("compute_features", {})
    info = {
        "input_size": emb.get("input_size"),
        "channels": emb.get("channels"),
        "lin_neurons": emb.get("lin_neurons", 192),
        "n_mels": (feats.get("n_mels") if isinstance(feats, dict)
                   else None) or emb.get("input_size"),
        "sample_rate": h.get("sample_rate", 16000),
    }
    ckpt = os.path.join(model_dir, "embedding_model.ckpt")
    params = load_ecapa_ckpt(ckpt)
    return params, info
