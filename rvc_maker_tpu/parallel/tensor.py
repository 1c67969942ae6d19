"""Tensor parallelism for the HuBERT encoder (feature extraction).

The reference has no TP (SURVEY.md §2.8) — its models fit one GPU.  On
a TPU pod slice, sharding the encoder's attention heads and FFN hidden
dim across a 'model' mesh axis cuts per-chip weight memory and lets
batch extraction scale past data parallelism alone (BASELINE stage-1
note).  GSPMD does the heavy lifting: we only annotate parameter
shardings — q/k/v and fc1 split on their OUTPUT features, o and fc2 on
their INPUT features — so each chip computes a head/hidden slice and
XLA inserts one psum per block at the o/fc2 boundary, riding ICI.

Param layouts (models/hubert.py, layers stacked for lax.scan):
  layers.attn.{q,k,v}.w (L, C, C)   -> shard last  (heads)
  layers.attn.o.w       (L, C, C)   -> shard middle
  layers.fc{1}.w        (L, C, 4C)  -> shard last  (hidden)
  layers.fc{2}.w        (L, 4C, C)  -> shard middle
  biases follow their weight's sharded axis; everything else replicates.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_keys(path) -> list[str]:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
    return keys


def hubert_tp_spec(path, leaf, axis: str = "model") -> P:
    """PartitionSpec for one HuBERT param leaf under tensor parallelism."""
    keys = _path_keys(path)
    if "layers" in keys:
        col = ({"q", "k", "v"} & set(keys)) or ("fc1" in keys)
        row = ("o" in keys) or ("fc2" in keys)
        if col and keys[-1] == "w":
            return P(None, None, axis)
        if col and keys[-1] == "b":
            return P(None, axis)
        if row and keys[-1] == "w":
            return P(None, axis, None)
        # row bias is added after the psum -> replicated
    return P()


def shard_hubert_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place HuBERT params on the mesh with TP shardings."""
    def put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, hubert_tp_spec(path, leaf, axis)))

    return jax.tree_util.tree_map_with_path(put, params)


def tp_extract_features(params: Any, mesh: Mesh, *, version: str = "v2",
                        data_axis: str = "data", model_axis: str = "model"):
    """Build a jitted data+tensor-parallel feature extraction step.

    params must already be sharded with shard_hubert_tp; audio batches
    shard over data_axis.  Returns fn(audio (B, L), lengths (B,)) ->
    features (replicated)."""
    from ..models import hubert as hubert_mod

    data_sh = NamedSharding(mesh, P(data_axis))
    out_sh = NamedSharding(mesh, P(data_axis, None, None))

    @jax.jit
    def fn(audio, lengths):
        audio = jax.lax.with_sharding_constraint(audio, data_sh)
        feats, _ = hubert_mod.extract_features(
            params, audio, lengths,
            output_layer=12 if version == "v2" else 9)
        if version == "v1":
            feats = hubert_mod.final_proj(params, feats)
        return jax.lax.with_sharding_constraint(feats, out_sh)

    return fn
