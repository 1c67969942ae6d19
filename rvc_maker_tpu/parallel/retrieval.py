"""Sharded retrieval: index rows distributed over the mesh 'data' axis.

BASELINE config 5 / SURVEY.md §2.8: the retrieval index is sharded by
rows across chips; each shard computes a local top-k, the (distance,
global-index) pairs are all_gathered (k scalars per query per shard —
tiny), merged with a second top_k, and the final blend is assembled as a
psum of per-shard partial weighted sums, so full feature vectors never
cross the interconnect.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_retrieval_blend(mesh: Mesh, *, k: int = 8, axis: str = "data"):
    """Build a jitted blend(feats, vectors_sharded, index_rate) where
    vectors_sharded is (N, D) row-sharded over `axis` and feats (B, T, D)
    is replicated. Returns blended feats (replicated)."""

    def local_fn(feats, vec_shard, index_rate):
        # vec_shard: (N/shards, D) local rows
        n_local = vec_shard.shape[0]
        shard_id = jax.lax.axis_index(axis)

        q2 = jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
        x2 = jnp.sum(jnp.square(vec_shard), axis=-1)
        dots = jnp.einsum("btd,nd->btn", feats, vec_shard)
        d2 = q2 - 2.0 * dots + x2
        neg, idx_local = jax.lax.top_k(-d2, k)           # (B, T, k)
        d2_local = -neg

        # gather the k best (distance, global row) pairs from every shard
        d2_all = jax.lax.all_gather(d2_local, axis)       # (S, B, T, k)
        s = d2_all.shape[0]
        b, t, _ = d2_local.shape
        d2_all = jnp.moveaxis(d2_all, 0, 2).reshape(b, t, s * k)
        src_all = jnp.repeat(jnp.arange(s), k)[None, None, :]

        neg2, sel = jax.lax.top_k(-d2_all, k)             # global top-k
        d2_top = -neg2
        sel_shard = jnp.take_along_axis(
            jnp.broadcast_to(src_all, d2_all.shape), sel, axis=-1)

        w = 1.0 / jnp.square(jnp.maximum(d2_top, 1e-12))
        w = w / jnp.sum(w, axis=-1, keepdims=True)        # (B, T, k)

        # partial blend: each shard sums the winners it owns, then psum
        idx_all = jax.lax.all_gather(idx_local, axis)     # (S, B, T, k)
        idx_all = jnp.moveaxis(idx_all, 0, 2).reshape(b, t, s * k)
        idx_top = jnp.take_along_axis(idx_all, sel, axis=-1)

        mine = (sel_shard == shard_id)
        safe_idx = jnp.where(mine, idx_top, 0)
        neighbors = vec_shard[safe_idx]                   # (B, T, k, D)
        contrib = jnp.sum(neighbors * (w * mine)[..., None], axis=-2)
        blended = jax.lax.psum(contrib, axis)
        return blended * index_rate + feats * (1.0 - index_rate)

    try:
        shard_map = jax.shard_map  # jax >= 0.6
        kwargs = {"check_vma": False}
    except AttributeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        kwargs = {"check_rep": False}

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        **kwargs,
    )
    return jax.jit(fn)


def shard_index_rows(mesh: Mesh, vectors, axis: str = "data"):
    """Pad rows to a multiple of the axis size and place row-sharded."""
    import numpy as np

    n_shards = mesh.shape[axis]
    n = vectors.shape[0]
    pad = (-n) % n_shards
    if pad:
        # pad with far-away sentinel rows so they never win top-k
        sentinel = np.full((pad, vectors.shape[1]), 1e6, vectors.dtype)
        vectors = np.concatenate([vectors, sentinel], axis=0)
    return jax.device_put(vectors, NamedSharding(mesh, P(axis)))
