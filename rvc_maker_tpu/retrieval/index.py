"""TPU-native feature retrieval — replaces FAISS IVF with matmul top-k.

The reference builds an IVF-Flat FAISS index with nprobe=1 over HuBERT
features and at conversion time searches k=8 neighbors, blending the
query with inverse-square-distance weights (reference create_index.py:66-83,
convert.py:349-359).  The reference itself reconstructs the *dense* matrix
from the index for blending (convert.py:395), so the dense matrix IS the
index; on TPU, exact k-NN over it is one (B*T, D) x (D, N) matmul + top_k
— MXU work, no pointer-chasing, and typically *more* accurate than
IVF/nprobe=1.

Index artifacts:
  * our own `.npz` (vectors + metadata) written by build_index
  * the reference's `total_fea.npy` (raw dense matrix) loads directly
    (faiss `.index` files need faiss to parse and faiss is not in this
    image; total_fea.npy is written alongside every reference index).

Sharding (BASELINE config 5): rows sharded over the mesh 'data' axis;
each shard computes a local top-k and the k winners are merged with a
second top_k after an all_gather — see rvc_maker_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FeatureIndex:
    vectors: np.ndarray          # (N, D) float32
    version: str = "v2"          # v1 (256-d) | v2 (768-d)
    sample_rate: int = 16000

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])


# ---------------------------------------------------------------------------
# search + blend (the conversion-time hot path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k",))
def topk_l2(queries, vectors, *, k: int = 8):
    """Exact k-NN by squared L2 over the MXU.

    queries: (..., D); vectors: (N, D).
    Returns (distances (..., k), indices (..., k)) — squared L2, ascending,
    matching faiss IndexFlatL2 search semantics.
    """
    q2 = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)     # (..., 1)
    x2 = jnp.sum(jnp.square(vectors), axis=-1)                     # (N,)
    dots = jnp.einsum("...d,nd->...n", queries, vectors)
    d2 = q2 - 2.0 * dots + x2
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


@partial(jax.jit, static_argnames=("k",))
def retrieval_blend(feats, vectors, index_rate, *, k: int = 8):
    """Blend features with their k nearest index rows.

    feats: (B, T, D); vectors: (N, D); index_rate: scalar in [0, 1].
    weight = (1/d^2) normalized (reference convert.py:353-359);
    out = blended * rate + feats * (1 - rate).
    """
    d2, idx = topk_l2(feats, vectors, k=k)
    w = 1.0 / jnp.square(jnp.maximum(d2, 1e-12))
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbors = vectors[idx]                                       # (B, T, k, D)
    blended = jnp.sum(neighbors * w[..., None], axis=-2)
    return blended * index_rate + feats * (1.0 - index_rate)


# ---------------------------------------------------------------------------
# k-means (index build compression, reference create_index.py:63)
# ---------------------------------------------------------------------------

def kmeans(key, x, n_clusters: int, *, n_iters: int = 25,
           batch_size: int = 16384):
    """Mini-batch Lloyd's k-means on device.

    x: (N, D) array (host or device). Returns (n_clusters, D) centroids.
    Replaces sklearn MiniBatchKMeans(init='random') semantics — exact
    centroid parity with sklearn is not required (the reference's own
    result is run-to-run random); what matters is a well-spread codebook.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    batch_size = min(batch_size, n)
    k0, key = jax.random.split(key)
    init_idx = jax.random.choice(k0, n, (n_clusters,), replace=False)
    centroids = x[init_idx]
    counts = jnp.ones((n_clusters,))

    @jax.jit
    def step(carry, bkey):
        centroids, counts = carry
        bidx = jax.random.choice(bkey, n, (batch_size,), replace=False)
        batch = x[bidx]
        _, assign = topk_l2(batch, centroids, k=1)
        assign = assign[:, 0]
        add = jax.ops.segment_sum(batch, assign, num_segments=centroids.shape[0])
        cnt = jax.ops.segment_sum(jnp.ones((batch.shape[0],)), assign,
                                  num_segments=centroids.shape[0])
        new_counts = counts + cnt
        lr = cnt / new_counts
        mean_batch = add / jnp.maximum(cnt, 1.0)[:, None]
        centroids = jnp.where((cnt > 0)[:, None],
                              centroids * (1 - lr[:, None]) + mean_batch * lr[:, None],
                              centroids)
        return (centroids, new_counts), None

    keys = jax.random.split(key, n_iters)
    (centroids, _), _ = jax.lax.scan(step, (centroids, counts), keys)
    return centroids


# ---------------------------------------------------------------------------
# build / save / load
# ---------------------------------------------------------------------------

def build_index(features: np.ndarray, *, version: str = "v2",
                max_rows: float = 2e5, n_clusters: int = 10000,
                seed: int = 0, shuffle: bool = True) -> FeatureIndex:
    """Reference create_index.py semantics: shuffle, k-means to 10k
    centroids when rows > 2e5, keep the dense matrix."""
    feats = np.ascontiguousarray(features, dtype=np.float32)
    if shuffle:
        rs = np.random.RandomState(seed)
        feats = feats[rs.permutation(feats.shape[0])]
    if feats.shape[0] > max_rows:
        feats = np.asarray(kmeans(jax.random.PRNGKey(seed), feats, n_clusters))
    return FeatureIndex(vectors=feats, version=version)


def save_index(index: FeatureIndex, path: str) -> None:
    np.savez_compressed(
        path, vectors=index.vectors,
        meta=json.dumps({"version": index.version,
                         "sample_rate": index.sample_rate}))


def load_index(path: str) -> FeatureIndex:
    """Load our .npz, a faiss `.index` file (the format every existing
    RVC user's `added_*.index` is in — reference convert.py:394-395 reads
    it with faiss.read_index + reconstruct_n), or a reference
    total_fea.npy dense matrix."""
    if path.endswith(".npy"):
        vec = np.load(path).astype(np.float32)
        return FeatureIndex(vectors=vec,
                            version="v1" if vec.shape[1] == 256 else "v2")
    if path.endswith(".index"):
        from .faiss_io import read_index

        idx = read_index(path)
        vec = idx.reconstruct_n()
        return FeatureIndex(vectors=vec,
                            version="v1" if vec.shape[1] == 256 else "v2")
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    return FeatureIndex(vectors=data["vectors"].astype(np.float32),
                        version=meta.get("version", "v2"),
                        sample_rate=meta.get("sample_rate", 16000))
