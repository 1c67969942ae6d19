"""IVF coarse quantization for faiss-format index export.

Reference create_index.py:66-83 builds `IVF{nlist},Flat` with
nlist = min(16*sqrt(N), N/39) and nprobe 1; this reproduces that layout
so our `added_*.index` files load in any faiss-based RVC tool.  The
coarse k-means runs on device (retrieval.index.kmeans).
"""

from __future__ import annotations

import numpy as np


def reference_nlist(n: int) -> int:
    return max(1, min(int(16 * np.sqrt(n)), n // 39 if n >= 39 else 1))


def build_ivf_file(vectors: np.ndarray, path: str, *,
                   nlist: int | None = None, seed: int = 0) -> int:
    """Coarse-quantize `vectors` and write a faiss IndexIVFFlat file.
    Returns nlist."""
    import jax

    from .faiss_io import write_ivf_flat
    from .index import kmeans

    vectors = np.ascontiguousarray(vectors, np.float32)
    n, d = vectors.shape
    if nlist is None:
        nlist = reference_nlist(n)
    if nlist <= 1:
        centroids = vectors.mean(axis=0, keepdims=True)
    else:
        centroids = np.asarray(
            kmeans(jax.random.PRNGKey(seed), vectors, nlist))
    # nearest-centroid assignment (blocked to bound memory)
    assign = np.empty(n, np.int64)
    c_sq = np.sum(centroids.astype(np.float64) ** 2, axis=1)
    for lo in range(0, n, 65536):
        blk = vectors[lo : lo + 65536].astype(np.float64)
        d2 = c_sq[None, :] - 2.0 * (blk @ centroids.T.astype(np.float64))
        assign[lo : lo + len(blk)] = np.argmin(d2, axis=1)
    write_ivf_flat(path, vectors, centroids, assign)
    return int(nlist)
