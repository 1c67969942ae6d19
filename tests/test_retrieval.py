"""Retrieval (FAISS replacement) semantics tests."""

import numpy as np

import jax
import jax.numpy as jnp

from rvc_maker_tpu.retrieval import (FeatureIndex, build_index, kmeans,
                                     load_index, retrieval_blend, save_index)
from rvc_maker_tpu.retrieval.index import topk_l2


def test_topk_matches_bruteforce():
    rs = np.random.RandomState(0)
    q = rs.randn(2, 5, 16).astype(np.float32)
    x = rs.randn(100, 16).astype(np.float32)
    d2, idx = topk_l2(jnp.asarray(q), jnp.asarray(x), k=8)
    # brute-force reference
    full = ((q[:, :, None, :] - x[None, None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=-1)[..., :8]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=-1)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-3)
    # indices may differ on ties; distances must match
    got_d2 = np.take_along_axis(full, np.asarray(idx), axis=-1)
    np.testing.assert_allclose(got_d2, ref_d2, rtol=1e-3, atol=1e-3)


def test_blend_reference_semantics():
    """weight = (1/d^2) normalized; out = rate*blend + (1-rate)*feats
    (reference convert.py:349-359)."""
    rs = np.random.RandomState(1)
    feats = rs.randn(1, 3, 8).astype(np.float32)
    vecs = rs.randn(50, 8).astype(np.float32)
    rate = 0.7
    out = np.asarray(retrieval_blend(jnp.asarray(feats), jnp.asarray(vecs),
                                     rate, k=4))
    # numpy reference
    full = ((feats[:, :, None, :] - vecs[None, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(full, axis=-1)[..., :4]
    d2 = np.take_along_axis(full, idx, axis=-1)
    w = 1.0 / d2 ** 2
    w /= w.sum(-1, keepdims=True)
    blended = (vecs[idx] * w[..., None]).sum(-2)
    expect = blended * rate + feats * (1 - rate)
    np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-4)


def test_blend_rate_zero_identity():
    rs = np.random.RandomState(2)
    feats = rs.randn(1, 4, 8).astype(np.float32)
    vecs = rs.randn(20, 8).astype(np.float32)
    out = np.asarray(retrieval_blend(jnp.asarray(feats), jnp.asarray(vecs), 0.0))
    np.testing.assert_allclose(out, feats, rtol=1e-5, atol=1e-6)


def test_kmeans_reduces_quantization_error():
    rs = np.random.RandomState(3)
    centers = rs.randn(8, 4) * 5
    x = (centers[rs.randint(0, 8, 2000)] + rs.randn(2000, 4) * 0.1).astype(np.float32)
    cents = np.asarray(kmeans(jax.random.PRNGKey(0), x, 8, n_iters=30,
                              batch_size=512))
    d2, _ = topk_l2(jnp.asarray(x), jnp.asarray(cents), k=1)
    # random-init minibatch k-means can merge a pair of clusters (the
    # reference's init='random' MiniBatchKMeans does the same); require a
    # large improvement over no clustering (~50 mean d2 for random cents)
    assert float(jnp.mean(d2)) < 8.0


def test_index_save_load_roundtrip(tmp_path):
    rs = np.random.RandomState(4)
    feats = rs.randn(300, 16).astype(np.float32)
    index = build_index(feats, version="v2", max_rows=1e6)
    p = str(tmp_path / "test.index.npz")
    save_index(index, p)
    loaded = load_index(p)
    np.testing.assert_array_equal(loaded.vectors, index.vectors)
    assert loaded.version == "v2"
    # total_fea.npy (reference artifact) path
    p2 = str(tmp_path / "total_fea.npy")
    np.save(p2, feats)
    loaded2 = load_index(p2)
    assert loaded2.vectors.shape == feats.shape


def test_build_index_compresses_large_sets():
    rs = np.random.RandomState(5)
    feats = rs.randn(3000, 8).astype(np.float32)
    index = build_index(feats, version="v2", max_rows=1000, n_clusters=64)
    assert index.vectors.shape == (64, 8)
