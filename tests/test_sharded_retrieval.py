"""Sharded retrieval == single-device retrieval (8-device CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from rvc_maker_tpu.parallel import data_mesh
from rvc_maker_tpu.parallel.retrieval import (shard_index_rows,
                                              sharded_retrieval_blend)
from rvc_maker_tpu.retrieval import retrieval_blend


def test_sharded_blend_matches_single_device():
    rs = np.random.RandomState(0)
    feats = rs.randn(2, 7, 32).astype(np.float32)
    vectors = rs.randn(640, 32).astype(np.float32)

    ref = np.asarray(retrieval_blend(jnp.asarray(feats), jnp.asarray(vectors),
                                     0.6, k=8))

    mesh = data_mesh()
    blend = sharded_retrieval_blend(mesh, k=8)
    vec_sharded = shard_index_rows(mesh, vectors)
    out = np.asarray(blend(jnp.asarray(feats), vec_sharded, jnp.float32(0.6)))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_blend_with_row_padding():
    """Row count not divisible by the mesh: sentinel rows must not win."""
    rs = np.random.RandomState(1)
    feats = rs.randn(1, 5, 16).astype(np.float32)
    vectors = rs.randn(101, 16).astype(np.float32)  # 101 % 8 != 0

    ref = np.asarray(retrieval_blend(jnp.asarray(feats), jnp.asarray(vectors),
                                     1.0, k=4))
    mesh = data_mesh()
    blend = sharded_retrieval_blend(mesh, k=4)
    out = np.asarray(blend(jnp.asarray(feats), shard_index_rows(mesh, vectors),
                           jnp.float32(1.0)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
