"""Tensor-parallel HuBERT == single-device output (8-CPU mesh: 2 data x
4 model; 12 heads / 4 = 3 heads per model shard)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rvc_maker_tpu.models import hubert as hubert_mod
from rvc_maker_tpu.parallel.tensor import (hubert_tp_spec, shard_hubert_tp,
                                           tp_extract_features)


def _mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def test_spec_assignment():
    params = hubert_mod.init_params(jax.random.PRNGKey(0), n_layers=2)
    from jax.sharding import PartitionSpec as P

    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: hubert_tp_spec(p, l), params)
    assert specs["layers"]["attn"]["q"]["w"] == P(None, None, "model")
    assert specs["layers"]["attn"]["o"]["w"] == P(None, "model", None)
    assert specs["layers"]["fc1"]["b"] == P(None, "model")
    assert specs["layers"]["fc2"]["w"] == P(None, "model", None)
    assert specs["layers"]["ln1"]["gamma"] == P()
    assert specs["frontend"]["convs"][0]["w"] == P()


def test_tp_matches_single_device():
    params = hubert_mod.init_params(jax.random.PRNGKey(1))
    rs = np.random.RandomState(0)
    audio = (rs.randn(2, 8000) * 0.1).astype(np.float32)
    lengths = np.array([8000, 6400])

    ref, _ = hubert_mod.extract_features(params, jnp.asarray(audio),
                                         jnp.asarray(lengths),
                                         output_layer=12)
    ref = np.asarray(ref)

    mesh = _mesh()
    with mesh:
        tp_params = shard_hubert_tp(params, mesh)
        fn = tp_extract_features(tp_params, mesh, version="v2")
        out = np.asarray(fn(jnp.asarray(audio), jnp.asarray(lengths)))

    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_tp_v1_final_proj():
    params = hubert_mod.init_params(jax.random.PRNGKey(2))
    rs = np.random.RandomState(1)
    audio = (rs.randn(2, 6400) * 0.1).astype(np.float32)
    lengths = np.array([6400, 6400])

    ref, _ = hubert_mod.extract_features(params, jnp.asarray(audio),
                                         jnp.asarray(lengths),
                                         output_layer=9)
    ref = np.asarray(hubert_mod.final_proj(params, ref))

    mesh = _mesh()
    with mesh:
        tp_params = shard_hubert_tp(params, mesh)
        fn = tp_extract_features(tp_params, mesh, version="v1")
        out = np.asarray(fn(jnp.asarray(audio), jnp.asarray(lengths)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
