"""ECAPA-TDNN parity vs the reference (random weights, BN folded)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import ecapa_tdnn as jecapa

from reference_util import ref_module


@pytest.fixture(scope="module")
def ref_and_params():
    mod = ref_module("main.library.speaker_diarization.ECAPA_TDNN")
    torch.manual_seed(0)
    net = mod.ECAPA_TDNN(input_size=80)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    net.eval()
    params = jecapa.params_from_state_dict(net.state_dict())
    return net, params


def test_embedding_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(1)
    feats = rs.randn(2, 120, 80).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(feats)).numpy()[:, 0, :]   # (B, 192)
    ours = np.asarray(jecapa.embed(params, jnp.asarray(feats)))
    assert ours.shape == ref.shape == (2, 192)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_embedding_discriminates(ref_and_params):
    """Same input twice -> identical; different inputs -> different."""
    _, params = ref_and_params
    rs = np.random.RandomState(2)
    a = rs.randn(1, 100, 80).astype(np.float32)
    b = rs.randn(1, 100, 80).astype(np.float32)
    ea = np.asarray(jecapa.embed(params, jnp.asarray(a)))
    ea2 = np.asarray(jecapa.embed(params, jnp.asarray(a)))
    eb = np.asarray(jecapa.embed(params, jnp.asarray(b)))
    np.testing.assert_allclose(ea, ea2, atol=1e-6)
    # different inputs do produce different vectors (with random weights
    # the cosine is near 1 — bias-dominated — so only exact-equality is
    # meaningful here; real separation comes with trained weights)
    assert np.max(np.abs(ea - eb)) > 1e-4
