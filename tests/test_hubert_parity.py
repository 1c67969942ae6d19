"""HuBERT/ContentVec encoder parity vs the reference vendored fairseq."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import hubert as jhubert

from reference_util import ref_module


@pytest.fixture(scope="module")
def ref_and_params():
    mod = ref_module("main.library.architectures.fairseq")
    cfg = mod.HubertConfig(
        _name="hubert", label_rate=50, encoder_layers_1=0, logit_temp_ctr=0.1,
        num_negatives=0, cross_sample_negatives=0, ctr_layers=[],
        encoder_layers=12, final_dim=256,
    )
    torch.manual_seed(0)
    net = mod.HubertModel(cfg)
    net.eval()
    params = jhubert.params_from_fairseq_state_dict(net.state_dict())
    return net, params


def test_conv_frontend_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(0)
    audio = rs.randn(2, 3200).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = net.feature_extractor(torch.from_numpy(audio)).numpy()  # (B,512,T)
    ours = np.asarray(jhubert.conv_frontend(params["frontend"], jnp.asarray(audio)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("output_layer", [12, 9])
def test_extract_features_parity(ref_and_params, output_layer):
    """v2 path (layer 12 raw) and v1 path (layer 9) vs reference
    extract_features (fairseq.py:1459-1461, convert.py:336-345)."""
    net, params = ref_and_params
    rs = np.random.RandomState(1)
    audio = rs.randn(1, 3200).astype(np.float32) * 0.1
    src = torch.from_numpy(audio)
    with torch.no_grad():
        padding_mask = torch.zeros_like(src, dtype=torch.bool)
        logits = net.extract_features(source=src, padding_mask=padding_mask,
                                      output_layer=output_layer)
        ref = logits[0].numpy()
    ours, fl = jhubert.extract_features(params, jnp.asarray(audio),
                                        output_layer=output_layer)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)


def test_final_proj_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(2)
    x = rs.randn(1, 7, 768).astype(np.float32)
    with torch.no_grad():
        ref = net.final_proj(torch.from_numpy(x)).numpy()
    ours = np.asarray(jhubert.final_proj(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_padded_batch_matches_unpadded(ref_and_params):
    """Bucketed static-shape batching: a padded short sequence must produce
    the same features on its valid frames as running it alone."""
    _, params = ref_and_params
    rs = np.random.RandomState(3)
    short = rs.randn(1, 2560).astype(np.float32) * 0.1
    long_pad = np.zeros((1, 3200), np.float32)
    long_pad[:, :2560] = short

    alone, fl_a = jhubert.extract_features(params, jnp.asarray(short))
    padded, fl_p = jhubert.extract_features(params, jnp.asarray(long_pad),
                                            lengths=jnp.asarray([2560]))
    n = int(fl_a[0])
    assert int(fl_p[0]) == n
    np.testing.assert_allclose(np.asarray(padded)[0, :n], np.asarray(alone)[0, :n],
                               rtol=1e-3, atol=2e-4)
