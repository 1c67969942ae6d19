"""Unit parity tests for core ops vs torch (layout conversions included)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rvc_maker_tpu.ops import nn as jnn


def _t2j_conv(w):
    # torch (Cout, Cin, K) -> ours (K, Cin, Cout)
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 1, 0)))


def _t2j_convt(w):
    # torch (Cin, Cout, K) -> ours (K, Cin, Cout)
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 0, 1)))


@pytest.mark.parametrize("stride,dilation,padding,k", [
    (1, 1, 1, 3), (2, 1, 2, 5), (1, 3, 9, 7), (4, 1, 20, 41), (1, 1, 0, 1),
])
def test_conv1d_matches_torch(stride, dilation, padding, k):
    torch.manual_seed(0)
    x = torch.randn(2, 8, 50)          # (B, C, T)
    conv = torch.nn.Conv1d(8, 16, k, stride=stride, dilation=dilation, padding=padding)
    y_ref = conv(x).detach().numpy()
    y = jnn.conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   _t2j_conv(conv.weight), jnp.asarray(conv.bias.detach().numpy()),
                   stride=stride, dilation=dilation, padding=padding)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), y_ref,
                               rtol=1e-5, atol=1e-5)


def test_conv1d_grouped_matches_torch():
    torch.manual_seed(1)
    x = torch.randn(2, 16, 40)
    conv = torch.nn.Conv1d(16, 32, 5, groups=4, padding=2)
    y_ref = conv(x).detach().numpy()
    y = jnn.conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   _t2j_conv(conv.weight), jnp.asarray(conv.bias.detach().numpy()),
                   padding=2, groups=4)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), y_ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("u,k", [(10, 16), (12, 24), (2, 4), (3, 7), (5, 10)])
def test_conv_transpose1d_matches_torch(u, k):
    """Covers the NSF upsampler geometry incl. odd strides
    (reference synthesizers.py:133 asymmetric padding + output_padding)."""
    torch.manual_seed(2)
    padding = ((k - u) // 2) if u % 2 == 0 else (u // 2 + u % 2)
    output_padding = u % 2
    x = torch.randn(2, 8, 25)
    conv = torch.nn.ConvTranspose1d(8, 4, k, stride=u, padding=padding,
                                    output_padding=output_padding)
    y_ref = conv(x).detach().numpy()
    y = jnn.conv_transpose1d(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                             _t2j_convt(conv.weight),
                             jnp.asarray(conv.bias.detach().numpy()),
                             stride=u, padding=padding,
                             output_padding=output_padding)
    assert y.shape[1] == y_ref.shape[2]
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), y_ref,
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 7, 24)
    g = torch.randn(24)
    b = torch.randn(24)
    y_ref = F.layer_norm(x, (24,), g, b, 1e-5).numpy()
    y = jnn.layer_norm(jnp.asarray(x.numpy()), jnp.asarray(g.numpy()),
                       jnp.asarray(b.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)


def test_interp_nearest_x2():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3).astype(np.float32))
    y = jnn.interp_nearest_x2(x)
    t = torch.from_numpy(np.asarray(x)).permute(0, 2, 1)
    y_ref = F.interpolate(t, scale_factor=2.0, mode="nearest").permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), y_ref)


def test_slice_segments():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = jnn.slice_segments(x, jnp.asarray([2, 5]), 4)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 2:6]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 5:9]))


def test_sequence_mask():
    m = jnn.sequence_mask(jnp.asarray([2, 5]), 5)
    np.testing.assert_array_equal(np.asarray(m),
                                  [[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]])
