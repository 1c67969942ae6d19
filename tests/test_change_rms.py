"""change_rms parity (reference convert.py:150-152).

The reference mixes the RMS envelope with
F.interpolate(mode="linear", align_corners=False) — half-pixel sampling.
librosa is absent in this image, so the torch replica below uses the
exact torch interpolation op with the same frame-RMS front end; the test
pins our numpy half-pixel interpolation + end-to-end mix against it at
rate ∈ {0, 0.5, 1}.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rvc_maker_tpu.pipelines.convert import (_frame_rms, _interp_half_pixel,
                                             change_rms)


def _torch_change_rms(source, source_sr, target, target_sr, rate):
    """Reference semantics with torch's own interpolate op."""
    def up(v, t):
        return F.interpolate(torch.from_numpy(v[None, None, :]).float(),
                             size=t, mode="linear").squeeze().numpy()

    rms1 = _frame_rms(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = _frame_rms(target, target_sr // 2 * 2, target_sr // 2)
    x1 = up(rms1.astype(np.float32), len(target))
    x2 = np.maximum(up(rms2.astype(np.float32), len(target)), 1e-6)
    return target * (np.power(x1, 1 - rate) * np.power(x2, rate - 1))


def test_interp_half_pixel_matches_torch():
    rs = np.random.RandomState(0)
    for n, t in [(3, 17), (21, 16000), (5, 5), (7, 3), (1, 10)]:
        v = rs.randn(n).astype(np.float32)
        ours = _interp_half_pixel(v, t)
        ref = F.interpolate(torch.from_numpy(v[None, None, :]), size=t,
                            mode="linear").squeeze(0).squeeze(0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rate", [0.0, 0.5, 1.0])
def test_change_rms_parity(rate):
    rs = np.random.RandomState(1)
    sr_s, sr_t = 16000, 48000
    source = (rs.randn(sr_s) * 0.3).astype(np.float32)
    target = (rs.randn(3 * sr_t // 2) * 0.2).astype(np.float32)
    ours = change_rms(source, sr_s, target, sr_t, rate)
    ref = _torch_change_rms(source, sr_s, target, sr_t, rate)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)
