"""RMVPE parity vs the PyTorch reference (random weights, BN folded).

librosa is absent from this image; the reference RMVPE module imports
librosa.filters.mel at module scope, so a shim backed by our own
filterbank construction is installed first. The U-Net/GRU/decode parity
below is therefore independent of the filterbank; the filterbank itself
is checked structurally in test_stft.py.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import rmvpe as jrmvpe
from rvc_maker_tpu.ops.stft import mel_filterbank, rmvpe_mel

from reference_util import ref_module


@pytest.fixture(scope="module")
def ref_mod():
    # librosa shim (filters.mel backed by our filterbank) installed by
    # reference_util._install_shims via ref_module
    return ref_module("main.library.predictors.RMVPE")


@pytest.fixture(scope="module")
def e2e_and_params(ref_mod):
    torch.manual_seed(42)
    net = ref_mod.E2E(4, 1, (2, 2))
    # randomize BN running stats so folding is actually exercised
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    net.eval()
    params = jrmvpe.params_from_state_dict(net.state_dict())
    return net, params


def test_mel_frontend_parity(ref_mod):
    """Our fused-op mel vs the reference MelSpectrogram (torch.stft)."""
    mel_t = ref_mod.MelSpectrogram(False, 128, 16000, 1024, 160, None, 30, 8000)
    rs = np.random.RandomState(0)
    audio = rs.randn(1, 4000).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = mel_t(torch.from_numpy(audio), center=True).numpy()
    ours = np.asarray(rmvpe_mel(jnp.asarray(audio)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bigru_matches_torch():
    torch.manual_seed(7)
    gru = torch.nn.GRU(12, 8, num_layers=1, batch_first=True, bidirectional=True)
    x = torch.randn(2, 20, 12)
    with torch.no_grad():
        ref = gru(x)[0].numpy()
    p = {
        "w_ih": gru.weight_ih_l0.detach().numpy(),
        "w_hh": gru.weight_hh_l0.detach().numpy(),
        "b_ih": gru.bias_ih_l0.detach().numpy(),
        "b_hh": gru.bias_hh_l0.detach().numpy(),
        "w_ih_r": gru.weight_ih_l0_reverse.detach().numpy(),
        "w_hh_r": gru.weight_hh_l0_reverse.detach().numpy(),
        "b_ih_r": gru.bias_ih_l0_reverse.detach().numpy(),
        "b_hh_r": gru.bias_hh_l0_reverse.detach().numpy(),
    }
    ours = np.asarray(jrmvpe._bigru(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_e2e_salience_parity(e2e_and_params):
    net, params = e2e_and_params
    rs = np.random.RandomState(3)
    mel = rs.randn(1, 128, 32).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(mel)).numpy()
    ours = np.asarray(jrmvpe.e2e_apply(params, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_decode_cents_parity(ref_mod):
    rs = np.random.RandomState(5)
    salience = rs.rand(40, 360).astype(np.float32) ** 4  # sparse-ish peaks
    r = ref_mod.RMVPE.__new__(ref_mod.RMVPE)
    r.cents_mapping = np.pad(20 * np.arange(360) + 1997.3794084376191, (4, 4))
    ref = r.decode(salience.copy(), thred=0.03)
    ours = np.asarray(jrmvpe.decode_cents(jnp.asarray(salience[None]), thred=0.03))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_full_infer_pipeline_parity(e2e_and_params, ref_mod):
    """audio -> mel -> pad x32 -> E2E -> crop -> decode, ours vs reference
    steps composed the same way (reference RMVPE.infer_from_audio)."""
    net, params = e2e_and_params
    rs = np.random.RandomState(9)
    audio = (rs.randn(6400) * 0.2).astype(np.float32)

    mel_t = ref_mod.MelSpectrogram(False, 128, 16000, 1024, 160, None, 30, 8000)
    with torch.no_grad():
        mel = mel_t(torch.from_numpy(audio[None]), center=True)
        n_frames = mel.shape[-1]
        mel_p = torch.nn.functional.pad(
            mel, (0, 32 * ((n_frames - 1) // 32 + 1) - n_frames), mode="reflect")
        hidden = net(mel_p)[:, :n_frames]
    r = ref_mod.RMVPE.__new__(ref_mod.RMVPE)
    r.cents_mapping = np.pad(20 * np.arange(360) + 1997.3794084376191, (4, 4))
    f0_ref = r.decode(hidden.squeeze(0).numpy(), thred=0.03)

    f0 = np.asarray(jrmvpe.infer(params, jnp.asarray(audio[None])))[0]
    assert f0.shape == f0_ref.shape
    np.testing.assert_allclose(f0, f0_ref, rtol=1e-3, atol=0.05)


def test_int8_unet_close_to_fp32(e2e_and_params):
    """W8A8 on the C>=128 U-Net levels (prequantize_rmvpe) stays close
    to the unquantized salience and the f0 decode agrees on voiced
    frames (r5: int8 scope 'rmvpe')."""
    import jax
    import jax.numpy as jnp

    from rvc_maker_tpu.ops.int8_conv import prequantize_rmvpe

    _, params = e2e_and_params
    qp = jax.jit(prequantize_rmvpe)(params)
    # quantized leaves exist exactly at Cin>=128 sites
    assert "w_q" in qp["intermediate"][0]["blocks"][0]["conv1"]
    assert "w_q" not in qp["encoder"][0]["blocks"][0]["conv1"]

    rs = np.random.RandomState(7)
    mel = jnp.asarray(rs.rand(2, 128, 64).astype(np.float32) * 4 - 2)
    ref = np.asarray(jrmvpe.e2e_apply(params, mel))
    got = np.asarray(jrmvpe.e2e_apply(qp, mel, use_int8=True))
    # sigmoid salience in [0,1]: absolute closeness is the right metric
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()
    # without the flag, prequantized params run the fp32 path bit-exactly
    plain = np.asarray(jrmvpe.e2e_apply(qp, mel))
    np.testing.assert_array_equal(plain, ref)
