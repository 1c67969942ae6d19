"""Interchange-format roundtrip: our params -> .pth -> reference model ->
back through our importer, with output parity at every hop."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import DataConfig, ModelConfig, RVCConfig, TrainConfig
from rvc_maker_tpu.interop import synthesizer_params_from_state_dict
from rvc_maker_tpu.interop.torch_export import (export_synthesizer_pth,
                                                synthesizer_state_dict)
from rvc_maker_tpu.models import synthesizer as syn

from reference_util import ref_module, zero_noise_torch

CFG_M = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=64, hidden_channels=64,
    filter_channels=128, n_heads=2, n_layers=2, kernel_size=3,
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
    upsample_rates=(5, 4, 2), upsample_initial_channel=64,
    upsample_kernel_sizes=(10, 8, 4), spk_embed_dim=4, gin_channels=32,
    sr=16000, use_f0=True, text_enc_hidden_dim=96)


def test_export_import_roundtrip(tmp_path):
    params = syn.init_params(jax.random.PRNGKey(3), CFG_M)
    cfg = RVCConfig(version="v2", train=TrainConfig(), data=DataConfig(),
                    model=CFG_M)
    path = str(tmp_path / "model.pth")
    export_synthesizer_pth(params, cfg, path, epoch=7, step=123, author="t")

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    assert cpt["version"] == "v2" and cpt["f0"] == 1
    assert cpt["epoch"] == 7 and cpt["step"] == 123
    assert "model_hash" in cpt
    assert not any(k.startswith("enc_q") for k in cpt["weight"])

    # back through our importer (exercises weight-norm folding of the
    # parametrized keys we emitted)
    sd = {k: v for k, v in cpt["weight"].items()}
    params2 = synthesizer_params_from_state_dict(sd, CFG_M)

    b, t = 1, 11
    rs = np.random.RandomState(0)
    phone = jnp.asarray(rs.randn(b, t, CFG_M.text_enc_hidden_dim).astype(np.float32))
    pitch = jnp.asarray(rs.randint(1, 256, (b, t)))
    nsff0 = jnp.asarray((rs.rand(b, t) * 300 + 80).astype(np.float32))
    lengths = jnp.asarray([t])
    sid = jnp.asarray([1])
    zn = jnp.zeros((b, t, CFG_M.inter_channels))
    sn = jnp.zeros((b, t * CFG_M.upp, 1))

    o1, _, _ = syn.infer(params, CFG_M, phone, lengths, pitch, nsff0, sid, zn, sn)
    o2, _, _ = syn.infer(params2, CFG_M, phone, lengths, pitch, nsff0, sid, zn, sn)
    # fp16 interchange quantization bounds the roundtrip error
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=5e-3)


def test_reference_loads_our_export(tmp_path):
    """The reference Synthesizer must accept our exported .pth exactly the
    way its converter loads it (convert.py:564-569) and produce the same
    waveform as our model."""
    params = syn.init_params(jax.random.PRNGKey(4), CFG_M)
    cfg = RVCConfig(version="v2", model=CFG_M)
    path = str(tmp_path / "model.pth")
    export_synthesizer_pth(params, cfg, path)

    mod = ref_module("main.library.algorithm.synthesizers")
    cpt = torch.load(path, map_location="cpu", weights_only=False)
    net = mod.Synthesizer(*cpt["config"], use_f0=True,
                          text_enc_hidden_dim=CFG_M.text_enc_hidden_dim,
                          vocoder="Default")
    del net.enc_q
    result = net.load_state_dict(cpt["weight"], strict=False)
    # nothing unexpected should be rejected
    assert not result.unexpected_keys, result.unexpected_keys
    net.eval().float()

    b, t = 1, 9
    rs = np.random.RandomState(1)
    phone = rs.randn(b, t, CFG_M.text_enc_hidden_dim).astype(np.float32)
    pitch = rs.randint(1, 256, (b, t))
    nsff0 = (rs.rand(b, t) * 300 + 80).astype(np.float32)

    with torch.no_grad(), zero_noise_torch():
        o_ref, _, _ = net.infer(torch.from_numpy(phone),
                                torch.LongTensor([t]),
                                torch.from_numpy(pitch),
                                torch.from_numpy(nsff0),
                                torch.LongTensor([1]))

    o_ours, _, _ = syn.infer(params, CFG_M, jnp.asarray(phone),
                             jnp.asarray([t]), jnp.asarray(pitch),
                             jnp.asarray(nsff0), jnp.asarray([1]),
                             jnp.zeros((b, t, CFG_M.inter_channels)),
                             jnp.zeros((b, t * CFG_M.upp, 1)))
    np.testing.assert_allclose(np.asarray(o_ours)[0, :, 0],
                               o_ref.numpy()[0, 0], atol=5e-3)


def test_state_dict_covers_reference_keys():
    """Key-name coverage: our export must hit every reference key except
    enc_q (stripped from inference weights)."""
    mod = ref_module("main.library.algorithm.synthesizers")
    torch.manual_seed(0)
    net = mod.Synthesizer(
        CFG_M.spec_channels, CFG_M.segment_size, CFG_M.inter_channels,
        CFG_M.hidden_channels, CFG_M.filter_channels, CFG_M.n_heads,
        CFG_M.n_layers, CFG_M.kernel_size, 0.0, "1",
        list(CFG_M.resblock_kernel_sizes),
        [list(d) for d in CFG_M.resblock_dilation_sizes],
        list(CFG_M.upsample_rates), CFG_M.upsample_initial_channel,
        list(CFG_M.upsample_kernel_sizes), CFG_M.spk_embed_dim,
        CFG_M.gin_channels, CFG_M.sr, use_f0=True,
        text_enc_hidden_dim=CFG_M.text_enc_hidden_dim)
    ref_keys = {k for k in net.state_dict() if not k.startswith("enc_q")}
    params = syn.init_params(jax.random.PRNGKey(5), CFG_M)
    ours = set(synthesizer_state_dict(params, CFG_M).keys())
    missing = ref_keys - ours
    assert not missing, sorted(missing)[:10]
