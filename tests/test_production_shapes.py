"""fp32 parity at the six PRODUCTION presets (v1/v2 x 32/40/48 kHz).

Every other parity test uses reduced geometries; this matrix builds the
reference Synthesizer at the real preset configs (reference
main/configs/{v1,v2}/{sr}.json; transposed-conv geometry at
synthesizers.py:133 is the #1 numerics risk at these exact strides —
e.g. v2-48k upsample (12,10,2,2) k=(24,20,4,4)) and pins:

  * full infer on a >= 1 s utterance (noise seams zeroed), waveform
    max-abs-err <= 1e-3 — the BASELINE.md correctness gate
  * the train forward path at the production segment geometry
    (segment_size frames, e.g. 17280 samples / hop 480 for v2-48k):
    posterior encoder -> flow forward -> sliced NSF decode, each vs the
    reference submodule on identical inputs
  * both alternative vocoders (MRF HiFi-GAN, RefineGAN) at the
    production decoder geometry

Everything is slow-marked; the default `-m "not slow"` lane skips it.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.config import preset
from rvc_maker_tpu.interop import synthesizer_params_from_state_dict
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.models import vocoders as voc

from reference_util import ref_module, zero_noise_torch

pytestmark = pytest.mark.slow

PRESETS = [("v1", 32000), ("v1", 40000), ("v1", 48000),
           ("v2", 32000), ("v2", 40000), ("v2", 48000)]

# >= 1 s of audio at every preset: upp = hop in samples (320/400/480),
# so 103 frames is 1.03 s at 48 kHz and more below. Odd/prime-ish length
# stresses the asymmetric transposed-conv padding.
T_FRAMES = 103
B = 1


def _build_reference(cfg, version, vocoder="Default"):
    mod = ref_module("main.library.algorithm.synthesizers")
    torch.manual_seed(20260821)
    net = mod.Synthesizer(
        cfg.spec_channels, cfg.segment_size, cfg.inter_channels,
        cfg.hidden_channels, cfg.filter_channels, cfg.n_heads, cfg.n_layers,
        cfg.kernel_size, cfg.p_dropout, "1",
        list(cfg.resblock_kernel_sizes),
        [list(d) for d in cfg.resblock_dilation_sizes],
        list(cfg.upsample_rates), cfg.upsample_initial_channel,
        list(cfg.upsample_kernel_sizes), cfg.spk_embed_dim,
        cfg.gin_channels, cfg.sr, use_f0=True,
        text_enc_hidden_dim=cfg.text_enc_hidden_dim, vocoder=vocoder)
    net.eval()
    return net


def _mk_inputs(cfg, t=T_FRAMES, b=B, seed=0):
    rs = np.random.RandomState(seed)
    phone = (rs.randn(b, t, cfg.text_enc_hidden_dim) * 0.5).astype(np.float32)
    pitch = rs.randint(1, 256, (b, t)).astype(np.int64)
    nsff0 = (rs.rand(b, t).astype(np.float32) * 300 + 80)
    nsff0[:, :6] = 0.0  # unvoiced head exercises the uv path
    lengths = np.full((b,), t, dtype=np.int64)
    sid = rs.randint(0, cfg.spk_embed_dim, (b,)).astype(np.int64)
    return phone, pitch, nsff0, lengths, sid


@pytest.mark.parametrize("version,sr", PRESETS)
def test_infer_parity_production(version, sr):
    cfg = preset(version, sr).model
    net = _build_reference(cfg, version)
    params = synthesizer_params_from_state_dict(net.state_dict(), cfg)
    phone, pitch, nsff0, lengths, sid = _mk_inputs(cfg)
    b, t = phone.shape[:2]

    with torch.no_grad(), zero_noise_torch():
        o_t, _, _ = net.infer(torch.from_numpy(phone),
                              torch.from_numpy(lengths),
                              torch.from_numpy(pitch),
                              torch.from_numpy(nsff0),
                              torch.from_numpy(sid))

    z_noise = jnp.zeros((b, t, cfg.inter_channels), jnp.float32)
    sine_noise = jnp.zeros((b, t * cfg.upp, 1), jnp.float32)
    o, _, _ = syn.infer(params, cfg, jnp.asarray(phone), jnp.asarray(lengths),
                        jnp.asarray(pitch), jnp.asarray(nsff0),
                        jnp.asarray(sid), z_noise, sine_noise)

    ours = np.asarray(o)[:, :, 0]
    ref = o_t.numpy()[:, 0, :]
    assert ours.shape == ref.shape  # t * upp samples, >= 1 s
    assert ours.shape[1] == t * cfg.upp >= sr
    err = np.max(np.abs(ours - ref))
    assert err <= 1e-3, f"{version}-{sr}: waveform max abs err {err}"


@pytest.mark.parametrize("version,sr", PRESETS)
def test_train_forward_parity_production(version, sr):
    """The pieces of Synthesizer.forward (synthesizers.py:434-443) at the
    production segment geometry: enc_q -> flow fwd -> sliced NSF decode,
    each vs the reference submodule on identical inputs/slices."""
    cfg = preset(version, sr).model
    net = _build_reference(cfg, version)
    params = synthesizer_params_from_state_dict(net.state_dict(), cfg)

    rs = np.random.RandomState(3)
    t = T_FRAMES
    y = (rs.randn(B, t, cfg.spec_channels) * 0.5).astype(np.float32)
    pitchf = (rs.rand(B, t).astype(np.float32) * 300 + 80)
    lengths = np.full((B,), t, dtype=np.int64)
    g = rs.randn(B, 1, cfg.gin_channels).astype(np.float32)

    # posterior encoder (zero noise -> z == m_q)
    with torch.no_grad(), zero_noise_torch():
        z_t, m_t, logs_t, _ = net.enc_q(
            torch.from_numpy(y.transpose(0, 2, 1)),
            torch.from_numpy(lengths),
            g=torch.from_numpy(g.transpose(0, 2, 1)))
    z, m, logs, y_mask = syn.posterior_encoder(
        params["enc_q"], cfg, jnp.asarray(y), jnp.asarray(lengths),
        jnp.asarray(g), jnp.zeros((B, t, cfg.inter_channels), jnp.float32))
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1),
                               z_t.numpy(), rtol=1e-3, atol=1e-4)

    # flow forward (training direction)
    with torch.no_grad():
        zf_t = net.flow(z_t, torch.ones(B, 1, t),
                        g=torch.from_numpy(g.transpose(0, 2, 1)),
                        reverse=False)
    zf = syn.flow(params["flow"], z, jnp.ones((B, t, 1), jnp.float32),
                  jnp.asarray(g), reverse=False)
    np.testing.assert_allclose(np.asarray(zf).transpose(0, 2, 1),
                               zf_t.numpy(), rtol=1e-3, atol=1e-4)

    # sliced decode at the production segment size (e.g. 36 frames ->
    # 17280 samples for v2-48k) on an identical fixed slice
    seg = cfg.segment_size
    start = 11
    z_slice = np.asarray(z)[:, start:start + seg, :]
    pf_slice = pitchf[:, start:start + seg]
    with torch.no_grad(), zero_noise_torch():
        yh_t = net.dec(torch.from_numpy(z_slice.transpose(0, 2, 1)),
                       torch.from_numpy(pf_slice),
                       g=torch.from_numpy(g.transpose(0, 2, 1)))
    sine_noise = jnp.zeros((B, seg * cfg.upp, 1), jnp.float32)
    yh = syn.generator_nsf(params["dec"], cfg, jnp.asarray(z_slice),
                           jnp.asarray(pf_slice), jnp.asarray(g), sine_noise)
    assert yh.shape[1] == seg * cfg.upp  # e.g. 17280 for v2-48k
    np.testing.assert_allclose(np.asarray(yh).transpose(0, 2, 1),
                               yh_t.numpy(), rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("version,sr", PRESETS)
def test_mrf_hifigan_parity_production(version, sr):
    cfg = preset(version, sr).model
    mod = ref_module("main.library.algorithm.mrf_hifigan")
    torch.manual_seed(6)
    net = mod.HiFiGANMRFGenerator(
        in_channel=cfg.inter_channels,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilations=[list(d) for d in cfg.resblock_dilation_sizes],
        gin_channels=cfg.gin_channels, sample_rate=cfg.sr, harmonic_num=8)
    net.eval()
    sd = {f"dec.{k}": v for k, v in net.state_dict().items()}
    params = voc.mrf_params_from_state_dict(sd, cfg)

    rs = np.random.RandomState(5)
    t = T_FRAMES
    x = (rs.randn(B, t, cfg.inter_channels) * 0.5).astype(np.float32)
    f0 = (rs.rand(B, t).astype(np.float32) * 300 + 80)
    f0[:, :4] = 0.0
    g = rs.randn(B, 1, cfg.gin_channels).astype(np.float32)
    with torch.no_grad(), zero_noise_torch():
        ref = net(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(f0),
                  g=torch.from_numpy(g.transpose(0, 2, 1))).numpy()

    noise = jnp.zeros((B, t * cfg.upp, 9), jnp.float32)
    out = voc.mrf_hifigan(params, cfg, jnp.asarray(x), jnp.asarray(f0),
                          jnp.asarray(g), noise, rand_ini=jnp.zeros((B, 9)))
    assert out.shape[1] == ref.shape[2] == t * cfg.upp
    err = np.max(np.abs(np.asarray(out).transpose(0, 2, 1) - ref))
    assert err <= 1e-3, f"{version}-{sr} MRF: max abs err {err}"


@pytest.mark.parametrize("version,sr", PRESETS)
def test_refinegan_parity_production(version, sr):
    cfg = preset(version, sr).model
    mod = ref_module("main.library.algorithm.refinegan")
    torch.manual_seed(7)
    net = mod.RefineGANGenerator(
        sample_rate=cfg.sr, upsample_rates=list(cfg.upsample_rates),
        num_mels=cfg.inter_channels, gin_channels=cfg.gin_channels,
        upsample_initial_channel=cfg.upsample_initial_channel)
    net.eval()
    sd = {f"dec.{k}": v for k, v in net.state_dict().items()}
    params = voc.refinegan_params_from_state_dict(sd, cfg)

    rs = np.random.RandomState(8)
    t = T_FRAMES
    mel = (rs.randn(B, t, cfg.inter_channels) * 0.5).astype(np.float32)
    f0 = (rs.rand(B, t).astype(np.float32) * 300 + 80)
    f0[:, :4] = 0.0
    g = rs.randn(B, 1, cfg.gin_channels).astype(np.float32)
    with torch.no_grad(), zero_noise_torch():
        ref = net(torch.from_numpy(mel.transpose(0, 2, 1)),
                  torch.from_numpy(f0),
                  g=torch.from_numpy(g.transpose(0, 2, 1))).numpy()

    source_noise = jnp.zeros((B, t * cfg.upp, 1), jnp.float32)
    adain_noises = []
    ch = cfg.upsample_initial_channel
    t_cur = t
    for rate in cfg.upsample_rates:
        ch = ch // 2
        t_cur = t_cur * rate
        z = jnp.zeros((B, t_cur, ch), jnp.float32)
        adain_noises.append([(z, z)] * 3)
    out = voc.refinegan(params, cfg, jnp.asarray(mel), jnp.asarray(f0),
                        jnp.asarray(g), source_noise, adain_noises,
                        rand_ini=jnp.zeros((B, 1)))
    assert out.shape[1] == ref.shape[2]
    err = np.max(np.abs(np.asarray(out).transpose(0, 2, 1) - ref))
    assert err <= 1e-3, f"{version}-{sr} RefineGAN: max abs err {err}"
