"""Training + interchange with alternative vocoders (MRF HiFi-GAN,
RefineGAN) and f0-less models — reference train.py --vocoder /
--pitch_guidance flags."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import (DataConfig, ModelConfig, RVCConfig,
                                  TrainConfig, preset)
from rvc_maker_tpu.models import synthesizer as syn
from rvc_maker_tpu.pipelines import train as train_mod


def _tiny_cfg(vocoder="Default", use_f0=True):
    hop = 64
    data = DataConfig(sample_rate=16000, filter_length=256, hop_length=hop,
                      win_length=256, n_mel_channels=32)
    model = ModelConfig(
        spec_channels=129, segment_size=8, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        kernel_size=3, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8, 4, 4),
        spk_embed_dim=4, gin_channels=16, sr=16000, use_f0=use_f0,
        text_enc_hidden_dim=96, vocoder=vocoder)
    return RVCConfig(version="v2", train=TrainConfig(segment_size=8 * hop),
                     data=data, model=model)


def _batch(model, hop=64, b=2, t=24):
    rs = np.random.RandomState(0)
    return train_mod.Batch(
        phone=rs.randn(b, t, model.text_enc_hidden_dim).astype(np.float32),
        phone_lengths=np.full((b,), t, np.int32),
        pitch=rs.randint(1, 256, (b, t)).astype(np.int32),
        pitchf=(rs.rand(b, t) * 200 + 80).astype(np.float32),
        spec=rs.randn(b, t, model.spec_channels).astype(np.float32),
        spec_lengths=np.full((b,), t, np.int32),
        wave=rs.randn(b, t * hop, 1).astype(np.float32) * 0.1,
        sid=rs.randint(0, 4, (b,)).astype(np.int32),
    )


@pytest.mark.parametrize("vocoder", ["MRF HiFi-GAN", "RefineGAN"])
def test_train_step_alt_vocoder(vocoder):
    cfg = _tiny_cfg(vocoder)
    state = train_mod.init_state(jax.random.PRNGKey(0), cfg,
                                 disc_width_div=16)
    step = train_mod.make_train_step(cfg, disc_width_div=16)
    batch = _batch(cfg.model)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    # generator params actually moved
    before = jax.tree_util.tree_leaves(state.params_g)[0]
    after = jax.tree_util.tree_leaves(new_state.params_g)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_step_f0less():
    cfg = _tiny_cfg(use_f0=False)
    state = train_mod.init_state(jax.random.PRNGKey(0), cfg,
                                 disc_width_div=16)
    assert "source" not in state.params_g["dec"]
    step = train_mod.make_train_step(cfg, disc_width_div=16)
    new_state, metrics = step(state, _batch(cfg.model),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_g"]))


@pytest.mark.parametrize("vocoder", ["MRF HiFi-GAN", "RefineGAN"])
def test_alt_vocoder_export_import_roundtrip(tmp_path, vocoder):
    from rvc_maker_tpu.interop import load_synthesizer_pth
    from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth

    cfg = _tiny_cfg(vocoder)
    params = syn.init_params(jax.random.PRNGKey(2), cfg.model)
    p = str(tmp_path / "alt.pth")
    export_synthesizer_pth(params, cfg, p)
    params2, mcfg2, meta = load_synthesizer_pth(p)
    assert meta["vocoder"] == vocoder and mcfg2.vocoder == vocoder

    # decode parity through the roundtrip (fp16 interchange tolerance)
    rs = np.random.RandomState(3)
    b, t = 1, 12
    m = cfg.model
    x = jnp.asarray(rs.randn(b, t, m.inter_channels), jnp.float32) * 0.3
    f0 = jnp.full((b, t), 220.0)
    g = jnp.asarray(rs.randn(b, 1, m.gin_channels), jnp.float32) * 0.2
    from rvc_maker_tpu.models import vocoders as voc

    if vocoder == "RefineGAN":
        noise = jnp.zeros((b, t * m.upp, 1))
        adain = []
        ch, t_cur = m.upsample_initial_channel, t
        for rate in m.upsample_rates:
            ch //= 2
            t_cur *= rate
            adain.append([(jnp.zeros((b, t_cur, ch)),
                           jnp.zeros((b, t_cur, ch))) for _ in range(3)])
        a = voc.refinegan(params["dec"], m, x, f0, g, noise, adain)
        b_ = voc.refinegan(params2["dec"], mcfg2, x, f0, g, noise, adain)
    else:
        noise = jnp.zeros((b, t * m.upp, 9))
        a = voc.mrf_hifigan(params["dec"], m, x, f0, g, noise)
        b_ = voc.mrf_hifigan(params2["dec"], mcfg2, x, f0, g, noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=5e-3, rtol=5e-3)


def test_preset_vocoder_and_pitch_guidance():
    cfg = preset("v2", 48000, vocoder="RefineGAN", pitch_guidance=False)
    assert cfg.model.vocoder == "RefineGAN" and cfg.model.use_f0 is False
