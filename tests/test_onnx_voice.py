"""ONNX voice-model interchange: .pth -> .onnx export, OnnxVoiceModel
load, waveform parity vs the direct JAX path, and ConvertPipeline
equivalence (the .onnx model must convert identically to the .pth)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import (DataConfig, ModelConfig, RVCConfig,
                                  TrainConfig)
from rvc_maker_tpu.interop import onnx_proto as proto
from rvc_maker_tpu.interop.onnx_voice import (OnnxVoiceModel,
                                              export_voice_model,
                                              load_voice_model)
from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
from rvc_maker_tpu.models import synthesizer as syn

CFG = ModelConfig(
    spec_channels=129, segment_size=16, inter_channels=64,
    hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
    kernel_size=3, p_dropout=0.0, resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)), upsample_rates=(5, 4, 2),
    upsample_initial_channel=64, upsample_kernel_sizes=(10, 8, 4),
    spk_embed_dim=4, gin_channels=32, sr=16000, use_f0=True,
    text_enc_hidden_dim=768)

FRAMES = 24


@pytest.fixture(scope="module")
def onnx_model_path(tmp_path_factory):
    td = tmp_path_factory.mktemp("onnx_voice")
    params = syn.init_params(jax.random.PRNGKey(3), CFG)
    rvc_cfg = RVCConfig(version="v2", train=TrainConfig(), data=DataConfig(),
                        model=CFG)
    pth = str(td / "model.pth")
    export_synthesizer_pth(params, rvc_cfg, pth, epoch=7, step=123,
                           author="t")
    onnx = str(td / "model.onnx")
    export_voice_model(pth, onnx, max_frames=FRAMES, dynamic=False)
    return pth, onnx


@pytest.fixture(scope="module")
def onnx_dynamic_path(onnx_model_path, tmp_path_factory):
    pth, _ = onnx_model_path
    td = tmp_path_factory.mktemp("onnx_voice_dyn")
    onnx = str(td / "model_dyn.onnx")
    export_voice_model(pth, onnx)  # dynamic is the default
    return pth, onnx


def test_metadata(onnx_model_path):
    _, onnx = onnx_model_path
    model = proto.load_model(onnx)
    md = {e.key: e.value for e in model.metadata_props}
    info = json.loads(md["model_info"])
    assert info["sr"] == 16000 and info["f0"] == 1
    assert info["version"] == "v2" and info["vocoder"] == "Default"
    assert json.loads(md["config_list"])[2] == 64  # inter_channels
    assert md["max_frames"] == str(FRAMES)


def test_waveform_parity_vs_jax(onnx_model_path):
    pth, onnx = onnx_model_path
    params, cfg, _ = load_voice_model(pth)
    vm, vm_cfg, info = load_voice_model(onnx)
    assert isinstance(vm, OnnxVoiceModel)
    assert vm_cfg == cfg

    rs = np.random.RandomState(0)
    b, t = 2, 17  # < FRAMES: exercises the padding path
    phone = jnp.asarray(rs.randn(b, t, 768).astype(np.float32) * 0.3)
    lengths = jnp.asarray([t, t - 4], jnp.int32)
    pitch = jnp.asarray(rs.randint(1, 255, (b, t)), jnp.int32)
    pitchf = jnp.asarray(
        rs.uniform(100, 300, (b, t)).astype(np.float32))
    sid = jnp.asarray([0, 2], jnp.int32)
    z_noise = jnp.asarray(rs.randn(b, t, 64).astype(np.float32))
    sine_noise = jnp.asarray(
        rs.randn(b, t * cfg.upp, 1).astype(np.float32))

    ref, _, _ = syn.infer(params, cfg, phone, lengths, pitch, pitchf, sid,
                          z_noise, sine_noise)
    ref = np.asarray(ref[:, :, 0])
    got = np.asarray(vm.synth(phone, lengths, pitch, pitchf, sid,
                              z_noise, sine_noise))
    assert got.shape == ref.shape
    # padded execution differs from unpadded within the decoder's
    # receptive field of the pad boundary (conv biases make the padded
    # region non-zero after the first conv) — compare outside it.  The
    # converter itself always trims chunk padding, so this tail never
    # reaches output audio.
    guard = 4 * cfg.upp
    np.testing.assert_allclose(got[:, :-guard], ref[:, :-guard],
                               rtol=1e-3, atol=2e-4)


def test_waveform_parity_exact_at_capacity(onnx_model_path):
    """At t == max_frames (no padding) the graph must match syn.infer
    sample for sample."""
    pth, onnx = onnx_model_path
    params, cfg, _ = load_voice_model(pth)
    vm, _, _ = load_voice_model(onnx)
    rs = np.random.RandomState(1)
    b, t = 2, FRAMES
    phone = jnp.asarray(rs.randn(b, t, 768).astype(np.float32) * 0.3)
    lengths = jnp.asarray([t, t], jnp.int32)
    pitch = jnp.asarray(rs.randint(1, 255, (b, t)), jnp.int32)
    pitchf = jnp.asarray(rs.uniform(100, 300, (b, t)).astype(np.float32))
    sid = jnp.asarray([1, 3], jnp.int32)
    z_noise = jnp.asarray(rs.randn(b, t, 64).astype(np.float32))
    sine_noise = jnp.asarray(rs.randn(b, t * cfg.upp, 1).astype(np.float32))
    ref, _, _ = syn.infer(params, cfg, phone, lengths, pitch, pitchf, sid,
                          z_noise, sine_noise)
    got = np.asarray(vm.synth(phone, lengths, pitch, pitchf, sid,
                              z_noise, sine_noise))
    np.testing.assert_allclose(got, np.asarray(ref[:, :, 0]),
                               rtol=1e-3, atol=2e-4)


def test_convert_pipeline_onnx_equals_pth(onnx_model_path):
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)

    pth, onnx = onnx_model_path
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1))
    rs = np.random.RandomState(5)
    audio = (rs.randn(2, 3200) * 0.1).astype(np.float32)
    lengths = np.array([3200, 2700], np.int64)
    settings = ConvertSettings(pitch=0, index_rate=0.0, protect=0.5,
                               f0_method="yin", deterministic=True)

    params, cfg, _ = load_voice_model(pth)
    pipe_pth = ConvertPipeline(params, cfg, hubert_params, version="v2")
    wav_pth, _ = pipe_pth.convert_batch(audio, lengths, 0, settings)

    vm, vm_cfg, _ = load_voice_model(onnx)
    pipe_onnx = ConvertPipeline(vm, vm_cfg, hubert_params, version="v2")
    wav_onnx, _ = pipe_onnx.convert_batch(audio, lengths, 0, settings)

    # the ONNX graph pads 20 -> 24 frames internally; the pad-boundary
    # receptive field (see test_waveform_parity_vs_jax) is trimmed —
    # convert_utterance always cuts t_pad regions off chunk tails anyway
    guard = 4 * cfg.upp
    np.testing.assert_allclose(np.asarray(wav_onnx)[:, :-guard],
                               np.asarray(wav_pth)[:, :-guard],
                               rtol=1e-3, atol=2e-3)


def test_frame_overflow_raises(onnx_model_path):
    _, onnx = onnx_model_path
    vm, cfg, _ = load_voice_model(onnx)
    b, t = 1, FRAMES + 8
    z = jnp.zeros((b, t, 64))
    with pytest.raises(ValueError, match="max_frames"):
        vm.synth(jnp.zeros((b, t, 768)), jnp.asarray([t], jnp.int32),
                 jnp.zeros((b, t), jnp.int32), jnp.zeros((b, t)),
                 jnp.asarray([0], jnp.int32), z,
                 jnp.zeros((b, t * cfg.upp, 1)))


# -- dynamic-axes export (reference onnx_export.py:37-42 equivalence) -------

def test_dynamic_metadata(onnx_dynamic_path):
    _, onnx = onnx_dynamic_path
    model = proto.load_model(onnx)
    md = {e.key: e.value for e in model.metadata_props}
    assert md["max_frames"] == "dynamic"
    # the frame axes carry dim_param (symbolic), like torch dynamic_axes
    by_name = {vi.name: vi for vi in model.graph.input}
    assert by_name["phone"].type.tensor_type.shape.dim[1].dim_param == "t"
    pf = by_name["pitchf"].type.tensor_type.shape.dim[1]
    assert pf.dim_param == "t" and not pf.dim_value
    sn = by_name["sine_noise"].type.tensor_type.shape.dim[1]
    assert "t" in sn.dim_param  # upp*t expression
    vm, _, _ = load_voice_model(onnx)
    assert vm.dynamic and vm.max_frames is None and vm.min_frames == 21


@pytest.mark.parametrize("t", [24, 37])
def test_dynamic_exact_parity_any_length(onnx_dynamic_path, t):
    """One dynamic graph serves multiple lengths with exact (unpadded)
    parity vs syn.infer — no capacity, no pad boundary."""
    pth, onnx = onnx_dynamic_path
    params, cfg, _ = load_voice_model(pth)
    vm, _, _ = load_voice_model(onnx)
    rs = np.random.RandomState(t)
    b = 2
    phone = jnp.asarray(rs.randn(b, t, 768).astype(np.float32) * 0.3)
    lengths = jnp.asarray([t, t], jnp.int32)
    pitch = jnp.asarray(rs.randint(1, 255, (b, t)), jnp.int32)
    pitchf = jnp.asarray(rs.uniform(100, 300, (b, t)).astype(np.float32))
    sid = jnp.asarray([1, 3], jnp.int32)
    z_noise = jnp.asarray(rs.randn(b, t, 64).astype(np.float32))
    sine_noise = jnp.asarray(rs.randn(b, t * cfg.upp, 1).astype(np.float32))
    ref, _, _ = syn.infer(params, cfg, phone, lengths, pitch, pitchf, sid,
                          z_noise, sine_noise)
    got = np.asarray(vm.synth(phone, lengths, pitch, pitchf, sid,
                              z_noise, sine_noise))
    assert got.shape == (b, t * cfg.upp)
    np.testing.assert_allclose(got, np.asarray(ref[:, :, 0]),
                               rtol=1e-3, atol=2e-4)


def test_dynamic_short_chunk_pads_to_band_minimum(onnx_dynamic_path):
    """Chunks under 21 frames (the rel-attention band minimum) pad up to
    21 and trim back; parity holds outside the pad receptive field."""
    pth, onnx = onnx_dynamic_path
    params, cfg, _ = load_voice_model(pth)
    vm, _, _ = load_voice_model(onnx)
    rs = np.random.RandomState(9)
    b, t = 1, 17
    phone = jnp.asarray(rs.randn(b, t, 768).astype(np.float32) * 0.3)
    lengths = jnp.asarray([t], jnp.int32)
    pitch = jnp.asarray(rs.randint(1, 255, (b, t)), jnp.int32)
    pitchf = jnp.asarray(rs.uniform(100, 300, (b, t)).astype(np.float32))
    sid = jnp.asarray([0], jnp.int32)
    z_noise = jnp.asarray(rs.randn(b, t, 64).astype(np.float32))
    sine_noise = jnp.asarray(rs.randn(b, t * cfg.upp, 1).astype(np.float32))
    ref, _, _ = syn.infer(params, cfg, phone, lengths, pitch, pitchf, sid,
                          z_noise, sine_noise)
    got = np.asarray(vm.synth(phone, lengths, pitch, pitchf, sid,
                              z_noise, sine_noise))
    assert got.shape == (b, t * cfg.upp)
    guard = 4 * cfg.upp
    np.testing.assert_allclose(got[:, :-guard],
                               np.asarray(ref[:, :-guard, 0]),
                               rtol=1e-3, atol=2e-4)


def test_dynamic_convert_pipeline_equals_pth(onnx_dynamic_path):
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)

    pth, onnx = onnx_dynamic_path
    hubert_params = hubert_mod.init_params(jax.random.PRNGKey(1))
    rs = np.random.RandomState(5)
    audio = (rs.randn(2, 3200) * 0.1).astype(np.float32)
    lengths = np.array([3200, 2700], np.int64)
    settings = ConvertSettings(pitch=0, index_rate=0.0, protect=0.5,
                               f0_method="yin", deterministic=True)

    params, cfg, _ = load_voice_model(pth)
    pipe_pth = ConvertPipeline(params, cfg, hubert_params, version="v2")
    wav_pth, _ = pipe_pth.convert_batch(audio, lengths, 0, settings)

    vm, vm_cfg, _ = load_voice_model(onnx)
    pipe_onnx = ConvertPipeline(vm, vm_cfg, hubert_params, version="v2")
    wav_onnx, _ = pipe_onnx.convert_batch(audio, lengths, 0, settings)

    # 20-frame chunks pad to the 21-frame band minimum; trim the pad
    # receptive field like test_convert_pipeline_onnx_equals_pth
    guard = 4 * cfg.upp
    np.testing.assert_allclose(np.asarray(wav_onnx)[:, :-guard],
                               np.asarray(wav_pth)[:, :-guard],
                               rtol=1e-3, atol=2e-3)


# -- torch-exported graph conventions (reference onnx_exporter output) ------

def test_torch_convention_graph_loads_and_runs(tmp_path):
    """A graph shaped like the reference's torch.onnx export — model_info
    metadata only (no config_list), rnd in (1, inter, T) channel-first,
    no sine_noise input, audio with a channel dim — must load via the
    preset-reconstruction fallback and convert."""
    from rvc_maker_tpu.config import preset
    from rvc_maker_tpu.interop.onnx_export import export_onnx

    cfg = preset("v2", 32000).model
    T, emb, inter, upp = 20, 768, cfg.inter_channels, cfg.upp

    def stub(phone, phone_lengths, ds, rnd, pitch, pitchf):
        v = (phone.mean() + rnd.mean()
             + pitchf.mean() * 1e-3 + ds.sum() * 0.0)
        return jnp.broadcast_to(v, (1, 1, T * upp))

    args = (jnp.zeros((1, T, emb), jnp.float32),
            jnp.asarray([T], jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, inter, T), jnp.float32),
            jnp.zeros((1, T), jnp.int32),
            jnp.zeros((1, T), jnp.float32))
    model = export_onnx(
        stub, args,
        input_names=["phone", "phone_lengths", "ds", "rnd", "pitch",
                     "pitchf"],
        output_names=["audio"],
        metadata={"model_info": json.dumps(
            {"sr": 32000, "f0": 1, "version": "v2",
             "text_enc_hidden_dim": 768, "vocoder": "Default"})})
    path = str(tmp_path / "torch_style.onnx")
    proto.save_model(model, path)

    vm, vm_cfg, info = load_voice_model(path)
    assert isinstance(vm, OnnxVoiceModel)
    assert vm.torch_layout and vm.dynamic
    assert vm_cfg.sr == 32000 and vm_cfg.inter_channels == inter
    assert vm_cfg.upp == upp

    rs = np.random.RandomState(0)
    phone = jnp.asarray(rs.randn(1, T, emb).astype(np.float32))
    z = jnp.asarray(rs.randn(1, T, inter).astype(np.float32))
    pitchf = jnp.asarray(rs.uniform(100, 300, (1, T)).astype(np.float32))
    wav = np.asarray(vm.synth(
        phone, jnp.asarray([T], jnp.int32),
        jnp.asarray(rs.randint(1, 255, (1, T)), jnp.int32), pitchf,
        jnp.asarray([0], jnp.int32), z,
        jnp.asarray(rs.randn(1, T * upp, 1).astype(np.float32))))
    assert wav.shape == (1, T * upp)
    want = (np.asarray(phone).mean() + np.asarray(z).mean()
            + np.asarray(pitchf).mean() * 1e-3)
    np.testing.assert_allclose(wav, np.full((1, T * upp), want),
                               rtol=1e-4, atol=1e-5)
