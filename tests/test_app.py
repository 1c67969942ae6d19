"""Web app API tests — in-process server, tiny exported model."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from scipy.io import wavfile

import jax

from rvc_maker_tpu.app import server as app_server
from rvc_maker_tpu.config import ModelConfig, RVCConfig
from rvc_maker_tpu.interop.torch_export import export_synthesizer_pth
from rvc_maker_tpu.models import synthesizer as syn

# consistent tiny model (hop == upp == sr/100)
CFG_M = ModelConfig(
    spec_channels=129, segment_size=8, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8, 4, 4), spk_embed_dim=4, gin_channels=16,
    sr=6400, use_f0=True, text_enc_hidden_dim=768)


@pytest.fixture(scope="module")
def server_port():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), app_server.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_index_page(server_port):
    html = urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/").read().decode()
    # en-US render of the i18n'd page (keys convert_audio / fushion)
    assert "Convert Audio" in html and "Model Fusion" in html
    assert "{{" not in html  # all template keys resolved


def test_model_info_endpoint(tmp_path, server_port):
    params = syn.init_params(jax.random.PRNGKey(0), CFG_M)
    p = str(tmp_path / "m.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)
    info = _post(server_port, "/api/model_info", {"model": p})
    assert info["sr"] == 6400 and info["version"] == "v2"


def test_convert_endpoint(tmp_path, server_port):
    params = syn.init_params(jax.random.PRNGKey(1), CFG_M)
    p = str(tmp_path / "m.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sr, tone)
    resp = _post(server_port, "/api/convert", {
        "audio_b64": base64.b64encode(buf.getvalue()).decode(),
        "model": p, "f0_method": "yin", "index_rate": 0.0})
    assert resp["sr"] == 6400
    out_sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp["audio_b64"])))
    assert out_sr == 6400
    assert abs(len(out) / out_sr - 1.0) < 0.3
    assert np.all(np.isfinite(out))


def test_error_surface(server_port):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/api/model_info",
        data=json.dumps({"model": "/nope.pth"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())


def _tone_wav_b64(sr=16000, freq=220.0, secs=1.0):
    t = np.arange(int(sr * secs)) / sr
    tone = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sr, tone)
    return base64.b64encode(buf.getvalue()).decode()


def test_effects_endpoint(server_port):
    resp = _post(server_port, "/api/effects", {
        "audio_b64": _tone_wav_b64(), "reverb": True,
        "reverb_room_size": 0.7, "gain": True, "gain_db": -3.0})
    sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp["audio_b64"])))
    assert sr == resp["sr"] and len(out) > 0
    assert np.all(np.isfinite(out))


def test_training_job_endpoints(tmp_path, server_port):
    import time

    from rvc_maker_tpu.utils.audio import save_wav

    data = tmp_path / "data"
    data.mkdir()
    sr = 32000
    t = np.arange(4 * sr) / sr
    save_wav(str(data / "a.wav"),
             (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    exp = str(tmp_path / "exp")

    r = _post(server_port, "/api/job_start", {
        "kind": "preprocess", "exp_dir": exp, "dataset": str(data),
        "sr": sr})
    job_id = r["job_id"]
    for _ in range(120):
        st = _post(server_port, "/api/job_status", {"job_id": job_id})
        if st["done"]:
            break
        time.sleep(1)
    assert st["done"] and not st["error"], st
    assert "segments" in st["log"]
    import os

    assert os.path.isdir(os.path.join(exp, "sliced_audios_16k"))


def test_job_unknown_kind(server_port):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/api/job_start",
        data=json.dumps({"kind": "nope"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400   # malformed request -> client error (r5)


def test_f0_extract_endpoint(server_port):
    resp = _post(server_port, "/api/f0_extract", {
        "audio_b64": _tone_wav_b64(freq=220.0), "method": "yin"})
    f0 = np.asarray(resp["f0"])
    assert len(f0) > 50 and resp["hop_ms"] == 10.0
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 220.0) < 10.0


def test_export_onnx_and_onnx_convert_endpoint(tmp_path, server_port):
    params = syn.init_params(jax.random.PRNGKey(0), CFG_M)
    from rvc_maker_tpu.config import DataConfig, TrainConfig

    rvc = RVCConfig(version="v2", train=TrainConfig(), data=DataConfig(),
                    model=CFG_M)
    pth = str(tmp_path / "m.pth")
    export_synthesizer_pth(params, rvc, pth, epoch=1, step=1, author="t")

    onnx = str(tmp_path / "m.onnx")
    resp = _post(server_port, "/api/export_onnx",
                 {"model": pth, "output": onnx, "max_frames": 512})
    assert resp["output"] == onnx

    # convert through the exported .onnx model
    resp = _post(server_port, "/api/convert", {
        "audio_b64": _tone_wav_b64(secs=0.5), "model": onnx,
        "f0_method": "yin", "index_rate": 0.0})
    sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp["audio_b64"])))
    assert sr == CFG_M.sr and len(out) > 0


def test_separate_endpoint_mdx(tmp_path, server_port):
    import jax.numpy as jnp

    from rvc_maker_tpu.interop import onnx_proto as proto
    from rvc_maker_tpu.interop.onnx_export import export_onnx

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(4, 4, 3, 3).astype(np.float32) * 0.2)

    def net(spek):
        return jax.lax.conv_general_dilated(
            spek, jnp.transpose(w, (1, 0, 2, 3)), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    x = jnp.zeros((1, 4, 24, 32), jnp.float32)
    model = export_onnx(net, (x,), input_names=["input"],
                        output_names=["output"])
    path = str(tmp_path / "mdx.onnx")
    proto.save_model(model, path)

    resp = _post(server_port, "/api/separate", {
        "audio_b64": _tone_wav_b64(secs=0.3), "model": path,
        "mdx_n_fft": 64, "mdx_hop": 16})
    for key in ("vocals_b64", "instrumental_b64"):
        sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp[key])))
        assert len(out) > 0 and np.all(np.isfinite(out))


def test_settings_endpoint(server_port):
    r = _post(server_port, "/api/settings", {})
    assert "en-US" in r["languages"] and "vi-VN" in r["languages"]
    r = _post(server_port, "/api/settings", {"language": "ja-JP",
                                             "precision": "fp32"})
    assert r["language"] == "ja-JP" and r["precision"] == "fp32"
    from rvc_maker_tpu.utils.i18n import set_language, tr
    assert tr("srt_invalid") == "SRTファイルが空か不正です"
    _post(server_port, "/api/settings", {"language": "en-US",
                                         "precision": "bf16"})
    set_language("en-US")


def test_precision_setting_reaches_pipeline(tmp_path, server_port):
    """The settings precision choice must select the pipeline's compute
    dtype (r4 regression: served conversions ran fp32 regardless)."""
    import jax.numpy as jnp

    from rvc_maker_tpu.app import server as srv

    params = syn.init_params(jax.random.PRNGKey(7), CFG_M)
    p = str(tmp_path / "prec.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)

    _post(server_port, "/api/settings", {"precision": "bf16"})
    pipe = srv._get_pipeline(p, "", "", "")
    assert pipe.compute_dtype == jnp.bfloat16
    _post(server_port, "/api/settings", {"precision": "fp32"})
    pipe32 = srv._get_pipeline(p, "", "", "")
    assert pipe32.compute_dtype is None
    assert pipe32 is not pipe   # precision is part of the cache key
    _post(server_port, "/api/settings", {"precision": "bf16"})


def test_tts_endpoint(server_port):
    from tests.test_tts import FakeReadAloudServer, _pcm_wav_bytes

    srv = FakeReadAloudServer(_pcm_wav_bytes(freq=330.0, seconds=0.4))
    try:
        resp = _post(server_port, "/api/tts", {
            "text": "hello", "voice": "en-US-AriaNeural",
            "endpoint": f"ws://127.0.0.1:{srv.port}/tts"})
        assert resp["sr"] == 24000
        sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp["audio_b64"])))
        assert sr == 24000 and len(out) == int(0.4 * 24000)
    finally:
        srv.close()


def test_tts_endpoint_with_conversion(tmp_path, server_port):
    from tests.test_tts import FakeReadAloudServer, _pcm_wav_bytes

    params = syn.init_params(jax.random.PRNGKey(2), CFG_M)
    p = str(tmp_path / "m.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)
    srv = FakeReadAloudServer(_pcm_wav_bytes(freq=220.0, seconds=0.5))
    try:
        resp = _post(server_port, "/api/tts", {
            "text": "hello", "voice": "x",
            "endpoint": f"ws://127.0.0.1:{srv.port}/tts",
            "model": p, "f0_method": "yin", "index_rate": 0.0})
        sr, out = wavfile.read(io.BytesIO(
            base64.b64decode(resp["converted_b64"])))
        assert sr == CFG_M.sr and np.all(np.isfinite(out))
        assert abs(len(out) / sr - 0.5) < 0.3
    finally:
        srv.close()


def test_create_dataset_job(tmp_path, server_port):
    import os
    import time

    from rvc_maker_tpu.utils.audio import save_wav

    sr = 32000
    t = np.arange(2 * sr) / sr
    src = str(tmp_path / "src.wav")
    save_wav(src, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    out_dir = str(tmp_path / "dataset")
    r = _post(server_port, "/api/job_start", {
        "kind": "create_dataset", "inputs": [src], "output": out_dir,
        "sr": 32000})
    for _ in range(120):
        st = _post(server_port, "/api/job_status", {"job_id": r["job_id"]})
        if st["done"]:
            break
        time.sleep(1)
    assert st["done"] and not st["error"], st
    assert os.path.isdir(out_dir) and len(os.listdir(out_dir)) == 1


def test_convert_whisper_endpoint(tmp_path, server_port):
    import torch

    from reference_util import ref_module

    mod = ref_module("main.library.speaker_diarization.ECAPA_TDNN")
    torch.manual_seed(0)
    net = mod.ECAPA_TDNN(input_size=80).eval()
    ckpt = str(tmp_path / "ecapa.ckpt")
    torch.save(net.state_dict(), ckpt)

    params = syn.init_params(jax.random.PRNGKey(3), CFG_M)
    p = str(tmp_path / "m.pth")
    export_synthesizer_pth(params, RVCConfig(version="v2", model=CFG_M), p)

    # two bursts of tone separated by silence -> energy VAD segments
    sr = 16000
    t = np.arange(int(1.2 * sr)) / sr
    burst = 0.4 * np.sin(2 * np.pi * 220 * t)
    audio = np.concatenate([burst, np.zeros(sr // 2), burst]).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (audio * 32767).astype(np.int16))

    resp = _post(server_port, "/api/convert_whisper", {
        "audio_b64": base64.b64encode(buf.getvalue()).decode(),
        "model_a": p, "model_b": p, "ecapa": ckpt,
        "f0_method": "yin", "index_rate": 0.0})
    out_sr, out = wavfile.read(io.BytesIO(base64.b64decode(resp["audio_b64"])))
    assert out_sr == CFG_M.sr
    assert np.all(np.isfinite(out)) and np.abs(out).max() > 0


def test_download_endpoint_error_surface(server_port):
    import urllib.error

    try:
        _post(server_port, "/api/download",
              {"url": "https://mega.nz/folder/notafile", "output": "/tmp"})
        assert False, "expected an error"
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        assert "error" in body


def test_audio_edit_endpoint(tmp_path, server_port):
    from rvc_maker_tpu.utils.audio import save_wav

    t = np.arange(8000) / 16000.0
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    src = str(tmp_path / "edit_in.wav")
    save_wav(src, tone, 16000, subtype="float32")
    out = str(tmp_path / "edit_out.wav")

    r = _post(server_port, "/api/audio_edit", {
        "input": src, "output": out, "toy_stack": True,
        "steps": 6, "t_start": 50, "sample_rate": 16000})
    assert r["output"] == out
    sr, data = wavfile.read(out)
    assert sr == 16000 and np.all(np.isfinite(data))

    # without weights the checkpoint stack is download-gated
    try:
        _post(server_port, "/api/audio_edit",
              {"input": src, "output": out})
        assert False, "expected gated error"
    except Exception as e:
        assert "500" in str(e) or "gated" in str(e)


def test_index_page_has_edit_tab(server_port):
    html = urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/").read().decode()
    # audio_editing tab key + its API wiring
    assert "Editing the Soundtrack" in html and "audioEdit" in html


def test_malformed_convert_requests_are_client_errors(server_port):
    """Bad base64 / missing fields return 400 (not 500) and never kill
    the server (r5 served-path hardening)."""
    import urllib.error

    for req in ({"audio_b64": "!!!notbase64!!!", "model": "/nope.pth"},
                {"model": "/nope.pth"},                    # missing audio
                {"audio_b64": base64.b64encode(b"junkjunk").decode(),
                 "model": "/nope.pth"}):                   # not a wav
        r = urllib.request.Request(
            f"http://127.0.0.1:{server_port}/api/convert",
            data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(r)
            assert False, "should have errored"
        except urllib.error.HTTPError as e:
            assert e.code == 400, (req, e.code)
            assert "error" in json.loads(e.read())
    # server still alive
    assert "Convert Audio" in urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/").read().decode()


def test_convert_refused_while_training_job_active(tmp_path, server_port,
                                                   monkeypatch):
    """Chip-contention policy: conversion requests get 503+retry while a
    training job is running (RVC_TPU_SERVE_DURING_TRAIN=1 opts out)."""
    import urllib.error

    monkeypatch.delenv("RVC_TPU_SERVE_DURING_TRAIN", raising=False)
    with app_server._JOBS_LOCK:
        app_server._JOBS["train-999"] = {"log": [], "done": False,
                                         "error": None}
    try:
        r = urllib.request.Request(
            f"http://127.0.0.1:{server_port}/api/convert",
            data=json.dumps({"audio_b64": _tone_wav_b64(),
                             "model": "/nope.pth"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(r)
            assert False, "should have been refused"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            body = json.loads(e.read())
            assert body.get("retry") is True
        # opting in bypasses the policy (fails later on the bogus model,
        # but NOT with 503)
        monkeypatch.setenv("RVC_TPU_SERVE_DURING_TRAIN", "1")
        try:
            urllib.request.urlopen(r)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code != 503
    finally:
        with app_server._JOBS_LOCK:
            app_server._JOBS["train-999"]["done"] = True
            del app_server._JOBS["train-999"]


def test_raised_in_library_classifier():
    """Exception types the 400 classifier matches are still server
    faults (500) when raised from library code: the classifier keys on
    whether the traceback leaves app/ (review r5)."""
    from rvc_maker_tpu.app.server import _raised_in_library
    from rvc_maker_tpu.ops.int8_conv import Int8Ctx

    try:
        json.loads("{")                       # stdlib-only traceback
    except json.JSONDecodeError as e:
        assert not _raised_in_library(e)

    try:
        Int8Ctx("bogus-mode")                 # raises inside ops/
    except ValueError as e:
        assert _raised_in_library(e)
