#!/usr/bin/env python
"""TPU compile + throughput smoke for the auxiliary model stacks.

The flagship conversion/training paths have deep TPU evidence; this
bench gives each AUX stack a row: whisper transcription encode+decode,
HTDemucs separation, MDX demix (ONNX executor), and the AudioLDM2 edit
UNet — compiled and timed on the real chip with random weights
(reference-constructed state dicts through our importers, so the traced
graphs are exactly the production ones).

Prints ONE JSON line with per-stack seconds and realtime factors.
Reference match: separator_music.py:115-146, whisper.py:299-520,
audio_editing flow.

Timing fetches results to host (np.asarray) — block_until_ready lies
through the axon tunnel (docs/perf_notes.md).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, fetch, iters=3):
    fetch(fn())          # compile + warm
    best = None
    for _ in range(iters):
        t0 = time.time()
        fetch(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _whisper_random_sd(dims, rs):
    """Random whisper-layout torch-style state dict (numpy values feed
    params_from_state_dict directly) — the reference whisper module
    needs numba at import, absent here."""
    sd = {}

    def lin(prefix, i, o, bias=True):
        sd[f"{prefix}.weight"] = rs.randn(o, i).astype(np.float32) * 0.02
        if bias:
            sd[f"{prefix}.bias"] = np.zeros(o, np.float32)

    def ln(prefix, d):
        sd[f"{prefix}.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(d, np.float32)

    def blocks(prefix, n, d, cross):
        for i in range(n):
            bp = f"{prefix}.blocks.{i}"
            lin(f"{bp}.attn.query", d, d)
            lin(f"{bp}.attn.key", d, d, bias=False)
            lin(f"{bp}.attn.value", d, d)
            lin(f"{bp}.attn.out", d, d)
            ln(f"{bp}.attn_ln", d)
            if cross:
                lin(f"{bp}.cross_attn.query", d, d)
                lin(f"{bp}.cross_attn.key", d, d, bias=False)
                lin(f"{bp}.cross_attn.value", d, d)
                lin(f"{bp}.cross_attn.out", d, d)
                ln(f"{bp}.cross_attn_ln", d)
            lin(f"{bp}.mlp.0", d, 4 * d)
            lin(f"{bp}.mlp.2", 4 * d, d)
            ln(f"{bp}.mlp_ln", d)

    d = dims.n_audio_state
    sd["encoder.conv1.weight"] = rs.randn(d, dims.n_mels, 3).astype(
        np.float32) * 0.02
    sd["encoder.conv1.bias"] = np.zeros(d, np.float32)
    sd["encoder.conv2.weight"] = rs.randn(d, d, 3).astype(np.float32) * 0.02
    sd["encoder.conv2.bias"] = np.zeros(d, np.float32)
    blocks("encoder", dims.n_audio_layer, d, cross=False)
    ln("encoder.ln_post", d)
    sd["decoder.token_embedding.weight"] = rs.randn(
        dims.n_vocab, dims.n_text_state).astype(np.float32) * 0.02
    sd["decoder.positional_embedding"] = rs.randn(
        dims.n_text_ctx, dims.n_text_state).astype(np.float32) * 0.02
    blocks("decoder", dims.n_text_layer, dims.n_text_state, cross=True)
    ln("decoder.ln", dims.n_text_state)
    return sd


def bench_whisper(results):
    import jax.numpy as jnp

    from rvc_maker_tpu.models import whisper as jwhisper

    log("whisper: building base-scale model (numpy random init) ...")
    dims = jwhisper.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=512, n_audio_head=8,
        n_audio_layer=6, n_vocab=51865, n_text_ctx=448, n_text_state=512,
        n_text_head=8, n_text_layer=6)          # whisper-base geometry
    rs = np.random.RandomState(0)
    params = jwhisper.params_from_state_dict(_whisper_random_sd(dims, rs),
                                             dims)
    import jax

    params = jax.device_put(params)

    audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(16000 * 30) / 16000)
             ).astype(np.float32)

    enc = jax.jit(lambda p, a: jwhisper.encode_audio(
        p, dims, jwhisper.log_mel(a, n_mels=dims.n_mels)))
    t_enc = timed(lambda: enc(params["encoder"], jnp.asarray(audio[None])),
                  lambda o: np.asarray(o).sum())
    log(f"whisper encode(30s): {t_enc*1e3:.0f} ms")
    results["whisper_encode_30s_s"] = round(t_enc, 4)
    results["whisper_encode_realtime_x"] = round(30.0 / t_enc, 1)

    # decode: 10 greedy steps through the KV cache (per-token latency)
    feats = enc(params["encoder"], jnp.asarray(audio[None]))
    cache = jwhisper.init_cache(params["decoder"], dims, feats)
    tok = jnp.full((1,), 50258, jnp.int32)
    logits, cache = jwhisper.decode_step(params["decoder"], dims, tok,
                                         cache)
    float(np.asarray(logits).max())   # compile fence
    t0 = time.time()
    for _ in range(10):
        logits, cache = jwhisper.decode_step(params["decoder"], dims, tok,
                                             cache)
    float(np.asarray(logits).max())
    per_tok = (time.time() - t0) / 10
    log(f"whisper decode: {per_tok*1e3:.1f} ms/token")
    results["whisper_decode_ms_per_token"] = round(per_tok * 1e3, 1)


def bench_demucs(results):
    import torch

    import jax
    import jax.numpy as jnp

    from reference_util import REFERENCE_ROOT, ref_module
    from rvc_maker_tpu.interop import demucs_load
    from rvc_maker_tpu.models import demucs as jdemucs

    log("demucs: building HTDemucs (torch CPU init, production dims) ...")
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        mod = ref_module("main.library.uvr5_separator.demucs.htdemucs")
    finally:
        os.chdir(cwd)
    torch.manual_seed(0)
    net = mod.HTDemucs(sources=["drums", "bass", "other", "vocals"],
                       audio_channels=2, channels=48, nfft=4096, depth=4,
                       t_layers=5, segment=7.8)
    args, kwargs = net._init_args_kwargs
    params, cfg = demucs_load.load_demucs_th(
        {"klass": type(net), "args": args, "kwargs": kwargs,
         "state": net.state_dict()})
    del net
    # params stay a HOST tree closed over the jit: device_put would turn
    # the python metadata leaves (freq/empty/stride) into device arrays
    # and break the static branches (pipelines/separate.py:68 does the
    # same)

    seg_len = int(cfg.segment * cfg.samplerate)
    rs = np.random.RandomState(0)
    mix = (rs.randn(1, 2, seg_len) * 0.1).astype(np.float32)
    # params close over the jit (like pipelines/separate.py:68): the
    # tree carries python metadata (freq/empty flags) that must stay
    # static, not become tracers
    fn = jax.jit(lambda m: jdemucs.apply_model_single(params, cfg, m))
    t = timed(lambda: fn(jnp.asarray(mix)),
              lambda o: np.asarray(o).sum())
    secs = seg_len / cfg.samplerate
    log(f"htdemucs segment ({secs:.1f}s stereo): {t*1e3:.0f} ms")
    results["demucs_segment_s"] = round(t, 4)
    results["demucs_realtime_x"] = round(secs / t, 1)


def bench_mdx(results):
    import jax
    import jax.numpy as jnp

    from rvc_maker_tpu.interop import onnx_proto as proto
    from rvc_maker_tpu.interop.onnx_export import export_onnx
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph
    from rvc_maker_tpu.pipelines import mdx

    log("mdx: conv net on the ONNX executor ...")
    rs = np.random.RandomState(0)
    chans = [4, 32, 32, 4]
    ws = [jnp.asarray(rs.randn(chans[i + 1], chans[i], 3, 3)
                      .astype(np.float32) * 0.1) for i in range(3)]

    def net(spek):
        h = spek
        for i, w in enumerate(ws):
            if i:
                h = jax.nn.relu(h)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return h

    p = mdx.MDXParams(n_fft=6144, hop_length=1024, dim_f=2048, dim_t=256)
    x = jnp.zeros((1, 4, p.dim_f, p.dim_t), jnp.float32)
    model = export_onnx(net, (x,), input_names=["input"],
                        output_names=["output"])
    graph = OnnxGraph(proto.decode(proto.ModelProto, proto.encode(model)))

    secs = 10.0
    wav = (rs.randn(2, int(44100 * secs)) * 0.1).astype(np.float32)
    t0 = time.time()
    out = mdx.mdx_demix(graph, wav, p)
    cold = time.time() - t0
    t0 = time.time()
    out = mdx.mdx_demix(graph, wav, p)
    np.asarray(out).sum()
    warm = time.time() - t0
    log(f"mdx demix({secs:.0f}s stereo): cold {cold:.1f}s warm {warm*1e3:.0f} ms")
    results["mdx_demix_10s_s"] = round(warm, 4)
    results["mdx_realtime_x"] = round(secs / warm, 1)


def bench_audioldm2(results):
    import jax
    import jax.numpy as jnp

    from rvc_maker_tpu.models import audioldm2 as am

    log("audioldm2: UNet denoise step (moderate dims) ...")
    cfg = am.UNetConfig(in_channels=8, block_out_channels=(128, 256),
                        layers_per_block=2)
    params = am.init_unet(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    rs = np.random.RandomState(0)
    # sample layout is channels-LAST: (B, t, f, Z) — audioldm2.py:501
    lat = jnp.asarray(rs.randn(1, 128, 16, cfg.in_channels)
                      .astype(np.float32))
    eh0 = jnp.asarray(rs.randn(1, 8, cfg.cross_dim).astype(np.float32))
    eh1 = jnp.asarray(rs.randn(1, 8, cfg.cross_dim_1).astype(np.float32))

    fn = jax.jit(lambda p, x, a, b: am.unet_forward(
        p, cfg, x, jnp.asarray([10.0]), a, b))
    t = timed(lambda: fn(params, lat, eh0, eh1),
              lambda o: np.asarray(o).sum())
    log(f"audioldm2 unet step: {t*1e3:.1f} ms ({1/t:.1f} steps/s; a "
        f"50-step edit = {50*2*t:.1f}s of UNet time fwd+inv)")
    results["audioldm2_unet_step_s"] = round(t, 4)
    results["audioldm2_50step_edit_unet_s"] = round(100 * t, 2)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/rvc_tpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    results = {"metric": "aux_stacks_tpu_smoke", "value": 1,
               "unit": "all aux stacks compiled+ran on TPU"}
    only = set(filter(None, os.environ.get("BENCH_AUX_ONLY", "").split(",")))
    for name, fn in (("whisper", bench_whisper), ("demucs", bench_demucs),
                     ("mdx", bench_mdx), ("audioldm2", bench_audioldm2)):
        if only and name not in only:
            continue
        try:
            fn(results)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_error"] = str(e)[:300]
            results["value"] = 0
            log(f"{name} FAILED: {e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
