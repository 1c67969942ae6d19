"""MDX-Net driver parity vs the reference MDXSeparator demix loop.

The reference class needs onnxruntime/onnx2torch/Config at import, so its
demix/run_model methods and STFT class are AST-extracted and bound to a
bare harness object (same pattern as test_spec_tools).  Both sides run
the SAME tiny conv model (built in JAX, exported to ONNX with our
exporter; the reference side calls it through a fake ort session)."""

import ast
import textwrap
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rvc_maker_tpu.interop.onnx_export import export_onnx
from rvc_maker_tpu.interop.onnx_run import OnnxGraph
from rvc_maker_tpu.pipelines import mdx

REF = "/root/reference/main/library/architectures/mdx_separator.py"

P = mdx.MDXParams(n_fft=64, dim_f=24, dim_t=32, compensate=1.035,
                  overlap=0.25, hop_length=16)


class _T(dict):
    """translations stand-in: any key formats to ''."""

    def __getitem__(self, k):
        return types.SimpleNamespace(format=lambda *a, **kw: "")


class _Log:
    def debug(self, *a, **k):
        pass

    info = error = debug


@pytest.fixture(scope="module")
def ref_harness():
    src = open(REF).read()
    tree = ast.parse(src)
    ns = {"np": np, "torch": torch, "translations": _T(),
          "tqdm": lambda it, **kw: it}
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == "STFT":
            exec(ast.get_source_segment(src, node), ns)
        if isinstance(node, ast.ClassDef) and node.name == "MDXSeparator":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name in (
                        "demix", "run_model", "initialize_model_settings"):
                    exec(textwrap.dedent(
                        ast.get_source_segment(src, item)), ns)
    assert "STFT" in ns and "demix" in ns

    def build(model_run, p: mdx.MDXParams):
        h = types.SimpleNamespace()
        h.logger = _Log()
        h.n_fft = p.n_fft
        h.dim_f = p.dim_f
        h.dim_t = p.dim_t
        h.segment_size = p.seg
        h.overlap = p.overlap
        h.hop_length = p.hop_length
        h.batch_size = 1
        h.enable_denoise = p.enable_denoise
        h.compensate = p.compensate
        h.torch_device = torch.device("cpu")
        h.model_run = model_run
        h.initialize_model_settings = types.MethodType(
            ns["initialize_model_settings"], h)
        h.run_model = types.MethodType(ns["run_model"], h)
        h.demix = types.MethodType(ns["demix"], h)
        # STFT is instantiated inside initialize_model_settings via the
        # module-global STFT — bind it into the method's globals
        ns["STFT"] = ns["STFT"]
        return h

    return ns, build


@pytest.fixture(scope="module")
def toy_graph():
    """Tiny spectrogram-to-spectrogram conv net exported to ONNX."""
    from rvc_maker_tpu.interop import onnx_proto as proto

    rs = np.random.RandomState(0)
    w1 = jnp.asarray(rs.randn(4, 8, 3, 3).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rs.randn(8).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(8, 4, 1, 1).astype(np.float32) * 0.3)

    def net(spek):                    # (B, 4, dim_f, dim_t)
        h = jax.lax.conv_general_dilated(
            spek, jnp.transpose(w1, (1, 0, 2, 3)), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jnp.tanh(h + b1[None, :, None, None])
        return jax.lax.conv_general_dilated(
            h, jnp.transpose(w2, (1, 0, 2, 3)), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    x = jnp.zeros((1, 4, P.dim_f, P.dim_t), jnp.float32)
    model = export_onnx(net, (x,), input_names=["input"],
                        output_names=["output"])
    g = OnnxGraph(proto.decode(proto.ModelProto, proto.encode(model)))
    return g, net


def test_stft_matches_torch(ref_harness):
    ns, _ = ref_harness
    rs = np.random.RandomState(1)
    x = rs.randn(1, 2, 700).astype(np.float32)
    tstft = ns["STFT"](_Log(), P.n_fft, P.hop_length, P.dim_f,
                       torch.device("cpu"))
    ref = tstft(torch.from_numpy(x)).numpy()
    ours = np.asarray(mdx.mdx_stft(jnp.asarray(x), n_fft=P.n_fft,
                                   hop=P.hop_length, dim_f=P.dim_f))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # istft roundtrip parity on an arbitrary (not self-consistent) spec
    spec = rs.randn(1, 4, P.dim_f, 40).astype(np.float32)
    ref_wav = tstft.inverse(torch.from_numpy(spec)).numpy()
    ours_wav = np.asarray(mdx.mdx_istft(jnp.asarray(spec), n_fft=P.n_fft,
                                        hop=P.hop_length,
                                        length=ref_wav.shape[-1]))
    np.testing.assert_allclose(ours_wav, ref_wav, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("denoise", [False, True])
def test_demix_parity(ref_harness, toy_graph, denoise):
    ns, build = ref_harness
    g, _ = toy_graph
    p = mdx.MDXParams(**{**P.__dict__, "enable_denoise": denoise})

    gjit = g.jit()

    def model_run(spek_t):
        return np.asarray(gjit(spek_t.detach().cpu().numpy())[0])

    h = build(model_run, p)
    rs = np.random.RandomState(2)
    mix = (rs.randn(2, 1500) * 0.3).astype(np.float32)
    ref = h.demix(mix.copy())
    ours = mdx.mdx_demix(g, mix.copy(), p)
    assert ours.shape == ref.shape == mix.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_demix_match_mix_parity(ref_harness, toy_graph):
    ns, build = ref_harness
    g, _ = toy_graph
    h = build(lambda s: (_ for _ in ()).throw(AssertionError("no model")),
              P)
    rs = np.random.RandomState(3)
    mix = (rs.randn(2, 1200) * 0.3).astype(np.float32)
    ref = h.demix(mix.copy(), is_match_mix=True)
    ours = mdx.mdx_demix(g, mix.copy(), P, is_match_mix=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_separate_stems(toy_graph):
    g, _ = toy_graph
    rs = np.random.RandomState(4)
    mix = (rs.randn(2, 2000) * 0.3).astype(np.float32)
    primary, secondary = mdx.mdx_separate(g, mix, P)
    assert primary.shape == secondary.shape == mix.shape
    assert np.isfinite(primary).all() and np.isfinite(secondary).all()
    # secondary = normalized(mix) - source by default
    p2, s2 = mdx.mdx_separate(g, mix, P, invert_using_spec=True)
    assert np.isfinite(s2).all()


def test_params_from_graph(toy_graph):
    g, _ = toy_graph
    p = mdx.params_from_graph(g, n_fft=64, compensate=1.035)
    assert p.dim_f == P.dim_f and p.dim_t == P.dim_t
    with pytest.raises(ValueError, match="n_fft"):
        mdx.params_from_graph(g)


def test_stft_istft_slice_path_matches_gather_path():
    """The scatter-free framing/OLA (hop | n_fft) must equal the gather/
    scatter fallback bit-for-bit-ish (r4 verdict: the scatter dominated
    TPU demix time)."""
    import numpy as np

    import jax.numpy as jnp

    from rvc_maker_tpu.pipelines import mdx as m

    rs = np.random.RandomState(0)
    x = jnp.asarray((rs.randn(2, 2, 5000) * 0.3).astype(np.float32))
    # divisible: n_fft=256 hop=64 (slice path); odd: hop=96 (fallback)
    for n_fft, hop in ((256, 64), (256, 96)):
        spec = m.mdx_stft(x, n_fft=n_fft, hop=hop, dim_f=100)
        # reference framing via explicit gather
        y = jnp.pad(x.reshape(4, -1), ((0, 0), (n_fft // 2, n_fft // 2)),
                    mode="reflect")
        n_frames = 1 + (y.shape[1] - n_fft) // hop
        idx = (np.arange(n_fft)[None, :]
               + hop * np.arange(n_frames)[:, None])
        frames = y[:, idx] * jnp.asarray(m._hann(n_fft), y.dtype)
        ref = jnp.fft.rfft(frames, axis=-1)
        ref = jnp.transpose(ref, (0, 2, 1))
        ref = jnp.stack([ref.real, ref.imag], 1).reshape(
            2, 4, n_fft // 2 + 1, n_frames)[:, :, :100]
        np.testing.assert_allclose(np.asarray(spec), np.asarray(ref),
                                   atol=1e-4)
        out = m.mdx_istft(spec, n_fft=n_fft, hop=hop, length=5000)
        assert out.shape == (2, 2, 5000)
        # hann-windowed OLA of an identity transform reconstructs the
        # middle of the signal (edges lose the analysis taper)
        a = np.asarray(out)[:, :, n_fft: -n_fft]
        # dim_f=100 low-passes hard; just require finite + same scale
        assert np.isfinite(a).all()


def test_mdx_jit_cache_is_bounded():
    """The per-(graph, length) compiled-program cache must evict (a
    long-running server would otherwise grow one pinned executable per
    distinct song length until OOM — review r5)."""
    from rvc_maker_tpu.pipelines import mdx as mdx_mod

    saved = dict(mdx_mod._JIT_CACHE)
    mdx_mod._JIT_CACHE.clear()
    try:
        cap = mdx_mod._JIT_CACHE_MAX
        for i in range(cap + 5):
            mdx_mod._jit_cache_put(("t", i), object())
        assert len(mdx_mod._JIT_CACHE) == cap
        assert mdx_mod._jit_cache_get(("t", 0)) is None      # evicted
        assert mdx_mod._jit_cache_get(("t", cap + 4)) is not None
        # LRU: touching an old entry protects it from the next eviction
        mdx_mod._jit_cache_get(("t", 5))
        mdx_mod._jit_cache_put(("t", 999), object())
        assert mdx_mod._jit_cache_get(("t", 5)) is not None
    finally:
        mdx_mod._JIT_CACHE.clear()
        mdx_mod._JIT_CACHE.update(saved)
