"""ONNX embedder interchange (HuBERT/ContentVec `.onnx` mode).

The reference's embedder loader has three modes — fairseq .pt,
onnxruntime .onnx, transformers directory (library/utils.py:131-170).
The first and third are covered by models.hubert; this module adds the
.onnx mode, running embedder graphs through the JAX ONNX executor, plus
the export direction so our own weights can ship as .onnx.

Graph interface (what we export; torch-exported contentvec graphs with a
single waveform input also load — extra inputs are fed zeros):
    inputs : source (1, L) f32, lengths (1,) i32
    outputs: feats (1, T, C)  [C=768 v2 raw layer-12, 256 v1 projected]
Metadata: embedder_info JSON {version, max_samples}.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from . import onnx_proto as proto
from .onnx_export import export_onnx
from .onnx_run import OnnxGraph


def n_frames(n_samples: int) -> int:
    """Conv-frontend output frames for an input length (320x downsample,
    reference fairseq.py conv stack)."""
    from ..models.hubert import CONV_LAYERS

    t = int(n_samples)
    for _dim, k, stride in CONV_LAYERS:
        t = (t - k) // stride + 1
    return t


def _min_samples() -> int:
    """Shortest waveform producing one conv-frontend frame (the stack's
    receptive field — 400 samples for the standard HuBERT frontend)."""
    from ..models.hubert import CONV_LAYERS

    r = 1
    for _dim, k, stride in reversed(CONV_LAYERS):
        r = (r - 1) * stride + k
    return r


MIN_SAMPLES = _min_samples()


def export_embedder(params, path: str, *, version: str = "v2",
                    max_samples: int = 160000, dynamic: bool = True) -> str:
    """Export HuBERT params (models.hubert pytree) to .onnx.

    dynamic=True (default) marks the waveform axis symbolic — one graph
    serves any length >= MIN_SAMPLES (the conv frontend's receptive
    field).  dynamic=False emits a shape-specialized graph of capacity
    max_samples (default 10 s @16 kHz)."""
    from ..models import hubert as hubert_mod

    L = int(max_samples)

    def fwd(p, source, lengths):
        feats, _ = hubert_mod.extract_features(
            p, source, lengths, output_layer=12 if version == "v2" else 9)
        if version == "v1":
            feats = hubert_mod.final_proj(p, feats)
        return feats

    args = (jnp.zeros((1, L), jnp.float32), jnp.asarray([L], jnp.int32))
    model = export_onnx(
        fwd, args, params=params, input_names=["source", "lengths"],
        output_names=["feats"],
        dynamic_axes={"source": {1: "l"}} if dynamic else None,
        dim_constraints=[f"l >= {MIN_SAMPLES}"] if dynamic else (),
        metadata={"embedder_info": json.dumps(
            {"version": version,
             "max_samples": "dynamic" if dynamic else L,
             "min_samples": MIN_SAMPLES})})
    proto.save_model(model, path)
    return path


class OnnxEmbedder:
    """Drop-in for the hubert params pytree inside ConvertPipeline's
    feature stage: exposes features(audio, lengths) -> (B, T, C)."""

    def __init__(self, path: str):
        self.graph = OnnxGraph(path)
        md = self.graph.metadata
        info = json.loads(md.get("embedder_info", "{}"))
        self.version = info.get("version", "v2")
        ms = info.get("max_samples") or 0
        # our dynamic exports and torch graphs (no metadata) both serve
        # any length; only our --static graphs carry a numeric capacity
        self.dynamic = ms in (0, "dynamic")
        self.max_samples = None if self.dynamic else int(ms)
        self.min_samples = int(info.get("min_samples", 0) or 0)
        self._has_lengths = "lengths" in self.graph.input_names

    def features(self, audio, lengths):
        """audio: (B, L); lengths: (B,).  Pads to the graph's static
        capacity, maps over the batch (graphs trace at B=1), trims to
        the true frame count of L."""
        b, L = audio.shape
        if self.dynamic:
            cap = max(L, self.min_samples)
        else:
            cap = self.max_samples or L
            if L > cap:
                raise ValueError(
                    f"audio bucket {L} exceeds the embedder graph capacity "
                    f"{cap}; re-export with a larger max_samples (or use "
                    f"the default dynamic export)")
        if L < cap:
            audio = jnp.pad(audio, ((0, 0), (0, cap - L)))
        lengths = jnp.asarray(lengths, jnp.int32)

        def per_sample(xs):
            a, ln = xs
            feeds = {"source": a[None]}
            if self._has_lengths:
                feeds["lengths"] = ln
            return self.graph.run(feeds)[0][0]

        feats = jax.lax.map(per_sample, (audio, lengths[:, None]))
        return feats[:, : n_frames(L)]


def load_embedder(path_or_params):
    """Accept a .onnx path, a fairseq .pt path, a transformers dir, or an
    already-built params pytree (mirror of reference
    load_embedders_model)."""
    if isinstance(path_or_params, str):
        from ..models import hubert as hubert_mod
        import os

        if path_or_params.endswith(".onnx"):
            return OnnxEmbedder(path_or_params)
        if os.path.isdir(path_or_params):
            return hubert_mod.load_transformers_dir(path_or_params)
        return hubert_mod.load_fairseq_pt(path_or_params)
    return path_or_params
