"""Executable first-run validator for real released checkpoints.

Turns docs/real_weights_checklist.md into a program: point it at a
directory of downloaded artifacts and it runs every applicable check —
decrypt, strict keymaps, representative forwards, reference A/Bs (when
the torch reference at /root/reference is importable), faiss `.index`
vs total_fea, ONNX graph op coverage — and prints PASS/FAIL/SKIP per
check plus one summary JSON line.  Exit code != 0 iff any check FAILED.

    python tools/validate_real_weights.py /path/to/assets [--lenient]
                                          [--audio speech.wav]

--lenient skips the semantic quality gates that only hold for REAL
weights (f0 predictors tracking a pure tone, reference-output A/Bs
within tolerance, separator stems reconstructing the mix); structural
checks (key consumption, shapes, decrypt, finite outputs, byte-exact
index reconstruction) always run.  The offline self-test
(tests/test_validate_real_weights.py) builds synthetic stand-ins for
every artifact class and runs this file with --lenient.

Checklist provenance: reference loaders convert.py:545-552 (interchange
.pth), fairseq.py:30-36 (HuBERT .pt), FCPE.py:28-40 (AES at-rest),
whisper dims dict, demucs bag yaml, create_index.py:66-83 (faiss).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


class Ctx:
    def __init__(self, args):
        self.dir = os.path.abspath(args.dir)
        self.lenient = args.lenient
        self.audio_path = args.audio
        self._audio16k = None

    def find(self, *patterns):
        """First file in the asset dir matching any glob pattern."""
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(self.dir, "**", pat),
                                    recursive=True))
            if hits:
                return hits[0]
        return None

    def find_all(self, *patterns):
        out = []
        for pat in patterns:
            out += sorted(glob.glob(os.path.join(self.dir, "**", pat),
                                    recursive=True))
        return out

    def audio16k(self, seconds: float = 1.0) -> np.ndarray:
        """--audio resampled to 16 kHz, else a synthetic 220 Hz voiced
        tone (enough for structural checks; quality gates want --audio)."""
        if self._audio16k is None:
            if self.audio_path:
                from rvc_maker_tpu.utils.audio import load_audio

                self._audio16k = np.asarray(load_audio(self.audio_path,
                                                       16000), np.float32)
            else:
                t = np.arange(16000 * 4) / 16000.0
                vib = 1 + 0.02 * np.sin(2 * np.pi * 5 * t)
                self._audio16k = (0.4 * np.sin(
                    2 * np.pi * 220 * np.cumsum(vib) / 16000)).astype(
                        np.float32)
        n = int(16000 * seconds)
        a = self._audio16k
        return a[:n] if len(a) >= n else np.pad(a, (0, n - len(a)))

    def ref_available(self) -> bool:
        if not os.path.isdir("/root/reference"):
            return False
        try:
            import torch  # noqa: F401
            return True
        except Exception:  # noqa: BLE001
            return False


class Skip(Exception):
    pass


def _interchange_pth(ctx: Ctx):
    """First *.pth that is an RVC interchange file (config + weight)."""
    import torch

    for p in ctx.find_all("*.pth"):
        base = os.path.basename(p)
        if base.startswith(("crepe_", "G_", "D_")) or base == "rmvpe.pth":
            continue
        try:
            c = torch.load(p, map_location="cpu", weights_only=False)
        except Exception:  # noqa: BLE001
            continue
        if isinstance(c, dict) and "config" in c and "weight" in c:
            return p, c
    return None, None


# ---------------------------------------------------------------------------
# 1. RVC interchange .pth
# ---------------------------------------------------------------------------

@check("synth_pth")
def check_synth_pth(ctx: Ctx) -> dict:
    import torch

    path, cpt = _interchange_pth(ctx)
    if path is None:
        raise Skip("no interchange .pth (config+weight) found")
    out = {"file": os.path.basename(path)}

    # checklist 1a: 18-element config list -> ModelConfig
    cfg_list = cpt["config"]
    assert len(cfg_list) == 18, f"config list len {len(cfg_list)} != 18"
    from rvc_maker_tpu.config import model_config_from_ckpt_list

    use_f0 = bool(cpt.get("f0", 1))
    version = cpt.get("version", "v2")
    # spk_embed_dim patch + emb-dim-from-weights, as the product loader
    # does (convert.py:558 semantics)
    from rvc_maker_tpu.interop.torch_import import load_synthesizer_pth

    _params_chk, mcfg, _meta = load_synthesizer_pth(path)
    _probe = model_config_from_ckpt_list(cfg_list, use_f0=use_f0,
                                         version=version,
                                         vocoder=cpt.get("vocoder",
                                                         "Default"))
    assert _probe.sr == mcfg.sr, (_probe.sr, mcfg.sr)
    out["version"], out["sr"], out["use_f0"] = version, mcfg.sr, use_f0

    # checklist 1b: which weight-norm spelling does the file use?
    keys = list(cpt["weight"])
    spelling = ("parametrizations" if any("parametrizations" in k
                                          for k in keys)
                else "weight_g/v" if any(k.endswith("weight_g")
                                         for k in keys)
                else "plain")
    out["weight_norm_spelling"] = spelling

    from rvc_maker_tpu.models import synthesizer as syn
    import jax.numpy as jnp

    params = _params_chk
    b, t = 1, 20
    rs = np.random.RandomState(0)
    phone = jnp.asarray(rs.randn(b, t, mcfg.text_enc_hidden_dim)
                        .astype(np.float32))
    pitch = jnp.asarray(rs.randint(1, 256, (b, t)))
    nsff0 = jnp.asarray((rs.rand(b, t) * 300 + 80).astype(np.float32))
    zn = jnp.zeros((b, t, mcfg.inter_channels))
    sn = jnp.zeros((b, t * mcfg.upp, 1))
    wav, _, _ = syn.infer(params, mcfg, phone, jnp.asarray([t]),
                          pitch if use_f0 else None, nsff0,
                          jnp.asarray([0]), zn, sn)
    assert np.isfinite(np.asarray(wav)).all(), "non-finite output"
    out["wav_shape"] = list(np.asarray(wav).shape)

    # checklist 1c: A/B vs the reference toolkit's own Synthesizer
    if ctx.ref_available() and use_f0:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from reference_util import ref_module, zero_noise_torch

        mod = ref_module("main.library.algorithm.synthesizers")
        net = mod.Synthesizer(*cfg_list, use_f0=use_f0,
                              text_enc_hidden_dim=mcfg.text_enc_hidden_dim,
                              vocoder=cpt.get("vocoder", "Default"))
        if hasattr(net, "enc_q"):
            del net.enc_q
        res = net.load_state_dict(cpt["weight"], strict=False)
        assert not res.unexpected_keys, \
            f"reference rejected keys: {res.unexpected_keys[:5]}"
        net.eval().float()
        with torch.no_grad(), zero_noise_torch():
            o_ref, _, _ = net.infer(
                torch.from_numpy(np.asarray(phone)),
                torch.LongTensor([t]),
                torch.from_numpy(np.asarray(pitch)),
                torch.from_numpy(np.asarray(nsff0)),
                torch.LongTensor([0]))
        err = float(np.max(np.abs(
            o_ref.numpy()[:, 0, :] - np.asarray(wav)[:, :, 0])))
        out["ref_max_abs_err"] = err
        if not ctx.lenient:
            assert err <= 1e-3, f"reference A/B err {err} > 1e-3"
    return out


# ---------------------------------------------------------------------------
# 2. fairseq HuBERT .pt (and transformers dirs / spin safetensors)
# ---------------------------------------------------------------------------

@check("hubert_pt")
def check_hubert(ctx: Ctx) -> dict:
    path = ctx.find("*hubert*.pt", "*contentvec*.pt", "*spin*.safetensors")
    if path is None:
        raise Skip("no hubert/contentvec checkpoint found")
    from rvc_maker_tpu.interop.onnx_embedder import load_embedder
    from rvc_maker_tpu.models import hubert as hubert_mod
    import jax.numpy as jnp

    params = load_embedder(path)
    out = {"file": os.path.basename(path)}
    audio = ctx.audio16k(1.0)
    # v2 path: raw layer-12 features
    feats, flen = hubert_mod.extract_features(
        params, jnp.asarray(audio[None]), jnp.asarray([len(audio)]),
        output_layer=12)
    f = np.asarray(feats)
    assert np.isfinite(f).all(), "v2: non-finite features"
    assert f.std() > 1e-5, "v2: degenerate features"
    out["v2_feat_shape"] = list(f.shape)
    # v1 path: layer-9 + final_proj (contentvec carries the proj head)
    if "final_proj" in params:
        feats9, _ = hubert_mod.extract_features(
            params, jnp.asarray(audio[None]), jnp.asarray([len(audio)]),
            output_layer=9)
        proj = hubert_mod.final_proj(params, feats9)
        p = np.asarray(proj)
        assert np.isfinite(p).all(), "v1: non-finite projected features"
        out["v1_feat_shape"] = list(p.shape)
    return out


# ---------------------------------------------------------------------------
# 3-4. f0 predictors: rmvpe.pt / fcpe.pt (+ AES) / crepe .pth
# ---------------------------------------------------------------------------

def _f0_tone_check(ctx: Ctx, f0: np.ndarray, out: dict, label: str):
    f0 = np.asarray(f0).reshape(-1)
    voiced = f0[f0 > 1]
    out[f"{label}_voiced_frac"] = round(float(len(voiced) / max(len(f0), 1)),
                                        3)
    out[f"{label}_median_hz"] = round(float(np.median(voiced)), 1) \
        if len(voiced) else 0.0
    if not ctx.lenient and not ctx.audio_path:
        # synthetic 220 Hz tone: a real predictor must track it
        assert len(voiced) > 0.5 * len(f0), f"{label}: mostly unvoiced"
        med = float(np.median(voiced))
        assert abs(med - 220.0) < 22.0, f"{label}: median {med} != 220 Hz"


@check("rmvpe_pt")
def check_rmvpe(ctx: Ctx) -> dict:
    path = ctx.find("rmvpe.pt")
    if path is None:
        raise Skip("no rmvpe.pt found")
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod
    import jax.numpy as jnp

    params = rmvpe_mod.load_rmvpe_pt(path)   # shape-asserts E2E(4,1,(2,2))
    f0 = np.asarray(rmvpe_mod.infer(params,
                                    jnp.asarray(ctx.audio16k(1.0)[None])))
    out = {"file": os.path.basename(path)}
    assert np.isfinite(f0).all()
    _f0_tone_check(ctx, f0, out, "rmvpe")
    return out


@check("fcpe_pt")
def check_fcpe(ctx: Ctx) -> dict:
    paths = [p for p in (ctx.find("fcpe.pt"), ctx.find("fcpe_legacy.pt"))
             if p]
    if not paths:
        raise Skip("no fcpe checkpoint found")
    out = {}
    from rvc_maker_tpu.interop.modelcrypt import maybe_decrypt
    from rvc_maker_tpu.models import fcpe as fcpe_mod
    import jax.numpy as jnp

    for p in paths:
        raw = open(p, "rb").read()
        tag = os.path.basename(p).replace(".pt", "")
        # checklist 4: released files are AES-encrypted at rest
        out[f"{tag}_was_encrypted"] = maybe_decrypt(raw) != raw
        params, legacy = fcpe_mod.load_fcpe_ckpt(p)
        out[f"{tag}_arch"] = "legacy" if legacy else "current"
        f0 = np.asarray(fcpe_mod.infer(
            params, jnp.asarray(ctx.audio16k(1.0)[None])))
        assert np.isfinite(f0).all(), f"{tag}: non-finite f0"
        _f0_tone_check(ctx, f0, out, tag)
    return out


@check("crepe_pth")
def check_crepe(ctx: Ctx) -> dict:
    paths = ctx.find_all("crepe_*.pth")
    if not paths:
        raise Skip("no crepe_*.pth found")
    from rvc_maker_tpu.models import crepe as crepe_mod
    import jax.numpy as jnp

    out = {}
    for p in paths:
        cap = os.path.basename(p)[len("crepe_"):-len(".pth")]
        params = crepe_mod.load_crepe_pth(p, cap)
        probs = crepe_mod.predict_probs(
            params, jnp.asarray(ctx.audio16k(0.5)[None]))
        f0 = crepe_mod.decode(np.asarray(probs))
        assert np.isfinite(f0).all(), f"{cap}: non-finite"
        _f0_tone_check(ctx, f0, out, f"crepe_{cap}")
    return out


# ---------------------------------------------------------------------------
# 5. Whisper .pt
# ---------------------------------------------------------------------------

@check("whisper_pt")
def check_whisper(ctx: Ctx) -> dict:
    import torch

    path = None
    for p in ctx.find_all("*.pt"):
        if "hubert" in p or "contentvec" in p or "fcpe" in p or "rmvpe" in p:
            continue
        try:
            d = torch.load(p, map_location="cpu", weights_only=False)
        except Exception:  # noqa: BLE001
            continue
        if isinstance(d, dict) and "dims" in d:
            path = p
            break
    if path is None:
        raise Skip("no whisper checkpoint (dims dict) found")
    from rvc_maker_tpu.models import whisper as whisper_mod
    import jax.numpy as jnp

    params, dims = whisper_mod.load_whisper_pt(path)
    out = {"file": os.path.basename(path),
           "dims": {k: getattr(dims, k) for k in
                    ("n_mels", "n_audio_state", "n_audio_layer",
                     "n_text_layer", "n_vocab")}}
    ck = torch.load(path, map_location="cpu", weights_only=False)
    blob = ck.get("alignment_heads") or ck["dims"].get("alignment_heads")
    if blob is not None:
        heads = whisper_mod.alignment_heads_from_dump(blob, dims)
        out["alignment_heads"] = int(np.asarray(heads).sum())
    mel = whisper_mod.log_mel(jnp.asarray(ctx.audio16k(1.0)[None]),
                              n_mels=dims.n_mels)
    enc = whisper_mod.encode_audio(params, dims, mel)
    assert np.isfinite(np.asarray(enc)).all()
    out["enc_shape"] = list(np.asarray(enc).shape)
    return out


# ---------------------------------------------------------------------------
# 6. Demucs bags
# ---------------------------------------------------------------------------

@check("demucs")
def check_demucs(ctx: Ctx) -> dict:
    from rvc_maker_tpu.interop import demucs_load
    from rvc_maker_tpu.models import demucs as demucs_mod
    import jax.numpy as jnp

    bag = ctx.find("*.yaml")
    th = ctx.find("*.th")
    out = {}
    if not bag and not th:
        raise Skip("no demucs .yaml/.th found")
    # if the real reference `main` package is already imported (a prior
    # check used it), pickled reference-path classes re-import for real
    # and read configs relative to the reference root
    cwd = os.getcwd()
    if os.path.isdir("/root/reference"):
        os.chdir("/root/reference")
    try:
        if bag:
            models = demucs_load.load_demucs_bag(bag)
            out["bag"] = os.path.basename(bag)
            out["bag_models"] = len(models)
            params, cfg = models[0][0], models[0][1]
        else:
            params, cfg = demucs_load.load_demucs_th(th)
            out["th"] = os.path.basename(th)
    finally:
        os.chdir(cwd)
    n = int(min(cfg.segment * cfg.samplerate, cfg.samplerate // 2))
    mix = np.stack([ctx.audio16k(0.5)[:n]] * 2)   # stereo
    stems = demucs_mod.apply_model_single(params, cfg,
                                          jnp.asarray(mix[None]))
    s = np.asarray(stems)
    assert np.isfinite(s).all(), "non-finite stems"
    out["stems_shape"] = list(s.shape)
    if not ctx.lenient:
        # real separators approximately reconstruct the mix
        recon = s[0, :, :, :mix.shape[-1]].sum(axis=0)
        rel = float(np.abs(recon - mix).mean() / (np.abs(mix).mean() + 1e-9))
        out["recon_rel_err"] = round(rel, 3)
        assert rel < 0.5, f"stem sum does not reconstruct mix (rel {rel})"
    return out


# ---------------------------------------------------------------------------
# 7. UVR MDX .onnx
# ---------------------------------------------------------------------------

def _onnx_input_shape(graph, name):
    for vi in graph.graph.input:
        if vi.name == name:
            return [d.dim_value if d.dim_value else 0
                    for d in vi.type.tensor_type.shape.dim]
    return []


@check("mdx_onnx")
def check_mdx(ctx: Ctx) -> dict:
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph

    path, graph, shape = None, None, None
    for p in ctx.find_all("*.onnx"):
        base = os.path.basename(p).lower()
        if any(k in base for k in ("rmvpe", "crepe", "fcpe")):
            continue
        try:
            g = OnnxGraph(p)
        except Exception:  # noqa: BLE001
            continue
        if "model_info" in g.metadata:   # voice model, not MDX
            continue
        sh = _onnx_input_shape(g, g.input_names[0])
        if len(sh) == 4:   # MDX nets take (B, 4, F, T) spectrograms
            path, graph, shape = p, g, sh
            break
    if path is None:
        raise Skip("no 4-D-input .onnx (MDX) found")
    shape = [d if d > 0 else 8 for d in shape]
    shape[0] = 1
    rs = np.random.RandomState(0)
    x = rs.randn(*shape).astype(np.float32) * 0.1
    y = graph.run({graph.input_names[0]: x})
    y0 = np.asarray(y[0])
    assert np.isfinite(y0).all(), "non-finite MDX output"
    return {"file": os.path.basename(path), "in": shape,
            "out": list(y0.shape)}


# ---------------------------------------------------------------------------
# 8. AudioLDM2 diffusers directory
# ---------------------------------------------------------------------------

@check("audioldm2_dir")
def check_audioldm2(ctx: Ctx) -> dict:
    root = None
    for d in sorted(glob.glob(os.path.join(ctx.dir, "**/"), recursive=True)):
        if os.path.isdir(os.path.join(d, "unet")) and \
                os.path.isdir(os.path.join(d, "vae")):
            root = d.rstrip("/")
            break
    if root is None:
        raise Skip("no diffusers-layout directory (unet/ + vae/) found")
    from rvc_maker_tpu.edit.stack import load_components_from_dir

    comps = load_components_from_dir(root)   # strict keymaps raise inside
    ucfg = comps["unet_cfg"]
    return {"dir": os.path.relpath(root, ctx.dir),
            "components": sorted(k for k in comps if k != "unet_cfg"),
            "unet_blocks": list(ucfg.block_out_channels),
            "unet_cross_dims": [c if c is None else int(c)
                                for c in ucfg.cross_dims]
            if hasattr(ucfg, "cross_dims") else None}


# ---------------------------------------------------------------------------
# 9. faiss .index vs total_fea.npy
# ---------------------------------------------------------------------------

@check("faiss_index")
def check_faiss(ctx: Ctx) -> dict:
    idx = ctx.find("added_*.index", "*.index")
    if idx is None:
        raise Skip("no faiss .index found")
    from rvc_maker_tpu.retrieval.faiss_io import read_index

    index = read_index(idx)
    out = {"file": os.path.basename(idx),
           "ntotal": int(index.ntotal), "d": int(index.d)}
    fea = ctx.find("total_fea.npy")
    if fea is not None:
        ref = np.load(fea)
        rec = index.reconstruct_n()
        assert rec.shape == ref.shape, (rec.shape, ref.shape)
        assert np.array_equal(rec, ref), \
            "reconstruct_n != total_fea.npy (byte-exact check failed)"
        out["total_fea_byte_exact"] = True
    return out


# ---------------------------------------------------------------------------
# 11. torch-exported voice .onnx
# ---------------------------------------------------------------------------

@check("voice_onnx")
def check_voice_onnx(ctx: Ctx) -> dict:
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph
    from rvc_maker_tpu.interop.onnx_voice import OnnxVoiceModel

    path = None
    for p in ctx.find_all("*.onnx"):
        try:
            g = OnnxGraph(p)
        except Exception:  # noqa: BLE001
            continue
        if "model_info" in g.metadata:
            path = p
            break
    if path is None:
        raise Skip("no voice .onnx (model_info metadata) found")
    model = OnnxVoiceModel(path)
    cfg = model.cfg
    out = {"file": os.path.basename(path), "sr": cfg.sr,
           "version": model.version,
           "layout": "torch" if model.torch_layout else "NTC",
           "dynamic": model.dynamic}
    import jax.numpy as jnp

    t = max(20, model.min_frames)
    rs = np.random.RandomState(0)
    wav = model.synth(
        jnp.asarray(rs.randn(1, t, cfg.text_enc_hidden_dim)
                    .astype(np.float32)),
        jnp.asarray([t]), jnp.asarray(rs.randint(1, 256, (1, t))),
        jnp.asarray((rs.rand(1, t) * 300 + 80).astype(np.float32)),
        jnp.asarray([0]),
        jnp.zeros((1, t, cfg.inter_channels), jnp.float32),
        jnp.zeros((1, t * cfg.upp, 1), jnp.float32))
    w = np.asarray(wav)
    assert np.isfinite(w).all(), "non-finite onnx voice output"
    out["wav_shape"] = list(w.shape)
    return out


# ---------------------------------------------------------------------------
# 12. torch-exported f0 .onnx
# ---------------------------------------------------------------------------

@check("f0_onnx")
def check_f0_onnx(ctx: Ctx) -> dict:
    from rvc_maker_tpu.interop.onnx_run import OnnxGraph
    from rvc_maker_tpu.f0 import onnx_predictor as op

    out = {}
    found = False
    import jax.numpy as jnp

    audio = jnp.asarray(ctx.audio16k(0.5)[None])
    for pat, fn in (("rmvpe.onnx", op.rmvpe_onnx_infer),
                    ("crepe_*.onnx", op.crepe_onnx_infer),
                    ("fcpe*.onnx", op.fcpe_onnx_infer)):
        p = ctx.find(pat)
        if p is None:
            continue
        found = True
        graph = OnnxGraph(p)   # load raises NotImplementedError(op names)
        f0 = np.asarray(fn(graph, audio))
        tag = os.path.basename(p).replace(".onnx", "")
        assert np.isfinite(f0).all(), f"{tag}: non-finite"
        out[f"{tag}_frames"] = int(f0.shape[-1])
        _f0_tone_check(ctx, f0, out, tag)
    if not found:
        raise Skip("no f0 .onnx graph found")
    return out


# ---------------------------------------------------------------------------
# 10. bf16 gate over the full pipeline (needs synth + hubert)
# ---------------------------------------------------------------------------

@check("bf16_gate")
def check_bf16(ctx: Ctx) -> dict:
    pth, _ = _interchange_pth(ctx)
    hub = ctx.find("*hubert*.pt", "*contentvec*.pt")
    if pth is None or hub is None:
        raise Skip("needs both interchange .pth and hubert .pt")
    from rvc_maker_tpu.interop.onnx_voice import load_voice_model
    from rvc_maker_tpu.interop.onnx_embedder import load_embedder
    from rvc_maker_tpu.ops.stft import mel_spectrogram
    from rvc_maker_tpu.pipelines.convert import (ConvertPipeline,
                                                 ConvertSettings)
    import jax.numpy as jnp

    synth_params, cfg, meta = load_voice_model(pth)
    hubert_params = load_embedder(hub)
    version = meta.get("version", "v2")
    audio = ctx.audio16k(1.0)[None]
    lens = np.array([audio.shape[1]])
    settings = ConvertSettings(f0_method="yin", deterministic=True)
    outs = {}
    for dtype in (None, "bf16"):
        pipe = ConvertPipeline(
            synth_params, cfg, hubert_params, version=version,
            compute_dtype=jnp.bfloat16 if dtype else None)
        wav, _ = pipe.convert_batch(audio, lens, 0, settings)
        w = np.asarray(wav, np.float32)
        assert np.isfinite(w).all(), f"{dtype or 'fp32'}: non-finite"
        outs[dtype or "fp32"] = w
    a, b = outs["fp32"], outs["bf16"]
    n = min(a.shape[1], b.shape[1])
    mel = lambda x: np.asarray(mel_spectrogram(  # noqa: E731
        jnp.asarray(x[:, :n]), n_fft=1024, num_mels=80,
        sample_rate=cfg.sr, hop_length=256, win_length=1024,
        fmin=0.0, fmax=None))
    dist = float(np.mean(np.abs(mel(a) - mel(b))))
    out = {"mel_l1": round(dist, 4)}
    if not ctx.lenient:
        assert dist < 1.0, f"bf16 mel distance {dist} over gate"
    return out


# ---------------------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", help="directory of downloaded artifacts")
    ap.add_argument("--lenient", action="store_true",
                    help="structural checks only (synthetic stand-ins)")
    ap.add_argument("--audio", default="",
                    help="real speech wav for quality gates")
    ap.add_argument("--only", default="",
                    help="comma-separated check names")
    args = ap.parse_args()
    ctx = Ctx(args)
    only = set(filter(None, args.only.split(",")))

    results = {}
    n_fail = 0
    for name, fn in CHECKS:
        if only and name not in only:
            continue
        try:
            r = fn(ctx)
            results[name] = {"status": "PASS", **(r or {})}
            print(f"PASS {name}: {json.dumps(r)}")
        except Skip as s:
            results[name] = {"status": "SKIP", "reason": str(s)}
            print(f"SKIP {name}: {s}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            results[name] = {"status": "FAIL", "error": f"{e}"}
            print(f"FAIL {name}: {e}")
            traceback.print_exc()
    summary = {
        "checks": len(results),
        "pass": sum(1 for r in results.values() if r["status"] == "PASS"),
        "skip": sum(1 for r in results.values() if r["status"] == "SKIP"),
        "fail": n_fail,
        "lenient": ctx.lenient,
    }
    print(json.dumps({"validate_real_weights": summary}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
