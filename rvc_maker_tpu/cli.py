"""Command-line interface — one dispatcher for every pipeline stage.

Replaces the reference's per-stage argparse scripts + parser.py dispatcher
(reference main/app/parser.py:11-25).  Stages share the typed config tree
instead of re-declaring flags.

Usage:
  python -m rvc_maker_tpu.cli preprocess --dataset ./dataset --exp-dir ./exp --sample-rate 48000
  python -m rvc_maker_tpu.cli extract    --exp-dir ./exp --version v2 --f0-method rmvpe
  python -m rvc_maker_tpu.cli index      --exp-dir ./exp --version v2
  python -m rvc_maker_tpu.cli train      --exp-dir ./exp --sample-rate 48000 --epochs 200
  python -m rvc_maker_tpu.cli convert    --input in.wav --output out.wav --model model.pth [...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _setup_logging(exp_dir: str | None = None, name: str = "rvc"):
    handlers = [logging.StreamHandler()]
    if exp_dir:
        os.makedirs(exp_dir, exist_ok=True)
        from logging.handlers import RotatingFileHandler
        handlers.append(RotatingFileHandler(
            os.path.join(exp_dir, f"{name}.log"), maxBytes=5 * 1024 * 1024,
            backupCount=3, encoding="utf-8"))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s.%(msecs)03d | %(levelname)s | %(module)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S", handlers=handlers, force=True)


def cmd_preprocess(args):
    from .pipelines.preprocess import preprocess_dataset

    _setup_logging(args.exp_dir, "preprocess")
    import time

    from .utils.i18n import tr

    t0 = time.time()
    n = preprocess_dataset(args.dataset, args.exp_dir, args.sample_rate,
                           per=args.per, num_workers=args.cpu_cores,
                           cut=args.cut, effects=args.process_effects)
    print(tr("preprocess_success", elapsed_time=f"{time.time() - t0:.1f}")
          + f" [{n} segments]")


def cmd_extract(args):
    from .config import preset
    from .models import hubert as hubert_mod
    from .pipelines import extract as ex

    _setup_logging(args.exp_dir, "extract")
    cfg = preset(args.version, args.sample_rate)
    if args.embedder_path:
        hubert_params = hubert_mod.load_fairseq_pt(args.embedder_path)
    else:
        import jax
        from .utils.i18n import tr as _tr
        logging.warning(_tr("random_hubert"))
        hubert_params = hubert_mod.init_params(jax.random.PRNGKey(0))

    rmvpe_params = None
    method = args.f0_method
    if method.startswith("rmvpe"):
        if args.rmvpe_path:
            from .models.rmvpe import load_rmvpe_pt
            rmvpe_params = load_rmvpe_pt(args.rmvpe_path)
        else:
            from .utils.i18n import tr as _tr

            logging.warning(_tr("fallback_yin"))
            method = "yin"
    crepe_params = None
    if "crepe" in method and args.crepe_path:
        from .models.crepe import load_crepe_pth

        capacity = method.split("-")[-1]
        if capacity not in ("tiny", "small", "medium", "large", "full"):
            capacity = "full"
        crepe_params = load_crepe_pth(args.crepe_path, capacity)
    fcpe_params = None
    if "fcpe" in method and args.fcpe_path:
        from .models.fcpe import load_fcpe_ckpt

        fcpe_params, _legacy = load_fcpe_ckpt(args.fcpe_path)
    ex.extract_f0(args.exp_dir, method=method, rmvpe_params=rmvpe_params,
                  crepe_params=crepe_params, fcpe_params=fcpe_params,
                  hop_length=args.hop_length)
    ex.extract_embeddings(args.exp_dir, hubert_params, version=args.version)
    ex.write_mute_fixture(args.exp_dir, cfg, hubert_params, args.version)
    ex.generate_filelist(args.exp_dir, cfg, args.version)
    from .utils.i18n import tr

    print(tr("extract_done"))


def cmd_index(args):
    import numpy as np

    from .retrieval import build_index, save_index

    _setup_logging(args.exp_dir, "index")
    feat_dir = os.path.join(args.exp_dir, f"{args.version}_extracted")
    arrays = [np.load(os.path.join(feat_dir, n))
              for n in sorted(os.listdir(feat_dir)) if n.endswith(".npy")]
    feats = np.concatenate(arrays, axis=0)
    index = build_index(feats, version=args.version)
    out = os.path.join(args.exp_dir, f"added_{os.path.basename(args.exp_dir)}_{args.version}.index.npz")
    save_index(index, out)
    np.save(os.path.join(args.exp_dir, "total_fea.npy"), index.vectors)
    # faiss-compatible IVF-Flat file so reference-toolchain users can load
    # our index (reference create_index.py:66-83 layout: nlist =
    # min(16*sqrt(N), N/39), nprobe 1)
    from .retrieval.ivf import build_ivf_file

    fa = os.path.join(
        args.exp_dir,
        f"added_{os.path.basename(args.exp_dir)}_{args.version}.index")
    build_ivf_file(index.vectors, fa)
    from .utils.i18n import tr

    print(tr("save_index") + f": {index.vectors.shape} -> {out} + {fa}")


def cmd_train(args):
    from .config import preset
    from .pipelines.train_loop import train

    _setup_logging(args.exp_dir, "train")
    cfg = preset(args.version, args.sample_rate, vocoder=args.vocoder,
                 pitch_guidance=args.pitch_guidance)
    if args.bf16 or args.checkpointing:
        from dataclasses import replace

        cfg = replace(cfg, train=replace(cfg.train, bf16=args.bf16,
                                         remat=args.checkpointing))
    if not args.pretrain_g and not args.no_pretrained:
        # reference downloads pretrained G/D before training
        # (app.py:1310-1320); degrade to from-scratch offline
        from .utils import bootstrap

        try:
            args.pretrain_g, args.pretrain_d = bootstrap.ensure_pretrained(
                args.version, args.sample_rate, args.vocoder)
        except Exception as e:  # noqa: BLE001
            from .utils.i18n import tr as _tr

            logging.warning(_tr("pretrained_failed", e=e))
    train(args.exp_dir, cfg, total_epochs=args.epochs,
          batch_size=args.batch_size, save_every_epoch=args.save_every_epoch,
          save_only_latest=not args.save_all, pretrain_g=args.pretrain_g,
          pretrain_d=args.pretrain_d, author=args.model_author,
          model_name=args.model_name,
          overtraining_detector=not args.no_overtraining_detector,
          overtraining_threshold=args.overtraining_threshold,
          save_every_weights=not args.no_save_every_weights,
          cache_data=args.cache_data, cleanup=args.cleanup)
    from .utils.i18n import tr

    print(tr("success"))


def _build_convert_pipeline(args):
    """Model loading shared by `convert` and `tts` (conversion half):
    returns (pipeline, settings)."""
    from .interop.onnx_voice import load_voice_model
    from .models import hubert as hubert_mod
    from .pipelines.convert import ConvertPipeline, ConvertSettings
    from .retrieval import load_index

    # .pth -> params pytree; .onnx -> OnnxVoiceModel (JAX ONNX executor)
    synth_params, cfg, meta = load_voice_model(args.model)
    version = meta.get("version", "v2")
    from .utils import bootstrap

    def _maybe_bootstrap(kind, fn):
        """Reference-style lazy model download (check_predictors /
        check_embedders); clear warning when offline."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — degrade, don't die
            from .utils.i18n import tr as _tr

            logging.warning(_tr("bootstrap_failed", kind=kind, e=e))
            return None

    if args.embedder_path:
        from .interop.onnx_embedder import load_embedder

        # fairseq .pt / transformers dir / .onnx (JAX ONNX executor)
        hubert_params = load_embedder(args.embedder_path)
    else:
        fetched = _maybe_bootstrap(
            "embedder", lambda: bootstrap.ensure_embedder("contentvec_base"))
        if fetched:
            from .interop.onnx_embedder import load_embedder

            hubert_params = load_embedder(fetched)
        else:
            import jax
            from .utils.i18n import tr as _tr

            logging.warning(_tr("random_hubert"))
            hubert_params = hubert_mod.init_params(jax.random.PRNGKey(0))
    rmvpe_params = None
    method = args.f0_method
    # --f0-onnx: bootstrap the .onnx predictor variants
    # (reference check_predictors appends "-onnx", library/utils.py:25)
    suffix = "-onnx" if getattr(args, "f0_onnx", False) else ""

    def _boot_method():
        return "+".join(m + suffix for m in bootstrap.methods_of(method)) \
            if "hybrid" not in method else \
            "hybrid[" + "+".join(m + suffix for m in
                                 bootstrap.methods_of(method)) + "]"

    if "rmvpe" in method and not args.rmvpe_path:
        got = _maybe_bootstrap(
            "rmvpe", lambda: next(
                (v for k, v in bootstrap.ensure_predictor(
                    _boot_method()).items() if "rmvpe" in k), None))
        if got:
            args.rmvpe_path = got
    if "rmvpe" in method and args.rmvpe_path:
        if args.rmvpe_path.endswith(".onnx"):
            # --f0_onnx route: graph runs on the JAX ONNX executor
            from .interop.onnx_run import OnnxGraph
            rmvpe_params = OnnxGraph(args.rmvpe_path)
        else:
            from .models.rmvpe import load_rmvpe_pt
            rmvpe_params = load_rmvpe_pt(args.rmvpe_path)
    elif method == "rmvpe":
        from .utils.i18n import tr as _tr

        logging.warning(_tr("fallback_yin"))
        method = "yin"
    fcpe_params = None
    if "fcpe" in method and not args.fcpe_path:
        got = _maybe_bootstrap(
            "fcpe", lambda: next(
                (v for k, v in bootstrap.ensure_predictor(
                    _boot_method()).items() if "fcpe" in k), None))
        if got:
            args.fcpe_path = got
    if "fcpe" in method and args.fcpe_path:
        if args.fcpe_path.endswith(".onnx"):
            from .interop.onnx_run import OnnxGraph
            fcpe_params = OnnxGraph(args.fcpe_path)
        else:
            from .models.fcpe import load_fcpe_ckpt
            fcpe_params, _legacy = load_fcpe_ckpt(args.fcpe_path)
    crepe_params = None
    if "crepe" in method and not args.crepe_path:
        got = _maybe_bootstrap(
            "crepe", lambda: next(
                (v for k, v in bootstrap.ensure_predictor(
                    _boot_method()).items() if "crepe" in k), None))
        if got:
            args.crepe_path = got
    if "crepe" in method and args.crepe_path:
        if args.crepe_path.endswith(".onnx"):
            from .interop.onnx_run import OnnxGraph
            crepe_params = OnnxGraph(args.crepe_path)
        else:
            from .models.crepe import load_crepe_pth
            capacity = method.split("-")[-1]
            if capacity not in ("tiny", "small", "medium", "large", "full"):
                capacity = "full"
            crepe_params = load_crepe_pth(args.crepe_path, capacity)
    index_vectors = None
    if args.index and args.index_rate > 0:
        index_vectors = load_index(args.index).vectors

    pipe = ConvertPipeline(synth_params, cfg, hubert_params, version=version,
                           rmvpe_params=rmvpe_params, fcpe_params=fcpe_params,
                           crepe_params=crepe_params,
                           index_vectors=index_vectors)
    settings = ConvertSettings(
        pitch=args.pitch, index_rate=args.index_rate, protect=args.protect,
        f0_method=method, f0_autotune=args.f0_autotune,
        f0_autotune_strength=args.f0_autotune_strength,
        volume_envelope=args.volume_envelope, resample_sr=args.resample_sr,
        hop_length=args.hop_length, filter_radius=args.filter_radius,
        f0_file=args.f0_file)
    return pipe, settings


def cmd_convert(args):
    import numpy as np

    if getattr(args, "preset", ""):
        from .utils.presets import apply_preset_to_args, load_preset

        apply_preset_to_args(args, load_preset(args.preset))

    from .utils.audio import load_audio, save_wav

    _setup_logging(None)
    pipe, settings = _build_convert_pipeline(args)
    cfg = pipe.cfg

    audio = load_audio(args.input, 16000)
    if args.formant_shifting:
        # reference load_audio(formant_shifting=True) via stftpitchshift
        from .utils.pitchshift import formant_shift

        audio = formant_shift(audio, 16000, quefrency=args.formant_qfrency,
                              timbre=args.formant_timbre)
    peak = np.abs(audio).max() / 0.95
    if peak > 1:
        audio = audio / peak
    if args.split_audio:
        from .pipelines.convert import convert_split

        out = convert_split(pipe, audio, args.sid, settings)
    else:
        out = pipe.convert_utterance(audio, args.sid, settings)
    out_sr = args.resample_sr if args.resample_sr else cfg.sr
    if args.clean_audio:
        # reference convert.py clean_audio: spectral-gate the output
        from .utils.noisereduce import reduce_noise

        out = reduce_noise(out, out_sr, prop_decrease=args.clean_strength)
    if getattr(args, "export_format", "wav") != "wav":
        from .utils.audio import save_audio

        written = save_audio(args.output, out, out_sr, args.export_format)
    else:
        save_wav(args.output, out, out_sr)
        written = args.output
    from .utils.i18n import tr

    print(tr("export_success")
          + f" {written} ({len(out) / out_sr:.2f}s @ {out_sr} Hz)")


def cmd_separate(args):
    from .interop.demucs_load import load_demucs_bag, load_demucs_th
    from .pipelines.separate import apply_bag, separate_vocals
    from .utils.audio import read_wav, save_wav

    _setup_logging(None)
    audio, sr = read_wav(args.input)
    if args.model.endswith(".onnx"):
        # MDX-Net spectrogram-masking model via the JAX ONNX executor
        import numpy as np

        from .interop.onnx_run import OnnxGraph
        from .pipelines import mdx as mdx_mod

        graph = OnnxGraph(args.model)
        p = mdx_mod.params_from_graph(
            graph, n_fft=args.mdx_n_fft, hop_length=args.mdx_hop,
            compensate=args.mdx_compensate, overlap=args.mdx_overlap,
            enable_denoise=args.mdx_denoise)
        if audio.ndim == 1:
            audio = np.stack([audio, audio], axis=1)
        primary, secondary = mdx_mod.mdx_separate(
            graph, audio.T.astype(np.float32), p,
            invert_using_spec=args.invert_using_spec)
        # MDX primary stem is vocals for Kim_Vocal-style models
        save_wav(args.output_vocals, primary.T, sr)
        if args.output_instrumental:
            save_wav(args.output_instrumental, secondary.T, sr)
        from .utils.i18n import tr

        print(tr("separator_success_3") + f" {args.output_vocals}"
              + (f" and {args.output_instrumental}"
                 if args.output_instrumental else ""))
        return
    if args.model.endswith((".yaml", ".yml")):
        import numpy as np

        bag = load_demucs_bag(args.model)
        if audio.ndim == 1:
            audio = np.stack([audio, audio], axis=1)
        out = apply_bag(bag, audio.T[None].astype(np.float32),
                        shifts=args.shifts)
        cfg = bag[0][1]
        v_idx = cfg.sources.index("vocals")
        vocals = out[0, v_idx].T
        inst = sum(out[0, k] for k in range(len(cfg.sources))
                   if k != v_idx).T
    else:
        params, cfg = load_demucs_th(args.model)
        vocals, inst = separate_vocals(
            params, cfg, audio, sr, shifts=args.shifts,
            invert_using_spec=args.invert_using_spec)
    save_wav(args.output_vocals, vocals, cfg.samplerate)
    if args.output_instrumental:
        save_wav(args.output_instrumental, inst, cfg.samplerate)
    from .utils.i18n import tr

    print(tr("separator_success_3") + f" {args.output_vocals}"
          + (f" and {args.output_instrumental}"
             if args.output_instrumental else ""))


def cmd_separate_music(args):
    from .pipelines.separate_music import SeparationSettings, separate_music

    _setup_logging(None)
    s = SeparationSettings(
        model_name=args.model_name, kara_model=args.kara_model,
        reverb_model=args.reverb_model, backing=args.backing,
        reverb=args.reverb, backing_reverb=args.backing_reverb,
        clean_audio=args.clean_audio, clean_strength=args.clean_strength,
        shifts=args.shifts, sample_rate=args.sample_rate,
        export_format=args.export_format, mdx_denoise=args.mdx_denoise,
        mdx_overlap=args.mdx_overlap, mdx_hop=args.mdx_hop,
        mdx_n_fft=args.mdx_n_fft)
    written = separate_music(args.input, args.output, s)
    from .utils.i18n import tr

    for stem, path in written.items():
        print(f"{stem} -> {path}")
    print(tr("separator_success_3"))


def cmd_create_dataset(args):
    import time

    from .pipelines.create_dataset import create_dataset

    _setup_logging(None)
    t0 = time.time()
    separator = None
    if args.separator_model:
        from .interop.demucs_load import load_demucs_th

        separator = load_demucs_th(args.separator_model)
    written = create_dataset(
        args.inputs, args.output, sample_rate=args.sample_rate,
        skip_start=args.skip_start or None, skip_end=args.skip_end or None,
        separator=separator, clean_dataset=args.clean_dataset,
        clean_strength=args.clean_strength)
    from .utils.i18n import tr

    print(tr("create_dataset_success", elapsed_time=f"{time.time() - t0:.1f}")
          + f" [{len(written)} files -> {args.output}]")


def cmd_transcribe(args):
    import json

    from .models.whisper import load_whisper_pt
    from .speaker.transcribe import transcribe
    from .speaker.whisper_tokenizer import WhisperTokenizer
    from .utils.audio import load_audio

    _setup_logging(None)
    params, dims = load_whisper_pt(args.model)
    tok = WhisperTokenizer(args.vocab, multilingual=True,
                           language=args.language)
    audio = load_audio(args.input, 16000)
    segs = transcribe(params, dims, tok, audio,
                      word_timestamps=args.word_timestamps,
                      beam_size=args.beam_size, patience=args.patience,
                      best_of=args.best_of)
    out = [{k: v for k, v in s.items() if k != "tokens"} for s in segs]
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2, ensure_ascii=False)
    from .utils.i18n import tr

    print(tr("whisper_done") + " "
          + tr("segments_to", n=len(out), path=args.output))


def cmd_effects(args):
    from .utils.audio import load_audio, read_wav, save_wav
    from .utils.effects import EffectsSettings, apply_effects

    _setup_logging(None)
    audio, sr = read_wav(args.input)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    kwargs = {}
    for f in EffectsSettings.__dataclass_fields__:
        if hasattr(args, f):
            kwargs[f] = getattr(args, f)
    out, out_sr = apply_effects(audio, sr, EffectsSettings(**kwargs))
    save_wav(args.output, out, out_sr)
    from .utils.i18n import tr

    print(tr("export_success")
          + f" {args.output} ({len(out) / out_sr:.2f}s @ {out_sr} Hz)")


def cmd_tts(args):
    """Synthesize speech (edge-tts protocol or Google translate TTS),
    optionally SRT-timed, optionally converted through a voice model
    (reference app.py TTS tab + convert_tts:1166-1207)."""
    import numpy as np

    from .utils import edge_tts_client as etc
    from .utils.audio import save_wav
    from .utils.i18n import tr
    from .utils.tts import _read_tts_output, srt_tts, synthesize_tts

    _setup_logging(None)
    if not args.text and not args.srt:
        raise SystemExit(tr("enter_the_text"))
    print(tr("start_tts"))
    if args.srt:
        srt_tts(args.srt, args.output, args.voice, rate=args.rate,
                google=args.google)
    else:
        synthesize_tts(
            args.text, args.voice, args.output, rate=args.rate,
            pitch=args.tts_pitch, google=args.google,
            output_format=None if args.google else etc.PCM_FORMAT)
    print(tr("tts_success") + f" -> {args.output}")
    if args.model:
        pipe, settings = _build_convert_pipeline(args)
        audio16 = _read_tts_output(args.output, 16000)
        peak = np.abs(audio16).max() / 0.95
        if peak > 1:
            audio16 = audio16 / peak
        out = pipe.convert_utterance(audio16, args.sid, settings)
        out_sr = args.resample_sr if args.resample_sr else pipe.cfg.sr
        save_wav(args.convert_output, out, out_sr)
        print(tr("output_file_tts_convert") + f" -> {args.convert_output}")


def cmd_diarize_convert(args):
    """Diarized two-model conversion (reference convert_with_whisper,
    app.py:1022-1164): segment -> ECAPA cluster -> alternate models."""
    import copy

    from .models.ecapa_tdnn import load_ecapa_ckpt
    from .speaker.diarize import convert_with_diarization
    from .utils.audio import load_audio, save_wav

    _setup_logging(None)
    audio16 = load_audio(args.input, 16000)
    pipes, settings_list = [], []
    for model in [args.model, args.model_b or args.model]:
        a = copy.copy(args)
        a.model = model
        pipe, settings = _build_convert_pipeline(a)
        pipes.append(pipe)
        settings_list.append(settings)
    ecapa_params = load_ecapa_ckpt(args.ecapa)
    whisper = None
    if args.whisper:
        from .models.whisper import load_whisper_pt
        from .speaker.whisper_tokenizer import WhisperTokenizer

        params, dims = load_whisper_pt(args.whisper)
        whisper = (params, dims,
                   WhisperTokenizer(args.vocab, multilingual=True))
    out = convert_with_diarization(audio16, pipes, settings_list,
                                   ecapa_params, whisper=whisper)
    save_wav(args.output, out, pipes[0].cfg.sr)
    from .utils.i18n import tr

    print(tr("success") + f" {args.output}")


def cmd_fuse(args):
    from .utils.model_tools import fuse_models

    out = fuse_models(args.model_a, args.model_b, args.output,
                      ratio=args.ratio)
    from .utils.i18n import tr

    print(tr("fusion_success") + f" -> {out}")


def cmd_info(args):
    import json

    from .utils.model_tools import model_info

    print(json.dumps(model_info(args.model), indent=2, default=str))


def cmd_export_onnx(args):
    from .interop.onnx_voice import export_voice_model

    out = export_voice_model(args.model, args.output,
                             max_frames=args.max_frames,
                             dynamic=not args.static)
    from .utils.i18n import tr

    print(tr("success") + f" -> {out}")


def cmd_edit(args):
    """Prompt-based audio editing (reference main/inference/audioldm2.py
    main:64-86; flags parse_arguments:46-62)."""
    from .edit.pipeline import ToyMelStack, edit

    _setup_logging(None, "audioldm2")
    out = edit(args.input_path, args.output_path, model_id=args.model,
               source_prompt=args.source_prompt,
               target_prompt=args.target_prompt, steps=args.steps,
               cfg_scale_src=args.cfg_scale_src,
               cfg_scale_tar=args.cfg_scale_tar, t_start=args.t_start,
               save_compute=args.save_compute, sr=args.sample_rate,
               export_format=args.export_format,
               stack=ToyMelStack() if args.toy_stack else None)
    from .utils.i18n import tr

    print(tr("success") + f" -> {out}")


def cmd_tensorboard(args):
    from .pipelines.tb_logging import launch_tensorboard

    url = launch_tensorboard(args.logdir, args.port)
    from .utils.i18n import tr

    print(tr("tensorboard_url") + f": {url}")
    import time

    while True:
        time.sleep(60)


def build_parser():
    p = argparse.ArgumentParser(prog="rvc_maker_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("preprocess")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--exp-dir", required=True)
    sp.add_argument("--sample-rate", type=int, default=48000)
    sp.add_argument("--per", type=float, default=3.7)
    sp.add_argument("--cpu-cores", type=int, default=2)
    sp.add_argument("--no-cut", dest="cut", action="store_false")
    sp.add_argument("--no-process-effects", dest="process_effects",
                    action="store_false")
    sp.set_defaults(func=cmd_preprocess)

    se = sub.add_parser("extract")
    se.add_argument("--exp-dir", required=True)
    se.add_argument("--version", default="v2", choices=["v1", "v2"])
    se.add_argument("--sample-rate", type=int, default=48000)
    se.add_argument("--f0-method", default="rmvpe",
                    help="rmvpe | yin | pm | dio | harvest | swipe | pyin "
                         "| crepe-* | mangio-crepe-* | fcpe[-legacy] | "
                         "hybrid[a+b]")
    se.add_argument("--embedder-path", default="")
    se.add_argument("--rmvpe-path", default="")
    se.add_argument("--crepe-path", default="")
    se.add_argument("--fcpe-path", default="")
    se.add_argument("--hop-length", type=int, default=160)
    se.set_defaults(func=cmd_extract)

    si = sub.add_parser("index")
    si.add_argument("--exp-dir", required=True)
    si.add_argument("--version", default="v2", choices=["v1", "v2"])
    si.set_defaults(func=cmd_index)

    st = sub.add_parser("train")
    st.add_argument("--exp-dir", required=True)
    st.add_argument("--version", default="v2", choices=["v1", "v2"])
    st.add_argument("--sample-rate", type=int, default=48000)
    st.add_argument("--epochs", type=int, default=200)
    st.add_argument("--batch-size", type=int, default=8)
    st.add_argument("--save-every-epoch", type=int, default=5)
    st.add_argument("--save-all", action="store_true")
    st.add_argument("--pretrain-g", default="")
    st.add_argument("--pretrain-d", default="")
    st.add_argument("--vocoder", default="Default",
                    choices=["Default", "MRF HiFi-GAN", "RefineGAN"])
    st.add_argument("--no-pitch-guidance", dest="pitch_guidance",
                    action="store_false",
                    help="train an f0-less model (plain Generator decode)")
    st.add_argument("--model-name", default="")
    st.add_argument("--model-author", default="")
    st.add_argument("--no-overtraining-detector", action="store_true")
    st.add_argument("--overtraining-threshold", type=int, default=50)
    st.add_argument("--no-save-every-weights", action="store_true",
                    help="export inference weights only at the end")
    st.add_argument("--no-pretrained", action="store_true",
                    help="skip the pretrained G/D bootstrap download")
    st.add_argument("--cache-data", action="store_true",
                    help="cache decoded training items in RAM "
                         "(reference --cache_data_in_gpu analog)")
    st.add_argument("--cleanup", action="store_true",
                    help="wipe old checkpoints/logs before training "
                         "(reference --cleanup)")
    st.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 forward/backward,"
                         " fp32 master params (reference fp16 autocast)")
    st.add_argument("--checkpointing", action="store_true",
                    help="rematerialize G/D forwards during backprop "
                         "(reference --checkpointing; needed for B>=16)")
    st.set_defaults(func=cmd_train)

    sc = sub.add_parser("convert")
    sc.add_argument("--input", required=True)
    sc.add_argument("--output", required=True)
    sc.add_argument("--model", required=True)
    sc.add_argument("--index", default="")
    sc.add_argument("--sid", type=int, default=0)
    sc.add_argument("--pitch", type=int, default=0)
    sc.add_argument("--index-rate", type=float, default=0.5)
    sc.add_argument("--protect", type=float, default=0.33)
    sc.add_argument(
        "--f0-method", default="rmvpe",
        help="rmvpe | yin | pyin | fcpe | fcpe-legacy | dio | harvest | "
             "swipe | pm | crepe-{tiny,small,medium,large,full} | "
             "mangio-crepe-{...} | hybrid[a+b]")
    sc.add_argument("--fcpe-path", default="")
    sc.add_argument("--preset", default="", help="preset JSON (reference-compatible)")
    sc.add_argument("--f0-file", default="", help='external "time,f0" contour')
    sc.add_argument("--clean-audio", action="store_true")
    sc.add_argument("--clean-strength", type=float, default=0.7)
    sc.add_argument("--formant-shifting", action="store_true")
    sc.add_argument("--formant-qfrency", type=float, default=0.8)
    sc.add_argument("--formant-timbre", type=float, default=0.8)
    sc.add_argument("--crepe-path", default="")
    sc.add_argument("--hop-length", type=int, default=160)
    sc.add_argument("--filter-radius", type=int, default=3)
    sc.add_argument("--f0-autotune", action="store_true")
    sc.add_argument("--f0-autotune-strength", type=float, default=1.0)
    sc.add_argument("--volume-envelope", type=float, default=1.0)
    sc.add_argument("--resample-sr", type=int, default=0)
    sc.add_argument("--embedder-path", default="")
    sc.add_argument("--rmvpe-path", default="")
    sc.add_argument("--split-audio", action="store_true")
    sc.add_argument("--export-format", default="wav",
                    help="wav | flac (native) | mp3/ogg/m4a (ffmpeg)")
    sc.add_argument("--f0-onnx", action="store_true",
                    help="use .onnx F0 predictors (run on the JAX ONNX "
                         "executor); also honored when --rmvpe-path/"
                         "--fcpe-path/--crepe-path point at .onnx files")
    sc.set_defaults(func=cmd_convert)

    ss = sub.add_parser("separate")
    ss.add_argument("--model", required=True,
                    help="demucs .th checkpoint, .yaml bag, or MDX .onnx")
    ss.add_argument("--input", required=True)
    ss.add_argument("--output-vocals", required=True)
    ss.add_argument("--output-instrumental", default="")
    ss.add_argument("--shifts", type=int, default=0)
    ss.add_argument("--invert-using-spec", action="store_true")
    ss.add_argument("--mdx-n-fft", type=int, default=6144,
                    help="MDX model FFT size (from the model registry)")
    ss.add_argument("--mdx-hop", type=int, default=1024)
    ss.add_argument("--mdx-compensate", type=float, default=1.035)
    ss.add_argument("--mdx-overlap", type=float, default=0.25)
    ss.add_argument("--mdx-denoise", action="store_true")
    ss.set_defaults(func=cmd_separate)

    sm = sub.add_parser("separate-music",
                        help="full stem chain: separation + karaoke "
                             "split + dereverb (reference "
                             "separator_music.py)")
    sm.add_argument("--input", required=True)
    sm.add_argument("--output", default="./audios")
    sm.add_argument("--model-name", default="HT-Normal",
                    help="registry name (HT-Normal, Kim_Vocal_1, ...) "
                         "or a model path (.th/.yaml/.onnx)")
    sm.add_argument("--kara-model", default="Version-1")
    sm.add_argument("--reverb-model", default="Reverb_HQ")
    sm.add_argument("--backing", action="store_true")
    sm.add_argument("--reverb", action="store_true")
    sm.add_argument("--backing-reverb", action="store_true")
    sm.add_argument("--clean-audio", action="store_true")
    sm.add_argument("--clean-strength", type=float, default=0.7)
    sm.add_argument("--shifts", type=int, default=2)
    sm.add_argument("--sample-rate", type=int, default=44100)
    sm.add_argument("--export-format", default="wav")
    sm.add_argument("--mdx-denoise", action="store_true")
    sm.add_argument("--mdx-overlap", type=float, default=0.25)
    sm.add_argument("--mdx-hop", type=int, default=1024)
    sm.add_argument("--mdx-n-fft", type=int, default=6144)
    sm.set_defaults(func=cmd_separate_music)

    sd = sub.add_parser("create-dataset")
    sd.add_argument("inputs", nargs="+", help="audio paths or URLs")
    sd.add_argument("--output", default="./dataset")
    sd.add_argument("--sample-rate", type=int, default=44100)
    sd.add_argument("--skip-start", nargs="*", default=[])
    sd.add_argument("--skip-end", nargs="*", default=[])
    sd.add_argument("--separator-model", default="",
                    help="demucs .th for vocal isolation")
    sd.add_argument("--clean-dataset", action="store_true")
    sd.add_argument("--clean-strength", type=float, default=0.7)
    sd.set_defaults(func=cmd_create_dataset)

    sw = sub.add_parser("transcribe")
    sw.add_argument("--model", required=True, help="whisper .pt")
    sw.add_argument("--vocab", required=True,
                    help="multilingual.tiktoken vocab file")
    sw.add_argument("--input", required=True)
    sw.add_argument("--output", required=True)
    sw.add_argument("--language", default="en")
    sw.add_argument("--word-timestamps", action="store_true")
    sw.add_argument("--beam-size", type=int, default=None,
                    help="beam search width at temperature 0 "
                         "(reference DecodingOptions.beam_size)")
    sw.add_argument("--patience", type=float, default=None,
                    help="beam patience multiplier")
    sw.add_argument("--best-of", type=int, default=None,
                    help="independent samples kept at temperature > 0")
    sw.set_defaults(func=cmd_transcribe)

    sx = sub.add_parser("effects")
    sx.add_argument("--input", required=True)
    sx.add_argument("--output", required=True)
    from .utils.effects import EffectsSettings
    for fname, fdef in EffectsSettings.__dataclass_fields__.items():
        arg = "--" + fname.replace("_", "-")
        if fdef.type == "bool" or isinstance(fdef.default, bool):
            sx.add_argument(arg, dest=fname, action="store_true")
        else:
            sx.add_argument(arg, dest=fname,
                            type=type(fdef.default), default=fdef.default)
    sx.set_defaults(func=cmd_effects)

    sy = sub.add_parser("tts", help="text-to-speech (+ optional conversion)")
    sy.add_argument("--text", default="")
    sy.add_argument("--srt", default="", help="SRT file for timed synthesis")
    sy.add_argument("--voice", default="en-US-EmmaMultilingualNeural",
                    help="edge voice name, or language code with --google")
    sy.add_argument("--output", required=True, help="synthesized wav path")
    sy.add_argument("--rate", type=int, default=0, help="speed delta %%")
    sy.add_argument("--tts-pitch", type=int, default=0, help="pitch delta Hz")
    sy.add_argument("--google", action="store_true",
                    help="use Google translate TTS instead of edge")
    sy.add_argument("--model", default="",
                    help="voice model: also run conversion on the TTS output")
    sy.add_argument("--convert-output", default="tts_converted.wav")
    for flag, kw in (
            ("--index", dict(default="")),
            ("--sid", dict(type=int, default=0)),
            ("--pitch", dict(type=int, default=0)),
            ("--index-rate", dict(type=float, default=0.5)),
            ("--protect", dict(type=float, default=0.33)),
            ("--f0-method", dict(default="rmvpe")),
            ("--fcpe-path", dict(default="")),
            ("--crepe-path", dict(default="")),
            ("--f0-file", dict(default="")),
            ("--hop-length", dict(type=int, default=160)),
            ("--filter-radius", dict(type=int, default=3)),
            ("--f0-autotune", dict(action="store_true")),
            ("--f0-autotune-strength", dict(type=float, default=1.0)),
            ("--volume-envelope", dict(type=float, default=1.0)),
            ("--resample-sr", dict(type=int, default=0)),
            ("--embedder-path", dict(default="")),
            ("--rmvpe-path", dict(default=""))):
        sy.add_argument(flag, **kw)
    sy.set_defaults(func=cmd_tts)

    sv = sub.add_parser("diarize-convert",
                        help="multi-speaker conversion: diarize, then "
                             "alternate two voice models per speaker")
    sv.add_argument("--input", required=True)
    sv.add_argument("--output", required=True)
    sv.add_argument("--model", required=True, help="voice model A")
    sv.add_argument("--model-b", default="", help="voice model B")
    sv.add_argument("--ecapa", required=True, help="ECAPA-TDNN ckpt")
    sv.add_argument("--whisper", default="",
                    help="whisper .pt for segment boundaries (default: "
                         "energy VAD)")
    sv.add_argument("--vocab", default="", help="tiktoken vocab (w/ whisper)")
    for flag, kw in (
            ("--index", dict(default="")),
            ("--sid", dict(type=int, default=0)),
            ("--pitch", dict(type=int, default=0)),
            ("--index-rate", dict(type=float, default=0.5)),
            ("--protect", dict(type=float, default=0.33)),
            ("--f0-method", dict(default="rmvpe")),
            ("--fcpe-path", dict(default="")),
            ("--crepe-path", dict(default="")),
            ("--f0-file", dict(default="")),
            ("--hop-length", dict(type=int, default=160)),
            ("--filter-radius", dict(type=int, default=3)),
            ("--f0-autotune", dict(action="store_true")),
            ("--f0-autotune-strength", dict(type=float, default=1.0)),
            ("--volume-envelope", dict(type=float, default=1.0)),
            ("--resample-sr", dict(type=int, default=0)),
            ("--embedder-path", dict(default="")),
            ("--rmvpe-path", dict(default=""))):
        sv.add_argument(flag, **kw)
    sv.set_defaults(func=cmd_diarize_convert)

    sf = sub.add_parser("fuse")
    sf.add_argument("--model-a", required=True)
    sf.add_argument("--model-b", required=True)
    sf.add_argument("--output", required=True)
    sf.add_argument("--ratio", type=float, default=0.5)
    sf.set_defaults(func=cmd_fuse)

    sn = sub.add_parser("info")
    sn.add_argument("--model", required=True)
    sn.set_defaults(func=cmd_info)

    so = sub.add_parser("export-onnx",
                        help="export an interchange .pth to .onnx "
                             "(reference onnx_export.py equivalent)")
    so.add_argument("--model", required=True, help="interchange .pth")
    so.add_argument("--output", required=True, help="output .onnx path")
    so.add_argument("--static", action="store_true",
                    help="emit a shape-specialized graph of --max-frames "
                         "capacity instead of the default dynamic axes")
    so.add_argument("--max-frames", type=int, default=800,
                    help="frame capacity of a --static graph (dynamic "
                         "graphs serve any length >= 21 frames)")
    so.set_defaults(func=cmd_export_onnx)

    sa = sub.add_parser("edit",
                        help="prompt-based audio editing via DDPM "
                             "inversion (reference audioldm2.py; the "
                             "diffusion checkpoint stack is "
                             "download-gated)")
    sa.add_argument("--input-path", required=True)
    sa.add_argument("--output-path", default="./output.wav")
    sa.add_argument("--export-format", default="wav")
    sa.add_argument("--sample-rate", type=int, default=44100)
    sa.add_argument("--model", default="audioldm2-music",
                    choices=["audioldm2", "audioldm2-large",
                             "audioldm2-music"])
    sa.add_argument("--source-prompt", default="")
    sa.add_argument("--target-prompt", default="")
    sa.add_argument("--steps", type=int, default=50)
    sa.add_argument("--cfg-scale-src", type=float, default=3.5)
    sa.add_argument("--cfg-scale-tar", type=float, default=12.0)
    sa.add_argument("--t-start", type=int, default=45)
    sa.add_argument("--save-compute", action="store_true", default=True)
    sa.add_argument("--toy-stack", action="store_true",
                    help="use the self-contained toy latent stack "
                         "(no pretrained weights; for testing)")
    sa.set_defaults(func=cmd_edit)

    sb = sub.add_parser("tensorboard")
    sb.add_argument("--logdir", required=True)
    sb.add_argument("--port", type=int, default=6006)
    sb.set_defaults(func=cmd_tensorboard)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
