"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-host/multi-chip code paths are exercised without a pod slice via
XLA's host-platform device-count flag (SURVEY.md §4 point 3).  Must run
before the first `import jax` anywhere in the test session.
"""

import os

# force CPU: the surrounding environment pins JAX_PLATFORMS=axon (a
# tunneled TPU with slow remote compiles) and its sitecustomize register()
# sets jax_platforms programmatically at interpreter start — unit tests
# must stay local, so override via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 parity mode: make MXU-path matmuls use full float32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# two-lane suite: tests measured >= 5 s (full-suite --durations run,
# re-derived 2026-08-22, 2-vCPU host) are auto-marked `slow`, so
#     pytest -m "not slow"      finishes in ~6-8 min (the iterating lane)
#     pytest                    runs everything (~43 min, CI / pre-land)
# The manifest lists "file::function" (parametrized cases share their
# function's mark).  Re-derive with `pytest --durations=0` when the
# balance drifts.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_app.py::test_convert_endpoint",
    "test_app.py::test_convert_whisper_endpoint",
    "test_app.py::test_export_onnx_and_onnx_convert_endpoint",
    "test_app.py::test_model_info_endpoint",
    "test_app.py::test_precision_setting_reaches_pipeline",
    "test_app.py::test_tts_endpoint_with_conversion",
    "test_audioldm2_stack.py::test_full_stack_edit_end_to_end",
    "test_audioldm2_stack.py::test_load_components_from_synthetic_checkpoint_dir",
    "test_audioldm2_stack.py::test_speecht5_hifigan_parity",
    "test_audioldm2_stack.py::test_stack_inversion_reconstruction_identity",
    "test_audioldm2_stack.py::test_unet_conditioning_matters",
    "test_audioldm2_stack.py::test_vae_shapes_and_scaling",
    "test_audioldm2_text.py::test_generate_language_model_matches_manual_loop",
    "test_audioldm2_unet.py::test_attention_less_blocks_import_and_run",
    "test_audioldm2_unet.py::test_every_key_consumed_and_config_inferred",
    "test_audioldm2_unet.py::test_stream_routing",
    "test_batcher.py::test_batcher_mixed_lengths_and_sids",
    "test_bf16_mode.py::test_bf16_close_to_fp32",
    "test_bf16_mode.py::test_bf16_mel_distance_gate",
    "test_blocked_conv.py::test_matches_conv1d",
    "test_crepe_parity.py::test_onnx_export_dynamic_frames",
    "test_demucs_load.py::test_load_bag",
    "test_demucs_load.py::test_load_th_and_forward",
    "test_demucs_parity.py::test_htdemucs_forward_parity",
    "test_diarize.py::test_convert_with_diarization_end_to_end",
    "test_ecapa_parity.py::test_embedding_parity",
    "test_f0_dispatch.py::test_method_dispatch",
    "test_f0_onnx.py::test_pipeline_stage_with_onnx_rmvpe",
    "test_f0_onnx.py::test_rmvpe_export_dynamic_frames",
    "test_f0_onnx.py::test_rmvpe_onnx_matches_native",
    "test_fcpe_parity.py::test_full_infer_parity",
    "test_fcpe_parity.py::test_onnx_export_dynamic_frames",
    "test_folded_conv.py::test_folded_conv_matches_plain",
    "test_folded_conv.py::test_generator_nsf_folded_matches_plain",
    "test_folded_conv2d.py::test_rmvpe_e2e_fold_matches_plain",
    "test_generator_plain.py::test_f0less_train_forward",
    "test_generator_plain.py::test_infer_f0less_runs",
    "test_golden_mute.py::test_our_mute_fixture_matches_golden_layout",
    "test_hubert_parity.py::test_conv_frontend_parity",
    "test_hubert_parity.py::test_extract_features_parity",
    "test_hubert_parity.py::test_padded_batch_matches_unpadded",
    "test_hubert_transformers.py::test_load_transformers_file",
    "test_hubert_transformers.py::test_transformers_import_forward_parity",
    "test_hubert_transformers.py::test_transformers_intermediate_layer",
    "test_int8_decode.py::test_int8_audit_flags_hot_input",
    "test_int8_decode.py::test_int8_decode_quality_gate",
    "test_int8_decode.py::test_int8_hubert_features_close_and_scoped",
    "test_int8_decode.py::test_pipeline_threads_int8",
    "test_interop_roundtrip.py::test_export_import_roundtrip",
    "test_interop_roundtrip.py::test_reference_loads_our_export",
    "test_mdx.py::test_stft_istft_slice_path_matches_gather_path",
    "test_mesh_convert.py::test_mesh_convert_matches_single_device",
    "test_multihost.py::test_two_process_dryrun",
    "test_onnx_embedder.py::test_dynamic_feature_parity_any_length",
    "test_onnx_embedder.py::test_feature_parity",
    "test_onnx_embedder.py::test_n_frames_matches_frontend",
    "test_onnx_embedder.py::test_pipeline_equivalence",
    "test_onnx_voice.py::test_convert_pipeline_onnx_equals_pth",
    "test_onnx_voice.py::test_dynamic_convert_pipeline_equals_pth",
    "test_onnx_voice.py::test_dynamic_exact_parity_any_length",
    "test_onnx_voice.py::test_dynamic_short_chunk_pads_to_band_minimum",
    "test_onnx_voice.py::test_waveform_parity_exact_at_capacity",
    "test_onnx_voice.py::test_waveform_parity_vs_jax",
    "test_pallas_resblock.py::test_generator_nsf_integration",
    "test_pallas_resblock.py::test_matches_xla_resblock",
    "test_pipeline_roundtrip.py::test_full_pipeline_roundtrip",
    "test_presets.py::test_f0_file_overrides_contour",
    "test_pretrained_import.py::test_discriminator_import_and_apply",
    "test_production_shapes.py::test_infer_parity_production",
    "test_production_shapes.py::test_mrf_hifigan_parity_production",
    "test_production_shapes.py::test_refinegan_parity_production",
    "test_production_shapes.py::test_train_forward_parity_production",
    "test_rmvpe_parity.py::test_e2e_salience_parity",
    "test_rmvpe_parity.py::test_full_infer_pipeline_parity",
    "test_rmvpe_parity.py::test_int8_unet_close_to_fp32",
    "test_scan_microbatch.py::test_host_f0_still_loops",
    "test_scan_microbatch.py::test_scan_equals_loop",
    "test_separate.py::test_chunked_apply_shapes",
    "test_separate.py::test_hdemucs_forward_parity",
    "test_separate.py::test_separate_vocals_entry",
    "test_separate.py::test_shift_averaging_runs",
    "test_synthesizer_parity.py::test_generator_nsf_parity",
    "test_synthesizer_parity.py::test_train_forward_shapes",
    "test_tensor_parallel.py::test_tp_matches_single_device",
    "test_tensor_parallel.py::test_tp_v1_final_proj",
    "test_train_loop.py::test_eval_sample_logging_produces_audio_and_mel",
    "test_train_loop.py::test_train_loop_end_to_end",
    "test_train_step.py::test_bf16_remat_composes",
    "test_train_step.py::test_bf16_step_tracks_fp32",
    "test_train_step.py::test_remat_step_matches_plain",
    "test_train_step.py::test_sharded_step_matches_single_device",
    "test_train_step.py::test_share_fwd_matches_legacy_two_forward",
    "test_train_step.py::test_single_device_step_runs_and_updates",
    "test_validate_real_weights.py::test_validator_end_to_end",
    "test_vocoder_training.py::test_alt_vocoder_export_import_roundtrip",
    "test_vocoder_training.py::test_train_step_alt_vocoder",
    "test_vocoder_training.py::test_train_step_f0less",
    "test_vocoders_parity.py::test_interp_linear_matches_torch",
    "test_vocoders_parity.py::test_mrf_hifigan_parity",
    "test_vocoders_parity.py::test_refinegan_parity",
    "test_whisper_align.py::test_find_alignment_parity",
    "test_whisper_parity.py::test_cached_greedy_matches_full_decode",
    "test_wiener.py::test_non_cac_forward_parity",
    "test_wiener.py::test_wiener_mask_windowing_consistent",
    "test_wiener.py::test_wiener_matches_reference",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.function.__name__}"
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
