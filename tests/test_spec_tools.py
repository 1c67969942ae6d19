"""spec_utils equivalence: exact parity on the pure-numpy pieces
(reference functions exec'd from source), same-STFT parity on the
multi-band (VR model-parameter) flow, property tests for the spectral
inversion / ensembling / alignment tooling."""

import ast
import textwrap
import types

import numpy as np
import pytest

from rvc_maker_tpu.pipelines import spec_tools as st

REF_PATH = "/root/reference/main/library/uvr5_separator/spec_utils.py"

TRANSLATIONS = {
    "not_success": "not_success", "warnings": "warnings",
    "warnings_2": "warnings_2", "resample_error": "resample_error",
    "shapes": "shapes", "wav_resolution": "wav_resolution",
    "assert": "mix {mixshape} vs inst {instrumentalshape}",
    "process_file": "process", "save_instruments": "saving",
}


def _extract(wanted, extra_ns=None):
    """Exec just the wanted reference function sources (its module-level
    imports — librosa/soundfile/six — are absent from this image)."""
    src = open(REF_PATH).read()
    tree = ast.parse(src)
    ns = {"np": np, "translations": TRANSLATIONS,
          "MIN_SPEC": "Min Spec", "MAX_SPEC": "Max Spec",
          "NONE_P": ("None",), "wav_resolution": "sinc_fastest"}
    if extra_ns:
        ns.update(extra_ns)
    found = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(textwrap.dedent(ast.get_source_segment(src, node)), ns)
            found.add(node.name)
    assert set(wanted) <= found
    return ns


def _fake_librosa():
    lib = types.SimpleNamespace()
    lib.stft = lambda wave, n_fft=2048, hop_length=1024: \
        st._stft_np(wave, n_fft, hop_length)
    lib.istft = lambda spec, hop_length=1024: st._istft_np(spec, hop_length)
    lib.resample = lambda y, orig_sr, target_sr, res_type=None: \
        st._resample(y, orig_sr, target_sr)
    return lib


@pytest.fixture(scope="module")
def ref_spec():
    return _extract(["normalize", "to_shape", "to_shape_minimize",
                     "reduce_vocal_aggressively", "invert_audio",
                     "make_padding", "merge_artifacts", "mirroring",
                     "adjust_aggr", "ensembling", "detect_leading_silence",
                     "adjust_leading_silence", "match_array_shapes",
                     "match_mono_array_shapes", "average_dual_sources",
                     "reshape_sources", "reshape_sources_ref",
                     "combine_arrarys", "organize_inputs",
                     "check_if_phase_inverted", "phase_shift_hilbert",
                     "get_phase_shifted_tracks", "ensemble_wav",
                     "ensemble_wav_min", "align_audio_test",
                     "get_lp_filter_mask", "get_hp_filter_mask",
                     "fft_lp_filter", "fft_hp_filter", "preprocess",
                     "auto_transpose", "spectrogram_to_image",
                     "crop_center"],
                    extra_ns={"hilbert": __import__("scipy.signal",
                                                    fromlist=["hilbert"]
                                                    ).hilbert})


# ------------------------------------------------------------ small helpers


def test_normalize_parity(ref_spec):
    rs = np.random.RandomState(0)
    for scale in (0.3, 1.7):
        w = (rs.randn(2, 1000) * scale).astype(np.float32)
        np.testing.assert_allclose(st.normalize(w.copy()),
                                   ref_spec["normalize"](w.copy()))


def test_make_padding_parity(ref_spec):
    for args in [(1000, 256, 32), (777, 512, 0), (64, 64, 32)]:
        assert st.make_padding(*args) == ref_spec["make_padding"](*args)


def test_preprocess_auto_transpose_crop_center(ref_spec):
    rs = np.random.RandomState(5)
    z = rs.randn(2, 5, 7) + 1j * rs.randn(2, 5, 7)
    m_ours, p_ours = st.preprocess(z)
    m_ref, p_ref = ref_spec["preprocess"](z)
    np.testing.assert_allclose(m_ours, m_ref)
    np.testing.assert_allclose(p_ours, p_ref)

    a = rs.randn(100, 2)
    np.testing.assert_allclose(st.auto_transpose(a),
                               ref_spec["auto_transpose"](a))

    # crop_center: reference is torch (.size()); same slicing on arrays
    h1 = rs.randn(1, 3, 4, 20)
    h2 = rs.randn(1, 3, 4, 12)
    np.testing.assert_allclose(st.crop_center(h1, h2), h1[:, :, :, 4:16])
    with pytest.raises(ValueError):
        st.crop_center(h2, h1)


def test_reduce_vocal_aggressively_parity(ref_spec):
    rs = np.random.RandomState(1)
    X = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    y = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    np.testing.assert_allclose(
        st.reduce_vocal_aggressively(X, y, 0.2),
        ref_spec["reduce_vocal_aggressively"](X, y, 0.2))


def test_invert_audio_parity(ref_spec):
    rs = np.random.RandomState(2)
    a = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    b = rs.randn(2, 65, 28) + 1j * rs.randn(2, 65, 28)
    np.testing.assert_allclose(st.invert_audio([a.copy(), b.copy()]),
                               ref_spec["invert_audio"]([a.copy(), b.copy()]))
    np.testing.assert_allclose(
        st.invert_audio([a.copy(), b.copy()], invert_p=False),
        ref_spec["invert_audio"]([a.copy(), b.copy()], invert_p=False))


def test_merge_artifacts_parity(ref_spec):
    rs = np.random.RandomState(3)
    mask = rs.rand(2, 16, 600).astype(np.float32)
    mask[:, :, 100:300] = 0.5          # one long artifact region
    mask[:, :, 350:360] = 0.001        # below threshold gap
    ours = st.merge_artifacts(mask.copy(), thres=0.01, min_range=64,
                              fade_size=32)
    ref = ref_spec["merge_artifacts"](mask.copy(), thres=0.01, min_range=64,
                                      fade_size=32)
    np.testing.assert_allclose(ours, ref)
    # invalid params: both sides return input unchanged
    np.testing.assert_allclose(
        st.merge_artifacts(mask.copy(), min_range=10, fade_size=32),
        ref_spec["merge_artifacts"](mask.copy(), min_range=10, fade_size=32))


def test_filter_masks_parity(ref_spec):
    np.testing.assert_allclose(st.get_lp_filter_mask(1025, 300, 400),
                               ref_spec["get_lp_filter_mask"](1025, 300, 400))
    np.testing.assert_allclose(st.get_hp_filter_mask(1025, 150, 99),
                               ref_spec["get_hp_filter_mask"](1025, 150, 99))
    rs = np.random.RandomState(4)
    spec = rs.randn(2, 513, 20) + 1j * rs.randn(2, 513, 20)
    # atol: the reference's sequential `g -= 1/n` leaves ~1e-16 residue
    # at the last ramp bin where the closed-form ramp is exactly 0
    np.testing.assert_allclose(
        st.fft_lp_filter(spec.copy(), 300, 400),
        ref_spec["fft_lp_filter"](spec.copy(), 300, 400), atol=1e-12)
    np.testing.assert_allclose(
        st.fft_hp_filter(spec.copy(), 150, 99),
        ref_spec["fft_hp_filter"](spec.copy(), 150, 99), atol=1e-12)


def test_mirroring_parity(ref_spec):
    rs = np.random.RandomState(6)
    mp = st.ModelParameters({"bins": 512, "band": {},
                             "pre_filter_start": 400,
                             "pre_filter_stop": 500})
    spec_m = rs.randn(2, 513, 10) + 1j * rs.randn(2, 513, 10)
    high = rs.randn(2, 50, 10) + 1j * rs.randn(2, 50, 10)
    for mode in ("mirroring", "mirroring2"):
        np.testing.assert_allclose(
            st.mirroring(mode, spec_m, high, mp),
            ref_spec["mirroring"](mode, spec_m, high, mp))


def test_adjust_aggr_parity(ref_spec):
    rs = np.random.RandomState(7)
    mask = rs.rand(2, 100, 8)
    aggr = {"value": 0.3, "split_bin": 40,
            "aggr_correction": {"left": 0.05, "right": -0.05}}
    np.testing.assert_allclose(
        st.adjust_aggr(mask.copy(), False, dict(aggr)),
        ref_spec["adjust_aggr"](mask.copy(), False, dict(aggr)))
    np.testing.assert_allclose(
        st.adjust_aggr(mask.copy(), True, dict(aggr)),
        ref_spec["adjust_aggr"](mask.copy(), True, dict(aggr)))


def test_ensembling_parity(ref_spec):
    rs = np.random.RandomState(8)
    specs = [rs.randn(2, 33, 20 + i) + 1j * rs.randn(2, 33, 20 + i)
             for i in range(3)]
    for alg in ("Min Spec", "Max Spec"):
        np.testing.assert_allclose(
            st.ensembling(alg, [s.copy() for s in specs]),
            ref_spec["ensembling"](alg, [s.copy() for s in specs]))
    waves = [rs.randn(2, 500 + i * 7) for i in range(3)]
    for alg in ("Min Spec", "Max Spec"):
        np.testing.assert_allclose(
            st.ensembling(alg, [w.copy() for w in waves], is_wavs=True),
            ref_spec["ensembling"](alg, [w.copy() for w in waves],
                                   is_wavs=True))


def test_shape_and_silence_helpers_parity(ref_spec):
    rs = np.random.RandomState(9)
    x = rs.randn(2, 80)
    np.testing.assert_allclose(st.to_shape_minimize(x, (2, 100)),
                               ref_spec["to_shape_minimize"](x, (2, 100)))

    audio = np.zeros(8000, np.float32)
    audio[3000:] = 0.4
    assert st.detect_leading_silence(audio, 16000) == \
        ref_spec["detect_leading_silence"](audio, 16000)
    stereo = np.stack([audio, audio * 0.5])
    assert st.detect_leading_silence(stereo, 16000) == \
        ref_spec["detect_leading_silence"](stereo, 16000)

    target = np.zeros(8000, np.float32)
    target[1000:] = 0.4
    np.testing.assert_allclose(
        st.adjust_leading_silence(target.copy(), audio.copy()),
        ref_spec["adjust_leading_silence"](target.copy(), audio.copy()))
    np.testing.assert_allclose(
        st.adjust_leading_silence(audio.copy(), target.copy()),
        ref_spec["adjust_leading_silence"](audio.copy(), target.copy()))

    a, b = rs.randn(2, 50), rs.randn(2, 70)
    np.testing.assert_allclose(st.match_array_shapes(a.copy(), b),
                               ref_spec["match_array_shapes"](a.copy(), b))
    np.testing.assert_allclose(
        st.match_array_shapes(a.T.copy(), b.T, is_swap=True),
        ref_spec["match_array_shapes"](a.T.copy(), b.T, is_swap=True))
    m1, m2 = rs.randn(50), rs.randn(70)
    np.testing.assert_allclose(st.match_mono_array_shapes(m1.copy(), m2),
                               ref_spec["match_mono_array_shapes"](m1.copy(),
                                                                   m2))


def test_source_combination_parity(ref_spec):
    rs = np.random.RandomState(10)
    a, b = rs.randn(2, 100), rs.randn(2, 80)
    np.testing.assert_allclose(
        st.average_dual_sources(a.copy(), b.copy(), 0.3),
        ref_spec["average_dual_sources"](a.copy(), b.copy(), 0.3))
    np.testing.assert_allclose(st.reshape_sources(a.copy(), b.copy()),
                               ref_spec["reshape_sources"](a.copy(),
                                                           b.copy()))
    np.testing.assert_allclose(
        st.reshape_sources_ref((2, 120), b.copy()),
        ref_spec["reshape_sources_ref"]((2, 120), b.copy()))
    srcs = [rs.randn(2, 60), rs.randn(2, 100), rs.randn(2, 80)]
    np.testing.assert_allclose(
        st.combine_arrarys([s.copy() for s in srcs]),
        ref_spec["combine_arrarys"]([s.copy() for s in srcs]))

    files = ["a_(Vocals).wav", "x_RVC_out.wav", "reverbed_stem.wav",
             "b_(Instrumental).wav"]
    assert st.organize_inputs(files) == ref_spec["organize_inputs"](files)


def test_phase_helpers_parity(ref_spec):
    rs = np.random.RandomState(11)
    w1 = rs.randn(2, 2000)
    assert st.check_if_phase_inverted(w1, -w1) == \
        ref_spec["check_if_phase_inverted"](w1, -w1)
    assert st.check_if_phase_inverted(w1, w1) == \
        ref_spec["check_if_phase_inverted"](w1, w1)

    sig = rs.randn(1024)
    for deg in (45, 90, -60):
        np.testing.assert_allclose(st.phase_shift_hilbert(sig, deg),
                                   ref_spec["phase_shift_hilbert"](sig, deg))
    for shift in (180, 90):
        ours = st.get_phase_shifted_tracks(sig, shift)
        ref = ref_spec["get_phase_shifted_tracks"](sig, shift)
        assert len(ours) == len(ref)
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o, r)


def test_ensemble_wav_parity(ref_spec):
    rs = np.random.RandomState(12)
    waves = [rs.randn(4800) * s for s in (1.0, 0.5, 2.0)]
    np.testing.assert_allclose(
        st.ensemble_wav([w.copy() for w in waves], split_size=12),
        ref_spec["ensemble_wav"]([w.copy() for w in waves], split_size=12))
    np.testing.assert_allclose(
        st.ensemble_wav_min([w.copy() for w in waves]),
        ref_spec["ensemble_wav_min"]([w.copy() for w in waves]))


def test_align_audio_test_parity(ref_spec):
    rs = np.random.RandomState(13)
    base = rs.randn(2, 44100 * 3).astype(np.float32) * 0.3
    shifted = np.concatenate([np.zeros((2, 500), np.float32),
                              base[:, :-500]], axis=1)
    np.testing.assert_allclose(st.align_audio_test(base.copy(),
                                                   shifted.copy()),
                               ref_spec["align_audio_test"](base.copy(),
                                                            shifted.copy()))


def test_spectrogram_to_image(ref_spec):
    rs = np.random.RandomState(14)
    spec = rs.randn(2, 64, 40) + 1j * rs.randn(2, 64, 40)
    for mode in ("magnitude", "phase"):
        np.testing.assert_array_equal(
            st.spectrogram_to_image(spec, mode),
            ref_spec["spectrogram_to_image"](spec, mode))


# -------------------------------------------- STFT layer + inversion chain


def test_stft_istft_roundtrip():
    rs = np.random.RandomState(3)
    w = (rs.randn(2, 40960) * 0.3).astype(np.float32)
    spec = st.wave_to_spectrogram(w)
    back = st.spectrogram_to_wave(spec, length=w.shape[1])
    np.testing.assert_allclose(back[:, 1024:-1024], w[:, 1024:-1024],
                               atol=1e-4)


def test_invert_stem_properties():
    rs = np.random.RandomState(4)
    mix = (rs.randn(2, 32768) * 0.3).astype(np.float32)
    out = st.invert_stem(mix, mix)
    assert np.abs(out[1024:-1024]).max() < 1e-4
    out2 = st.invert_stem(mix, np.zeros_like(mix))
    np.testing.assert_allclose(out2[1024:-1024], mix.T[1024:-1024],
                               atol=1e-3)


def test_reshape_sources():
    a = np.zeros((2, 100))
    b = np.zeros((2, 80))
    assert st.reshape_sources(a, b).shape == (2, 100)
    c = np.zeros((2, 130))
    assert st.reshape_sources(a, c).shape == (2, 100)


def test_spec_effects_parity():
    """Exec the reference spec_effects with our stft/istft injected —
    identical transform on both sides isolates the combine logic."""
    ns = _extract(["spec_effects"],
                  extra_ns={"stft": st.stft, "istft": st.istft})
    rs = np.random.RandomState(15)
    pair = [rs.randn(2, 8192).astype(np.float32) * 0.3,
            rs.randn(2, 8192).astype(np.float32) * 0.3]
    for alg, val in [("Min_Mag", None), ("Max_Mag", None),
                     ("Default", 0.25), ("Invert_p", None)]:
        np.testing.assert_allclose(
            st.spec_effects([p.copy() for p in pair], alg, val),
            ns["spec_effects"]([p.copy() for p in pair], alg, val),
            atol=1e-6)


# ----------------------------------------------------- multi-band (VR) flow


def _two_band_mp():
    return st.ModelParameters({
        "bins": 1025,
        "pre_filter_start": 1000, "pre_filter_stop": 1020,
        "band": {
            1: {"sr": 22050, "hl": 512, "n_fft": 1024,
                "crop_start": 0, "crop_stop": 400,
                "lpf_start": 300, "lpf_stop": 380,
                "hpf_start": 0, "hpf_stop": 0},
            2: {"sr": 44100, "hl": 1024, "n_fft": 2048,
                "crop_start": 100, "crop_stop": 725,
                "hpf_start": 150, "hpf_stop": 100,
                "lpf_start": 0, "lpf_stop": 0},
        }})


@pytest.fixture(scope="module")
def ref_band():
    lib = _fake_librosa()
    ns = _extract(["convert_channels", "combine_spectrograms",
                   "wave_to_spectrogram", "spectrogram_to_wave",
                   "cmb_spectrogram_to_wave", "get_lp_filter_mask",
                   "get_hp_filter_mask", "fft_lp_filter", "fft_hp_filter"],
                  extra_ns={"librosa": lib, "math": __import__("math")})
    return ns


@pytest.mark.parametrize("mode", ["plain", "reverse", "mid_side",
                                  "mid_side_b2"])
def test_band_wave_spectrogram_parity(ref_band, mode):
    rs = np.random.RandomState(16)
    wave = rs.randn(2, 16384).astype(np.float32) * 0.3
    param = {"bins": 1025, "band": {1: {}},
             "reverse": mode == "reverse",
             "mid_side": mode == "mid_side",
             "mid_side_b2": mode == "mid_side_b2"}
    mp = st.ModelParameters(param)
    ours = st.wave_to_spectrogram(wave, 512, 1024, mp, 1)
    ref = ref_band["wave_to_spectrogram"](wave, 512, 1024, mp, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_w = st.spectrogram_to_wave(ours, 512, mp, 1, False)
    ref_w = ref_band["spectrogram_to_wave"](ref, 512, mp, 1, False)
    np.testing.assert_allclose(ours_w, ref_w, atol=1e-5)


@pytest.mark.parametrize("cc", ["mid_side_c", "mid_side", "stereo_n"])
def test_v51_channel_modes_parity(ref_band, cc):
    rs = np.random.RandomState(17)
    wave = rs.randn(2, 16384).astype(np.float32) * 0.3
    mp = st.ModelParameters({"bins": 512,
                             "band": {1: {"convert_channels": cc}}})
    ours = st.wave_to_spectrogram(wave, 512, 1024, mp, 1, is_v51_model=True)
    ref = ref_band["wave_to_spectrogram"](wave, 512, 1024, mp, 1,
                                          is_v51_model=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_w = st.spectrogram_to_wave(ours, 512, mp, 1, True)
    ref_w = ref_band["spectrogram_to_wave"](ref, 512, mp, 1, True)
    np.testing.assert_allclose(ours_w, ref_w, atol=1e-5)


def test_combine_and_cmb_roundtrip_parity(ref_band):
    rs = np.random.RandomState(18)
    mp = _two_band_mp()
    t = 24
    specs = {1: (rs.randn(2, 513, t) + 1j * rs.randn(2, 513, t)
                 ).astype(np.complex64),
             2: (rs.randn(2, 1025, t) + 1j * rs.randn(2, 1025, t)
                 ).astype(np.complex64)}
    ours_c = st.combine_spectrograms({k: v.copy() for k, v in specs.items()},
                                     mp)
    ref_c = ref_band["combine_spectrograms"](
        {k: v.copy() for k, v in specs.items()}, mp)
    np.testing.assert_allclose(ours_c, ref_c, atol=1e-5)

    ours_w = st.cmb_spectrogram_to_wave(ours_c.copy(), mp)
    ref_w = ref_band["cmb_spectrogram_to_wave"](ref_c.copy(), mp)
    assert ours_w.shape == ref_w.shape
    np.testing.assert_allclose(ours_w, ref_w, atol=1e-4)


def test_time_correction_parity():
    ns = _extract(["time_correction", "ensemble_wav",
                   "get_phase_shifted_tracks", "phase_shift_hilbert"],
                  extra_ns={"correlate": __import__(
                      "scipy.signal", fromlist=["correlate"]).correlate,
                      "hilbert": __import__(
                          "scipy.signal", fromlist=["hilbert"]).hilbert})
    rs = np.random.RandomState(19)
    sr = 4000
    mix = rs.randn(sr * 2).astype(np.float64) * 0.3
    inst = np.roll(mix, 37) + rs.randn(sr * 2) * 0.01
    ours = st.time_correction(mix.copy(), inst.copy(), 2,
                              align_window=[0.5], db_analysis=(0.0, [0.0]),
                              sr=sr, unique_sources=1, phase_shifts=190)
    ref = ns["time_correction"](mix.copy(), inst.copy(), 2,
                                align_window=[0.5],
                                db_analysis=(0.0, [0.0]), sr=sr,
                                unique_sources=1, phase_shifts=190)
    np.testing.assert_allclose(ours, ref)


# ------------------------------------------------------------ file-level IO


def test_write_array_to_mem_roundtrip():
    from scipy.io import wavfile

    rs = np.random.RandomState(20)
    audio = (rs.randn(1000, 2) * 0.3).astype(np.float32)
    buf = st.write_array_to_mem(audio, subtype="FLOAT")
    sr, back = wavfile.read(buf)
    assert sr == 44100
    np.testing.assert_allclose(back, audio, atol=1e-6)
    assert st.write_array_to_mem("path.wav", "PCM_16") == "path.wav"


def test_change_pitch_and_stretch():
    sr = 22050
    t = np.arange(sr, dtype=np.float64) / sr
    tone = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    y, new_sr = st.change_pitch_semitones(np.stack([tone, tone]), sr, 12.0)
    assert abs(new_sr - sr * 2) < 1e-6
    assert abs(y.shape[1] - 2 * sr) <= 2
    stretched = st.time_stretch(tone, sr, 2.0)      # 2x tempo -> half length
    assert abs(len(stretched) - sr // 2) <= 2
    shifted = st.pitch_shift(tone, sr, 12.0)        # +1 octave, same length
    assert len(shifted) == len(tone)
    # dominant frequency doubles
    spec = np.abs(np.fft.rfft(shifted[2000:-2000] * np.hanning(
        len(shifted) - 4000)))
    peak_hz = np.argmax(spec) * sr / (len(shifted) - 4000)
    assert 400 < peak_hz < 480


def test_file_ensembles(tmp_path):
    from rvc_maker_tpu.utils.audio import save_wav

    rs = np.random.RandomState(21)
    paths = []
    for i, n in enumerate((44100, 44100, 40000)):
        w = (rs.randn(n, 2) * 0.2).astype(np.float32)
        p = str(tmp_path / f"in{i}.wav")
        save_wav(p, w, 44100, subtype="float32")
        paths.append(p)

    avg = st.average_audio(paths)
    assert avg.shape == (2, 44100)

    out = str(tmp_path / "ens.wav")
    st.ensemble_inputs(paths, "Average", 1.0, "FLOAT", out)
    got = st.load_audio(out)
    np.testing.assert_allclose(got, np.clip(avg, -1, 1), atol=1e-3)

    st.ensemble_inputs(paths, "Min Spec", 1.0, "FLOAT",
                       str(tmp_path / "min.wav"))
    assert st.load_audio(str(tmp_path / "min.wav")).shape[0] == 2

    st.combine_audio(paths, str(tmp_path / "comb"), "FLOAT")
    comb = st.load_audio(str(tmp_path / "comb_combined.wav"))
    assert comb.shape == (2, 44100)


def test_augment_audio(tmp_path):
    from rvc_maker_tpu.utils.audio import save_wav

    sr = 44100
    t = np.arange(sr, dtype=np.float64) / sr
    tone = (np.sin(2 * np.pi * 220.0 * t) * 0.5).astype(np.float32)
    src = str(tmp_path / "tone.wav")
    save_wav(src, np.stack([tone, tone], axis=1), sr, subtype="float32")

    out = str(tmp_path / "fast.wav")
    st.augment_audio(out, src, 2.0, 1.0, "FLOAT")  # 2x tempo
    got = st.load_audio(out)
    assert abs(got.shape[1] - sr // 2) < 100

    out2 = str(tmp_path / "pitch.wav")
    st.augment_audio(out2, src, 12.0, 1.0, "FLOAT", is_pitch=True)
    got2 = st.load_audio(out2)
    assert got2.shape[1] == sr

    out3 = str(tmp_path / "semis.wav")
    st.augment_audio(out3, src, 12.0, 1.0, "FLOAT",
                     is_time_correction=False)
    got3 = st.load_audio(out3)
    assert abs(got3.shape[1] - sr // 2) < 100


def test_align_audio_end_to_end(tmp_path):
    from rvc_maker_tpu.utils.audio import save_wav

    rs = np.random.RandomState(22)
    sr = 44100
    mix = (rs.randn(sr * 3) * 0.2).astype(np.float32)
    inst = np.concatenate([np.zeros(300, np.float32), mix[:-300]])
    f1, f2 = str(tmp_path / "mix.wav"), str(tmp_path / "inst.wav")
    save_wav(f1, np.stack([mix, mix], axis=1), sr, subtype="float32")
    save_wav(f2, np.stack([inst, inst], axis=1), sr, subtype="float32")

    aligned = str(tmp_path / "aligned.wav")
    subtracted = str(tmp_path / "sub.wav")
    st.align_audio(f1, f2, aligned, subtracted, "FLOAT",
                   is_save_aligned=True, command_Text=None,
                   save_format=None, align_window=[],
                   align_intro_val=[1], db_analysis=(0.0, [0.0]),
                   set_progress_bar=None, phase_option="Positive Phase",
                   phase_shifts=190, is_match_silence=False,
                   is_spec_match=False)
    sub = st.load_audio(subtracted)
    # perfectly re-aligned identical content -> near-silent subtraction
    assert np.abs(sub).mean() < 0.01
