"""spec_utils subset: exact parity on the pure-numpy pieces, property
tests for the spectral-inversion flow."""

import numpy as np
import pytest

from rvc_maker_tpu.pipelines import spec_tools as st


@pytest.fixture(scope="module")
def ref_spec():
    """Load the reference spec_utils pure functions without its module
    imports (librosa/soundfile/six are absent) by exec'ing just the
    function sources we compare against."""
    import ast
    import textwrap

    src = open("/root/reference/main/library/uvr5_separator/spec_utils.py"
               ).read()
    tree = ast.parse(src)
    wanted = {"normalize", "to_shape", "reduce_vocal_aggressively",
              "invert_audio"}
    ns = {"np": np}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(textwrap.dedent(ast.get_source_segment(src, node)), ns)
    assert wanted <= set(ns)
    return ns


def test_normalize_parity(ref_spec):
    rs = np.random.RandomState(0)
    for scale in (0.3, 1.7):
        w = (rs.randn(2, 1000) * scale).astype(np.float32)
        ours = st.normalize(w.copy())
        ref = ref_spec["normalize"](w.copy())
        np.testing.assert_allclose(ours, ref)


def test_reduce_vocal_aggressively_parity(ref_spec):
    rs = np.random.RandomState(1)
    X = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    y = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    ours = st.reduce_vocal_aggressively(X, y, 0.2)
    ref = ref_spec["reduce_vocal_aggressively"](X, y, 0.2)
    np.testing.assert_allclose(ours, ref)


def test_invert_audio_parity(ref_spec):
    rs = np.random.RandomState(2)
    a = rs.randn(2, 65, 30) + 1j * rs.randn(2, 65, 30)
    b = rs.randn(2, 65, 28) + 1j * rs.randn(2, 65, 28)
    ours = st.invert_audio([a.copy(), b.copy()])
    ref = ref_spec["invert_audio"]([a.copy(), b.copy()])
    np.testing.assert_allclose(ours, ref)
    ours2 = st.invert_audio([a.copy(), b.copy()], invert_p=False)
    ref2 = ref_spec["invert_audio"]([a.copy(), b.copy()], invert_p=False)
    np.testing.assert_allclose(ours2, ref2)


def test_stft_istft_roundtrip():
    rs = np.random.RandomState(3)
    w = (rs.randn(2, 40960) * 0.3).astype(np.float32)
    spec = st.wave_to_spectrogram(w)
    back = st.spectrogram_to_wave(spec, length=w.shape[1])
    # centered hann at 50% overlap reconstructs exactly away from edges
    np.testing.assert_allclose(back[:, 1024:-1024], w[:, 1024:-1024],
                               atol=1e-4)


def test_invert_stem_properties():
    rs = np.random.RandomState(4)
    mix = (rs.randn(2, 32768) * 0.3).astype(np.float32)
    # stem == mixture -> inverted (secondary) stem is silence
    out = st.invert_stem(mix, mix)
    assert np.abs(out[1024:-1024]).max() < 1e-4
    # stem == silence -> secondary stem is the mixture itself
    out2 = st.invert_stem(mix, np.zeros_like(mix))
    np.testing.assert_allclose(out2[1024:-1024], mix.T[1024:-1024],
                               atol=1e-3)


def test_reshape_sources():
    a = np.zeros((2, 100))
    b = np.zeros((2, 80))
    assert st.reshape_sources(a, b).shape == (2, 100)  # padded up
    c = np.zeros((2, 130))
    assert st.reshape_sources(a, c).shape == (2, 100)  # trimmed
