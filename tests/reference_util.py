"""Golden-output access to the PyTorch reference at /root/reference.

Tests import reference modules *in place* (read-only) to generate golden
outputs on CPU — our framework code never depends on this; it exists so
numerical parity is asserted against the real reference, not against a
re-transcription of it (SURVEY.md §4 point 1).
"""

from __future__ import annotations

import contextlib
import importlib
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _shim_module(name: str) -> types.ModuleType:
    """A stub module with a real ModuleSpec: importlib.util.find_spec
    raises ValueError on modules whose __spec__ is None (transformers
    probes librosa that way)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _install_shims():
    """Stub out reference deps absent from this image (omegaconf, librosa).

    The librosa shim provides exactly the two entry points reference
    modules import at module scope: filters.mel (backed by our own
    filterbank construction) and a `sequence` namespace.
    """
    if "omegaconf" not in sys.modules:
        om = _shim_module("omegaconf")

        class DictConfig(dict):
            pass

        @contextlib.contextmanager
        def open_dict(x):
            yield x

        om.DictConfig = DictConfig
        om.open_dict = open_dict
        sys.modules["omegaconf"] = om

    if "librosa" not in sys.modules:
        # NOTE: this shim backs librosa.filters.mel with our own
        # mel_filterbank, which would be self-referential on its own;
        # the filterbank itself is pinned against committed golden
        # fixtures + an independent construction + analytic invariants
        # in tests/test_mel_golden.py, so the circularity is broken.
        from rvc_maker_tpu.ops.stft import mel_filterbank

        lib = _shim_module("librosa")
        filters = _shim_module("librosa.filters")

        def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)

        filters.mel = mel
        lib.filters = filters
        lib.sequence = _shim_module("librosa.sequence")
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.sequence"] = lib.sequence


def ref_classes_from_source(rel_path: str, class_names: tuple,
                            extra_globals: dict | None = None) -> dict:
    """Exec selected class definitions from a reference source file.

    Some reference files (main/inference/train.py) parse argv at module
    level, so they cannot be imported; this extracts the named ClassDef
    nodes with ast and runs the reference's *own* code in a namespace
    seeded with the globals those classes need.  Returns {name: class}.
    """
    import ast
    import os

    src_path = os.path.join(REFERENCE_ROOT, rel_path)
    with open(src_path) as f:
        tree = ast.parse(f.read())
    wanted = [n for n in tree.body
              if isinstance(n, ast.ClassDef) and n.name in class_names]
    missing = set(class_names) - {n.name for n in wanted}
    assert not missing, f"classes not found in {rel_path}: {missing}"
    ns: dict = dict(extra_globals or {})
    code = compile(ast.Module(body=wanted, type_ignores=[]), src_path, "exec")
    exec(code, ns)
    return {name: ns[name] for name in class_names}


def ref_train_discriminators():
    """The reference MultiPeriodDiscriminator family (train.py:608-674),
    executed from the reference source (train.py itself is unimportable:
    module-level argparse at train.py:102)."""
    import torch
    from torch.nn import functional as F
    from torch.utils.checkpoint import checkpoint
    from torch.nn.utils.parametrizations import spectral_norm, weight_norm

    commons = ref_module("main.library.algorithm.commons")
    residuals = ref_module("main.library.algorithm.residuals")
    return ref_classes_from_source(
        "main/inference/train.py",
        ("MultiPeriodDiscriminator", "DiscriminatorS", "DiscriminatorP"),
        {"torch": torch, "F": F, "checkpoint": checkpoint,
         "spectral_norm": spectral_norm, "weight_norm": weight_norm,
         "get_padding": commons.get_padding,
         "LRELU_SLOPE": residuals.LRELU_SLOPE})


def ref_module(name: str):
    """Import a module from the reference tree, e.g.
    ref_module('main.library.algorithm.synthesizers')."""
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(name)


@contextlib.contextmanager
def zero_noise_torch():
    """Silence the reference's implicit randomness so fp32 parity can be
    asserted: torch.randn_like -> zeros, torch.rand -> zeros.

    Known noise seams (SURVEY.md §4): infer prior noise (synthesizers.py:449),
    SineGen dither + rand_ini (synthesizers.py:87-98), posterior noise
    (synthesizers.py:391).
    """
    import torch

    saved = (torch.randn_like, torch.rand, torch.randn)
    try:
        torch.randn_like = lambda x, **kw: torch.zeros_like(x)
        torch.rand = lambda *s, **kw: torch.zeros(*s, **{k: v for k, v in kw.items() if k in ("device", "dtype")})
        torch.randn = lambda *s, **kw: torch.zeros(*s, **{k: v for k, v in kw.items() if k in ("device", "dtype")})
        yield
    finally:
        torch.randn_like, torch.rand, torch.randn = saved
