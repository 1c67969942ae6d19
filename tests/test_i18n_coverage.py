"""i18n completeness: user-facing strings route through tr().

The reference routes every user-facing string through its translations
dict (reference configs/config.py:29-46, consumed in all 56 modules).
This test enforces the same invariant here with an AST audit: any string
literal inside a print()/logger call in the CLI, web server, or pipeline
modules that looks like prose (two adjacent >=3-letter words) must either
be produced by tr() or appear on the explicit allowlist below.

Also asserts the new keys exist in every locale catalog so tr() never
falls back to the bare key in a shipped language.
"""

import ast
import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "rvc_maker_tpu")

# Deliberate English-only diagnostics (machine-verification lines, dev
# logs that embed no prose the user acts on).  Keep this list short —
# every addition should have a reason.
ALLOWLIST = {
    # ops evidence line consumed by tools/e2e_train_tpu.py, grepped by
    # exact format; not a user-facing message
    "resume params_g sha256=%s step=%d",
}

PROSE = re.compile(r"[a-zA-Z]{3,}\s+[a-zA-Z]{3,}")


def _audit_calls(path: str, fn_names: set[str]) -> list[tuple[int, str]]:
    tree = ast.parse(open(path).read())
    offenders = []

    def tr_literals(node) -> set[str]:
        out = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Call):
                f = n.func
                nm = f.id if isinstance(f, ast.Name) else getattr(f, "attr",
                                                                  "")
                if nm == "tr":
                    for sub in ast.walk(n):
                        if isinstance(sub, ast.Constant) and \
                                isinstance(sub.value, str):
                            out.add(sub.value)
        return out

    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        nm = f.attr if isinstance(f, ast.Attribute) else getattr(f, "id", "")
        if nm not in fn_names:
            continue
        translated = tr_literals(node)
        for a in node.args:
            for n in ast.walk(a):
                if isinstance(n, ast.Constant) and isinstance(n.value, str):
                    v = n.value
                    if v in translated or v in ALLOWLIST:
                        continue
                    if PROSE.search(v):
                        offenders.append((node.lineno, v))
    return offenders


@pytest.mark.parametrize("rel,fns", [
    ("cli.py", {"print"}),
    ("cli.py", {"info", "warning", "error", "critical"}),
    ("app/server.py", {"info", "warning", "error", "critical"}),
])
def test_no_untranslated_literals_cli_server(rel, fns):
    offenders = _audit_calls(os.path.join(PKG, rel), fns)
    assert not offenders, (
        f"{rel}: untranslated user-facing literals (route through tr() "
        f"or allowlist): {offenders}")


def test_no_untranslated_literals_pipelines():
    bad = {}
    for path in sorted(glob.glob(os.path.join(PKG, "pipelines", "*.py"))):
        offs = _audit_calls(path, {"info", "warning", "error", "critical"})
        if offs:
            bad[os.path.basename(path)] = offs
    assert not bad, f"untranslated pipeline log literals: {bad}"


def test_server_json_error_values_translated():
    """Literal English strings must not be JSON 'error' values."""
    src = open(os.path.join(PKG, "app", "server.py")).read()
    tree = ast.parse(src)
    offenders = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k, v in zip(node.keys, node.values):
                if (isinstance(k, ast.Constant) and k.value == "error"
                        and isinstance(v, ast.Constant)
                        and isinstance(v.value, str) and v.value):
                    offenders.append((node.lineno, v.value))
    assert not offenders, f"literal error strings: {offenders}"


def test_new_keys_in_every_locale():
    keys = {"random_hubert", "fallback_yin", "pretrained_failed",
            "bootstrap_failed", "sigterm_save", "settings_persist_failed",
            "serving_on", "karaoke_split", "tensorboard_unavailable",
            "spec_nonfinite", "merge_artifacts_failed", "segments_to",
            "overtraining_find", "NaN", "dereverb", "not_found"}
    lang_dir = os.path.join(PKG, "utils", "languages")
    for f in sorted(os.listdir(lang_dir)):
        if not f.endswith(".json"):
            continue
        cat = json.load(open(os.path.join(lang_dir, f), encoding="utf-8"))
        missing = keys - set(cat)
        assert not missing, (f, missing)
