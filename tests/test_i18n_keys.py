"""Full i18n key-space coverage (VERDICT r1 missing #4).

The reference ships 807 translation keys per locale
(/root/reference/assets/languages/*.json).  Capability parity means a
fully translated surface, so each of our 4 locale files must cover every
reference key with reference-matching format placeholders.  Our values
are our own phrasings/translations, not copies — only the KEY SPACE and
placeholder sets are contractually identical.
"""

import json
import os
import re

import pytest

from rvc_maker_tpu.utils import i18n

REF_LANG_DIR = "/root/reference/assets/languages"
OUR_LANG_DIR = os.path.join(os.path.dirname(i18n.__file__), "languages")
LOCALES = ["en-US", "vi-VN", "ja-JP", "id_ID"]
_PLACEHOLDER = re.compile(r"\{([a-zA-Z_][a-zA-Z0-9_]*)\}")


def _ref_keys():
    with open(os.path.join(REF_LANG_DIR, "en-US.json"), encoding="utf-8") as f:
        return json.load(f)


@pytest.mark.parametrize("locale", LOCALES)
def test_full_reference_key_space(locale):
    ref = _ref_keys()
    with open(os.path.join(OUR_LANG_DIR, f"{locale}.json"),
              encoding="utf-8") as f:
        ours = json.load(f)
    missing = set(ref) - set(ours)
    assert not missing, sorted(missing)[:10]
    assert len(ours) >= len(ref)


@pytest.mark.parametrize("locale", LOCALES)
def test_placeholders_match_reference(locale):
    """tr(key, **kwargs) must accept exactly the reference's format
    fields in every language, or .format raises at runtime."""
    ref = _ref_keys()
    with open(os.path.join(OUR_LANG_DIR, f"{locale}.json"),
              encoding="utf-8") as f:
        ours = json.load(f)
    bad = [k for k in ref
           if set(_PLACEHOLDER.findall(ref[k]))
           != set(_PLACEHOLDER.findall(ours[k]))]
    assert not bad, bad[:10]


@pytest.mark.parametrize("locale", LOCALES)
def test_values_are_nonempty_strings(locale):
    with open(os.path.join(OUR_LANG_DIR, f"{locale}.json"),
              encoding="utf-8") as f:
        ours = json.load(f)
    assert all(isinstance(v, str) and v for v in ours.values())


def test_set_language_formats_in_every_locale():
    saved = i18n._lang
    try:
        expects = {
            "en-US": "converted", "vi-VN": "chuyển", "ja-JP": "変換",
            "id_ID": "selesai",
        }
        for locale, token in expects.items():
            i18n.set_language(locale)
            s = i18n.tr("convert_audio_success", input_path="a.wav",
                        elapsed_time=1.2, output_path="b.wav")
            assert "a.wav" in s and "b.wav" in s
            assert token.lower() in s.lower(), (locale, s)
    finally:
        i18n.set_language(saved)


def test_available_languages_unique():
    langs = i18n.available_languages()
    assert len(langs) == len(set(langs))
    for locale in LOCALES:
        assert locale in langs


def _load_locales():
    out = {}
    for locale in LOCALES:
        with open(os.path.join(OUR_LANG_DIR, f"{locale}.json"),
                  encoding="utf-8") as f:
            out[locale] = json.load(f)
    return out


def test_ui_template_keys_exist_in_every_locale():
    """Every {{key}} the web UI renders must resolve in all 4 catalogs
    (the page is server-side rendered through tr(), so a missing key
    would leak the raw key name into the UI)."""
    from rvc_maker_tpu.app import server

    keys = set(re.findall(r"\{\{([a-z0-9_]+)\}\}", server.INDEX_HTML))
    keys.discard("i18n_js")  # JS-catalog injection slot, not a string key
    assert len(keys) > 50  # the UI is actually templated
    locales = _load_locales()
    for locale, cat in locales.items():
        missing = sorted(k for k in keys if k not in cat)
        assert not missing, (locale, missing)
    for k in server._JS_KEYS:
        for locale, cat in locales.items():
            assert k in cat, (locale, k)


def test_tr_callsite_keys_exist_in_every_locale():
    """Every literal tr("key") in the package resolves in all 4 catalogs."""
    import rvc_maker_tpu

    pkg = os.path.dirname(rvc_maker_tpu.__file__)
    pat = re.compile(r"""\btr\(\s*["']([a-z0-9_]+)["']""")
    used = set()
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            with open(os.path.join(root, fn), encoding="utf-8") as f:
                used |= set(pat.findall(f.read()))
    assert len(used) >= 15  # the product actually consumes the catalogs
    for locale, cat in _load_locales().items():
        missing = sorted(k for k in used if k not in cat)
        assert not missing, (locale, missing)


def test_index_renders_vietnamese_end_to_end():
    """Switching the language setting produces a genuinely translated
    page, not an English page with a translated settings row."""
    from rvc_maker_tpu.app import server

    saved = i18n._lang
    try:
        i18n.set_language("vi-VN")
        page = server.render_index()
        assert "{{" not in page  # every placeholder resolved
        assert "Chuyển Đổi Âm Thanh" in page       # convert_audio
        assert "Tách Nhạc" in page                  # separator_tab
        assert "Cài đặt" in page                    # settings
        assert "Đang xử lý" in page                 # TR.processing for JS
        i18n.set_language("en-US")
        page_en = server.render_index()
        assert "Convert Audio" in page_en and "{{" not in page_en
    finally:
        i18n.set_language(saved)
