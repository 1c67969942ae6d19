"""Scraping downloaders: offline tests of the pure logic — Drive URL/id
parsing and confirmation-page scraping, MediaFire button extraction,
mega.nz key unwrapping + AES-CTR decrypt + chunked CBC-MAC (fixtures
encrypted with the cryptography package, MAC recomputed independently
following the reference algorithm structure)."""

import json
import os

import numpy as np
import pytest

from rvc_maker_tpu.utils import scrapers as sc


# -- Google Drive ------------------------------------------------------------

def test_gdrive_parse_url():
    fid, dl = sc.gdrive_parse_url(
        "https://drive.google.com/file/d/ABC123xyz/view")
    assert fid == "ABC123xyz" and not dl
    fid, dl = sc.gdrive_parse_url(
        "https://drive.google.com/uc?id=QQ11&export=download")
    assert fid == "QQ11" and dl
    fid, _ = sc.gdrive_parse_url("https://example.com/file/d/X/view")
    assert fid is None


def test_gdrive_confirmation_scrape():
    html = ('<html><form><a href="/uc?export=download&amp;id=F1&amp;'
            'confirm=tok">Download anyway</a></form></html>')
    url = sc.gdrive_url_from_confirmation(html)
    assert url == ("https://docs.google.com/uc?export=download&id=F1"
                   "&confirm=tok")

    html2 = ('<html><a href="/open?id=BIGFILE99"></a>'
            '<input type="hidden" name="uuid" value="u-u-i-d">')
    url2 = sc.gdrive_url_from_confirmation(html2)
    assert url2 == ("https://drive.usercontent.google.com/download?"
                    "id=BIGFILE99&confirm=t&uuid=u-u-i-d")

    html3 = '{"downloadUrl":"https://x.test/a\\u003d1\\u0026b\\u003d2"}'
    assert sc.gdrive_url_from_confirmation(html3) == \
        "https://x.test/a=1&b=2"

    with pytest.raises(RuntimeError, match="quota exceeded"):
        sc.gdrive_url_from_confirmation(
            '<p class="uc-error-subcaption">quota exceeded</p>')


# -- MediaFire ---------------------------------------------------------------

def test_mediafire_button():
    html = ('<div><a class="input popsok" id="downloadButton" '
            'href="https://download123.mediafire.com/xyz/file.pth">'
            'DOWNLOAD</a></div>')
    assert sc.mediafire_direct_url(html) == \
        "https://download123.mediafire.com/xyz/file.pth"
    html_rev = ('<a href="https://dl.mediafire.com/q/f.bin" '
                'id="downloadButton">x</a>')
    assert sc.mediafire_direct_url(html_rev) == \
        "https://dl.mediafire.com/q/f.bin"
    with pytest.raises(RuntimeError):
        sc.mediafire_direct_url("<html>nothing here</html>")


# -- mega.nz -----------------------------------------------------------------

def test_mega_parse_url():
    h, k = sc.mega_parse_url(
        "https://mega.nz/file/AbCd1234#keykeykeykeykey")
    assert h == "AbCd1234" and k == "keykeykeykeykey"
    h, k = sc.mega_parse_url("https://mega.nz/#!LEGACY42!oldkey")
    assert h == "LEGACY42" and k == "oldkey"
    with pytest.raises(ValueError):
        sc.mega_parse_url("https://mega.nz/folder/zzz")


def test_mega_key_unwrap_and_a32():
    fk = tuple(range(1, 9))
    k, iv, mac = sc.mega_unwrap_key(fk)
    assert k == (1 ^ 5, 2 ^ 6, 3 ^ 7, 4 ^ 8)
    assert iv == (5, 6, 0, 0)
    assert mac == (7, 8)
    a = (0x01020304, 0xA0B0C0D0)
    assert sc.str_to_a32(sc.a32_to_str(a)) == a
    assert sc.base64_url_decode("QUJD") == b"ABC"
    assert sc.base64_url_decode("QUJDRA") == b"ABCD"  # stripped padding


def test_mega_attr_roundtrip():
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)

    k = (11, 22, 33, 44)
    attr = 'MEGA{"n": "model.pth"}'
    padded = attr.encode() + b"\0" * (16 - len(attr) % 16)
    enc = Cipher(algorithms.AES(sc.a32_to_str(k)),
                 modes.CBC(b"\0" * 16)).encryptor()
    blob = enc.update(padded) + enc.finalize()
    out = sc.mega_decrypt_attr(blob, k)
    assert out == {"n": "model.pth"}
    assert sc.mega_decrypt_attr(b"\x00" * 16, (1, 2, 3, 4)) is False


def _reference_style_mac(data: bytes, k, iv) -> tuple:
    """Independent reimplementation of the reference MAC loop
    (meganz.py:117-144) with per-block encrypt calls."""
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)

    k_str = sc.a32_to_str(k)
    iv_str = sc.a32_to_str([iv[0], iv[1], iv[0], iv[1]])
    mac_str = b"\0" * 16
    file_size = len(data)
    for start, size in sc.mega_get_chunks(file_size):
        chunk = data[start:start + size]
        enc = Cipher(algorithms.AES(k_str), modes.CBC(iv_str)).encryptor()
        i = 0
        for i in range(0, len(chunk) - 16, 16):
            enc.update(chunk[i:i + 16])
        if file_size > 16:
            i += 16
        else:
            i = 0
        block = chunk[i:i + 16]
        if len(block) % 16:
            block += b"\0" * (16 - len(block) % 16)
        elif not block:
            block = b"\0" * 16  # degenerate-final-chunk rule (see scrapers)
        chunk_mac = enc.update(block)
        fold = Cipher(algorithms.AES(k_str), modes.CBC(mac_str)).encryptor()
        mac_str = fold.update(chunk_mac)
    fm = sc.str_to_a32(mac_str)
    return (fm[0] ^ fm[1], fm[2] ^ fm[3])


@pytest.mark.parametrize("size", [7, 16, 100, 0x20000 + 5, 0x20000 * 3 + 11])
def test_mega_decrypt_stream(size):
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)

    rs = np.random.RandomState(size % 97)
    plain = rs.bytes(size)
    k = (0xdead, 0xbeef, 0x1234, 0x5678)
    iv = (0x1111, 0x2222, 0, 0)
    ctr0 = (((iv[0] << 32) + iv[1]) << 64).to_bytes(16, "big")
    enc = Cipher(algorithms.AES(sc.a32_to_str(k)),
                 modes.CTR(ctr0)).encryptor()
    cipher = enc.update(plain) + enc.finalize()
    meta_mac = _reference_style_mac(plain, k, iv)

    pos = [0]

    def read_chunk(n):
        out = cipher[pos[0]:pos[0] + n]
        pos[0] += n
        return out

    written = []
    sc.mega_decrypt_stream(read_chunk, written.append, size, k, iv,
                           meta_mac)
    assert b"".join(written) == plain

    # corrupted MAC must raise
    pos[0] = 0
    with pytest.raises(ValueError, match="MAC"):
        sc.mega_decrypt_stream(read_chunk, lambda b: None, size, k, iv,
                               (meta_mac[0] ^ 1, meta_mac[1]))


def test_mega_chunk_schedule():
    chunks = list(sc.mega_get_chunks(0x20000 * 8))
    # growing schedule: 128k, 256k, 384k, ...
    assert chunks[0] == (0, 0x20000)
    assert chunks[1][1] == 0x40000
    total = sum(s for _, s in chunks)
    assert total == 0x20000 * 8
    assert list(sc.mega_get_chunks(10)) == [(0, 10)]


def test_download_any_dispatch(monkeypatch):
    calls = []
    monkeypatch.setattr(sc, "gdrive_download",
                        lambda **kw: calls.append(("g", kw)) or "g")
    monkeypatch.setattr(sc, "mediafire_download",
                        lambda url, output: calls.append(("mf", url)) or "m")
    monkeypatch.setattr(sc, "mega_download",
                        lambda url, dest_path: calls.append(("mega", url))
                        or "z")
    assert sc.download_any("https://drive.google.com/uc?id=1", "/tmp") == "g"
    assert sc.download_any("https://www.mediafire.com/file/q/x/file", "/tmp") == "m"
    assert sc.download_any("https://mega.nz/file/a#b", "/tmp") == "z"
    assert [c[0] for c in calls] == ["g", "mf", "mega"]
