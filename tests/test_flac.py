"""Native FLAC decoder — exercised with a test-only Python encoder.

No FLAC encoder exists in this image, so the test builds spec-conformant
streams by hand (BitWriter below) covering every subframe type the
decoder supports, and asserts exact PCM roundtrips.
"""

import numpy as np
import pytest

from rvc_maker_tpu import native

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _zigzag(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _write_rice(bw: BitWriter, v: int, param: int):
    u = _zigzag(v)
    bw.write_unary(u >> param)
    if param:
        bw.write(u & ((1 << param) - 1), param)


def _streaminfo(sr: int, channels: int, bps: int, total: int) -> bytes:
    bw = BitWriter()
    bw.write(1, 1)          # last metadata block
    bw.write(0, 7)          # STREAMINFO
    bw.write(34, 24)        # length
    bw.write(4096, 16)      # min blocksize
    bw.write(4096, 16)      # max blocksize
    bw.write(0, 24)         # min framesize (unknown)
    bw.write(0, 24)         # max framesize
    bw.write(sr, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    for _ in range(16):     # md5 (unchecked)
        bw.write(0, 8)
    return b"fLaC" + bw.getvalue()


def _frame_header(bw: BitWriter, frame_no: int, blocksize: int,
                  ch_assign: int, bps_code: int):
    bw.write(0x3FFE, 14)    # sync
    bw.write(0, 1)          # reserved
    bw.write(0, 1)          # fixed-blocksize stream
    bw.write(7, 4)          # blocksize: 16-bit value-1 follows
    bw.write(0, 4)          # sample rate: from STREAMINFO
    bw.write(ch_assign, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)          # reserved
    assert frame_no < 128
    bw.write(frame_no, 8)   # UTF-8 single byte
    bw.write(blocksize - 1, 16)
    bw.write(0, 8)          # CRC-8 (decoder doesn't verify)


def _sub_verbatim(bw: BitWriter, s, bps: int):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in s:
        bw.write_signed(int(v), bps)


def _sub_constant(bw: BitWriter, value: int, bps: int):
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write_signed(value, bps)


def _sub_fixed(bw: BitWriter, s, bps: int, order: int, param: int = 6,
               porder: int = 0, escape: bool = False):
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    s = np.asarray(s, np.int64)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    resid = [int(s[i]) - sum(c * int(s[i - 1 - j]) for j, c in enumerate(coefs))
             for i in range(order, len(s))]
    bw.write(0, 2)          # rice method 0 (4-bit params)
    bw.write(porder, 4)
    partitions = 1 << porder
    psize = len(s) >> porder
    idx = 0
    for p in range(partitions):
        count = psize - (order if p == 0 else 0)
        if escape:
            bw.write(15, 4)          # escape -> raw
            raw = int(max(np.abs(resid)).item()).bit_length() + 1 if resid else 4
            bw.write(raw, 5)
            for _ in range(count):
                bw.write_signed(resid[idx], raw)
                idx += 1
        else:
            bw.write(param, 4)
            for _ in range(count):
                _write_rice(bw, resid[idx], param)
                idx += 1


def _sub_lpc(bw: BitWriter, s, bps: int, coefs, shift: int,
             precision: int = 15, param: int = 6):
    order = len(coefs)
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)
    bw.write(0, 1)
    s = np.asarray(s, np.int64)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    bw.write(precision - 1, 4)
    bw.write_signed(shift, 5)
    for c in coefs:
        bw.write_signed(int(c), precision)
    bw.write(0, 2)
    bw.write(0, 4)          # partition order 0
    bw.write(param, 4)
    for i in range(order, len(s)):
        pred = sum(int(c) * int(s[i - 1 - j]) for j, c in enumerate(coefs))
        _write_rice(bw, int(s[i]) - (pred >> shift), param)


def _mono_flac(signal, sr=16000, bps=16, encode=_sub_verbatim, **kw):
    signal = np.asarray(signal, np.int64)
    head = _streaminfo(sr, 1, bps, len(signal))
    bw = BitWriter()
    blocksize = 4096
    for f, start in enumerate(range(0, len(signal), blocksize)):
        block = signal[start:start + blocksize]
        _frame_header(bw, f, len(block), 0, 4 if bps == 16 else 0)
        encode(bw, block, bps, **kw)
        bw.align()
        bw.write(0, 16)     # CRC-16 (unchecked)
    return head + bw.getvalue()


def _pcm16_tone(n=10000, freq=220.0, sr=16000, amp=12000):
    t = np.arange(n) / sr
    return np.round(amp * np.sin(2 * np.pi * freq * t)).astype(np.int64)


def test_verbatim_roundtrip():
    sig = _pcm16_tone()
    audio, sr = native.flac_decode(_mono_flac(sig))
    assert sr == 16000 and audio.shape == (len(sig),)
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_constant_subframe():
    data = _streaminfo(8000, 1, 16, 1000)
    bw = BitWriter()
    _frame_header(bw, 0, 1000, 0, 4)
    _sub_constant(bw, -1234, 16)
    bw.align()
    bw.write(0, 16)
    audio, sr = native.flac_decode(data + bw.getvalue())
    assert sr == 8000
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), np.full(1000, -1234))


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    sig = _pcm16_tone(5000)
    audio, _ = native.flac_decode(
        _mono_flac(sig, encode=_sub_fixed, order=order, param=8))
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_fixed_partitions_and_escape():
    sig = _pcm16_tone(4096)
    audio, _ = native.flac_decode(
        _mono_flac(sig, encode=_sub_fixed, order=2, param=8, porder=2))
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)
    audio, _ = native.flac_decode(
        _mono_flac(sig, encode=_sub_fixed, order=1, escape=True))
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_lpc_subframe():
    sig = _pcm16_tone(4096, freq=440.0)
    # order-3 quantized predictor
    coefs, shift = [3200, -1800, 400], 10
    audio, _ = native.flac_decode(
        _mono_flac(sig, encode=_sub_lpc, coefs=coefs, shift=shift, param=9))
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_stereo_left_side():
    n = 3000
    left = _pcm16_tone(n, freq=220.0)
    right = _pcm16_tone(n, freq=330.0, amp=8000)
    side = left - right  # needs bps+1 bits
    head = _streaminfo(22050, 2, 16, n)
    bw = BitWriter()
    _frame_header(bw, 0, n, 8, 4)   # left-side assignment
    _sub_verbatim(bw, left, 16)
    _sub_verbatim(bw, side, 17)
    bw.align()
    bw.write(0, 16)
    audio, sr = native.flac_decode(head + bw.getvalue())
    assert sr == 22050 and audio.shape == (n, 2)
    pcm = np.round(audio * 32768).astype(np.int64)
    np.testing.assert_array_equal(pcm[:, 0], left)
    np.testing.assert_array_equal(pcm[:, 1], right)


def test_read_wav_routes_flac(tmp_path):
    from rvc_maker_tpu.utils.audio import load_audio, read_wav

    sig = _pcm16_tone(8000)
    p = tmp_path / "tone.flac"
    p.write_bytes(_mono_flac(sig))
    audio, sr = read_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(audio, sig / 32768.0, atol=1e-6)
    out = load_audio(str(p), 16000)
    assert len(out) == len(sig)


def test_encoder_roundtrip_mono():
    from rvc_maker_tpu.utils.flac_enc import encode_flac

    sig = _pcm16_tone(20000, freq=180.0)
    audio, sr = native.flac_decode(encode_flac(sig / 32768.0, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_encoder_roundtrip_stereo_and_noise():
    from rvc_maker_tpu.utils.flac_enc import encode_flac

    rs = np.random.RandomState(3)
    noise = (rs.randn(9000, 2) * 3000).astype(np.int64).clip(-32768, 32767)
    audio, sr = native.flac_decode(encode_flac(noise / 32768.0, 44100))
    assert sr == 44100 and audio.shape == (9000, 2)
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), noise)


def test_encoder_compresses_tones():
    from rvc_maker_tpu.utils.flac_enc import encode_flac

    sig = _pcm16_tone(48000, freq=220.0)
    data = encode_flac(sig / 32768.0, 48000)
    assert len(data) < 2 * len(sig) * 0.7   # < 70% of raw PCM16


def test_save_audio_flac(tmp_path):
    from rvc_maker_tpu.utils.audio import read_wav, save_audio

    sig = _pcm16_tone(5000)
    out = save_audio(str(tmp_path / "o.wav"), sig / 32768.0, 16000, "flac")
    assert out.endswith(".flac")
    audio, sr = read_wav(out)
    assert sr == 16000
    np.testing.assert_array_equal(
        np.round(audio * 32768).astype(np.int64), sig)


def test_probe_rejects_garbage():
    with pytest.raises(ValueError):
        native.flac_decode(b"RIFF1234WAVEfmt ")
