"""TTS stack: WebSocket client, Edge read-aloud protocol, SRT timing.

Everything runs offline: a loopback fake server speaks the read-aloud
protocol over plain ws:// (the client's TLS path differs only in the
socket wrapping).  Reference behavior: app.py synthesize_tts:729-749,
srt_tts:760-788, time_stretch:751-756.
"""

import json
import socket
import struct
import threading

import numpy as np
import pytest

from rvc_maker_tpu.utils import edge_tts_client as etc
from rvc_maker_tpu.utils import ws as wsmod
from rvc_maker_tpu.utils.tts import (SrtCue, parse_srt, srt_tts,
                                     synthesize_tts, time_stretch)

# ------------------------------------------------------------- frames


def test_frame_roundtrip_masked():
    payload = bytes(range(256)) * 3
    frame = wsmod.encode_frame(wsmod.OP_BINARY, payload, mask=True,
                               mask_key=b"\x01\x02\x03\x04")
    a, b = socket.socketpair()
    a.sendall(frame)
    op, fin, out = wsmod.decode_frame(b)
    a.close(); b.close()
    assert (op, fin, out) == (wsmod.OP_BINARY, True, payload)


@pytest.mark.parametrize("n", [0, 125, 126, 65535, 65536])
def test_frame_lengths(n):
    payload = b"x" * n
    frame = wsmod.encode_frame(wsmod.OP_TEXT, payload, mask=False)
    a, b = socket.socketpair()
    a.sendall(frame)
    op, fin, out = wsmod.decode_frame(b)
    a.close(); b.close()
    assert out == payload and op == wsmod.OP_TEXT


# ------------------------------------------------- protocol primitives


def test_sec_ms_gec_known_value():
    # fixed clock -> deterministic token (5-minute rounding window)
    assert etc.sec_ms_gec(1_700_000_000) == (
        "42301B335578FEFDAE2637DED1ABD614505D432559EC08032B82048483726AFF")
    # same window -> same token; next window -> different
    assert etc.sec_ms_gec(1_700_000_050) == etc.sec_ms_gec(1_700_000_000)
    assert etc.sec_ms_gec(1_700_000_400) != etc.sec_ms_gec(1_700_000_000)


def test_js_timestamp_format():
    s = etc.js_timestamp(1_700_000_000)  # 2023-11-14 22:13:20 UTC, Tuesday
    assert s == ("Tue Nov 14 2023 22:13:20 GMT+0000 "
                 "(Coordinated Universal Time)")


def test_ssml_escaping_and_prosody():
    ssml = etc.build_ssml("a < b & c", "en-US-AriaNeural", rate=-10, pitch=3)
    assert "a &lt; b &amp; c" in ssml
    assert "rate='-10%'" in ssml and "pitch='+3Hz'" in ssml
    assert "name='en-US-AriaNeural'" in ssml


def test_binary_message_roundtrip():
    headers = "X-RequestId:abc\r\nPath:audio\r\n"
    payload = b"\xffaudio-bytes\x00\x01"
    msg = struct.pack("!H", len(headers)) + headers.encode() + payload
    h, p = etc.parse_binary_message(msg)
    assert h["Path"] == "audio" and p == payload
    with pytest.raises(ValueError):
        etc.parse_binary_message(b"\x00")
    with pytest.raises(ValueError):
        etc.parse_binary_message(struct.pack("!H", 99) + b"short")


def test_connection_url_parts():
    url = etc.connection_url("wss://example.test/tts/v1", 1_700_000_000)
    assert url.startswith("wss://example.test/tts/v1?")
    assert f"TrustedClientToken={etc.TRUSTED_CLIENT_TOKEN}" in url
    assert "Sec-MS-GEC=42301B33" in url
    assert f"Sec-MS-GEC-Version=1-{etc.CHROMIUM_FULL_VERSION}" in url


# ------------------------------------------------------ fake service

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _pcm_wav_bytes(freq=220.0, sr=24000, seconds=0.5):
    import io

    from scipy.io import wavfile
    t = np.arange(int(sr * seconds)) / sr
    tone = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (tone * 32767).astype(np.int16))
    return buf.getvalue()


class FakeReadAloudServer:
    """Accepts one connection at a time; replies to speech.config+ssml
    with turn.start, N binary audio chunks, word metadata, turn.end."""

    def __init__(self, audio: bytes, chunks: int = 3):
        self.audio = audio
        self.chunks = chunks
        self.requests = []  # (headers, body) of every client text message
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        import base64
        import hashlib
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            try:
                buf = b""
                while b"\r\n\r\n" not in buf:
                    buf += conn.recv(4096)
                key = ""
                for line in buf.split(b"\r\n"):
                    if line.lower().startswith(b"sec-websocket-key:"):
                        key = line.split(b":", 1)[1].strip().decode()
                accept = base64.b64encode(hashlib.sha1(
                    (key + _WS_GUID).encode()).digest()).decode()
                conn.sendall((
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept}\r\n\r\n").encode())

                # expect speech.config then ssml
                for _ in range(2):
                    op, fin, payload = wsmod.decode_frame(conn)
                    assert op == wsmod.OP_TEXT
                    self.requests.append(
                        etc.parse_text_message(payload.decode()))

                def send_text(s):
                    conn.sendall(wsmod.encode_frame(
                        wsmod.OP_TEXT, s.encode(), mask=False))

                send_text("X-RequestId:r\r\nPath:turn.start\r\n\r\n{}")
                step = max(1, len(self.audio) // self.chunks)
                for i in range(0, len(self.audio), step):
                    head = "X-RequestId:r\r\nContent-Type:audio/x\r\nPath:audio\r\n"
                    conn.sendall(wsmod.encode_frame(
                        wsmod.OP_BINARY,
                        struct.pack("!H", len(head)) + head.encode()
                        + self.audio[i:i + step], mask=False))
                meta = {"Metadata": [{"Type": "WordBoundary", "Data": {
                    "Offset": 500000, "Duration": 1000000,
                    "text": {"Text": "hello"}}}]}
                send_text("X-RequestId:r\r\nPath:audio.metadata\r\n\r\n"
                          + json.dumps(meta))
                send_text("X-RequestId:r\r\nPath:turn.end\r\n\r\n{}")
                # await client close (or EOF)
                try:
                    wsmod.decode_frame(conn)
                except Exception:
                    pass
            except Exception:
                pass
            finally:
                conn.close()

    def close(self):
        self.sock.close()


@pytest.fixture()
def fake_server():
    srv = FakeReadAloudServer(_pcm_wav_bytes())
    yield srv
    srv.close()


def test_synthesizer_full_exchange(fake_server):
    synth = etc.Synthesizer("en-US-AriaNeural", rate=5, pitch=-2,
                            output_format=etc.PCM_FORMAT,
                            endpoint=f"ws://127.0.0.1:{fake_server.port}/tts")
    audio, words = synth.synthesize("hello world & <tags>")
    assert audio == fake_server.audio            # chunks reassembled in order
    assert words == [etc.WordBoundary(500000, 1000000, "hello")]

    (h1, b1), (h2, b2) = fake_server.requests
    assert h1["Path"] == "speech.config"
    assert json.loads(b1)["context"]["synthesis"]["audio"][
        "outputFormat"] == etc.PCM_FORMAT
    assert h2["Path"] == "ssml"
    assert "hello world &amp; &lt;tags&gt;" in b2
    assert "rate='+5%'" in b2 and "pitch='-2Hz'" in b2


def test_synthesize_tts_writes_riff(tmp_path, fake_server):
    out = tmp_path / "tts.wav"
    synthesize_tts("hi", "en-US-AriaNeural", str(out), rate=0,
                   endpoint=f"ws://127.0.0.1:{fake_server.port}/tts",
                   output_format=etc.PCM_FORMAT)
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data == fake_server.audio


# ------------------------------------------------------------- SRT


SRT_FIXTURE = """\
1
00:00:01,000 --> 00:00:02,500
hello there

2
00:00:03,250 --> 00:00:04,000
second line
continued

"""


def test_parse_srt():
    cues = parse_srt(SRT_FIXTURE)
    assert cues == [
        SrtCue(1, 1.0, 2.5, "hello there"),
        SrtCue(2, 3.25, 4.0, "second line continued"),
    ]
    assert cues[0].duration == pytest.approx(1.5)
    # index-less + dot separators (both appear in the wild)
    cues = parse_srt("00:00:00.500 --> 00:00:01.000\nx\n")
    assert cues[0].start == 0.5 and cues[0].text == "x"
    assert parse_srt("") == []


def test_time_stretch_duration_and_pitch():
    sr = 24000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = time_stretch(tone, sr, 1.7)
    assert len(out) == int(1.7 * sr)
    # dominant frequency unchanged (phase vocoder, not resampling);
    # analyze the active head of the stretch
    head = out[:int(1.2 * sr)]
    spec = np.abs(np.fft.rfft(head * np.hanning(len(head))))
    peak = np.argmax(spec) * sr / len(head)
    assert abs(peak - 440) < 6
    # shrink path + pad path
    assert len(time_stretch(tone, sr, 0.5)) == sr // 2
    short = time_stretch(np.zeros(100, np.float32), sr, 0.01)
    assert len(short) == 240


def test_cli_tts(tmp_path, fake_server, monkeypatch):
    from rvc_maker_tpu.cli import main
    monkeypatch.setenv("RVC_TPU_EDGE_TTS_URL",
                       f"ws://127.0.0.1:{fake_server.port}/tts")
    out = tmp_path / "cli_tts.wav"
    main(["tts", "--text", "hello", "--voice", "en-US-AriaNeural",
          "--output", str(out)])
    assert out.read_bytes() == fake_server.audio


def test_srt_tts_places_cues(tmp_path, fake_server):
    srt = tmp_path / "cues.srt"
    srt.write_text(SRT_FIXTURE)
    out = tmp_path / "timeline.wav"
    srt_tts(str(srt), str(out), "en-US-AriaNeural",
            endpoint=f"ws://127.0.0.1:{fake_server.port}/tts")
    from rvc_maker_tpu.utils.audio import read_wav
    audio, sr = read_wav(str(out))
    assert sr == 24000
    assert len(audio) == int(4.0 * sr)          # timeline ends at last cue
    # speech occupies the cue windows, silence elsewhere
    assert np.abs(audio[: int(0.9 * sr)]).max() < 1e-4
    assert np.abs(audio[int(1.1 * sr): int(2.3 * sr)]).max() > 0.05
    assert np.abs(audio[int(2.6 * sr): int(3.1 * sr)]).max() < 1e-4
    assert np.abs(audio[int(3.4 * sr): int(3.9 * sr)]).max() > 0.05
