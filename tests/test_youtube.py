"""YouTube InnerTube downloader — offline tests (fixtures + local HTTP).

Reference capability: create_dataset.py:135-146 (yt-dlp "bestaudio").
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rvc_maker_tpu.utils import youtube as yt


@pytest.mark.parametrize("url,vid", [
    ("https://www.youtube.com/watch?v=dQw4w9WgXcQ", "dQw4w9WgXcQ"),
    ("https://www.youtube.com/watch?v=dQw4w9WgXcQ&t=42s", "dQw4w9WgXcQ"),
    ("https://youtu.be/dQw4w9WgXcQ?si=abc", "dQw4w9WgXcQ"),
    ("https://www.youtube.com/shorts/abcDEF12345", "abcDEF12345"),
    ("https://www.youtube.com/embed/abcDEF12345", "abcDEF12345"),
    ("https://m.youtube.com/watch?v=0123456789_", "0123456789_"),
    ("dQw4w9WgXcQ", "dQw4w9WgXcQ"),
])
def test_extract_video_id(url, vid):
    assert yt.extract_video_id(url) == vid


def test_extract_video_id_rejects():
    for bad in ("https://example.com/watch", "not an id", "short"):
        with pytest.raises(ValueError):
            yt.extract_video_id(bad)


def test_is_youtube_url():
    assert yt.is_youtube_url("https://www.youtube.com/watch?v=x")
    assert yt.is_youtube_url("https://youtu.be/x")
    assert yt.is_youtube_url("https://music.youtube.com/watch?v=x")
    assert not yt.is_youtube_url("https://drive.google.com/file/d/x")
    assert not yt.is_youtube_url("https://notyoutube.com.evil.io/x")
    assert not yt.is_youtube_url("https://evilyoutube.com/x")


def test_build_player_request():
    url, body, headers = yt.build_player_request("dQw4w9WgXcQ")
    assert url.startswith("https://www.youtube.com/youtubei/v1/player")
    payload = json.loads(body)
    assert payload["videoId"] == "dQw4w9WgXcQ"
    assert payload["context"]["client"]["clientName"] == "ANDROID"
    assert headers["X-Youtube-Client-Name"] == "3"
    assert "android" in headers["User-Agent"].lower()


PLAYER_FIXTURE = {
    "playabilityStatus": {"status": "OK"},
    "streamingData": {"adaptiveFormats": [
        {"itag": 137, "mimeType": 'video/mp4; codecs="avc1"',
         "bitrate": 4000000, "url": "https://v/video"},
        {"itag": 140, "mimeType": 'audio/mp4; codecs="mp4a.40.2"',
         "bitrate": 130000, "url": "https://v/m4a",
         "contentLength": "1000"},
        {"itag": 251, "mimeType": 'audio/webm; codecs="opus"',
         "bitrate": 160000, "url": "https://v/opus",
         "contentLength": "900"},
        {"itag": 250, "mimeType": 'audio/webm; codecs="opus"',
         "bitrate": 70000, "url": "https://v/opus-low"},
        {"itag": 777, "mimeType": 'audio/webm; codecs="opus"',
         "bitrate": 999999999,
         "signatureCipher": "s=..."},  # no direct url -> skipped
    ]},
}


def test_select_best_audio():
    fmt = yt.select_best_audio(PLAYER_FIXTURE)
    assert fmt["itag"] == 251            # highest-bitrate DIRECT audio
    assert yt.format_extension(fmt) == "webm"
    assert yt.format_extension(
        {"mimeType": 'audio/mp4; codecs="mp4a.40.2"'}) == "m4a"


def test_select_best_audio_errors():
    with pytest.raises(RuntimeError, match="not playable"):
        yt.select_best_audio({"playabilityStatus": {
            "status": "LOGIN_REQUIRED", "reason": "age"}})
    with pytest.raises(RuntimeError, match="no direct audio"):
        yt.select_best_audio({"playabilityStatus": {"status": "OK"},
                              "streamingData": {"adaptiveFormats": [
                                  {"mimeType": "audio/webm",
                                   "signatureCipher": "s=x"}]}})


class _RangeHandler(BaseHTTPRequestHandler):
    CONTENT = bytes(range(256)) * 40   # 10240 bytes
    requests: list = []

    def do_GET(self):
        rng = self.headers.get("Range", "")
        type(self).requests.append(rng)
        start, end = 0, len(self.CONTENT) - 1
        if rng.startswith("bytes="):
            s, _, e = rng[6:].partition("-")
            start = int(s)
            if e:
                end = min(int(e), len(self.CONTENT) - 1)
        if start >= len(self.CONTENT):
            self.send_response(416)
            self.end_headers()
            return
        chunk = self.CONTENT[start:end + 1]
        self.send_response(206)
        self.send_header("Content-Length", str(len(chunk)))
        self.end_headers()
        self.wfile.write(chunk)

    def log_message(self, *a):
        pass


@pytest.fixture()
def range_server():
    _RangeHandler.requests = []
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}/stream"
    httpd.shutdown()


def test_download_ranged_known_length(tmp_path, range_server):
    out = str(tmp_path / "a.bin")
    yt.download_ranged(range_server, out, total_bytes=10240,
                       chunk_bytes=4096)
    assert open(out, "rb").read() == _RangeHandler.CONTENT
    assert _RangeHandler.requests == [
        "bytes=0-4095", "bytes=4096-8191", "bytes=8192-10239"]


def test_download_ranged_unknown_length(tmp_path, range_server):
    out = str(tmp_path / "b.bin")
    yt.download_ranged(range_server, out, chunk_bytes=4096)
    assert open(out, "rb").read() == _RangeHandler.CONTENT


def test_download_audio_flow(tmp_path, range_server, monkeypatch):
    """Full download_audio with the player response mocked and the
    stream served by the local range server."""
    fixture = json.loads(json.dumps(PLAYER_FIXTURE))
    for f in fixture["streamingData"]["adaptiveFormats"]:
        if f.get("url"):
            f["url"] = range_server
    fixture["streamingData"]["adaptiveFormats"][2]["contentLength"] = "10240"
    monkeypatch.setattr(yt, "fetch_player_response",
                        lambda vid, timeout=30.0: fixture)
    out = yt.download_audio("https://youtu.be/dQw4w9WgXcQ",
                            str(tmp_path / "song"))
    assert out.endswith("song.webm")
    assert open(out, "rb").read() == _RangeHandler.CONTENT


def test_to_wav_gates_on_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setattr("shutil.which", lambda name: None)
    src = tmp_path / "x.webm"
    src.write_bytes(b"\x1aE\xdf\xa3")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        yt.to_wav(str(src), str(tmp_path / "x.wav"))
