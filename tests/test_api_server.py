"""HTTP API server tests: spin a real server on the tiny model and hit it."""

import json
import threading
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(tiny_config):
    import examples.api_server as api

    httpd = api.serve(0, "random", config=tiny_config)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.load(r)["status"] == "ok"


def test_webui_page(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        body = r.read()
    assert r.headers["Content-Type"].startswith("text/html")
    assert b"generate_voice" in body


def test_generate_voice(server):
    body = {"text": ["hi there"], "skip_refine_text": True,
            "max_new_token": 12, "min_new_token": 6, "manual_seed": 1}
    with _post(server, "/generate_voice", body) as r:
        data = r.read()
    assert r.headers["Content-Type"] == "audio/wav"
    assert data[:4] == b"RIFF"


def test_openai_speech(server):
    body = {"input": "hello", "skip_refine_text": True,
            "max_new_token": 12, "min_new_token": 6, "manual_seed": 2}
    with _post(server, "/v1/audio/speech", body) as r:
        data = r.read()
    assert data[:4] == b"RIFF"


def test_openai_speech_stream(server):
    body = {"input": "hello streaming", "skip_refine_text": True,
            "stream": True, "max_new_token": 16, "min_new_token": 8,
            "stream_batch": 4, "manual_seed": 3}
    with _post(server, "/v1/audio/speech", body) as r:
        data = r.read()  # urllib reassembles chunked transfer
    assert b"RIFF" in data


def test_bad_requests(server):
    for path, body in [
        ("/generate_voice", {}),
        ("/generate_voice", {"text": ""}),
        ("/v1/audio/speech", {}),
        ("/v1/audio/speech", {"input": "x", "response_format": "mp3"}),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, path, body)
        assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/nope", {})
    assert ei.value.code == 404


def test_generate_voice_zip(server):
    import io
    import zipfile

    body = {"text": ["one", "two"], "format": "zip", "skip_refine_text": True,
            "max_new_token": 10, "min_new_token": 4, "manual_seed": 4}
    with _post(server, "/generate_voice", body) as r:
        data = r.read()
    assert r.headers["Content-Type"] == "application/zip"
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = sorted(zf.namelist())
        assert names == ["0.wav", "1.wav"]
        for n in names:
            assert zf.read(n)[:4] == b"RIFF"
