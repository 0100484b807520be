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


def test_concurrent_requests_share_slots(server):
    """Two overlapping requests decode in the same engine chunk (the
    reference serializes on one lock, openai_api.py:67,205).  Verified by
    the service's peak concurrent slot occupancy, not wall-clock."""
    # several chunks per request (chunk_steps=24) so the overlap window is
    # wide even on a loaded CI machine
    body = {"input": "concurrency test sentence", "skip_refine_text": True,
            "max_new_token": 96, "min_new_token": 96}
    results = []

    def hit(seed):
        b = dict(body, manual_seed=seed)
        with _post(server, "/v1/audio/speech", b) as r:
            results.append(r.read()[:4])

    ts = [threading.Thread(target=hit, args=(s,)) for s in (7, 8, 9)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == [b"RIFF"] * 3
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        peak = json.load(r)["peak_slots"]
    assert peak >= 2, f"requests serialized (peak slots {peak})"


def test_refine_endpoint(server):
    with _post(server, "/refine", {"text": "refine me",
                                   "manual_seed": 5}) as r:
        out = json.load(r)
    assert isinstance(out["refined"], str)


def test_sample_speakers_and_clone(server):
    with urllib.request.urlopen(server + "/sample_random_speaker",
                                timeout=60) as r:
        emb = json.load(r)["spk_emb"]
    assert isinstance(emb, str) and len(emb) > 10

    # voice clone: upload a wav, get a portable spk_smp string back
    import numpy as np

    from chattts_tpu.utils.audio import wav_bytes

    wav = (np.sin(np.linspace(0, 440 * 2 * np.pi, 24000)) * 0.3
           ).astype(np.float32)
    req = urllib.request.Request(
        server + "/sample_audio_speaker", data=wav_bytes(wav),
        headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=300) as r:
        smp = json.load(r)["spk_smp"]
    assert isinstance(smp, str) and len(smp) > 4
    # the string is usable as a clone prompt
    body = {"text": "cloned voice", "skip_refine_text": True,
            "spk_smp": smp, "txt_smp": "reference",
            "max_new_token": 10, "min_new_token": 4, "manual_seed": 6}
    with _post(server, "/generate_voice", body) as r:
        assert r.read()[:4] == b"RIFF"


def test_interrupt_endpoint(server):
    with _post(server, "/interrupt", {}) as r:
        out = json.load(r)
    assert "dropped" in out


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
