"""HTTP TTS API server - stdlib, no framework dependencies.

Serves both API surfaces of the reference's examples
(``examples/api/main.py:71-119`` and the OpenAI-compatible
``examples/api/openai_api.py:149-285``):

* ``POST /generate_voice``  {"text": [...], "spk_emb"?, "stream"?, params...}
  -> audio/wav (single concatenated waveform)
* ``POST /v1/audio/speech`` {"input": "...", "voice"?: seed-or-spk-string,
  "response_format"?: "wav"} -> audio/wav, chunked streaming
* ``GET /health`` -> {"status": "ok"}

Model access is serialized with a lock exactly like the reference
(openai_api.py:67,205): one TPU, one request at a time; others queue.

    python examples/api_server.py --port 8000 --source random
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, ".")

from chattts_tpu import Chat
from chattts_tpu.utils.audio import transcode, wav_bytes
from chattts_tpu.utils.logger import get_logger
from chattts_tpu.utils.seeder import SpeakerSeedContext

logger = get_logger("chattts.api")

_chat: Chat = None  # type: ignore
_lock = threading.Lock()
_voices: dict[str, str] = {}  # name -> spk_emb string cache


def _resolve_voice(voice) -> str | None:
    """OpenAI `voice` param: a seed number or a raw spk_emb string."""
    if voice is None or voice == "":
        return None
    v = str(voice)
    if v.isdigit():
        if v not in _voices:
            with SpeakerSeedContext(_chat.speaker, int(v)):
                _voices[v] = _chat.sample_random_speaker()
        return _voices[v]
    return v  # assume portable spk_emb string


def _infer(texts, body, stream=False, split_text=True):
    p = Chat.InferCodeParams(
        spk_emb=_resolve_voice(body.get("voice") or body.get("spk_emb")),
        temperature=float(body.get("temperature", 0.3)),
        top_P=float(body.get("top_p", 0.7)),
        top_K=int(body.get("top_k", 20)),
        max_new_token=int(body.get("max_new_token", 2048)),
        min_new_token=int(body.get("min_new_token", 0)),
        manual_seed=body.get("manual_seed"),
    )
    rp = Chat.RefineTextParams(
        prompt=body.get("refine_prompt", ""),
        manual_seed=body.get("manual_seed"),
    )
    return _chat.infer(
        texts, stream=stream, split_text=split_text,
        skip_refine_text=bool(body.get("skip_refine_text", False)),
        params_refine_text=rp, params_infer_code=p)


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # route through our logger
        logger.debug("%s " + fmt, self.address_string(), *args)

    def _json_error(self, code: int, msg: str):
        body = json.dumps({"error": msg}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/" or self.path == "/index.html":
            import os

            page = os.path.join(os.path.dirname(__file__), "webui.html")
            try:
                with open(page, "rb") as f:
                    body = f.read()
            except OSError:
                return self._json_error(404, "webui.html missing")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/health":
            body = json.dumps({"status": "ok"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._json_error(404, "not found")

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._json_error(400, "invalid JSON body")

        if self.path == "/generate_voice":
            return self._generate_voice(body)
        if self.path == "/v1/audio/speech":
            return self._openai_speech(body)
        return self._json_error(404, "not found")

    def _generate_voice(self, body):
        texts = body.get("text")
        if isinstance(texts, str):
            texts = [texts]
        if not texts or not all(isinstance(t, str) and t for t in texts):
            return self._json_error(400, "'text' must be a non-empty string "
                                         "or list of strings")
        fmt = body.get("format", "wav")
        want_zip = fmt == "zip"  # one file per text (reference main.py
        # returns a zip of per-text audio, examples/api/main.py:71-119)
        with _lock:
            try:
                wavs = _infer(texts, body,
                              split_text=not want_zip)
            except Exception as e:  # noqa: BLE001
                logger.error("inference failed: %s", e)
                return self._json_error(500, f"inference failed: {e}")
        if want_zip:
            import io as _io
            import zipfile

            buf = _io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                for i, w in enumerate(wavs):
                    zf.writestr(f"{i}.wav", wav_bytes(np.asarray(w)))
            payload = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/zip")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        audio = np.concatenate([w for w in wavs if w.size]) if wavs else \
            np.zeros(1, np.float32)
        try:
            payload = transcode(audio, fmt)
        except RuntimeError as e:
            return self._json_error(400, str(e))
        self.send_response(200)
        self.send_header("Content-Type", f"audio/{fmt}")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _openai_speech(self, body):
        text = body.get("input")
        if not isinstance(text, str) or not text:
            return self._json_error(400, "'input' must be a non-empty string")
        fmt = body.get("response_format", "wav")
        if fmt != "wav":
            return self._json_error(
                400, f"response_format {fmt!r} unsupported (wav only)")
        stream = bool(body.get("stream", False))
        with _lock:
            try:
                if stream:
                    chunks = []
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for chunk in _infer([text], body, stream=True):
                        if not chunk.size:
                            continue
                        payload = wav_bytes(chunk[0])
                        self.wfile.write(f"{len(payload):x}\r\n".encode())
                        self.wfile.write(payload + b"\r\n")
                        chunks.append(chunk)
                    self.wfile.write(b"0\r\n\r\n")
                    return
                wavs = _infer([text], body)
            except Exception as e:  # noqa: BLE001
                logger.error("inference failed: %s", e)
                return self._json_error(500, f"inference failed: {e}")
        audio = np.concatenate([w for w in wavs if w.size])
        payload = wav_bytes(audio)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


def serve(port: int, source: str, custom_path=None, config=None) -> ThreadingHTTPServer:
    global _chat
    _chat = Chat(logger=logger, config=config)
    if not _chat.load(source=source, custom_path=custom_path):
        raise RuntimeError("model load failed")
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    logger.info("serving on :%d", port)
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--source", default="local",
                    choices=["local", "custom", "random"])
    ap.add_argument("--custom-path", default=None)
    args = ap.parse_args()
    serve(args.port, args.source, args.custom_path).serve_forever()


if __name__ == "__main__":
    main()
