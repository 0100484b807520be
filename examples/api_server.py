"""HTTP TTS API server - stdlib, no framework dependencies.

Serves the API surfaces of the reference's examples
(``examples/api/main.py:71-119`` and the OpenAI-compatible
``examples/api/openai_api.py:149-285``) plus the WebUI helpers:

* ``POST /generate_voice``  {"text": [...], "spk_emb"?, params...}
  -> audio/wav (or format=zip: one wav per text)
* ``POST /v1/audio/speech`` {"input": "...", "voice"?, "stream"?} -> wav
* ``POST /refine``          {"text": "..."} -> {"refined": "..."}
* ``POST /sample_audio_speaker``  raw wav body -> {"spk_smp": "..."}
* ``GET  /sample_random_speaker`` -> {"spk_emb": "..."}
* ``POST /interrupt``       -> drains all queued/running work
* ``GET  /health``, ``GET /`` (WebUI page)

Unlike the reference (one asyncio.Lock around the model,
openai_api.py:67,205), CONCURRENT requests share the continuous-batching
engine's decode slots through ``chattts_tpu.serving.TTSService`` - two
overlapping requests decode in the same jitted chunk.
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
from chattts_tpu.serving import TTSService
from chattts_tpu.utils.audio import (pcm16_bytes, transcode, wav_bytes,
                                     wav_stream_header)
from chattts_tpu.utils.logger import get_logger
from chattts_tpu.utils.seeder import SpeakerSeedContext

logger = get_logger("chattts.api")

_chat: Chat = None  # type: ignore
_svc: TTSService = None  # type: ignore
_voice_lock = threading.Lock()
_voices: dict[str, str] = {}  # name -> spk_emb string cache


def _resolve_voice(voice) -> str | None:
    """OpenAI `voice` param: a seed number or a raw spk_emb string."""
    if voice is None or voice == "":
        return None
    v = str(voice)
    if v.isdigit():
        with _voice_lock:
            if v not in _voices:
                with SpeakerSeedContext(_chat.speaker, int(v)):
                    _voices[v] = _chat.sample_random_speaker()
            return _voices[v]
    return v  # assume portable spk_emb string


# Streaming-cadence defaults come from the dataclass (they are tuned over
# time; stale literals here would silently desynchronize the server from
# the cadence TTSService warms at construction).
_DEFAULTS = Chat.InferCodeParams()
# Each distinct stream_batch is a distinct window-vocoder jit (serving.py
# warmup_stream); on TPU a new value is a multi-second remote compile.  An
# open HTTP surface must not let clients mint an unbounded compiled-jit
# population, so client values snap to this fixed set: the default cadence
# (warmed at service construction) and the low-latency lever cadence.
_STREAM_BATCHES = sorted({16, _DEFAULTS.stream_batch})


def _snap_stream_batch(v: int) -> int:
    return min(_STREAM_BATCHES, key=lambda a: (abs(a - v), a))


def _params_from(body) -> tuple[Chat.RefineTextParams, Chat.InferCodeParams]:
    p = Chat.InferCodeParams(
        spk_emb=_resolve_voice(body.get("voice") or body.get("spk_emb")),
        spk_smp=body.get("spk_smp"),
        txt_smp=body.get("txt_smp"),
        temperature=float(body.get("temperature", 0.3)),
        top_P=float(body.get("top_p", 0.7)),
        top_K=int(body.get("top_k", 20)),
        max_new_token=min(int(body.get("max_new_token", 2048)), 2048),
        min_new_token=max(int(body.get("min_new_token", 0)), 0),
        manual_seed=body.get("manual_seed"),
        stream_batch=_snap_stream_batch(
            int(body.get("stream_batch", _DEFAULTS.stream_batch))),
        stream_speed=min(max(int(body.get(
            "stream_speed", _DEFAULTS.stream_speed)), 2000), 48000),
        pass_first_n_batches=min(max(int(body.get(
            "pass_first_n_batches", _DEFAULTS.pass_first_n_batches)), 0), 8),
    )
    rp = Chat.RefineTextParams(
        prompt=body.get("refine_prompt", ""),
        manual_seed=body.get("manual_seed"),
    )
    return rp, p


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # route through our logger
        logger.debug("%s " + fmt, self.address_string(), *args)

    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json_error(self, code: int, msg: str):
        self._json(code, {"error": msg})

    def _bytes(self, payload: bytes, ctype: str):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _stream_chunk(self, payload: bytes):
        """One HTTP chunked-transfer frame (empty payloads are skipped - a
        zero-length chunk would terminate the transfer)."""
        if payload:
            self.wfile.write(f"{len(payload):x}\r\n".encode())
            self.wfile.write(payload + b"\r\n")
            self.wfile.flush()

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            import os

            page = os.path.join(os.path.dirname(__file__), "webui.html")
            try:
                with open(page, "rb") as f:
                    self._bytes(f.read(), "text/html; charset=utf-8")
            except OSError:
                self._json_error(404, "webui.html missing")
        elif self.path == "/health":
            self._json(200, {"status": "ok", **_svc.stats()})
        elif self.path == "/sample_random_speaker":
            self._json(200, {"spk_emb": _chat.sample_random_speaker()})
        else:
            self._json_error(404, "not found")

    def do_POST(self):
        raw = b""
        try:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
        except ValueError:
            return self._json_error(400, "bad Content-Length")

        if self.path == "/sample_audio_speaker":
            return self._sample_audio_speaker(raw)
        try:
            body = json.loads(raw or b"{}")
        except json.JSONDecodeError:
            return self._json_error(400, "invalid JSON body")
        if self.path == "/generate_voice":
            return self._generate_voice(body)
        if self.path == "/v1/audio/speech":
            return self._openai_speech(body)
        if self.path == "/refine":
            return self._refine(body)
        if self.path == "/interrupt":
            return self._json(200, {"dropped": _svc.interrupt()})
        return self._json_error(404, "not found")

    def _sample_audio_speaker(self, raw: bytes):
        """Voice clone: wav upload -> spk_smp string (core.py:179-180)."""
        import io as _io
        import wave

        try:
            with wave.open(_io.BytesIO(raw)) as w:
                sr = w.getframerate()
                pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
                if w.getnchannels() > 1:
                    pcm = pcm.reshape(-1, w.getnchannels()).mean(1)
        except Exception as e:  # noqa: BLE001
            return self._json_error(400, f"expected a wav body: {e}")
        wav = pcm.astype(np.float32) / 32768.0
        if sr != 24000:
            from chattts_tpu.utils.audio import resample

            wav = resample(wav, sr, 24000)
        smp = _chat.sample_audio_speaker(wav)
        self._json(200, {"spk_smp": smp})

    def _refine(self, body):
        text = body.get("text")
        if not isinstance(text, str) or not text:
            return self._json_error(400, "'text' must be a non-empty string")
        rp, _ = _params_from(body)
        try:
            refined = _svc.refine([text], rp)[0]
        except Exception as e:  # noqa: BLE001
            logger.error("refine failed: %s", e)
            return self._json_error(500, f"refine failed: {e}")
        self._json(200, {"refined": refined})

    def _generate_voice(self, body):
        texts = body.get("text")
        if isinstance(texts, str):
            texts = [texts]
        if not texts or not all(isinstance(t, str) and t for t in texts):
            return self._json_error(400, "'text' must be a non-empty string "
                                         "or list of strings")
        fmt = body.get("format", "wav")
        rp, p = _params_from(body)
        skip = bool(body.get("skip_refine_text", False))
        try:
            wavs = [_svc.synthesize(t, rp, p, skip_refine_text=skip)
                    for t in texts]
        except Exception as e:  # noqa: BLE001
            logger.error("inference failed: %s", e)
            return self._json_error(500, f"inference failed: {e}")
        if fmt == "zip":  # one file per text (reference main.py:71-119)
            import io as _io
            import zipfile

            buf = _io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                for i, w in enumerate(wavs):
                    zf.writestr(f"{i}.wav", wav_bytes(np.asarray(w)))
            return self._bytes(buf.getvalue(), "application/zip")
        audio = (np.concatenate([w for w in wavs if w.size])
                 if any(w.size for w in wavs) else np.zeros(1, np.float32))
        try:
            payload = transcode(audio, fmt)
        except RuntimeError as e:
            return self._json_error(400, str(e))
        self._bytes(payload, f"audio/{fmt}")

    def _openai_speech(self, body):
        text = body.get("input")
        if not isinstance(text, str) or not text:
            return self._json_error(400, "'input' must be a non-empty string")
        fmt = body.get("response_format", "wav")
        if fmt != "wav":
            return self._json_error(
                400, f"response_format {fmt!r} unsupported (wav only)")
        rp, p = _params_from(body)
        if bool(body.get("stream", False)):
            # ONE logical wav per response: a single unknown-length header,
            # then raw PCM16 frames per emission window (the reference
            # streams one stream per request, openai_api.py:149-285; the
            # old per-chunk wav_bytes produced N concatenated wav files)
            gen = _svc.synthesize_stream(text, p)
            try:
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                self._stream_chunk(wav_stream_header())
                for chunk in gen:
                    self._stream_chunk(pcm16_bytes(chunk[0]))
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionError) as e:
                # routine consumer disconnect - not a server failure
                logger.info("stream client gone: %s", e)
            except Exception:  # noqa: BLE001 - synthesis/engine failure:
                # the client gets a truncated body (no terminal chunk);
                # the server must record it as an ERROR, not a disconnect
                logger.exception("stream failed mid-response")
            finally:
                # client disconnect mid-stream: closing the generator fires
                # its abort path, freeing the engine slot immediately
                # instead of decoding to max_new for nobody
                gen.close()
            return
        try:
            audio = _svc.synthesize(
                text, rp, p, skip_refine_text=bool(
                    body.get("skip_refine_text", True)))
        except Exception as e:  # noqa: BLE001
            logger.error("inference failed: %s", e)
            return self._json_error(500, f"inference failed: {e}")
        self._bytes(wav_bytes(audio), "audio/wav")


def serve(port: int, source: str, custom_path=None, config=None) -> ThreadingHTTPServer:
    global _chat, _svc
    _chat = Chat(logger=logger, config=config)
    if not _chat.load(source=source, custom_path=custom_path,
                      use_engine=True):
        raise RuntimeError("model load failed")
    _svc = TTSService(_chat)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    logger.info("serving on :%d (continuous batching across requests)", port)
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
