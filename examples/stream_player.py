"""Streaming playback helper (reference ``examples/cmd/stream.py`` analog).

The reference's ChatStreamer re-buffers the generator's variable-size chunks
into fixed-size blocks for an audio device.  Without an audio device in this
environment, ``StreamRebuffer`` does the re-buffering and the CLI writes the
re-buffered stream to a growing wav file (or stdout) as it arrives.

    python examples/stream_player.py "Hello streaming world" -o out.wav
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Iterator, Optional

import numpy as np

sys.path.insert(0, ".")

from chattts_tpu import Chat
from chattts_tpu.utils.audio import write_wav
from chattts_tpu.utils.logger import get_logger

logger = get_logger("chattts.stream")


class StreamRebuffer:
    """Accumulates (B, n) float chunks, emits fixed-size mono blocks."""

    def __init__(self, block_size: int = 4096):
        self.block_size = block_size
        self._buf = np.zeros(0, np.float32)

    def push(self, chunk: np.ndarray) -> Iterator[np.ndarray]:
        if chunk.ndim == 2:
            chunk = chunk.reshape(-1) if chunk.shape[0] == 1 else \
                chunk.mean(axis=0)
        self._buf = np.concatenate([self._buf, chunk.astype(np.float32)])
        while self._buf.size >= self.block_size:
            yield self._buf[: self.block_size]
            self._buf = self._buf[self.block_size :]

    def flush(self) -> Optional[np.ndarray]:
        if self._buf.size:
            out, self._buf = self._buf, np.zeros(0, np.float32)
            return out
        return None


def http_stream(url: str, text: str, max_new: int,
                **body_extra) -> Iterator[np.ndarray]:
    """Consume the api_server's streaming ``/v1/audio/speech`` response.

    The body is ONE logical wav: a single unknown-length header followed by
    raw PCM16 frames (utils/audio.wav_stream_header) - this reader skips the
    44-byte header and yields float32 blocks as HTTP chunks arrive.
    """
    import json
    import urllib.request

    body = {"input": text, "stream": True, "max_new_token": max_new,
            **body_extra}
    req = urllib.request.Request(
        url.rstrip("/") + "/v1/audio/speech",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        hdr = r.read(44)  # one wav header per stream
        if hdr[:4] != b"RIFF":
            raise RuntimeError("expected a wav stream")
        carry = b""
        while True:
            raw = r.read(8192)
            if not raw:
                break
            carry += raw
            n = len(carry) // 2 * 2
            if n:
                yield (np.frombuffer(carry[:n], np.int16)
                       .astype(np.float32) / 32768.0)
                carry = carry[n:]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("text")
    ap.add_argument("--output", "-o", default="stream_out.wav")
    ap.add_argument("--source", default="local",
                    choices=["local", "custom", "random"])
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--max-new", type=int, default=2048)
    ap.add_argument("--url", default=None,
                    help="consume a running api_server's HTTP stream "
                         "instead of loading the model in-process")
    args = ap.parse_args()

    if args.url is not None:
        chunks = http_stream(args.url, args.text, args.max_new)
    else:
        chat = Chat(logger=logger)
        chat.load(source=args.source)
        params = Chat.InferCodeParams(max_new_token=args.max_new)
        chunks = chat.infer(args.text, stream=True,
                            params_infer_code=params)

    rebuf = StreamRebuffer(args.block)
    blocks = []
    t0 = time.time()
    first = None
    for chunk in chunks:
        for block in rebuf.push(chunk):
            if first is None:
                first = time.time() - t0
                logger.info("first audio block after %.2fs", first)
            blocks.append(block)
    tail = rebuf.flush()
    if tail is not None:
        blocks.append(tail)
    wav = np.concatenate(blocks) if blocks else np.zeros(0, np.float32)
    write_wav(args.output, wav)
    logger.info("wrote %s: %.2fs audio, TTFA %.2fs, wall %.2fs",
                args.output, wav.size / 24000, first or -1, time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
