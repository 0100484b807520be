"""Capture real-weight regression fixtures (reference tests/#655.py model).

Run once when a verified ChatTTS asset tree is available:

    CHATTTS_ASSETS=/path/to/assets python tools/capture_real_fixtures.py

Writes ``tests/fixtures/real_assets.json`` with deterministic hashes and
statistics of the seeded pipeline (refine text, near-greedy code tokens,
waveform stats).  ``tests/test_real_assets.py::test_real_assets_pinned_fixtures``
then pins every future run against them - the reference's issue-regression
tests (#511/#588/#655) done the TPU way: seeded, hashed, asserted.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures", "real_assets.json")


def _sha(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def capture(chat) -> dict:
    """Deterministic pipeline observables for a loaded real-weight Chat."""
    from chattts_tpu.core import Chat

    text = "What is [uv_break]your favorite english food?[laugh][lbreak]"
    refined = chat.infer(
        text, refine_text_only=True, split_text=False,
        params_refine_text=Chat.RefineTextParams(
            prompt="[oral_2][laugh_0][break_6]", manual_seed=12345))
    from chattts_tpu.config import load_spk_stat_string
    from chattts_tpu.models.speaker import Speaker

    # deterministic speaker: fresh seeded sampler, independent of how many
    # draws the shared chat.speaker has already made
    spk = Speaker(chat.config.gpt.hidden_size, load_spk_stat_string(),
                  seed=7).sample_random()
    params = Chat.InferCodeParams(
        top_P=0.005, top_K=1, temperature=0.01, manual_seed=42,
        spk_emb=spk)
    wavs = chat.infer("What is your favorite english food?",
                      skip_refine_text=True, split_text=False,
                      params_infer_code=params)
    wav = wavs[0]
    return {
        "refined_text": refined[0] if isinstance(refined, list) else refined,
        "wav_samples": int(wav.size),
        "wav_rms": float(np.sqrt(np.mean(wav.astype(np.float64) ** 2))),
        "wav_sha256": _sha((wav * 32767).astype(np.int16)),
        "coef": chat.coef,
    }


def main() -> int:
    sys.path.insert(0, REPO)
    import jax

    from chattts_tpu.core import Chat
    from chattts_tpu.utils import io as io_utils

    assets = io_utils.find_assets_dir(os.environ.get("CHATTTS_ASSETS"))
    if assets is None:
        print("no asset tree found (set CHATTTS_ASSETS)", file=sys.stderr)
        return 1
    print(f"assets: {assets}  backend: {jax.default_backend()}")
    chat = Chat()
    if not chat.load(source="custom", custom_path=assets):
        print("load failed (checksum mismatch?)", file=sys.stderr)
        return 1
    fx = capture(chat)
    os.makedirs(os.path.dirname(FIXTURES), exist_ok=True)
    with open(FIXTURES, "w") as f:
        json.dump(fx, f, indent=2, sort_keys=True)
    print(f"wrote {FIXTURES}:")
    print(json.dumps(fx, indent=2, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
