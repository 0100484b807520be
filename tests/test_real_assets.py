"""Real-weight end-to-end validation (skipped until assets exist).

Pre-staged harness for the day a ChatTTS asset tree appears (VERDICT r2
next-#6): point ``CHATTTS_ASSETS`` at the tree (or place ``asset/`` in the
cwd) and ``pytest -k real_assets`` runs the reference's regression suite
semantics against real weights with zero new code:

* checksum verification of all assets (reference utils/dl.py:66-111)
* all five checkpoints + tokenizer load through the key-map loaders
* the tests/#655.py tokenizer/prompt round trip, byte-exact golden
* tests/#588.py refine-length regression + seeded determinism
* one utterance per conditioning mode (random speaker / spk_emb / clone)
* optional pinned fixtures (tools/capture_real_fixtures.py writes them)

Every number that CAN be validated without assets already is (per-module
goldens vs HF/torch in the other test files); this module covers the
composed pipeline vs reference behavior (reference core.py:386-539,
tests/#511.py, #588.py, #655.py).
"""

import json
import os

import numpy as np
import pytest

from chattts_tpu.utils import io as io_utils

ASSETS = io_utils.find_assets_dir(os.environ.get("CHATTTS_ASSETS"))

pytestmark = pytest.mark.skipif(
    ASSETS is None, reason="no ChatTTS asset tree (set CHATTTS_ASSETS)")

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "real_assets.json")


@pytest.fixture(scope="module")
def real_chat():
    from chattts_tpu.core import Chat

    c = Chat()
    assert c.load(source="custom", custom_path=ASSETS), "load failed"
    return c


def test_real_assets_checksums():
    from chattts_tpu.utils import dl

    assert dl.check_all_assets(ASSETS), "sha256 verification failed"


def test_real_assets_all_checkpoints_load(real_chat):
    c = real_chat
    for attr in ("dvae_params", "decoder_params", "vocos_params",
                 "embed_params", "gpt_params"):
        params = getattr(c, attr)
        flat = []

        def walk(x):
            if isinstance(x, dict):
                for v in x.values():
                    walk(v)
            elif isinstance(x, (tuple, list)):
                for v in x:
                    walk(v)
            else:
                flat.append(np.asarray(x))

        walk(params)
        assert flat, attr
        for a in flat:
            assert np.isfinite(a).all(), f"non-finite weights in {attr}"
    # the HF tokenizer backend loaded (not the test fallback)
    assert type(c.tokenizer._backend).__name__ == "_HFBackend"


def test_real_assets_prompt_round_trip(real_chat):
    """tests/#655.py part (b): decorate -> encode -> decode reproduces the
    exact control-token string (byte-for-byte reference golden)."""
    c = real_chat
    from chattts_tpu.models.speaker import Speaker

    spk = c.sample_random_speaker()
    text = ["What is [uv_break]your favorite english food?[laugh][lbreak]"]
    prompts = Speaker.decorate_code_prompts(text, "speed_5", None, spk)
    ids, attn, tmask = c.tokenizer.encode(prompts, c.config.gpt.num_vq)
    n = int(attn[0].sum())
    recoded = c.tokenizer.decode([ids[0, ids.shape[1] - n:, 0]])
    assert recoded[0] == (
        "[Stts] [spk_emb] [speed_5] what is [uv_break] your favorite "
        "english food? [laugh] [lbreak] [Ptts]")


def test_real_assets_refine_regressions(real_chat):
    """tests/#588.py: refined text bounded by 4x the input length; plus
    seeded determinism (the #655 golden text is torch-RNG-specific, so the
    portable property is determinism for a fixed seed)."""
    from chattts_tpu.core import Chat

    c = real_chat
    text = "What is [uv_break]your favorite english food?[laugh][lbreak]"
    p = Chat.RefineTextParams(prompt="[oral_2][laugh_0][break_6]",
                              manual_seed=12345)
    out1 = c.infer(text, refine_text_only=True, split_text=False,
                   params_refine_text=p)
    out2 = c.infer(text, refine_text_only=True, split_text=False,
                   params_refine_text=p)
    assert out1 == out2, "seeded refine not deterministic"
    assert len(out1) <= 4 * len(text), f"runaway refine: {out1!r}"


def _wav_ok(wav, min_s=0.2, max_s=40.0, sr=24000):
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()
    assert min_s * sr <= wav.size <= max_s * sr, wav.size
    assert np.abs(wav).max() > 1e-3, "silent output"


def test_real_assets_one_utterance_per_mode(real_chat):
    """tests/#511.py essence: every conditioning mode yields real audio."""
    from chattts_tpu.core import Chat

    c = real_chat
    text = "What is your favorite english food?"
    near_greedy = dict(top_P=0.005, top_K=1, temperature=0.01,
                       manual_seed=42)
    # default: random speaker embedding
    spk = c.sample_random_speaker()
    wavs = c.infer(text, skip_refine_text=True, split_text=False,
                   params_infer_code=Chat.InferCodeParams(
                       spk_emb=spk, **near_greedy))
    _wav_ok(wavs[0])
    # zero-shot clone: encode the first output as the prompt
    smp = c.sample_audio_speaker(wavs[0])
    wavs2 = c.infer(text, skip_refine_text=True, split_text=False,
                    params_infer_code=Chat.InferCodeParams(
                        spk_smp=smp, txt_smp=text, **near_greedy))
    _wav_ok(wavs2[0])
    # unconditioned (empty speaker) path
    wavs3 = c.infer(text, skip_refine_text=True, split_text=False,
                    params_infer_code=Chat.InferCodeParams(**near_greedy))
    _wav_ok(wavs3[0])


def test_real_assets_gfsq_round_trip(real_chat):
    """With real DVAE weights: encode(decode-ish) audio -> indices in range,
    and the DVAE decode of those indices is finite non-silence.  This is
    the first true anchor for the GFSQ implementation beyond the
    self-derived goldens in test_gfsq.py (provenance caveat there)."""
    c = real_chat
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    smp = c.sample_audio_speaker(wav)
    from chattts_tpu import codecs

    codes = codecs.decode_code_prompt(smp)
    assert codes.shape[0] == c.config.gpt.num_vq
    assert codes.min() >= 0 and codes.max() < 625
    import jax.numpy as jnp

    mel = np.asarray(c._decode_indices_jit(c.dvae_params,
                                           jnp.asarray(codes.T[None])))
    assert np.isfinite(mel).all()


def test_real_assets_pinned_fixtures(real_chat):
    """Compare against captured fixtures when they exist
    (tools/capture_real_fixtures.py writes them on first run)."""
    if not os.path.isfile(FIXTURES):
        pytest.skip("no pinned fixtures yet; run "
                    "tools/capture_real_fixtures.py")
    with open(FIXTURES) as f:
        fx = json.load(f)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "capture_real_fixtures",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "capture_real_fixtures.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    got = mod.capture(real_chat)
    for k, v in fx.items():
        if isinstance(v, float):
            assert abs(got[k] - v) <= max(1e-4, 1e-3 * abs(v)), (
                k, got[k], v)
        else:
            assert got[k] == v, (k, got[k], v)
