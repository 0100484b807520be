"""Behavioral regressions modeled on the reference's issue tests (SURVEY §4).

The reference ships three end-to-end scripts (#511 batched infer, #588
refine-length bound, #655 seeded determinism + tokenizer round trip) that
need downloaded weights; these run the same behavioral contracts on the tiny
random-weight model.
"""

import numpy as np
import pytest

from chattts_tpu.core import Chat
from chattts_tpu.models.speaker import Speaker


@pytest.fixture(scope="module")
def chat(tiny_config):
    c = Chat(config=tiny_config)
    c.load(source="random", seed=0)
    return c


def test_batched_infer_returns_wav_per_text(chat):
    """#511: batched non-streaming infer returns audio for every input,
    near-greedy sampling."""
    texts = [f"sentence number {i} [uv_break] with a tag" for i in range(4)]
    params = Chat.InferCodeParams(
        top_K=1, top_P=0.005, max_new_token=12, min_new_token=6,
        manual_seed=42)
    wavs = chat.infer(texts, skip_refine_text=True, split_text=False,
                      params_infer_code=params)
    assert len(wavs) == 4
    for w in wavs:
        assert w is not None and w.dtype == np.float32


def test_refine_output_length_bounded(chat):
    """#588: refined text must stay within ~4x the input length."""
    text = "a short prompt to refine"
    out = chat.infer(text, refine_text_only=True, split_text=False,
                     params_refine_text=Chat.RefineTextParams(
                         max_new_token=4 * len(text), manual_seed=9))
    if isinstance(out, list):  # split_text=False returns the per-text list
        out = out[0]
    import re

    stripped = re.sub(r"\[[\w_]+\]", "", out)
    assert len(stripped) < 4 * len(text)


def test_seeded_refine_deterministic(chat):
    """#655a: identical manual_seed -> identical refined text."""
    p = Chat.RefineTextParams(max_new_token=10, manual_seed=12345)
    a = chat.infer("what is your favorite english food?",
                   refine_text_only=True, params_refine_text=p)
    b = chat.infer("what is your favorite english food?",
                   refine_text_only=True, params_refine_text=p)
    assert a == b


def test_prompt_decoration_and_tokenizer_round_trip(chat):
    """#655b: decorate -> encode -> decode reproduces the decorated prompt."""
    text = "what is [uv_break] your favorite english food?[laugh][lbreak]"
    decorated = Speaker.decorate_code_prompts(
        [text], "[speed_5]", None, spk_emb="x")[0]
    assert decorated.startswith("[Stts][spk_emb]")
    assert decorated.endswith("[Ptts]")
    ids, attn, tmask = chat.tokenizer.encode([decorated], chat.config.gpt.num_vq)
    assert attn.all() and tmask.all()
    round_trip = chat.tokenizer.decode([ids[0, :, 0]])[0]
    assert round_trip == decorated


def test_decorate_strips_stale_control_tokens():
    """decorate_code_prompts removes pre-existing [Stts]/[spk_emb]/[empty_spk]
    from user text (speaker.py:60-71, issue #459)."""
    out = Speaker.decorate_code_prompts(
        ["[Stts][spk_emb] hi [empty_spk]"], "", None, None)[0]
    assert out == "[Stts][empty_spk]hi[Ptts]"


def test_pyproject_packages_complete():
    """pyproject.toml must list every chattts_tpu subpackage and carry the
    resource globs - a new subpackage that isn't listed silently ships a
    broken wheel (pip install . then import fails)."""
    import pathlib
    import tomllib

    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = tomllib.loads((root / "pyproject.toml").read_text())
    listed = set(cfg["tool"]["setuptools"]["packages"])
    found = {"chattts_tpu"} | {
        f"chattts_tpu.{p.parent.name}"
        for p in (root / "chattts_tpu").glob("*/__init__.py")
    }
    assert listed == found
    data = cfg["tool"]["setuptools"]["package-data"]["chattts_tpu"]
    res = root / "chattts_tpu" / "res"
    for f in res.iterdir():
        assert any(f.match(g.split("/")[-1]) for g in data
                   if g.startswith("res/")), f.name


def test_compile_cache_dir_machine_keyed_for_cpu_and_unknown():
    """XLA:CPU AOT executables bake in host-ISA tuning features, so CPU
    cache entries must never cross machines - including when JAX_PLATFORMS
    is UNSET (which defaults to CPU on accelerator-less hosts).  Only
    platforms whose executables come from machine-independent compilers
    share the top-level dir."""
    import os

    import chattts_tpu as pkg

    base = os.path.join("some", "base")
    for plat in ("axon", "tpu", "cuda", "rocm", "gpu", "proxy"):
        assert pkg._cache_dir_for(plat, base) == base
    for plat in ("", "cpu"):
        sub = pkg._cache_dir_for(plat, base)
        assert sub.startswith(base + os.sep + "cpu-") and sub != base
    # same machine -> same key (warm cache); the key is content-derived
    assert pkg._cache_dir_for("cpu", base) == pkg._cache_dir_for("cpu", base)
