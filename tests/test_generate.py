"""Generation engine tests on the tiny config (jitted loop semantics)."""

import numpy as np
import jax
import pytest

from chattts_tpu.engine.generate import GenerateRequest, Generator
from chattts_tpu.models import embed as embed_mod
from chattts_tpu.models import llama


@pytest.fixture(scope="module")
def gen(tiny_config):
    cfg = tiny_config.gpt
    gp = llama.init_params(jax.random.PRNGKey(0), cfg)
    ep = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
    return Generator(cfg, gp, ep, prefill_bucket=16)


def _req(cfg, infer_text=False, **kw):
    B, T0 = 2, 7
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 50, (B, T0, cfg.num_vq)).astype(np.int32)
    attn = np.ones((B, T0), bool)
    attn[0, :2] = False
    tmask = attn.copy()
    defaults = dict(
        ids=ids, attn_mask=attn, text_mask=tmask, infer_text=infer_text,
        eos_token=cfg.num_text_tokens - 1,
        temperature=np.full((1 if infer_text else cfg.num_vq,), 0.7, np.float32),
        max_new=12, min_new=4, seed=123, return_hidden=True)
    defaults.update(kw)
    return GenerateRequest(**defaults)


def test_code_generation_shapes(gen, tiny_config):
    cfg = tiny_config.gpt
    out = next(gen.generate(_req(cfg)))
    assert len(out.ids) == 2
    for ids, hid in zip(out.ids, out.hiddens):
        assert ids.ndim == 2 and ids.shape[1] == cfg.num_vq
        assert ids.shape[0] >= 4  # min_new honored unless EOS impossible
        assert hid.shape == (ids.shape[0], cfg.hidden_size)
        # EOS never inside the kept region
        assert (ids < cfg.num_audio_tokens - 1).all()


def test_text_generation_shapes(gen, tiny_config):
    cfg = tiny_config.gpt
    out = next(gen.generate(_req(cfg, infer_text=True)))
    for ids in out.ids:
        assert ids.ndim == 1
        assert (ids != cfg.num_text_tokens - 1).all()


def test_seeded_determinism(gen, tiny_config):
    cfg = tiny_config.gpt
    a = next(gen.generate(_req(cfg)))
    b = next(gen.generate(_req(cfg)))
    for x, y in zip(a.ids, b.ids):
        np.testing.assert_array_equal(x, y)


def test_different_seeds_differ(gen, tiny_config):
    cfg = tiny_config.gpt
    a = next(gen.generate(_req(cfg, seed=1, max_new=16)))
    b = next(gen.generate(_req(cfg, seed=2, max_new=16)))
    assert any(
        x.shape != y.shape or not np.array_equal(x, y)
        for x, y in zip(a.ids, b.ids))


def test_streaming_yields_prefixes(gen, tiny_config):
    cfg = tiny_config.gpt
    outs = list(gen.generate(_req(cfg, stream_batch=4, max_new=12)))
    assert len(outs) >= 1
    final = outs[-1]
    for partial in outs[:-1]:
        for p, f in zip(partial.ids, final.ids):
            assert p.shape[0] <= f.shape[0]
            np.testing.assert_array_equal(p, f[: p.shape[0]])


def test_prompt_bucketing_pads_left(gen, tiny_config):
    """Different prompt lengths in the same bucket reuse one compilation and
    produce per-sequence results."""
    cfg = tiny_config.gpt
    req = _req(cfg)
    out = next(gen.generate(req))
    req2 = _req(cfg)
    req2.ids = req2.ids[:, :5]
    req2.attn_mask = np.ones((2, 5), bool)
    req2.text_mask = np.ones((2, 5), bool)
    out2 = next(gen.generate(req2))
    assert len(out2.ids) == 2


def test_streaming_retry_yields_discarded_final(gen, tiny_config, monkeypatch):
    """When the empty-generation retry restarts a STREAMING attempt, the
    failed attempt's final output (partial=False) must still be yielded:
    consumers detect the restart as "a yield arriving after a final" and
    drop the discarded attempt's accumulation (core._attempt_stream)."""
    cfg = tiny_config.gpt
    real = gen._run_once
    calls = {"n": 0}

    def forced(req, context, attempt):
        st, status, ids_np = yield from real(req, context, attempt)
        calls["n"] += 1
        if calls["n"] == 1:
            status = status.copy()
            status[2] = 1  # claim any_empty: forces the retry path
        return st, status, ids_np

    monkeypatch.setattr(gen, "_run_once", forced)
    outs = list(gen.generate(_req(cfg, stream_batch=4, max_new=12,
                                  seed=None)))
    finals = [i for i, o in enumerate(outs) if not o.partial]
    # two attempt-finals: the discarded attempt's and the accepted one's
    assert len(finals) == 2
    assert finals[-1] == len(outs) - 1
    # the consumer-side wrapper must flag the restart on the next yield
    from chattts_tpu.core import Chat

    restarts = [r for r, _ in Chat._attempt_stream(iter(outs))]
    assert restarts[finals[0] + 1] is True
    assert not any(restarts[: finals[0] + 1])


def test_streaming_speculation_equivalence(gen, tiny_config):
    """speculate_from=k (sync head, dispatch-ahead steady state) yields the
    same cumulative partials and identical final tokens as the synchronous
    chunk loop."""
    cfg = tiny_config.gpt

    def run(**kw):
        outs = list(gen.generate(_req(
            cfg, stream_batch=3, max_new=12, min_new=6, seed=77, **kw)))
        return outs

    sync = run()
    spec0 = run(speculate=True)                    # dispatch-ahead from 0
    spec2 = run(speculate=True, speculate_from=2)  # streaming hybrid
    for variant in (spec0, spec2):
        assert len(variant) == len(sync)
        for a, b in zip(variant, sync):
            assert a.partial == b.partial
            for ia, ib in zip(a.ids, b.ids):
                np.testing.assert_array_equal(ia, ib)
        for ha, hb in zip(variant[-1].materialize_hiddens(),
                          sync[-1].materialize_hiddens()):
            np.testing.assert_allclose(ha, hb, atol=0)


def test_retrace_with_new_packed_structure(tiny_config):
    """Switching the packed-slab pytree structure between generations in
    ONE process (e.g. CHATTTS_STEP_INT8 toggled between loads) forces the
    chunk fn to retrace.  Regression: the while_loop body bound its params
    through mutable closure cells, and jax's while_loop jaxpr cache (keyed
    on body-function identity + avals) reused the PREVIOUS trace's cell
    tracers as constants -> UnexpectedTracerError on the retrace.  Params
    now bind via a fresh functools.partial per trace."""
    cfg = tiny_config.gpt
    gp = llama.init_params(jax.random.PRNGKey(0), cfg)
    ep = embed_mod.init_params(jax.random.PRNGKey(1), cfg)

    g1 = Generator(cfg, gp, ep, prefill_bucket=16)
    g1._packed = {}
    out1 = next(g1.generate(_req(cfg)))

    g2 = Generator(cfg, gp, ep, prefill_bucket=16)
    # same _build_fns lru entry (same cfg/shape key), different packed
    # structure -> chunk_jit retraces with the cached step_body
    g2._packed = {"dummy": np.zeros((1,), np.float32)}
    out2 = next(g2.generate(_req(cfg)))  # raised UnexpectedTracerError

    # same request + seed => identical tokens (packed is unused unfused)
    for a, b in zip(out1.ids, out2.ids):
        np.testing.assert_array_equal(a, b)
