"""Continuous-batching engine tests (tiny config, CPU mesh)."""

import numpy as np
import jax
import pytest

from chattts_tpu.engine.batching import Engine, EngineConfig, EngineRequest
from chattts_tpu.models import embed as embed_mod
from chattts_tpu.models import llama


@pytest.fixture(scope="module")
def params(tiny_config):
    cfg = tiny_config.gpt
    return (llama.init_params(jax.random.PRNGKey(0), cfg),
            embed_mod.init_params(jax.random.PRNGKey(1), cfg))


def _mk_engine(tiny_config, params, **kw):
    cfg = tiny_config.gpt
    defaults = dict(max_num_seqs=4, max_prompt_len=16, max_new_tokens=12,
                    chunk_steps=4, infer_text=False, collect_hidden=True)
    defaults.update(kw)
    ecfg = EngineConfig(**defaults)
    return Engine(cfg, ecfg, params[0], params[1])


def _req(cfg, rid, n=6, **kw):
    rng = np.random.default_rng(hash(rid) % 1000)
    d = dict(
        request_id=rid,
        ids=rng.integers(5, 50, (n, cfg.num_vq)).astype(np.int32),
        text_mask=np.ones((n,), bool),
        temperature=np.full((cfg.num_vq,), 0.7, np.float32),
        min_new=2, max_new=8)
    d.update(kw)
    return EngineRequest(**d)


def test_offline_generate_batch(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    reqs = [_req(cfg, f"r{i}", n=4 + i) for i in range(6)]  # > slots
    outs = eng.generate(reqs)
    assert [o.request_id for o in outs] == [f"r{i}" for i in range(6)]
    for o in outs:
        assert o.ids.ndim == 2 and o.ids.shape[1] == cfg.num_vq
        assert 0 <= o.ids.shape[0] <= 8
        assert o.hiddens.shape == (o.ids.shape[0], cfg.hidden_size)
        assert o.finish_reason in ("eos", "length")
        # EOS token never appears in kept output
        assert (o.ids < cfg.num_audio_tokens - 1).all()
    assert not eng.has_unfinished()


def test_length_finish_keeps_all_tokens(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    # min_new == max_new: EOS suppressed throughout -> always length-finish
    outs = eng.generate([_req(cfg, "r0", min_new=8, max_new=8)])
    assert outs[0].finish_reason == "length"
    assert outs[0].ids.shape[0] == 8


def test_continuous_admission(tiny_config, params):
    """More requests than slots: later requests admitted as slots free."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=2)
    outs = eng.generate([_req(cfg, f"r{i}") for i in range(5)])
    assert len(outs) == 5
    assert eng.stats["prefills"] == 5
    assert eng.stats["requests_finished"] == 5


def test_streaming_callback(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, chunk_steps=2)
    got = []
    req = _req(cfg, "s0", min_new=6, max_new=8,
               on_tokens=lambda rid, ids, hid, fin: got.append(
                   (ids.shape[0], hid is not None, fin)))
    outs = eng.generate([req])
    total = sum(g[0] for g in got)
    assert total == outs[0].ids.shape[0]
    assert all(g[1] for g in got)


def test_abort(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    eng.add_request(_req(cfg, "a0", max_new=8))
    eng.add_request(_req(cfg, "a1", max_new=8))
    assert eng.abort_request("a1")  # still waiting
    eng.step()  # admits + runs a0
    assert eng.abort_request("a0")  # now running
    assert not eng.abort_request("missing")
    assert not eng.has_unfinished()


def test_text_mode(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, infer_text=True,
                     text_eos_token=cfg.num_text_tokens - 1,
                     collect_hidden=False)
    outs = eng.generate([_req(cfg, "t0", temperature=np.asarray([0.7]))])
    assert outs[0].ids.ndim == 1
    assert outs[0].hiddens is None
    assert (outs[0].ids != cfg.num_text_tokens - 1).all()


def test_prompt_too_long_rejected(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    with pytest.raises(ValueError):
        eng.add_request(_req(cfg, "x", n=20))


def test_mesh_sharded_engine(tiny_config, params):
    """Engine state/params shard over a dp x tp mesh; results stay correct."""
    from chattts_tpu.parallel.mesh import make_mesh

    cfg = tiny_config.gpt
    mesh = make_mesh(dp=4, tp=2)
    eng = _mk_engine(tiny_config, params)  # unsharded baseline
    base = eng.generate([_req(cfg, "m0", min_new=6, max_new=8)])

    from chattts_tpu.engine.batching import Engine, EngineConfig

    ecfg = EngineConfig(max_num_seqs=4, max_prompt_len=16, max_new_tokens=12,
                        chunk_steps=4, infer_text=False, collect_hidden=True)
    eng_m = Engine(cfg, ecfg, params[0], params[1], mesh=mesh)
    with mesh:
        outs = eng_m.generate([_req(cfg, "m0", min_new=6, max_new=8)])
    assert len(outs) == 1
    assert outs[0].ids.ndim == 2 and outs[0].ids.shape[1] == cfg.num_vq
    assert 6 <= outs[0].ids.shape[0] <= 8
    assert outs[0].hiddens.shape == (outs[0].ids.shape[0], cfg.hidden_size)
    # note: token-exact equality with the unsharded engine is NOT required -
    # tp-sharded reductions reassociate floats and can flip sampling ties.
    # determinism within the sharded engine must hold:
    eng_m2 = Engine(cfg, ecfg, params[0], params[1], mesh=mesh)
    with mesh:
        outs2 = eng_m2.generate([_req(cfg, "m0", min_new=6, max_new=8)])
    np.testing.assert_array_equal(outs[0].ids, outs2[0].ids)
    assert base[0].ids.shape[1] == outs[0].ids.shape[1]


def test_mesh_bad_dp_rejected(tiny_config, params):
    from chattts_tpu.parallel.mesh import make_mesh
    from chattts_tpu.engine.batching import Engine, EngineConfig

    mesh = make_mesh(dp=8, tp=1)
    ecfg = EngineConfig(max_num_seqs=6, max_prompt_len=16, max_new_tokens=8)
    with pytest.raises(ValueError):
        Engine(tiny_config.gpt, ecfg, params[0], params[1], mesh=mesh)


def test_prompt_buckets(tiny_config, params):
    """Short prompts prefill in a small bucket, long ones in a larger bucket;
    results keep per-request semantics."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, prompt_buckets=(8, 16))
    outs = eng.generate([_req(cfg, "b0", n=5, min_new=3, max_new=6),
                         _req(cfg, "b1", n=12, min_new=3, max_new=6)])
    assert len(outs) == 2
    for o in outs:
        assert 3 <= o.ids.shape[0] <= 6


def test_prompt_bucket_validation(tiny_config, params):
    from chattts_tpu.engine.batching import Engine, EngineConfig

    ecfg = EngineConfig(max_num_seqs=2, max_prompt_len=16,
                        max_new_tokens=8, prompt_buckets=(8, 32))
    with pytest.raises(ValueError):
        Engine(tiny_config.gpt, ecfg, params[0], params[1])
