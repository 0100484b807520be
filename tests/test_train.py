"""Training step: loss decreases, grads flow to all params, shard-safe."""

import dataclasses

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from chattts_tpu import train
from chattts_tpu.parallel import mesh as mesh_mod


def test_loss_decreases_on_fixed_batch(tiny_config):
    cfg = tiny_config.gpt
    opt = train.make_optimizer(lr=3e-3, warmup=1)
    state = train.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = train.make_train_step(cfg, opt)
    batch = train.random_batch(jax.random.PRNGKey(1), cfg, 2, 24)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizing a fixed batch


def test_grads_reach_all_params(tiny_config):
    cfg = tiny_config.gpt
    import jax.numpy as jnp
    from chattts_tpu.models import embed as em
    from chattts_tpu.models import llama

    gp = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ep = em.init_params(jax.random.PRNGKey(1), cfg)
    batch = train.random_batch(jax.random.PRNGKey(2), cfg, 2, 16)
    grads = jax.grad(
        lambda g, e: train.loss_fn(g, e, batch, cfg), argnums=(0, 1))(gp, ep)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # every parameter tensor receives nonzero gradient somewhere
    nonzero = [float(np.abs(np.asarray(l, np.float32)).max()) > 0
               for l in jax.tree.leaves(grads)]
    assert sum(nonzero) >= len(nonzero) - 1  # text head may miss rare ids


def test_pp_forward_matches_prefill(tiny_config):
    """Pipeline-parallel forward (4 stages x 3 microbatches, shard_map +
    ppermute) computes the same layer-stack output as llama.prefill."""
    import jax.numpy as jnp
    from chattts_tpu.models import llama
    from chattts_tpu.models.llama import KVCache
    from chattts_tpu.parallel import pipeline as pl

    cfg = dataclasses.replace(tiny_config.gpt, num_hidden_layers=4)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    B, T = 6, 16
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                            jnp.float32)
    attn = np.ones((B, T), bool)
    attn[1, :3] = False  # a left-padded row exercises the bias path
    attn = jnp.asarray(attn)
    positions = jnp.maximum(jnp.cumsum(attn.astype(jnp.int32), axis=1) - 1, 0)

    ref, _ = llama.prefill(params, emb, attn, positions,
                           KVCache.create(cfg, B, T), cfg)

    mesh = pl.make_pp_mesh(4)
    stacked = jax.device_put(
        pl.stack_layers(params["layers"]),
        NamedSharding(mesh, P("pp")))
    fwd = pl.make_pp_forward(cfg, mesh, n_micro=3)
    out = fwd(stacked, emb, attn, positions)
    hidden = llama.rms_norm(out, params["norm"],
                            cfg.rms_norm_eps).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # round trip of the stacked layout
    back = pl.unstack_layers(stacked, cfg.num_hidden_layers)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params["layers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_train_step_matches_plain(tiny_config):
    """One pp train step (grads flow back through the ppermute ring) matches
    the plain step's loss and updated parameters."""
    from chattts_tpu.parallel import pipeline as pl

    cfg = dataclasses.replace(tiny_config.gpt, num_hidden_layers=4)
    opt = train.make_optimizer(lr=3e-3, warmup=1)
    batch = train.random_batch(jax.random.PRNGKey(1), cfg, 4, 24)

    state = train.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    ref_state, ref_m = train.make_train_step(cfg, opt)(state, batch)

    mesh = pl.make_pp_mesh(2)
    pstate = pl.init_pp_state(jax.random.PRNGKey(0), cfg, opt, mesh)
    step = pl.make_pp_train_step(cfg, opt, mesh, n_micro=2)
    new_state, m = step(pstate, batch)

    assert np.isclose(float(m["loss"]), float(ref_m["loss"]),
                      rtol=2e-4, atol=1e-5)
    ref_stacked = pl.stack_layers(ref_state.gpt["layers"])
    for a, b in zip(jax.tree.leaves(new_state.gpt["stacked"]),
                    jax.tree.leaves(ref_stacked)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-4)
    for a, b in zip(jax.tree.leaves(new_state.embed),
                    jax.tree.leaves(ref_state.embed)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-4)


def test_sp_sharded_step_matches_unsharded(tiny_config):
    """One train step on a dp=2 x sp=2 x tp=2 mesh (sequence axis sharded,
    params replicated over sp) produces the same loss and updated params as
    the unsharded step - GSPMD inserts the attention all-gathers over sp and
    the grad psums over dp/sp, so only placement differs."""
    cfg = tiny_config.gpt
    opt = train.make_optimizer(lr=3e-3, warmup=1)
    state0 = train.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = train.random_batch(jax.random.PRNGKey(1), cfg, 4, 32)
    step = train.make_train_step(cfg, opt)

    ref_state, ref_m = step(state0, batch)
    ref_loss = float(ref_m["loss"])

    mesh = mesh_mod.make_mesh(dp=2, sp=2, tp=2)
    state0 = train.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    gpt_s = mesh_mod.shard_params(state0.gpt, mesh_mod.gpt_param_specs(cfg),
                                  mesh)
    emb_s = mesh_mod.shard_params(state0.embed,
                                  mesh_mod.embed_param_specs(cfg), mesh)
    opt_s = opt.init((gpt_s, emb_s))
    state_s = train.TrainState(gpt_s, emb_s, opt_s, state0.step)
    batch_s = mesh_mod.shard_params(batch, mesh_mod.train_batch_specs(), mesh)

    step_s = train.make_train_step(cfg, opt)
    with mesh:
        new_state, m = step_s(state_s, batch_s)
    assert np.isclose(float(m["loss"]), ref_loss, rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves((ref_state.gpt, ref_state.embed)),
                    jax.tree.leaves((new_state.gpt, new_state.embed))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)
