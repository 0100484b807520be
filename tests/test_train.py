"""Training step: loss decreases, grads flow to all params, shard-safe."""

import numpy as np
import jax

from chattts_tpu import train


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
