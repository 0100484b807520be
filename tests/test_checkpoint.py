"""Checkpoint round trips: safetensors pytree I/O + orbax train state."""

import numpy as np
import jax
import jax.numpy as jnp

from chattts_tpu import train
from chattts_tpu.models import llama
from chattts_tpu.utils import checkpoint


def test_params_safetensors_round_trip(tmp_path, tiny_config):
    params = llama.init_params(jax.random.PRNGKey(0), tiny_config.gpt,
                               dtype=jnp.float32)
    p = str(tmp_path / "gpt.safetensors")
    checkpoint.save_params(p, params)
    template = llama.init_params(jax.random.PRNGKey(1), tiny_config.gpt,
                                 dtype=jnp.float32)
    restored = checkpoint.load_params(p, template)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_train_state_round_trip(tmp_path, tiny_config):
    cfg = tiny_config.gpt
    opt = train.make_optimizer()
    state = train.init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = train.make_train_step(cfg, opt)
    batch = train.random_batch(jax.random.PRNGKey(1), cfg, 2, 16)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    path = checkpoint.save_train_state(str(tmp_path / "ckpt"), state)
    template = train.init_train_state(jax.random.PRNGKey(2), cfg, opt)
    template = train.TrainState(template.gpt, template.embed,
                                template.opt_state, state.step)
    restored = checkpoint.restore_train_state(path, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.gpt), jax.tree.leaves(restored.gpt)):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32), atol=0)
    # training continues from the restored state
    state2, m2 = step_fn(restored, batch)
    assert np.isfinite(float(m2["loss"]))
