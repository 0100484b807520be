"""StableHLO exporter: artifacts serialize, deserialize, and run."""

import numpy as np
import jax
import jax.numpy as jnp


def test_export_and_roundtrip(tmp_path, tiny_config, monkeypatch):
    monkeypatch.setattr("chattts_tpu.config.Config", lambda: tiny_config)
    import examples.exporter as ex

    sizes = ex.export_all(str(tmp_path), batch=1, prompt_len=8, max_new=16)
    assert set(sizes) == {"prefill", "decode_step", "heads", "vocoder"}
    assert all(v > 1000 for v in sizes.values())

    # artifacts reload and execute without the package's model code
    blob = (tmp_path / "heads.stablehlo").read_bytes()
    exported = jax.export.deserialize(blob)
    from chattts_tpu.models import embed as embed_mod

    ep = embed_mod.init_params(jax.random.PRNGKey(1), tiny_config.gpt)
    h = jnp.zeros((1, tiny_config.gpt.hidden_size), jnp.float32)
    out = exported.call(ep, h)
    assert out.shape == (1, tiny_config.gpt.num_vq,
                         tiny_config.gpt.num_audio_tokens)
    assert np.isfinite(np.asarray(out)).all()
