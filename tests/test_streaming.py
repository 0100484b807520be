"""Incremental streaming vocoder: emitted samples == full decode."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chattts_tpu.engine.streaming import StreamingDecoder
from chattts_tpu.models import dvae as dvae_mod
from chattts_tpu.models import vocos as vocos_mod


@pytest.fixture(scope="module")
def pipeline(tiny_config):
    dp = dvae_mod.init_decoder_params(jax.random.PRNGKey(0),
                                      tiny_config.decoder)
    vp = vocos_mod.init_params(jax.random.PRNGKey(1), tiny_config.vocos)

    def decode(feats):
        mel = dvae_mod.decode_from_hidden(dp, jnp.asarray(feats),
                                          tiny_config.decoder)
        return np.asarray(vocos_mod.decode(vp, mel, tiny_config.vocos))

    return jax.jit(
        lambda f: vocos_mod.decode(
            vp, dvae_mod.decode_from_hidden(dp, f, tiny_config.decoder),
            tiny_config.vocos)), decode


def test_incremental_matches_full(pipeline, tiny_config, rng):
    decode_jit, decode_np = pipeline
    B, T, C = 2, 90, tiny_config.decoder.stack.idim * 2
    feats = rng.standard_normal((B, T, C)).astype(np.float32)

    full = decode_np(feats)  # (B, (2T-1)*256)

    sd = StreamingDecoder(lambda w: np.asarray(decode_jit(jnp.asarray(w))),
                          B, C, ctx=40, guard=32, window=96)
    chunks = []
    step = 13
    for hi in range(step, T + step, step):
        hi = min(hi, T)
        items = [feats[b, :hi] for b in range(B)]
        out = sd.update(items, final=(hi == T))
        if out.size:
            chunks.append(out)
    inc = np.concatenate(chunks, axis=1)
    assert inc.shape == full.shape
    np.testing.assert_allclose(inc, full, atol=2e-4)


def test_one_shot_final(pipeline, tiny_config, rng):
    """A single final update (short utterance): equals the right-padded
    decode the reference's own batched path would produce (zero-pad to the
    window), trimmed to the true signal length."""
    decode_jit, decode_np = pipeline
    C = tiny_config.decoder.stack.idim * 2
    T = 20
    feats = rng.standard_normal((1, T, C)).astype(np.float32)
    padded = np.pad(feats, ((0, 0), (0, 96 - T), (0, 0)))
    full_padded = np.asarray(decode_jit(jnp.asarray(padded)))[:, : (2 * T - 1) * 256]
    sd = StreamingDecoder(lambda w: np.asarray(decode_jit(jnp.asarray(w))),
                          1, C, ctx=40, guard=32, window=96)
    out = sd.update([feats[0]], final=True)
    assert out.shape == full_padded.shape
    np.testing.assert_allclose(out, full_padded, atol=2e-4)
    # and the interior (away from the padded tail) matches the exact decode
    full = decode_np(feats)
    interior = (T - 16) * 512
    np.testing.assert_allclose(out[:, :interior], full[:, :interior],
                               atol=2e-4)


def test_no_emission_before_guard(pipeline, tiny_config, rng):
    decode_jit, _ = pipeline
    C = tiny_config.decoder.stack.idim * 2
    sd = StreamingDecoder(lambda w: np.asarray(decode_jit(jnp.asarray(w))),
                          1, C, ctx=40, guard=32, window=96)
    feats = rng.standard_normal((10, C)).astype(np.float32)
    out = sd.update([feats], final=False)  # 10 < guard
    assert out.shape == (1, 0)


def test_device_decoder_matches_host_decoder(pipeline, tiny_config, rng):
    """DeviceStreamingDecoder (on-device slice/pad/mask/roll windows) emits
    the same samples as the host StreamingDecoder."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    decode_jit, decode_np = pipeline
    B, T, C = 2, 90, tiny_config.decoder.stack.idim * 2
    feats = rng.standard_normal((B, T, C)).astype(np.float32)

    host = StreamingDecoder(lambda w: np.asarray(decode_jit(jnp.asarray(w))),
                            B, C, ctx=40, guard=32, window=96)

    window = 96

    def dev_window(feats_dev, lo, hi, pad_left, end=None):
        f = jnp.pad(feats_dev, ((0, 0), (0, window), (0, 0)))
        sl = jax.lax.dynamic_slice(f, (0, lo, 0), (B, window, C))
        t = jnp.arange(window)
        sl = jnp.where((t < (hi - lo))[None, :, None], sl, 0.0)
        sl = jnp.roll(sl, pad_left, axis=1)
        sl = jnp.where((t >= pad_left)[None, :, None], sl, 0.0)
        return decode_jit(sl)

    dev = DeviceStreamingDecoder(jax.jit(dev_window), B, C,
                                 ctx=40, guard=32, window=window)
    feats_dev = jnp.asarray(feats)
    step = 17
    for hi in range(step, T + step, step):
        hi = min(hi, T)
        items = [feats[b, :hi] for b in range(B)]
        a = host.update(items, final=(hi == T))
        b = dev.update_dev(feats_dev[:, :hi], hi, final=(hi == T))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_streaming_facade_total_length(tiny_config):
    """Facade streaming: chunks concatenate to the full utterance."""
    from chattts_tpu.core import Chat

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0)
    p = Chat.InferCodeParams(max_new_token=24, min_new_token=20,
                             manual_seed=3, stream_batch=6,
                             pass_first_n_batches=0, stream_speed=2048)
    chunks = list(chat.infer("stream me", stream=True,
                             skip_refine_text=True, params_infer_code=p))
    assert len(chunks) >= 2
    total = sum(c.shape[1] for c in chunks)
    assert total > 0


def test_first_guard_error_decays(pipeline, tiny_config, rng):
    """Reduced first-emission guard: the approximation is confined to the
    positions nearest the cone edge and decays with distance."""
    decode_jit, decode_np = pipeline
    C = tiny_config.decoder.stack.idim * 2
    T = 60
    feats = rng.standard_normal((1, T, C)).astype(np.float32)
    full = decode_np(feats)

    sd = StreamingDecoder(lambda w: np.asarray(decode_jit(jnp.asarray(w))),
                          1, C, ctx=40, guard=32, window=96, first_guard=8)
    first = sd.update([feats[:, :48][0]], final=False)  # emits [0, 40)
    assert first.shape[1] == 40 * 512
    ref = full[:, : first.shape[1]]
    err = np.abs(first - ref).max(axis=0)
    # positions well inside the exact guard distance are bit-identical-ish
    exact_until = (48 - 32) * 512
    assert err[:exact_until].max() < 2e-4
    # approximate region error is bounded and the overall scale is sane
    assert err.max() < 0.15 * np.abs(ref).max()
    # quantified bound on the whole first window: the reduced-guard
    # approximation stays far below audibility (measured ~125 dB SNR on
    # this geometry; assert a conservative floor)
    snr_db = 10 * np.log10(
        float((ref ** 2).sum()) / max(float(((first - ref) ** 2).sum()),
                                      1e-30))
    assert snr_db > 60.0, f"first-window SNR {snr_db:.1f} dB"

    # everything after the first emission is exact again
    rest = sd.update([feats[0]], final=True)
    inc = np.concatenate([first, rest], axis=1)
    np.testing.assert_allclose(inc[:, exact_until + 8 * 512:],
                               full[:, exact_until + 8 * 512:], atol=2e-4)


def test_incremental_chain_matches_full(tiny_config, rng):
    """Conv-state incremental vocoder (models/convnext.py stream apply +
    vocos.features_stream + istft_stream with one-chunk delayed consume)
    reproduces the full hidden->waveform decode exactly in its emitted
    region - no ctx/guard re-decode, O(new frames) per call."""
    from chattts_tpu.models import dvae as dvae_mod
    from chattts_tpu.models import vocos as vocos_mod
    from chattts_tpu.ops import stft

    cfg = tiny_config
    dp = dvae_mod.init_decoder_params(jax.random.PRNGKey(0), cfg.decoder)
    vp = vocos_mod.init_params(jax.random.PRNGKey(1), cfg.vocos)
    # non-tiny layer-scale so head-mask bugs cannot hide behind gamma=1e-6
    for b in dp["decoder"]["blocks"] + vp["blocks"]:
        b["gamma"] = jnp.full_like(b["gamma"], 0.3)

    B, n, Fh = 2, 96, 16
    hid = rng.standard_normal((B, n, cfg.decoder.stack.idim * 2)).astype(
        np.float32)
    mel_full = dvae_mod.decode_from_hidden(dp, jnp.asarray(hid), cfg.decoder)
    wav_full = np.asarray(vocos_mod.decode(vp, mel_full, cfg.vocos))

    F = 2 * Fh
    Dc = (dvae_mod.decoder_stream_offset(cfg.decoder)
          + vocos_mod.stream_offset(cfg.vocos))
    assert Dc <= F
    hop = cfg.vocos.hop_length
    dstate = dvae_mod.decoder_stream_init(B, cfg.decoder)
    vstate = vocos_mod.stream_init(B, cfg.vocos)
    carry = stft.istft_stream_init(B, cfg.vocos.n_fft, hop)
    prev = None
    emitted = []
    for c in range(n // Fh):
        t0 = jnp.int32(c * F)
        mel, dstate, cum = dvae_mod.decode_from_hidden_stream(
            dp, jnp.asarray(hid[:, c * Fh:(c + 1) * Fh]), dstate,
            cfg.decoder, t0=t0)
        spec, vstate = vocos_mod.features_stream(vp, mel, vstate, cfg.vocos,
                                                 t0=t0, cum_off=cum)
        if prev is not None:
            take = jnp.concatenate([prev, spec], axis=1)[:, Dc:Dc + F]
            raw, carry = stft.istft_stream(take, carry, cfg.vocos.n_fft, hop)
            emitted.append(np.asarray(raw))
        prev = spec
    stream = np.concatenate(emitted, axis=1)[:, cfg.vocos.n_fft // 2:]
    K = n // Fh
    valid = ((K - 1) * F * hop - cfg.vocos.n_fft // 2
             - (cfg.vocos.n_fft - hop))
    np.testing.assert_allclose(stream[:, :valid], wav_full[:, :valid],
                               atol=1e-5)



def _counted_dev_window(decode_jit, B, C, window, counter):
    """A device window fn with the facade's slice/pad/mask/roll semantics
    (core._device_window_fn) and an invocation counter."""
    def dev_window(feats_dev, lo, hi, pad_left, end=None):
        counter[0] += 1
        f = jnp.pad(jnp.asarray(feats_dev), ((0, 0), (0, window), (0, 0)))
        sl = jax.lax.dynamic_slice(f, (0, lo, 0), (B, window, C))
        t = jnp.arange(window)
        keep = (t < (hi - lo))[None, :]
        if end is not None:
            keep = keep & ((lo + t)[None, :] < jnp.asarray(end)[:, None])
        sl = jnp.where(keep[:, :, None], sl, 0.0)
        sl = jnp.roll(sl, pad_left, axis=1)
        sl = jnp.where((t >= pad_left)[None, :, None], sl, 0.0)
        return decode_jit(sl)
    return dev_window


def test_speculated_windows_match_inline(pipeline, tiny_config, rng):
    """speculate_window decoded ahead of the status read: consumed windows
    replace the inline dispatch (call counts equal) and the emitted audio
    is identical - the speculation passes the FULL generation buffer while
    the inline path passes per-chunk slices, so this also pins that the
    window fn's masking makes both views equivalent."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    decode_jit, _ = pipeline
    B, T, C = 2, 80, tiny_config.decoder.stack.idim * 2
    window = 96
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    # generation buffer: longer than T, garbage beyond the kept positions
    buf = np.concatenate(
        [feats, rng.standard_normal((B, 48, C)).astype(np.float32)], axis=1)
    full_buf = jnp.asarray(buf)
    end_dev = jnp.full((B,), T, jnp.int32)

    na, nb = [0], [0]
    spec = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, na), B, C,
        ctx=40, guard=32, window=window)
    plain = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, nb), B, C,
        ctx=40, guard=32, window=window)

    outs_a, outs_b = [], []
    step = 16
    for hi in range(step, T + step, step):
        hi = min(hi, T)
        final = hi == T
        if not final:
            # fired at chunk-dispatch time in the real system (on_dispatch)
            spec.speculate_window(full_buf, hi, end_dev)
        outs_a.append(spec.update_dev(jnp.asarray(feats[:, :hi]), hi,
                                      final=final, end_dev=end_dev))
        outs_b.append(plain.update_dev(jnp.asarray(feats[:, :hi]), hi,
                                       final=final, end_dev=end_dev))
    a = np.concatenate(outs_a, axis=1)
    b = np.concatenate(outs_b, axis=1)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)
    # every speculated window was consumed: no double decode anywhere
    assert na[0] == nb[0]
    assert not spec._specs


def test_speculation_dispatch_ahead_order(pipeline, tiny_config, rng):
    """The REAL pipeline ordering (_run_speculative): chunk k+1's
    speculation fires BEFORE chunk k's status is consumed (update_dev).
    Every steady-state window must still be served from a speculation -
    call counts equal, audio identical.  Regression: update_dev used to
    clobber the dispatch-ahead plan (_plan_e = emitted), mis-keying every
    speculation after the first and double-decoding every window."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    decode_jit, _ = pipeline
    B, T, C = 2, 80, tiny_config.decoder.stack.idim * 2
    window = 96
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    full_buf = jnp.asarray(np.concatenate(
        [feats, rng.standard_normal((B, 48, C)).astype(np.float32)], axis=1))
    end_dev = jnp.full((B,), T, jnp.int32)

    na, nb = [0], [0]
    spec = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, na), B, C,
        ctx=40, guard=32, window=window)
    plain = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, nb), B, C,
        ctx=40, guard=32, window=window)

    ns = list(range(16, T + 1, 16))  # chunk boundaries
    outs_a, outs_b = [], []
    spec.speculate_window(full_buf, ns[0], end_dev)
    for k, n in enumerate(ns):
        final = k == len(ns) - 1
        if k + 1 < len(ns):
            # dispatch-ahead: next chunk enqueued before this consume.
            # The provably-final chunk speculates the FINAL flush plan
            # (right-aligned pad_left windows) - facade on_dispatch does
            # the same split on hi >= max_new.
            if ns[k + 1] < T:
                spec.speculate_window(full_buf, ns[k + 1], end_dev)
            else:
                spec.speculate_final(full_buf, ns[k + 1], end_dev)
        outs_a.append(spec.update_dev(jnp.asarray(feats[:, :n]), n,
                                      final=final, end_dev=end_dev))
        outs_b.append(plain.update_dev(jnp.asarray(feats[:, :n]), n,
                                       final=final, end_dev=end_dev))
    a = np.concatenate(outs_a, axis=1)
    b = np.concatenate(outs_b, axis=1)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)
    # EVERY window (final flush included) came from a consumed
    # speculation: the inline path never re-decoded one
    assert na[0] == nb[0]
    assert not spec._specs


def test_speculate_final_multi_window_flush(pipeline, tiny_config, rng):
    """A final flush spanning several windows (nothing emitted yet, long
    tail): speculate_final pre-dispatches the whole plan and the final
    update consumes every entry; audio matches the plain decoder."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    decode_jit, _ = pipeline
    B, T, C = 2, 120, tiny_config.decoder.stack.idim * 2
    window = 96
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    buf = jnp.asarray(feats)
    end_dev = jnp.full((B,), T, jnp.int32)

    na, nb = [0], [0]
    spec = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, na), B, C,
        ctx=40, guard=32, window=window)
    plain = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, nb), B, C,
        ctx=40, guard=32, window=window)

    spec.speculate_final(buf, T, end_dev)
    assert len(spec._specs) >= 2  # multi-window plan really speculated
    a = spec.update_dev(buf, T, final=True, end_dev=end_dev)
    b = plain.update_dev(jnp.asarray(feats), T, final=True, end_dev=end_dev)
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert na[0] == nb[0]
    assert not spec._specs


def test_speculation_wrong_prediction_is_exact(pipeline, tiny_config, rng):
    """A speculation for a chunk that turns out final (generation finished
    mid-chunk) is discarded on the plan mismatch; output stays exact."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    decode_jit, _ = pipeline
    B, C = 2, tiny_config.decoder.stack.idim * 2
    window = 96
    T = 50
    feats = rng.standard_normal((B, 64, C)).astype(np.float32)
    end_dev = jnp.full((B,), T, jnp.int32)

    cnt = [0]
    spec = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, cnt), B, C,
        ctx=40, guard=32, window=window)
    plain = DeviceStreamingDecoder(
        _counted_dev_window(decode_jit, B, C, window, [0]), B, C,
        ctx=40, guard=32, window=window)

    # host predicted the chunk would reach 64 steps; it finished at 50
    spec.speculate_window(jnp.asarray(feats), 64, end_dev)
    a = spec.update_dev(jnp.asarray(feats[:, :T]), T, final=True,
                        end_dev=end_dev)
    b = plain.update_dev(jnp.asarray(feats[:, :T]), T, final=True,
                         end_dev=end_dev)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sim_walk_predicts_emitted(rng):
    """_sim_walk (the host-side plan used to key speculations ahead of the
    unconsumed chunk) exactly predicts _walk's non-final advance."""
    from chattts_tpu.engine.streaming import DeviceStreamingDecoder

    B = 1
    stub = lambda f, lo, hi, pl, end=None: np.zeros(
        (B, (2 * 96 - 1) * 256), np.float32)
    for fg in (None, 8):
        sd = DeviceStreamingDecoder(stub, B, 4, ctx=40, guard=32, window=96,
                                    first_guard=fg)
        n = 0
        for step in (7, 16, 3, 40, 11, 64, 5):
            n += step
            pred = sd._sim_walk(sd.emitted, n)
            sd.update_dev(np.zeros((B, n, 4), np.float32), n, final=False)
            assert sd.emitted == pred, (fg, n)


def test_stream_window_ahead_facade_equivalence(tiny_config):
    """Facade streaming with runtime.stream_window_ahead on vs off: same
    seeds, same audio - the speculated vocode windows are exact."""
    from chattts_tpu.core import Chat

    outs = {}
    for ahead in (True, False):
        cfg = tiny_config.with_runtime(stream_window_ahead=ahead)
        chat = Chat(config=cfg)
        chat.load(source="random", seed=0)
        p = Chat.InferCodeParams(max_new_token=24, min_new_token=20,
                                 manual_seed=3, stream_batch=6,
                                 pass_first_n_batches=0, stream_speed=2048)
        chunks = [c for c in chat.infer("stream me", stream=True,
                                        skip_refine_text=True,
                                        params_infer_code=p) if c.size]
        outs[ahead] = np.concatenate(chunks, axis=1)
    # deferral shifts which samples land in the silence-stripped tail
    # flush (documented one-chunk emission shift), so strip-normalize
    # before comparing: the audible samples must be identical
    a = outs[True][np.abs(outs[True]) > 1e-5]
    b = outs[False][np.abs(outs[False]) > 1e-5]
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_plan_walk_invariants(rng):
    """_plan_walk (the ONE emission-plan function shared by the walk and
    the speculators) respects the guard/window/geometry invariants over
    randomized geometries and chunkings: contiguous strictly-advancing
    emission, guard-shielded non-final emission, windows inside [0, n]
    and of at most ``window`` positions, final plans completing to n."""
    from chattts_tpu.engine.streaming import StreamingDecoder

    for trial in range(200):
        guard = int(rng.integers(4, 64))
        ctx = guard + int(rng.integers(0, 32))
        window = ctx + guard + 8 + int(rng.integers(0, 64))
        fg = (None if rng.random() < 0.5
              else int(rng.integers(0, guard + 1)))
        sd = StreamingDecoder(lambda w: None, 1, 4, ctx=ctx, guard=guard,
                              window=window, first_guard=fg)
        e = int(rng.integers(0, 80))
        n = e + int(rng.integers(0, 160))
        final = bool(rng.random() < 0.5)
        g_entry = sd.first_guard if e == 0 else sd.guard
        prev = e
        steps = list(sd._plan_walk(e, n, final))
        for e0, lo, hi, emit_hi, pad_left, is_last in steps:
            assert e0 == prev                  # contiguous plan
            assert emit_hi > e0                # strict progress
            assert 0 <= lo <= hi <= n
            assert hi - lo <= window
            if not is_last:
                assert pad_left == 0
                assert emit_hi <= n - g_entry  # guard shields emission
                assert lo == max(0, e0 - ctx)  # left context kept
            else:
                assert lo == max(0, hi - window)  # right-aligned tail
                if pad_left:
                    assert pad_left == window - (hi - lo)
            prev = emit_hi
        if final and n > e:
            # a final plan always flushes everything
            assert prev == n, (trial, guard, ctx, window, e, n)
        if not final and steps:
            assert prev <= n - g_entry
