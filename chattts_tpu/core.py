"""Chat: the public orchestration facade.

API-compatible rebuild of ``ChatTTS/core.py``'s ``Chat`` class: two-pass
generation (refine_text -> infer_code), sentence splitting and split-batching,
zero-shot voice cloning, streaming windows, speaker sampling, interrupt.

TPU-native differences (all internal):

* generation runs through the jitted engine (engine/generate.py) instead of a
  per-token Python loop;
* hidden->mel decoding and vocoding are jitted with bucketed time lengths;
* without downloaded assets the models initialize from a seeded PRNG
  (``load(source="random")``) so the full pipeline runs end-to-end for tests
  and benchmarks - numerics then have no reference counterpart, but every
  shape/semantic does.
"""

from __future__ import annotations

import functools
import logging
import os
import re
from dataclasses import dataclass
from typing import List, Literal, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config, load_spk_stat_string
from .engine.generate import GenerateRequest, GenerationOutputs, Generator, Interrupt
from .engine.streaming import StreamingDecoder, plan_windows
from .models import dvae as dvae_mod
from .models import embed as embed_mod
from .models import llama as llama_mod
from .models import vocos as vocos_mod
from .models.speaker import Speaker
from .models.tokenizer import Tokenizer
from .norm import Normalizer
from .utils import io as io_utils


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Chat:
    def __init__(self, logger: logging.Logger = logging.getLogger(__name__),
                 config: Optional[Config] = None):
        self.logger = logger
        self.config = config or Config()
        self.normalizer = Normalizer(logger=logger)
        self.context = Interrupt()
        self._loaded = False

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    def has_loaded(self, use_decoder=True) -> bool:
        return self._loaded

    def download_models(
        self,
        source: Literal["huggingface", "local", "custom"] = "local",
        force_redownload: bool = False,
        custom_path: Optional[str] = None,
    ) -> Optional[str]:
        """Locate (or fetch) the asset tree; returns its directory or None.

        ``local``/``custom`` verify an existing tree (utils/dl checksums,
        reference utils/dl.py:66-111).  ``huggingface`` downloads the
        2Noise/ChatTTS snapshot via huggingface_hub (reference
        core.py:87-123) - gated: returns None without network access.
        """
        from .utils import dl as dl_utils

        if source in ("local", "custom"):
            base = io_utils.find_assets_dir(custom_path)
            if base is None:
                self.logger.error("no asset tree found")
                return None
            if not dl_utils.check_all_assets(base):
                # reference returns None on mismatch (core.py:126-129):
                # never hand back a tree that fails the trusted checksums
                self.logger.error("asset verification failed for %s", base)
                return None
            return base
        try:
            from huggingface_hub import snapshot_download

            return snapshot_download(
                repo_id="2Noise/ChatTTS",
                allow_patterns=["*.yaml", "*.json", "*.safetensors"],
                cache_dir=custom_path,
                force_download=force_redownload)
        except Exception as e:  # noqa: BLE001 - network optional
            self.logger.error("huggingface download failed: %s", e)
            return None

    def load(
        self,
        source: Literal["local", "custom", "random"] = "local",
        custom_path: Optional[str] = None,
        compile: bool = True,  # noqa: A002 - API parity; jit is always on
        coef: Optional[str] = None,
        seed: int = 0,
        use_engine: bool = False,
    ) -> bool:
        """Load weights from a ChatTTS asset tree, or seeded-random init.

        ``source="local"/"custom"``: find the standard asset layout (env var
        ``CHATTTS_ASSETS``, ``custom_path`` or cwd).  ``source="random"``:
        initialize from a PRNG - every component is fully functional but
        untrained (for development, tests, benchmarks).

        ``use_engine=True`` routes generation through the continuous-batching
        engine (the reference's ``use_vllm=True`` analog, ``gpt.py:62-73``):
        the refine-text pass, code generation, AND streaming all share the
        engine's slots, so concurrent callers overlap instead of queueing;
        per-request ``manual_seed``, ``ensure_non_empty`` and interrupt keep
        generator-path semantics.
        """
        self.use_engine = use_engine
        assets = None
        if source != "random":
            if io_utils.find_assets_dir(custom_path) is None:
                self.logger.warning(
                    "no ChatTTS assets found; falling back to random init")
            else:
                # verified against the vendored trusted sha256 map; a tree
                # that fails verification is never loaded (reference
                # core.py:126-129 returns False)
                assets = self.download_models(source, custom_path=custom_path)
                if assets is None:
                    return False
        if assets is None:
            self._load_random(seed=seed, coef=coef)
        else:
            self._load_assets(assets, coef=coef)
        self._loaded = True
        return True

    def _load_random(self, seed: int, coef: Optional[str] = None):
        cfg = self.config
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        coef_arr = None
        if coef is not None:
            from . import codecs

            coef_arr = codecs.decode_coef(coef)
        self.dvae_params = dvae_mod.init_dvae_params(k1, cfg.dvae, coef_arr)
        dec_coef = np.asarray(self.dvae_params["coef"])
        self.decoder_params = dvae_mod.init_decoder_params(k2, cfg.decoder, dec_coef)
        self.vocos_params = vocos_mod.init_params(k3, cfg.vocos)
        self.embed_params = embed_mod.init_params(k4, cfg.gpt)
        self.gpt_params = llama_mod.init_params(k5, cfg.gpt)
        self.tokenizer = Tokenizer(None, vocab_size=cfg.gpt.num_text_tokens)
        self.speaker = Speaker(cfg.gpt.hidden_size, load_spk_stat_string())
        self.coef = dvae_mod.coef_string(self.decoder_params)
        self._init_runtime()

    def _load_assets(self, assets_dir: str, coef: Optional[str] = None):
        cfg = self.config
        p = cfg.path

        def path(rel):
            return os.path.join(assets_dir, rel)

        # DVAE
        state = io_utils.load_safetensors(path(p.dvae_ckpt_path))
        self.dvae_params = dvae_mod.init_dvae_params(
            jax.random.PRNGKey(0), cfg.dvae)
        io_utils.apply_key_map(
            self.dvae_params, state, dvae_mod.dvae_torch_key_map(cfg.dvae))
        if coef is not None:
            from . import codecs

            self.dvae_params["coef"] = jnp.asarray(codecs.decode_coef(coef))
        # Decoder (coef chains from DVAE as in core.py:321-376)
        state = io_utils.load_safetensors(path(p.decoder_ckpt_path))
        self.decoder_params = dvae_mod.init_decoder_params(
            jax.random.PRNGKey(0), cfg.decoder)
        io_utils.apply_key_map(
            self.decoder_params, state,
            dvae_mod.decoder_torch_key_map(cfg.decoder))
        # Vocos
        state = io_utils.load_safetensors(path(p.vocos_ckpt_path))
        self.vocos_params = vocos_mod.init_params(jax.random.PRNGKey(0), cfg.vocos)
        io_utils.apply_key_map(
            self.vocos_params, state, vocos_mod.torch_key_map(cfg.vocos))
        # Embed (weight-normed heads folded)
        state = io_utils.fold_weight_norm(
            io_utils.load_safetensors(path(p.embed_path)))
        self.embed_params = embed_mod.init_params(jax.random.PRNGKey(0), cfg.gpt)
        embed_mod.load_from_state(
            self.embed_params, state, cfg.gpt, lambda a: jnp.asarray(a))
        # GPT (HF dir)
        gpt_file = path(os.path.join(p.gpt_ckpt_path, "model.safetensors"))
        state = io_utils.load_safetensors(gpt_file)
        state = {k.removeprefix("model."): v for k, v in state.items()}
        self.gpt_params = llama_mod.init_params(jax.random.PRNGKey(0), cfg.gpt)
        llama_mod.load_from_state(self.gpt_params, state, cfg.gpt)
        self.tokenizer = Tokenizer(path(p.tokenizer_path))
        self.speaker = Speaker(cfg.gpt.hidden_size, load_spk_stat_string())
        self.coef = dvae_mod.coef_string(self.decoder_params)
        self._init_runtime()

    def _step_slabs(self):
        """One shared packed-slab copy for the fused decode step.

        ``pack_step_params`` materializes ~L*S*D*D bytes (~377 MB bf16 at
        the real config) on HBM; the generator and every engine tier use
        byte-identical slabs, so the facade packs ONCE and hands the same
        dict to all of them.  Keyed on the quantization env (a flip of
        CHATTTS_STEP_INT8/INT4 between constructions packs fresh) AND the
        params object (a re-``load`` replaces ``gpt_params``; stale slabs
        would silently decode with the previous load's weights).
        """
        from .engine.generate import step_int4, step_int8, use_fused_step

        if not use_fused_step(self.config.gpt):
            return None
        key = (step_int8(), step_int4())
        cache = getattr(self, "_slab_cache", None)
        if cache is None or cache[0] != key or cache[2] is not self.gpt_params:
            from .ops.pallas_step import pack_step_params

            self._slab_cache = (key, pack_step_params(
                self.gpt_params, self.config.gpt,
                int8=key[0], int4=key[1]), self.gpt_params)
        return self._slab_cache[1]

    def _init_runtime(self):
        cfg = self.config
        self.generator = Generator(
            cfg.gpt, self.gpt_params, self.embed_params,
            prefill_bucket=cfg.runtime.prefill_bucket,
            packed=self._step_slabs())
        self._decode_hidden_jit = jax.jit(
            functools.partial(dvae_mod.decode_from_hidden, cfg=cfg.decoder))
        self._decode_indices_jit = jax.jit(
            functools.partial(dvae_mod.decode_from_indices, cfg=cfg.dvae))
        self._vocos_jit = jax.jit(
            functools.partial(vocos_mod.decode, cfg=cfg.vocos))

        def _vocos_wire(vp, mel):
            # quantize on device so host-batch decodes (engine-backed and
            # ids paths) also transfer int16 PCM - half the bytes of f32
            wav = vocos_mod.decode(vp, mel, cfg=cfg.vocos)
            return jnp.clip(wav * 32767.0, -32767, 32767).astype(jnp.int16)

        self._vocos_wire_jit = jax.jit(_vocos_wire)
        self._encode_audio_jit = jax.jit(
            functools.partial(dvae_mod.encode_audio, cfg=cfg.dvae,
                              mel_cfg=cfg.vocos.mel))

        spc = 2 * cfg.vocos.hop_length  # samples per code step
        wire_int16 = cfg.runtime.wire_int16

        def _device_decode(dec_params, voc_params, hid, end):
            """hid (B, Tpad, D) on device, end (B,) kept lengths -> wav.

            Zero-masks the per-sequence tails before the conv stacks (zero
            features are not inert through norm/conv; the pad region would
            otherwise vocode to kept artifacts) and again on the waveform,
            then optionally quantizes to int16 so only final PCM crosses the
            host link.
            """
            Tpad = hid.shape[1]
            tmask = jnp.arange(Tpad)[None, :] < end[:, None]
            hid = hid * tmask[..., None]
            mel = dvae_mod.decode_from_hidden(dec_params, hid, cfg=cfg.decoder)
            wav = vocos_mod.decode(voc_params, mel, cfg=cfg.vocos)
            smask = jnp.arange(wav.shape[1])[None, :] < (end * spc)[:, None]
            wav = wav * smask
            if wire_int16:
                return jnp.clip(wav * 32767.0, -32767, 32767).astype(jnp.int16)
            return wav

        self._device_decode_jit = jax.jit(_device_decode)
        self._device_window_jits = {}
        self._incr_jits = {}

    def unload(self):
        logger = self.logger
        for attr in ("dvae_params", "decoder_params", "vocos_params",
                     "embed_params", "gpt_params", "generator", "tokenizer",
                     "speaker", "_code_engines", "_text_engine",
                     "_slab_cache"):
            if hasattr(self, attr):
                delattr(self, attr)
        self.normalizer.destroy()
        self.__init__(logger, self.config)

    def interrupt(self):
        self.context.set(True)

    # ------------------------------------------------------------------
    # Speakers
    # ------------------------------------------------------------------

    def sample_random_speaker(self) -> str:
        return self.speaker.sample_random()

    def sample_audio_speaker(self, wav: np.ndarray) -> str:
        """Zero-shot clone: waveform -> spk_smp code string (core.py:179-180)."""
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        ind = np.asarray(self._encode_audio_jit(self.dvae_params,
                                                jnp.asarray(wav)))
        return Speaker.encode_prompt(ind[0].T)  # (num_vq, T)

    # ------------------------------------------------------------------
    # Inference params (API parity with core.py:182-206)
    # ------------------------------------------------------------------

    @dataclass(repr=False, eq=False)
    class RefineTextParams:
        prompt: str = ""
        top_P: float = 0.7
        top_K: int = 20
        temperature: float = 0.7
        repetition_penalty: float = 1.0
        max_new_token: int = 384
        min_new_token: int = 0
        show_tqdm: bool = True
        ensure_non_empty: bool = True
        manual_seed: Optional[int] = None

    @dataclass(repr=False, eq=False)
    class InferCodeParams(RefineTextParams):
        prompt: str = "[speed_5]"
        spk_emb: Optional[str] = None
        spk_smp: Optional[str] = None
        txt_smp: Optional[str] = None
        temperature: float = 0.3
        repetition_penalty: float = 1.05
        max_new_token: int = 2048
        stream_batch: int = 24
        stream_speed: int = 12000
        pass_first_n_batches: int = 2

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def infer(
        self,
        text: Union[str, List[str]],
        stream: bool = False,
        lang: Optional[str] = None,
        skip_refine_text: bool = False,
        refine_text_only: bool = False,
        use_decoder: bool = True,
        do_text_normalization: bool = True,
        do_homophone_replacement: bool = True,
        split_text: bool = True,
        max_split_batch: int = 4,
        params_refine_text: Optional["Chat.RefineTextParams"] = None,
        params_infer_code: Optional["Chat.InferCodeParams"] = None,
    ):
        params_refine_text = params_refine_text or Chat.RefineTextParams()
        params_infer_code = params_infer_code or Chat.InferCodeParams()
        self.context.set(False)

        if split_text and isinstance(text, str):
            if "\n" in text:
                text = text.split("\n")
            else:
                text = [t for t in re.split(r"(?<=。)|(?<=\.\s)", text) if t]
            self.logger.info("split text into %d parts", len(text))
        if isinstance(text, str):
            text = [text]
        if len(text) == 0:
            return []

        res_gen = self._infer(
            text, stream, lang, skip_refine_text, refine_text_only,
            use_decoder, do_text_normalization, do_homophone_replacement,
            split_text, max_split_batch, params_refine_text, params_infer_code)
        if stream:
            return res_gen
        if refine_text_only:
            return next(res_gen)
        stripped = []
        thr = np.float32(1e-5)
        for wavs in res_gen:
            for wav in wavs:
                stripped.append(wav[np.abs(wav) > thr])
        if split_text:
            return [np.concatenate(stripped) if stripped else
                    np.array([], np.float32)]
        return stripped

    def _infer(
        self, text, stream, lang, skip_refine_text, refine_text_only,
        use_decoder, do_text_normalization, do_homophone_replacement,
        split_text, max_split_batch, params_refine_text, params_infer_code,
    ):
        text = [
            self.normalizer(t, do_text_normalization,
                            do_homophone_replacement, lang)
            for t in text
        ]
        self.logger.debug("normed texts %s", text)

        if not skip_refine_text:
            refined = self._refine_text(text, params_refine_text)
            text_tokens = [
                t[t < self.tokenizer.break_0_ids] for t in refined.ids]
            text = self.tokenizer.decode(text_tokens)
            refined.destroy()
            if refine_text_only:
                yield "\n".join(text) if split_text else text
                return

        # auto voice clone: synth segment 0 once, reuse its codes as prompt
        # (core.py:435-453)
        if split_text and len(text) > 1 and params_infer_code.spk_smp is None:
            refer_text = text[0]
            wavs = self._generate_wavs([refer_text], use_decoder,
                                       params_infer_code)
            if len(wavs) and wavs[0].size:
                params_infer_code.spk_smp = self.sample_audio_speaker(wavs[0])
                params_infer_code.txt_smp = refer_text

        if split_text:
            batches = [text[i : i + max_split_batch]
                       for i in range(0, len(text), max_split_batch)]
        else:
            batches = [text]
        for batch in batches:
            if stream:
                yield from self._stream_batch(
                    batch, use_decoder, params_infer_code)
            else:
                yield self._generate_wavs(batch, use_decoder,
                                          params_infer_code)

    @staticmethod
    def _progress_bar(params, n_requests: int, desc: str, per_request: bool):
        """tqdm progress over a generation pass when ``show_tqdm`` asks.

        ``per_request``: engine slots advance independently (total scales
        with batch); the generator's batch loop advances all rows together
        (total is one request's step budget).
        """
        if not params.show_tqdm:
            return None
        from .utils.progress import ProgressBar

        total = params.max_new_token * (n_requests if per_request else 1)
        return ProgressBar(total, desc=desc)

    @staticmethod
    def _closing_bar(gen, bar):
        try:
            yield from gen
        finally:
            bar.close()

    @staticmethod
    def _attempt_stream(gen):
        """Wrap a generation stream as (restarted, result) pairs.

        ``restarted`` is True when this yield follows an attempt's FINAL
        output - the empty-generation retry restarted generation, and
        streaming consumers must drop accumulation from the discarded
        attempt (the retry only fires when some sequence produced
        nothing)."""
        saw_final = False
        for result in gen:
            yield saw_final, result
            saw_final = not result.partial

    def _stream_batch(self, batch, use_decoder, params):
        """Streaming synthesis with incremental windowed vocoding.

        The reference re-decodes ALL accumulated hidden states on every
        yield (core.py:475-503, O(T^2) total); here a StreamingDecoder
        finalizes samples as soon as their conv receptive cone is complete,
        so each yield costs one fixed-size window.  When the generator
        provides device-resident hiddens, the window slicing/padding and
        vocoding run on device and only finished samples cross the host
        link (DeviceStreamingDecoder).  Emission cadence keeps the
        reference semantics: withhold the first ``pass_first_n_batches``
        yields, then emit ``stream_speed``-sample windows, then flush the
        silence-stripped tail.
        """
        from .engine.streaming import DeviceStreamingDecoder, EmissionPacer

        ctx, guard, window = plan_windows(
            self.config.decoder.stack if use_decoder
            else self.config.dvae.decoder,
            self.config.vocos, params.stream_batch)
        fg = self.config.runtime.stream_first_guard
        fg = None if fg is None else min(fg, guard)
        sd = None
        # Defer PCM materialization by one chunk (AsyncDeviceWindows): the
        # window decode + async copy are enqueued at consume time but
        # materialized on the NEXT yield, so the vocode's device compute
        # and the PCM transfer both overlap the next chunk's compute and
        # status read.  This matters on BOTH backends: the engine cannot
        # speculate windows at dispatch time (its partial rows are
        # per-harvest snapshots), and even the generator's speculated
        # windows still block inline materialization for the vocode's
        # device time at wide batch (engine 8x384 A/B: wall 1.96 -> 1.04 s).
        # A constant one-chunk shift in emission latency, not a rate
        # change; the TTFA-critical windows before the first emission
        # (and the final flush) materialize immediately.  The deferred swap
        # and the reference cadence both live in EmissionPacer (shared with
        # TTSService.synthesize_stream).
        defer = self.config.runtime.stream_window_ahead
        wire = self.config.runtime.wire_int16

        def _mk_pacer():
            return EmissionPacer(len(batch), params.pass_first_n_batches,
                                 params.stream_speed, wire)

        def _mk_device_sd():
            return self._device_stream_decoder(len(batch),
                                               params.stream_batch,
                                               async_windows=defer)

        # window speculation: right after the generator ENQUEUES a decode
        # chunk, enqueue the vocode of the window that chunk will allow and
        # start its PCM copy - both then overlap the chunk's blocking
        # status round trip instead of serializing after it (device trace:
        # TTFA was one chunk of compute + three sequential ~25 ms link
        # round trips; this folds the vocode+PCM trip into the status one).
        # Fires only on the generator path; the callback sees the full
        # hidden buffer (one compiled vocode shape across chunks).
        def on_dispatch(st, hi):
            nonlocal sd
            if not use_decoder:
                return
            if sd is None:
                sd = _mk_device_sd()
            if isinstance(sd, DeviceStreamingDecoder):
                if hi >= params.max_new_token:
                    # provably the final chunk: speculate the final flush
                    # (right-aligned tail windows included) instead of the
                    # mid-stream plan
                    sd.speculate_final(st.hiddens, hi, st.end_idx)
                else:
                    sd.speculate_window(st.hiddens, hi, st.end_idx)

        if not self.config.runtime.stream_window_ahead:
            on_dispatch = None
        pacer = _mk_pacer()
        last = None  # (device feats, n) or np items for the tail flush
        # dispatch-ahead AFTER the first emission window: the TTFA-critical
        # first chunk stays synchronous, steady-state yields hide the
        # per-chunk status round trip behind the next chunk's compute
        # (each window then materializes one chunk later - a constant
        # ~one-chunk shift in emission latency, not a rate change)
        for restarted, result in self._attempt_stream(
                self._infer_code(batch, True, use_decoder, params,
                                 speculate=True, speculate_from=2,
                                 on_dispatch=on_dispatch)):
            if restarted:
                sd = None
                pacer = _mk_pacer()  # reapply the first-yields suppression
            final = bool(result.finished.all())
            if use_decoder and result.hiddens_dev is not None:
                if sd is None:
                    sd = _mk_device_sd()
                last = ("dev", result.hiddens_dev, result.hid_n,
                        result.end_dev)
                chunk = sd.update_dev(result.hiddens_dev, result.hid_n,
                                      final=final, end_dev=result.end_dev)
            else:
                if sd is None:
                    sd = StreamingDecoder(
                        self._stream_decode_fn(use_decoder), len(batch),
                        self.config.gpt.hidden_size if use_decoder
                        else self.config.gpt.num_vq,
                        ctx=ctx, guard=guard, window=window,
                        int_features=not use_decoder, first_guard=fg)
                items = (result.materialize_hiddens() if use_decoder
                         else result.ids)
                last = ("np", items, None, None)
                chunk = sd.update(items, final=final)
            result.destroy()
            emit = pacer.push(chunk, final=final)
            if emit is not None:
                yield emit
        # tail flush: whatever remains, silence-stripped (core.py:501-503)
        tail = None
        if sd is not None and sd.emitted < sd.available and last is not None:
            kind, payload, n, end_dev = last
            tail = (sd.update_dev(payload, n, final=True, end_dev=end_dev)
                    if kind == "dev"
                    else sd.update(payload, final=True))
        yield pacer.flush(tail)

    def _device_stream_decoder(self, batch: int, stream_batch: int,
                               async_windows: bool = False):
        """Device streaming decoder with the facade's geometry recipe
        (plan_windows receptive cones, clamped first guard, wire scaling).
        The ONE construction shared by _stream_batch and
        TTSService.synthesize_stream - keep them from drifting.

        ``async_windows``: return the AsyncDeviceWindows variant whose
        update_dev yields device sample slices with async copies in
        flight instead of materialized arrays (int16 wire scaling then
        becomes the caller's job at materialization)."""
        from .engine.streaming import (AsyncDeviceWindows,
                                       DeviceStreamingDecoder, plan_windows)

        ctx, guard, window = plan_windows(self.config.decoder.stack,
                                          self.config.vocos, stream_batch)
        fg = self.config.runtime.stream_first_guard
        cls = AsyncDeviceWindows if async_windows else DeviceStreamingDecoder
        return cls(
            self._device_window_fn(window), batch,
            self.config.gpt.hidden_size,
            wire_int16=self.config.runtime.wire_int16 and not async_windows,
            ctx=ctx, guard=guard, window=window,
            first_guard=None if fg is None else min(fg, guard))

    def _stream_decode_fn(self, use_decoder: bool):
        if use_decoder:
            return lambda win: np.asarray(self._vocos_jit(
                self.vocos_params,
                self._decode_hidden_jit(self.decoder_params,
                                        jnp.asarray(win))))
        return lambda win: np.asarray(self._vocos_jit(
            self.vocos_params,
            self._decode_indices_jit(self.dvae_params, jnp.asarray(win))))

    def _device_window_fn(self, window: int):
        """Device-side window decode for streaming: slice/pad/mask/roll the
        hidden window, run the mel decoder + vocoder, and (optionally)
        quantize - all on device; only the finished sample window transfers.
        Semantics mirror StreamingDecoder._decode_window exactly.  When a
        per-row ``end`` (generated lengths, device (B,)) is supplied, hidden
        positions at/after a row's end are zeroed before the convs - the
        generation buffer keeps accumulating garbage hiddens for finished
        rows, and the one-shot decode (_device_decode) zero-masks the same
        region."""
        cfg = self.config
        wire_int16 = cfg.runtime.wire_int16

        def _mk(masked: bool):
            def f(dp, vp, feats, lo, hi, pad_left, *end):
                B = feats.shape[0]
                # pad so the dynamic window slice never clamps
                feats = jnp.pad(feats, ((0, 0), (0, window), (0, 0)))
                sl = jax.lax.dynamic_slice(
                    feats, (0, lo, 0), (B, window, feats.shape[2]))
                t = jnp.arange(window)
                keep = (t < (hi - lo))[None, :]
                if masked:
                    keep = keep & ((lo + t)[None, :] < end[0][:, None])
                sl = jnp.where(keep[:, :, None], sl, 0.0)
                sl = jnp.roll(sl, pad_left, axis=1)
                sl = jnp.where((t >= pad_left)[None, :, None], sl, 0.0)
                mel = dvae_mod.decode_from_hidden(dp, sl, cfg=cfg.decoder)
                wav = vocos_mod.decode(vp, mel, cfg=cfg.vocos)
                if wire_int16:
                    return jnp.clip(wav * 32767.0, -32767,
                                    32767).astype(jnp.int16)
                return wav
            return jax.jit(f)

        jits = self._device_window_jits.get(window)
        if jits is None:
            jits = (_mk(False), _mk(True))
            self._device_window_jits[window] = jits

        def call(feats_dev, lo, hi, pad_left, end_dev=None):
            args = (self.decoder_params, self.vocos_params, feats_dev,
                    jnp.int32(lo), jnp.int32(hi), jnp.int32(pad_left))
            if end_dev is not None:
                return jits[1](*args, end_dev)
            return jits[0](*args)

        return call

    # -- decoding ------------------------------------------------------

    def _generate_wavs(self, batch: List[str], use_decoder: bool,
                       params: "Chat.InferCodeParams") -> np.ndarray:
        """Non-streaming synthesis for one batch of texts.

        Prefers the PIPELINED path (chunked decode + windowed vocode with
        async PCM fetches - the host-link transfers overlap device compute)
        when device-resident hiddens are available; falls back to the
        one-shot decode otherwise (ids path, engine backend, or
        runtime.pipelined_decode off)."""
        rt = self.config.runtime
        pipelined = rt.pipelined_decode
        if pipelined is None:
            pipelined = jax.default_backend() == "tpu"
        env = os.environ.get("CHATTTS_PIPELINED_DECODE")
        if env is not None:
            pipelined = env == "1"
        if pipelined and use_decoder:
            # both backends stream device partials in the same contract:
            # the generator via its jitted chunk yields, the engine via
            # _infer_code_engine's device-resident streaming - so the
            # chunked vocode + async PCM pipeline covers use_engine too
            out = self._pipelined_wavs(batch, params)
            if out is not None:
                return out
        result = next(self._infer_code(batch, False, use_decoder, params))
        wavs = self._decode_to_wavs(result, use_decoder)
        result.destroy()
        return wavs

    def _incremental_fns(self, B: int, Fh: int):
        """Jitted conv-state incremental hidden->PCM stream steps.

        Returns (init_state, first_fn, step_fn) or None when the chunk is
        too small for the delayed-ISTFT consume (mel offset > 2*Fh).
        ``first_fn`` primes the stream (no PCM yet); ``step_fn`` feeds Fh
        hidden positions and emits exactly Fh*1024 RAW samples (the caller
        drops the first n_fft//2 once).  O(new frames) per call - no
        ctx/guard re-decode - and exact vs the full decode (see
        models/convnext.py streaming notes; pinned by
        tests/test_streaming.py::test_incremental_chain*)."""
        key = (B, Fh)
        cached = self._incr_jits.get(key)
        if cached is not None:
            return cached
        cfg = self.config
        F = 2 * Fh
        Dc = (dvae_mod.decoder_stream_offset(cfg.decoder)
              + vocos_mod.stream_offset(cfg.vocos))
        if Dc > F:
            return None
        wire = cfg.runtime.wire_int16
        n_fft, hop = cfg.vocos.n_fft, cfg.vocos.hop_length
        from .ops import stft as stft_ops

        def init_state():
            # the spec carry lives as (real, imag) pairs: eager complex64
            # array creation is unimplemented on this TPU backend, and
            # splitting keeps all state pytree leaves real
            nf = n_fft // 2 + 1
            return {
                "dec": dvae_mod.decoder_stream_init(B, cfg.decoder),
                "voc": vocos_mod.stream_init(B, cfg.vocos),
                "spec_re": jnp.zeros((B, F, nf), jnp.float32),
                "spec_im": jnp.zeros((B, F, nf), jnp.float32),
                "carry": stft_ops.istft_stream_init(B, n_fft, hop),
            }

        def core(dp, vp, state, hid, c, end):
            pos = c * Fh + jnp.arange(Fh)
            hid = jnp.where((pos[None, :] < end[:, None])[:, :, None],
                            hid, 0.0)  # finished rows: zeros, like one-shot
            t0 = c * F
            mel, dstate, cum = dvae_mod.decode_from_hidden_stream(
                dp, hid, state["dec"], cfg.decoder, t0=t0)
            spec, vstate = vocos_mod.features_stream(
                vp, mel, state["voc"], cfg.vocos, t0=t0, cum_off=cum)
            return spec, dstate, vstate

        def first(dp, vp, state, hid, end):
            spec, dstate, vstate = core(dp, vp, state, hid, jnp.int32(0),
                                        end)
            return {**state, "dec": dstate, "voc": vstate,
                    "spec_re": jnp.real(spec), "spec_im": jnp.imag(spec)}

        def step(dp, vp, state, hid, c, end):
            spec, dstate, vstate = core(dp, vp, state, hid, c, end)
            sre, sim = jnp.real(spec), jnp.imag(spec)
            # the ISTFT lags one chunk: it consumes full-decode frames
            # [(c-1)*F, c*F), which sit at stream offset Dc in the last
            # two spec chunks
            re = jnp.concatenate([state["spec_re"], sre],
                                 axis=1)[:, Dc:Dc + F]
            im = jnp.concatenate([state["spec_im"], sim],
                                 axis=1)[:, Dc:Dc + F]
            raw, carry = stft_ops.istft_stream(
                jax.lax.complex(re, im), state["carry"], n_fft, hop)
            if wire:
                raw = jnp.clip(raw * 32767.0, -32767, 32767).astype(
                    jnp.int16)
            return raw, {"dec": dstate, "voc": vstate,
                         "spec_re": sre, "spec_im": sim, "carry": carry}

        fns = (init_state, jax.jit(first, donate_argnums=(2,)),
               jax.jit(step, donate_argnums=(2,)))
        self._incr_jits[key] = fns
        return fns

    def _pipelined_wavs(self, batch: List[str],
                        params: "Chat.InferCodeParams"
                        ) -> Optional[np.ndarray]:
        """Chunked decode -> windowed vocode -> async PCM fetch pipeline.

        The one-shot path serializes [decode 100%] -> [vocode] -> [one big
        blocking PCM fetch]; on a slow host link the tail transfer is dead
        time.  Here the generator yields every ``pipeline_chunk`` steps
        with one chunk of speculative dispatch-ahead (the status read's
        round trip hides behind device compute), each yield advances an
        exact-guard sliding vocoder window on device, and every emitted
        sample window starts an async device->host copy immediately - by
        assembly time most PCM has already crossed the link.  Numerics:
        same guard math as streaming with ``first_guard=None`` (exact
        receptive cone), same per-row end masking as the one-shot decode;
        equality is pinned by tests/test_streaming.py."""
        from .engine.streaming import (AsyncDeviceWindows, copy_to_host_async,
                                       plan_windows)

        rt = self.config.runtime
        B = len(batch)
        chunk = max(16, rt.pipeline_chunk)
        ctx, guard, window = plan_windows(self.config.decoder.stack,
                                          self.config.vocos, chunk)
        hop = self.config.vocos.hop_length
        spc = 2 * hop
        incr = self._incremental_fns(B, chunk)
        if incr is not None:
            # conv-state incremental vocoder: O(new) per chunk, no
            # ctx/guard re-decode.  The flush window must cover the
            # un-emitted tail (up to 2 chunks: one ISTFT consume lag +
            # one possibly-ragged final chunk) plus the guard for its
            # inexact left edge.
            init_state, first_fn, step_fn = incr
            flush_w = _round_up(2 * chunk + guard + 8, 16)
            state = init_state()
        else:
            flush_w = window  # windowed fallback (chunk < conv offset)
        sd = None
        last = None
        ends = None
        parts: List = []
        final_res = None
        fed = 0
        emitted = 0  # samples emitted by the incremental stream
        broken = False  # device hiddens unavailable: one-shot at the end

        # final-flush speculation: when the dispatched chunk provably ends
        # generation (predicted kept count reaches max_new), the flush
        # window's arguments (lo, n) AND the incremental stream's final
        # emitted-sample count are already known (the feed loop advances
        # in fixed full-chunk quanta), so the flush vocode and its TAIL
        # slice's async PCM copy both dispatch here and overlap the final
        # status round trip.  The enqueued decode reads the generation
        # buffer AFTER the final chunk writes it (in-order device
        # execution) and st.end_idx's post-chunk values, so a hit is
        # bit-identical to the inline flush; a miss (a row EOSed early,
        # shrinking n) just falls back.  Only the tail transfers: the
        # full flush window's wasted copy measured +18% e2e (PERF.md).
        stash: List = [None]  # (lo, n, predicted emitted, device tail)
        nfft2 = self.config.vocos.n_fft // 2

        def on_dispatch(st, hi):
            if incr is None or hi < params.max_new_token:
                return
            n_p, lo_p = int(hi), int(hi) - flush_w
            fed_p = n_p // chunk
            em_p = (fed_p - 1) * chunk * spc - nfft2 if fed_p >= 2 else 0
            if lo_p < 0 or em_p < lo_p * spc:
                return
            wav = self._device_window_fn(flush_w)(
                st.hiddens, lo_p, n_p, 0, st.end_idx)
            tail = wav[:, em_p - lo_p * spc:]
            copy_to_host_async(tail)
            stash[0] = (lo_p, n_p, em_p, tail)

        if not rt.stream_window_ahead:
            on_dispatch = None
        for restarted, result in self._attempt_stream(self._infer_code(
                batch, True, True, params, stream_batch_override=chunk,
                speculate=True, on_dispatch=on_dispatch)):
            if restarted:
                parts.clear()
                fed = emitted = 0
                sd = None
                stash[0] = None  # flush content from the discarded attempt
                if incr is not None:
                    state = init_state()
            ends = [ids.shape[0] for ids in result.ids]
            if final_res is not None:
                final_res.destroy()
            final_res = result
            if result.hiddens_dev is None:
                broken = True  # decode the final output one-shot instead
            if broken:
                continue
            n = result.hid_n  # buffer may exceed the valid prefix (engine)
            if incr is not None:
                while (fed + 1) * chunk <= n:
                    hidc = result.hiddens_dev[:, fed * chunk:
                                              (fed + 1) * chunk]
                    if fed == 0:
                        state = first_fn(self.decoder_params,
                                         self.vocos_params, state, hidc,
                                         result.end_dev)
                    else:
                        pcm, state = step_fn(
                            self.decoder_params, self.vocos_params, state,
                            hidc, jnp.int32(fed), result.end_dev)
                        if fed == 1:  # drop the ISTFT center padding once
                            pcm = pcm[:, self.config.vocos.n_fft // 2:]
                        copy_to_host_async(pcm)
                        parts.append(pcm)
                        emitted += pcm.shape[1]
                    fed += 1
            else:
                if sd is None:
                    sd = AsyncDeviceWindows(
                        self._device_window_fn(window), B,
                        self.config.gpt.hidden_size,
                        wire_int16=rt.wire_int16,
                        ctx=ctx, guard=guard, window=window)
                parts += sd.update_dev(result.hiddens_dev, n,
                                       end_dev=result.end_dev,
                                       final=bool(result.finished.all()))
            last = (result.hiddens_dev, n, result.end_dev)
        if broken and final_res is not None:
            # hiddens never reached the device path: decode the final
            # output one-shot (same attempt - no re-generation)
            wavs = self._decode_to_wavs(final_res, True)
            final_res.destroy()
            return wavs
        if last is None or ends is None:
            if final_res is not None:
                final_res.destroy()
            return np.zeros((B, 0), np.float32)
        n = last[1]
        emitted_h = emitted // spc  # hidden positions fully emitted
        if n < flush_w or (incr is not None
                           and emitted_h - (n - flush_w) < guard):
            # shorter than one flush window (or the stream fell too far
            # behind): the flush would have to pad INSIDE the tensor,
            # whose zeros are live through the conv/norm stacks - only a
            # FULL final window has exact edge semantics.  Use the
            # one-shot bucketed decode instead.
            wavs = self._decode_to_wavs(final_res, True)
            final_res.destroy()
            return wavs
        if incr is not None:
            # right-aligned FULL flush window [n - flush_w, n): its samples
            # are exact from guard positions in; emission starts well past
            # that (checked above)
            lo = n - flush_w
            if stash[0] is not None and stash[0][:3] == (lo, n, emitted):
                tail = stash[0][3]  # speculated flush, copy in flight
            else:
                wav_w = self._device_window_fn(flush_w)(
                    last[0], lo, n, 0, last[2])
                tail = wav_w[:, emitted - lo * spc:]
                copy_to_host_async(tail)
            parts.append(tail)
        elif sd is not None and sd.emitted < sd.available:
            parts += sd.update_dev(last[0], last[1], end_dev=last[2],
                                   final=True)
        final_res.destroy()
        if not parts:
            return np.zeros((B, 0), np.float32)
        wav = np.concatenate([np.asarray(p) for p in parts], axis=1)
        if rt.wire_int16:
            wav = wav.astype(np.float32) / 32767.0
        # trim per-row generation tails (emission runs to the batch max;
        # shorter rows decode zeros there, but keep the cut exact)
        for b, nb in enumerate(ends):
            wav[b, nb * spc:] = 0.0
        return wav

    def _decode_to_wavs(self, result: GenerationOutputs, use_decoder: bool
                        ) -> np.ndarray:
        cfg = self.config
        if use_decoder and result.hiddens_dev is not None:
            # device-resident path: the hiddens never left the chip; pad,
            # mask, decode, vocode and quantize there, transferring only the
            # finished PCM (the host link dominates e2e latency otherwise)
            hid = result.hiddens_dev  # (B, n_max, D)
            B, n_max = hid.shape[0], result.hid_n
            if n_max == 0:
                return np.zeros((B, 0), np.float32)
            if hid.shape[1] != n_max:
                # engine partials carry the full fixed-shape buffer; decode
                # only the valid prefix (mel of the masked-zero tail is NOT
                # silent through the conv/norm stacks, and its ISTFT overlap
                # would bleed into the last real samples)
                hid = hid[:, :n_max]
            Tpad = _round_up(n_max, cfg.runtime.decode_bucket // 4 or 1)
            hid = jnp.pad(hid, ((0, 0), (0, Tpad - n_max), (0, 0)))
            wav = self._device_decode_jit(
                self.decoder_params, self.vocos_params, hid, result.end_dev)
            if cfg.runtime.wire_int16:
                return np.asarray(wav).astype(np.float32) / 32767.0
            return np.asarray(wav)

        items = result.hiddens if use_decoder else result.ids
        if not len(items) or max(x.shape[0] for x in items) == 0:
            return np.zeros((len(items), 0), np.float32)
        Tmax = max(x.shape[0] for x in items)
        Tpad = _round_up(Tmax, cfg.runtime.decode_bucket // 4 or 1)
        if use_decoder:
            batch = np.zeros((len(items), Tpad, cfg.gpt.hidden_size), np.float32)
            for i, h in enumerate(items):
                batch[i, : h.shape[0]] = h
            mel = self._decode_hidden_jit(self.decoder_params, jnp.asarray(batch))
        else:
            batch = np.zeros((len(items), Tpad, cfg.gpt.num_vq), np.int32)
            for i, ids in enumerate(items):
                batch[i, : ids.shape[0]] = ids
            mel = self._decode_indices_jit(self.dvae_params, jnp.asarray(batch))
        if cfg.runtime.wire_int16:
            wav = (np.asarray(self._vocos_wire_jit(self.vocos_params, mel))
                   .astype(np.float32) / 32767.0)
        else:
            wav = np.array(self._vocos_jit(self.vocos_params, mel))
        # zero the decode-bucket padding tail: zero *features* are not inert
        # through the conv/norm stacks, so with real weights the pad region
        # vocodes to non-silence that the |x|>1e-5 strip would keep.  Each
        # sequence's true length is Ti steps x 2 mel frames x hop samples
        # (the reference pads only to the batch max, core.py:512-539).
        spc = 2 * cfg.vocos.hop_length  # samples per code step
        for i, x in enumerate(items):
            wav[i, x.shape[0] * spc:] = 0.0
        return wav

    # -- generation passes ---------------------------------------------

    def _refine_text(self, text: List[str],
                     params: "Chat.RefineTextParams") -> GenerationOutputs:
        cfg = self.config.gpt
        prompts = Speaker.decorate_text_prompts(text, params.prompt)
        ids, attn, tmask = self.tokenizer.encode(prompts, cfg.num_vq)
        if getattr(self, "use_engine", False):
            from .engine.batching import EngineRequest

            eng = self._engine_for_text()
            lens = attn.sum(1)
            if lens.max() <= max(eng.ecfg.buckets):
                reqs = []
                for b in range(ids.shape[0]):
                    n = int(lens[b])
                    reqs.append(EngineRequest(
                        request_id=f"refine-{id(params)}-{b}",
                        ids=ids[b, ids.shape[1] - n :],
                        text_mask=tmask[b, ids.shape[1] - n :],
                        temperature=np.asarray([params.temperature],
                                               np.float32),
                        top_p=params.top_P, top_k=params.top_K,
                        repetition_penalty=params.repetition_penalty,
                        min_new=params.min_new_token,
                        max_new=params.max_new_token,
                        seed=params.manual_seed,
                        ensure_non_empty=params.ensure_non_empty))
                bar = self._progress_bar(params, len(reqs), "refine_text",
                                         per_request=True)
                if bar is not None:
                    for r in reqs:
                        r.on_progress = functools.partial(bar.report,
                                                          r.request_id)
                try:
                    outs = eng.generate(reqs, context=self.context)
                finally:
                    if bar is not None:
                        bar.close()
                return GenerationOutputs(
                    ids=[o.ids for o in outs], hiddens=[],
                    finished=np.asarray(
                        [o.finish_reason == "eos" for o in outs]))
            # prompts exceed the engine's bucket capacity: one-shot
            # generator path handles arbitrary lengths
        req = GenerateRequest(
            ids=ids, attn_mask=attn, text_mask=tmask, infer_text=True,
            eos_token=self.tokenizer.eos_token,
            temperature=np.asarray([params.temperature], np.float32),
            top_p=params.top_P, top_k=params.top_K,
            repetition_penalty=params.repetition_penalty,
            max_new=params.max_new_token, min_new=params.min_new_token,
            seed=params.manual_seed, ensure_non_empty=params.ensure_non_empty,
        )
        bar = self._progress_bar(params, len(text), "refine_text",
                                 per_request=False)
        if bar is not None:
            req.on_progress = functools.partial(bar.report, "batch")
        try:
            return next(self.generator.generate(req, self.context))
        finally:
            if bar is not None:
                bar.close()

    def _code_engine_geometry(self, tier: str):
        """Static engine geometry for a code-engine tier.

        The decode step's cost scales with the SLOT COUNT and the kv depth
        actually filled - NOT with the configured cache length (the
        megakernel scans chunks only up to ``max(cur)``, ops/pallas_step.py
        ``nc``), so both tiers carry the full 2048-token generation region
        and tiering is purely about width (the reference sizes its engine
        per deployment via EngineArgs, velocity/configs.py:551+):

        * ``"fast"`` - 8 slots: latency-sensitive and the facade's typical
          split-batch workload; per-step cost matches the 8-wide generator
          path, and DEFAULT ``InferCodeParams`` (max_new_token=2048) routes
          here whenever the batch fits - an EOS-terminated ~400-step batch
          must not pay the 16-wide shape for a ceiling it never reaches.
        * ``"capacity"`` - 16 slots, the concurrent STREAMING spine: the
          per-chunk step stays ~1.5 ms (24-step scheduling quantum ~36 ms),
          so live listeners get admission/abort/preempt decisions at that
          cadence.  Device-streaming slots are capped at 14 so saturating
          streams (the service's normal shape) leave preemptable slots for
          queued work (starvation bound).
        * ``"wide"`` - 32 slots for saturated OFFLINE work: equal
          aggregate throughput to the 16-slot tier at 2x the concurrent
          capacity (alternating same-process A/B median ratio 0.998,
          PERF.md round 5 - queued requests wait half as long; only
          reachable through the megakernel's flat int8-kv layout, XLA's
          padded bf16 cache OOMs at this shape).  Per-chunk-step latency
          is ~2.75 ms vs 1.49 at
          16 slots, which doubles the streaming scheduling quantum - hence
          a separate tier for bulk work rather than widening "capacity"
          (the latency A/B VERDICT r4 weak #2 asked for).  Requires a
          quantized KV cache; with CHATTTS_KV_INT8=0 the fused gate falls
          back to 16 slots and this tier loses its point, so routing
          guards on the engine's kv width.

        Prompt capacity is sized from the position-embedding budget rather
        than the prefill bucket (a spliced ``spk_smp`` clone prompt can run
        hundreds of tokens); bucket prefills compile lazily on first use.
        """
        from .engine.batching import EngineConfig

        rt = self.config.runtime
        max_new = rt.decode_bucket * 8
        if tier == "fast":
            slots, prompt_cap, stream_cap = 8, 256, None
        elif tier == "wide":
            slots, prompt_cap, stream_cap = 32, 512, 28
        else:
            slots, prompt_cap, stream_cap = 16, 512, 14
        budget = self.config.gpt.max_position_embeddings - max_new
        max_prompt = max(64, min(prompt_cap, (budget // 64) * 64))
        buckets = tuple(b for b in (64, 128, 256, 512)
                        if b <= max_prompt) or (max_prompt,)
        return EngineConfig(
            max_num_seqs=slots,
            max_prompt_len=max_prompt,
            max_new_tokens=max_new,
            chunk_steps=24,
            infer_text=False,
            collect_hidden=True,
            prompt_buckets=buckets,
            preempt_after_chunks=4,
            max_stream_slots=stream_cap,
        )

    def _engine_for_code(self, tier: str = "capacity"):
        """Lazily build the continuous-batching code engine for ``tier``."""
        engines = getattr(self, "_code_engines", None)
        if engines is None:
            engines = self._code_engines = {}
        if tier == "wide":
            from .engine import batching

            # same gate the router applies, for DIRECT tier requests too:
            # without a quantized KV cache the fused kernel caps at 16
            # slots and a 32-slot engine would take the XLA path, whose
            # padded bf16 cache OOMs one chip (PERF.md round 4) - fall
            # back instead of building a time bomb
            if batching.fused_slot_limit(self.config.gpt) < 32:
                self.logger.warning(
                    "wide tier requires the fused kernel at 32 slots "
                    "(quantized KV cache); falling back to capacity")
                tier = "capacity"
        if tier not in engines:
            from .engine.batching import Engine

            engines[tier] = Engine(
                self.config.gpt, self._code_engine_geometry(tier),
                self.gpt_params, self.embed_params,
                spk_emb_ids=self.tokenizer.spk_emb_ids,
                packed=self._step_slabs())
        return engines[tier]

    def _code_tier_for(self, n_requests: int, max_new: int,
                       prompt_len: int) -> str:
        """Pick the cheapest code-engine tier that fits the WORKLOAD.

        Routing is by batch width and prompt length - ``max_new`` is only a
        capacity check, never a router: the default ceiling (2048) says
        nothing about how long an EOS-terminated request actually runs, and
        every tier carries the full generation region anyway.  Saturated
        offline batches (wider than the 16-slot streaming tier) route to
        the 32-slot "wide" tier, the measured single-chip throughput peak
        (PERF.md round 4) - but only when the fused kernel actually runs
        32 slots there (quantized KV cache; a bf16-cache build caps the
        fused gate at 16 and the capacity tier time-slices instead).  A
        pure decision (no engine construction) so the gate is testable
        without building the 32-slot state."""
        fast = self._code_engine_geometry("fast")
        if (n_requests <= fast.max_num_seqs
                and max_new <= fast.max_new_tokens
                and prompt_len <= max(fast.buckets)):
            return "fast"
        cap = self._code_engine_geometry("capacity")
        wide = self._code_engine_geometry("wide")
        if n_requests > cap.max_num_seqs and prompt_len <= max(wide.buckets):
            from .engine import batching

            # gate BEFORE building: a 32-slot XLA-path engine would OOM on
            # one chip (the whole reason the wide tier is megakernel-only)
            if batching.fused_slot_limit(self.config.gpt) \
                    >= wide.max_num_seqs:
                return "wide"
        return "capacity"

    def _engine_for_code_auto(self, n_requests: int, max_new: int,
                              prompt_len: int):
        return self._engine_for_code(
            self._code_tier_for(n_requests, max_new, prompt_len))

    def _engine_for_text(self):
        """Text-mode engine for the refine pass under ``use_engine``."""
        if getattr(self, "_text_engine", None) is None:
            from .engine.batching import Engine, EngineConfig

            self._text_engine = Engine(
                self.config.gpt,
                EngineConfig(
                    max_num_seqs=8,
                    max_prompt_len=256,
                    max_new_tokens=512,
                    chunk_steps=24,
                    infer_text=True,
                    text_eos_token=self.tokenizer.eos_token,
                    collect_hidden=False,
                    prompt_buckets=(64, 128, 256),
                    preempt_after_chunks=4,
                ),
                self.gpt_params, self.embed_params,
                spk_emb_ids=self.tokenizer.spk_emb_ids,
                packed=self._step_slabs())
        return self._text_engine

    def _code_inputs(self, text, params: "Chat.InferCodeParams"):
        """Tokenized inputs of the code pass: (ids, attn, tmask, temp, spk)."""
        cfg = self.config.gpt
        prompts = Speaker.decorate_code_prompts(
            list(text), params.prompt, params.txt_smp, params.spk_emb)
        code_prompt = (Speaker.decode_prompt(params.spk_smp)
                       if params.spk_smp is not None else None)
        ids, attn, tmask = self.tokenizer.encode(
            prompts, cfg.num_vq, prompt=code_prompt)
        temp = (np.asarray(params.temperature, np.float32)
                if isinstance(params.temperature, list)
                else np.full((cfg.num_vq,), params.temperature, np.float32))
        spk = (Speaker.decode(params.spk_emb)
               if params.spk_emb is not None else None)
        return ids, attn, tmask, temp, spk

    def _code_requests(self, text, params: "Chat.InferCodeParams",
                       on_tokens=None, inputs=None):
        from .engine.batching import EngineRequest

        ids, attn, tmask, temp, spk = (inputs if inputs is not None
                                       else self._code_inputs(text, params))
        reqs = []
        for b in range(ids.shape[0]):
            n = int(attn[b].sum())
            reqs.append(EngineRequest(
                request_id=f"chat-{id(params)}-{b}",
                ids=ids[b, ids.shape[1] - n :],
                text_mask=tmask[b, ids.shape[1] - n :],
                temperature=temp, top_p=params.top_P, top_k=params.top_K,
                repetition_penalty=params.repetition_penalty,
                min_new=params.min_new_token,
                max_new=params.max_new_token, spk_vec=spk,
                seed=params.manual_seed,
                ensure_non_empty=params.ensure_non_empty,
                on_tokens=on_tokens))
        return reqs

    def _infer_code_engine(self, text, params: "Chat.InferCodeParams",
                           stream: bool = False, inputs=None, engine=None,
                           device_stream: bool = True,
                           long_chunk: bool = False):
        """Engine-backed code generation (use_vllm analog), incl. streaming:
        slot callbacks accumulate per-request increments and each engine
        chunk yields cumulative partials in the generator's output format.

        ``device_stream``: streaming requests keep hidden states ON DEVICE
        (EngineRequest.stream_hiddens_dev) and the partials carry batched
        ``hiddens_dev``/``end_dev`` - the downstream window vocode then runs
        on device and only PCM crosses the host link (the generator path's
        DeviceStreamingDecoder economics, applied to the engine)."""
        eng = engine if engine is not None else self._engine_for_code()
        bar = self._progress_bar(params, len(text), "infer_code",
                                 per_request=True)

        def attach(reqs):
            if bar is not None:
                for r in reqs:
                    r.on_progress = functools.partial(bar.report,
                                                      r.request_id)
            return reqs

        if not stream:
            from .engine.batching import outputs_to_generation

            try:
                outs = eng.generate(
                    attach(self._code_requests(text, params, inputs=inputs)),
                    context=self.context)
            finally:
                if bar is not None:
                    bar.close()
            # non-streaming outputs keep hiddens device-resident: the
            # batch feeds the device decode path without a host round trip
            yield outputs_to_generation(outs)
            return

        B = len(text)
        D = self.config.gpt.hidden_size
        acc_ids: List[List[np.ndarray]] = [[] for _ in text]
        acc_hid: List[List[np.ndarray]] = [[] for _ in text]
        cum_dev: List[Optional[jax.Array]] = [None] * B
        done = [False] * B
        index = {}

        def on_tokens(rid, new_ids, new_hid, finished):
            b = index[rid]
            if new_ids is not None:  # None = dropped by interrupt
                acc_ids[b].append(np.asarray(new_ids))
            if new_hid is not None:
                if device_stream:
                    # full (max_new, D) device row; true length = id count
                    cum_dev[b] = new_hid
                else:
                    acc_hid[b].append(np.asarray(new_hid))
            done[b] = done[b] or finished

        reqs = attach(self._code_requests(text, params, on_tokens=on_tokens,
                                          inputs=inputs))
        for r in reqs:
            r.stream_hiddens_dev = device_stream
        index.update({r.request_id: b for b, r in enumerate(reqs)})
        for r in reqs:
            eng.add_request(r)
        Z = np.zeros((0, self.config.gpt.num_vq), np.int32)
        Zh = np.zeros((0, D), np.float32)

        def partial_out():
            out_ids = [np.concatenate(a) if a else Z for a in acc_ids]
            fin = np.asarray(done)
            if device_stream:
                # batched device partial: stack the FULL fixed-shape
                # (max_new, D) slot rows on device (one compiled stack and
                # window-decode shape per engine tier - no per-length
                # recompiles); rows beyond a request's own count are masked
                # by end_dev.  ``n_valid`` is bounded by the SLOWEST
                # UNFINISHED request: with staggered admission (more
                # requests than slots, or preemption) a late row's content
                # for positions [0, k) only appears once it is admitted,
                # and downstream consumers (windowed walk, conv-state
                # incremental feed) never re-visit positions behind their
                # emission cursor - consuming past a lagging row would
                # bake its not-yet-generated positions in as silence.
                # Lockstep batches (the common case) lose nothing: all
                # unfinished rows share one count.
                lens = [sum(a.shape[0] for a in acc) for acc in acc_ids]
                n_safe = min((l for l, d in zip(lens, done) if not d),
                             default=max(lens))
                Tbuf = next((h.shape[0] for h in cum_dev if h is not None),
                            0)
                hb = (jnp.stack([
                    jnp.zeros((Tbuf, D), jnp.float32) if h is None else h
                    for h in cum_dev]) if Tbuf
                    else jnp.zeros((B, 0, D), jnp.float32))
                return GenerationOutputs(
                    ids=out_ids, hiddens=[], finished=fin,
                    hiddens_dev=hb, end_dev=jnp.asarray(lens, jnp.int32),
                    n_valid=n_safe, partial=not all(done))
            return GenerationOutputs(
                ids=out_ids,
                hiddens=[np.concatenate(a) if a else Zh for a in acc_hid],
                finished=fin, partial=not all(done))

        try:
            while eng.has_unfinished():
                if self.context.get():
                    eng.interrupt()
                    break
                # ``long_chunk``: bulk consumers (the pipelined decode)
                # accept chunk_steps_max of scheduling latency per yield;
                # live streaming keeps the short emission quantum
                eng.step(long_chunk=long_chunk)
                yield partial_out()
        finally:
            if bar is not None:
                bar.close()

    def _infer_code(self, text: List[str], stream: bool, return_hidden: bool,
                    params: "Chat.InferCodeParams",
                    stream_batch_override: Optional[int] = None,
                    speculate: bool = False,
                    speculate_from: int = 0,
                    on_dispatch=None):
        cfg = self.config.gpt
        inputs = self._code_inputs(text, params)
        ids, attn, tmask, temperature, spk_vec = inputs
        if getattr(self, "use_engine", False):
            plen = int(attn.sum(1).max())
            cap = max(self._code_engine_geometry("capacity").buckets)
            if plen <= cap:
                eng = self._engine_for_code_auto(
                    len(text), params.max_new_token, plen)
                # stream_batch_override marks a bulk pipeline consumer
                # (core._pipelined_wavs), not a live listener
                return self._infer_code_engine(
                    text, params, stream=stream, inputs=inputs, engine=eng,
                    device_stream=return_hidden,
                    long_chunk=stream_batch_override is not None)
            # a spliced clone prompt longer than the engine's prompt
            # capacity falls back to the one-shot generator, which buckets
            # arbitrary lengths (mirrors the refine pass's fallback; the
            # reference accepts prompts up to max_model_len,
            # velocity/configs.py:377-420)
            self.logger.info(
                "prompt length %d exceeds engine capacity %d; using the "
                "generator path", plen, cap)

        req = GenerateRequest(
            ids=ids, attn_mask=attn, text_mask=tmask, infer_text=False,
            eos_token=cfg.num_audio_tokens - 1,
            temperature=temperature,
            top_p=params.top_P, top_k=params.top_K,
            repetition_penalty=params.repetition_penalty,
            max_new=params.max_new_token, min_new=params.min_new_token,
            spk_vec=spk_vec,
            spk_emb_ids=self.tokenizer.spk_emb_ids,
            seed=params.manual_seed, ensure_non_empty=params.ensure_non_empty,
            stream_batch=(stream_batch_override if stream_batch_override
                          else (params.stream_batch if stream else 0)),
            return_hidden=return_hidden,
            speculate=speculate,
            speculate_from=speculate_from,
            on_dispatch=on_dispatch,  # generator-only; the engine path
            # above returns earlier (its vocode rides harvest instead)
        )
        bar = self._progress_bar(params, len(text), "infer_code",
                                 per_request=False)
        gen = self.generator.generate(req, self.context)
        if bar is not None:
            req.on_progress = functools.partial(bar.report, "batch")
            gen = self._closing_bar(gen, bar)
        return gen
