"""Continuous-batching serving engine.

Beyond the reference (which has no serving layer — SURVEY §1): a slot-based
decode engine for production inference.  A shared KV cache holds
``n_slots`` independent request contexts; each engine tick runs ONE decode
step for every active slot in a single jitted program with per-slot cache
positions, so requests join and leave the batch without stalling others
(continuous batching).  Admissions sharing a context bucket prefill
together in ONE program (batch padded to a power of two) and are scattered
into their slots — per-request dispatches would pay tunnel RTT + pipeline
fill each.

Request flow:
  submit(messages) /   -> host phases A/B (audio decode, VAD/ASR,
  submit_many([...])      templating, splice maps) + device perception/
                          splice (batched across requests) -> queued
  step()            -> dispatch ``steps_per_tick`` decode steps for the
                       active slots in ONE program, then admit queued
                       requests (prefill prep/dispatch overlaps the
                       in-flight decode; admissions join the next tick),
                       then fetch the tick's tokens (one host sync —
                       each sync costs dispatch latency / tunnel RTT;
                       measured 8.7x serving throughput at K=8 for
                       RTT-bound decode)
  run_until_done()  -> drain everything, returning {request_id: text}

Streaming: pass ``on_token(rid, token_id)`` to receive tokens as each
tick's results land (per-tick granularity, not per-step).

Lifecycle control: ``cancel(rid)`` retires a queued or running request
(tokens so far are kept, finish_reason="cancelled"); ``submit(...,
deadline_s=T)`` gives a request a wall budget *including queue wait* —
expired requests are shed at the next tick with finish_reason="deadline"
(backlog never grows unboundedly stale under overload).

Shapes are bucketed (context padded to multiples of ``ctx_bucket``) so the
engine compiles a handful of programs total.

Sampling: per-request temperature / top-p / do_sample ride the decode
batch as *traced* per-slot arrays (decode.sample_token_dynamic), so mixed
greedy and sampled requests share one compiled program.

ORCA deep injection: when the model deep-injects (orca_cross_attns in the
param tree), each slot carries its RoPE'd audio kv tokens in a fixed
[n_slots, Ta, D] buffer; the gated cross-attention runs after every
decoder layer during both prefill and decode
(cf. modeling_desta25.py:1101-1141), gated off per-slot for text-only
requests.  ORCA requests must carry exactly one audio (the injection kv
batch must match the request batch, as in ``generate``).
"""

from __future__ import annotations

import functools
import itertools
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..generate.decode import sample_token_dynamic
from ..models import llm as jllm
from ..models.desta import DeSTA25AudioModel

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    rid: int
    embeds: Any          # [1, Tc, D] device
    ctx_len: int         # valid context length (right-aligned)
    max_new_tokens: int
    temperature: float = 0.0
    top_p: float = 1.0
    do_sample: bool = False
    inject: Any = None   # [1, Ta, D] RoPE'd ORCA kv tokens, or None
    prompt_ids: Any = None  # np [ctx_len] n-gram seed (spec mode)
    tokens: List[int] = field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    truncated: bool = False   # context clipped or cache filled mid-run
    # "eos" | "stop" | "length" | "cache_full" | "cancelled" | "deadline"
    finish_reason: str = ""
    stop_strs: tuple = ()               # user stop sequences (host-side)
    stop_token_ids: frozenset = frozenset()
    final_text: Optional[str] = None    # text trimmed at the stop match
    deadline_s: Optional[float] = None  # wall budget incl. queue wait
    t_submit: float = 0.0


class ContinuousBatchingEngine:
    def __init__(self, model: DeSTA25AudioModel, n_slots: int = 16,
                 max_ctx: int = 256, max_new_tokens: int = 128,
                 ctx_bucket: int = 64, seed: int = 0,
                 steps_per_tick: int = 8, on_token=None,
                 speculative_k: int = 0,
                 adaptive_spec: bool = True,
                 spec_quiet_ticks: int = 4,
                 on_overflow: str = "error",
                 pipeline_ticks: bool = True,
                 audio_cache: int = 64):
        """n_slots=16 / steps_per_tick=8 defaults: measured on v5e-1 with
        the fused int8 decode kernel, in-kernel per-row cache writes and
        the top-k candidate sampler — 8 slots ~780 tok/s, 16 slots
        ~1450, 32 slots ~2550 (K=8; scripts/bench_serving_shaped.py,
        r3 driver bench serving_tok_s_* keys).
        ``on_token(rid, token_id)`` streams tokens as they are accepted
        host-side (once per tick).

        speculative_k >= 2 runs each tick as ``steps_per_tick``
        *speculative verify* steps: every slot drafts k-1 tokens by
        n-gram prompt-lookup over its own [context + transcription +
        generated] history (seeded at admission from the request's
        prompt ids) and verifies all k in one fused weight stream —
        repetitive continuations (transcription echo, JSON, lists)
        decode several tokens per step for ~5% extra cost per step.
        Sampled slots speculate too: each verify position draws from its
        temperature/top-p distribution and drafts are accepted up to the
        first mismatch (token-matching coupling — the emitted
        distribution is exactly plain sampling; generate/speculative.py
        has the argument).  Requires the fused verify kernel (int8 or
        bf16 tower, no LoRA; ORCA needs an int8 cross-attn stack + int8
        tower); falls back to plain ticks with a warning otherwise.

        adaptive_spec (default True, only meaningful with
        speculative_k >= 2): track an EMA of measured accepted
        tokens/step and drop to plain decode ticks while it is below
        break-even, re-probing with one history-resynced spec tick
        every ~24 ticks.  Break-even is COST-AWARE: the engine measures
        spec- and plain-tick durations (occasional plain calibration
        ticks while speculating) and requires acceptance >
        T_spec/T_plain — ~1.1 for a bare verify kernel, ~2x for ORCA
        whose in-kernel injection attends the audio K/V at every draft
        position.  Token trajectories are mode-invariant; set
        adaptive_spec=False to force speculation on every tick.

        spec_quiet_ticks (default 4, adaptive engines only): spec ticks
        additionally require this many consecutive dispatches with no
        pending queue and no admission.  Admission-bound workloads
        (steady arrivals) cannot profit from speculation — the tick
        count is set by the arrival schedule, so verify cost and
        mode-switch drains are pure loss (r5 load benches: ORCA
        --spec=4 138 vs 378 tok/s, plain 446 vs 477) — while saturated
        drain workloads go quiet right after their admission burst and
        keep the ~3x repetitive-workload win.  0 disables the gate
        except on the admission tick itself.

        on_overflow: "error" (default) rejects submissions whose context
        exceeds ``max_ctx`` with ValueError; "truncate" clips the left
        side and marks the request ``truncated`` in its result — never
        silent (VERDICT r2 weak #2).

        pipeline_ticks (DEFAULT-ON since r4: +44% under load — 349 ->
        502.8 tok/s at 8 slots, scripts/bench_serving_load.py with/
        without --pipeline on v5e-1) runs ONE-TICK-LOOKAHEAD dispatch:
        tick N+1
        is dispatched immediately, chained on tick N's device-resident
        last tokens, and tick N's results are fetched afterwards — the
        host sync (tunnel RTT + token bookkeeping, ~30% of a loaded
        tick here) hides behind the next tick's device time.  Token
        trajectories are identical for greedy requests (a finished
        request's slot decodes one extra "zombie" tick whose tokens are
        discarded; admissions overwrite the slot wholesale).  Sampled
        requests stay correctly distributed but draw different RNG
        streams than the sequential engine (tick indices shift).
        Composes with speculative_k: spec ticks chain the cache index /
        rope position on-device too (their per-tick advance is
        data-dependent).  Latency per token rises by up to one tick."""
        self.model = model
        # per-clip audio-feature cache (VAD/ASR/perception skipped on
        # hits — multi-turn conversations resubmit the same clip every
        # turn); 0 disables (models/feature_cache.py)
        model.enable_audio_cache(audio_cache)
        self.on_token = on_token
        self.cfg = model.llm_cfg
        self.n_slots = n_slots
        self.max_ctx = max_ctx
        self.max_new = max_new_tokens
        self.ctx_bucket = ctx_bucket
        self.t_max = max_ctx + max_new_tokens
        if speculative_k >= 2:
            # Kd slack: verify writes land at ci..ci+Kd-1
            self.t_max += speculative_k
        # ALL fused decode kernels (single-launch, TP, per-layer) require
        # the cache length to be a 128 multiple — an unrounded t_max
        # (e.g. 256+48=304) silently dropped every tick to the ~2x-slower
        # XLA path, caught by the round-3 load bench
        self.t_max = -(-self.t_max // 128) * 128
        self.steps_per_tick = max(1, steps_per_tick)
        if on_overflow not in ("error", "truncate"):
            raise ValueError(f"on_overflow: {on_overflow!r} "
                             "(expected 'error' or 'truncate')")
        self.on_overflow = on_overflow

        self.cache = jllm.init_kv_cache(self.cfg, n_slots, self.t_max,
                                        dtype=model.dtype)
        # host-side slot state
        self.slot_req: List[Optional[_Request]] = [None] * n_slots
        self.slot_pos = np.zeros(n_slots, np.int32)      # next cache index
        self.slot_rope = np.zeros(n_slots, np.int32)     # next rope position
        self.slot_mask = np.zeros((n_slots, self.t_max), np.int32)
        self.cur_tok = np.zeros(n_slots, np.int32)
        self.slot_temp = np.zeros(n_slots, np.float32)
        self.slot_top_p = np.ones(n_slots, np.float32)
        self.slot_sample = np.zeros(n_slots, bool)
        self.queue: List[_Request] = []
        self.finished: Dict[int, List[int]] = {}
        self.finished_info: Dict[int, Dict[str, Any]] = {}
        self._ids = itertools.count()
        self._eos = set(model._terminators())
        self._key = jax.random.PRNGKey(seed)

        # ORCA deep injection: fixed-length kv buffer per slot
        mcfg = model.config
        self._inject_len = 0
        if (mcfg.is_orca and mcfg.orca_deep_injection_enabled
                and "orca_cross_attns" in model.params
                and mcfg.orca_local_enabled):
            t_enc = model.enc_cfg.expected_mel_frames // 2
            k, s = mcfg.orca_local_kernel_size, mcfg.orca_local_downsample
            t_local = (t_enc + 2 * (k // 2) - k) // s + 1
            self._inject_len = t_local + (
                mcfg.orca_global_num_tokens
                if mcfg.orca_global_cross_attn else 0)
        d_llm = self.cfg.hidden_size
        self._inject_params = (model.params["orca_cross_attns"]
                               if self._inject_len else None)
        # per-layer audio K/V, precomputed ONCE at admission: the audio
        # tokens are decode-loop constants, and re-projecting them every
        # step x layer cost ~3.3 TFLOP/step at the ORCA flagship —
        # more FLOPs than the whole 4B tower (models/orca.py
        # precompute_cross_kv).  [L, n_slots, Ta, D] x2, model dtype.
        n_inj_layers = (jax.tree.leaves(self._inject_params)[0].shape[0]
                        if self._inject_len else 1)
        kv_bytes = (2 * n_inj_layers * n_slots * max(self._inject_len, 1)
                    * d_llm * jnp.dtype(model.dtype).itemsize)
        if kv_bytes > 4 << 30:
            # flagship geometry: ~160 MB/slot (L=36, Ta~440, D=2560 bf16)
            logger.warning(
                "ORCA injection K/V buffers: %.1f GB at n_slots=%d — "
                "the precomputed per-layer K/V trade HBM for the "
                "~3.3 TFLOP/step re-projection they replace; lower "
                "n_slots if this OOMs next to the tower weights",
                kv_bytes / 2**30, n_slots)
        # buffers are 8-row padded on the Ta axis (the fused in-kernel
        # injection DMAs [Ta, D] blocks, which need sublane-aligned
        # shapes); padded rows stay zero and are masked in-kernel, and
        # the XLA fallback slices back to the real length
        ta_pad = -(-max(self._inject_len, 1) // 8) * 8
        self.inject_k = jnp.zeros(
            (n_inj_layers, n_slots, ta_pad, d_llm), model.dtype)
        self.inject_v = jnp.zeros_like(self.inject_k)
        self.inject_on = np.zeros(n_slots, np.float32)

        # speculative verify ticks (greedy slots draft k-1 tokens/step)
        self.speculative_k = 0
        if speculative_k >= 2:
            from ..ops.fused_decode import (
                fused_inject_supported,
                fused_supported,
            )
            # ORCA slots can speculate too: the verify kernel runs the
            # gated cross-attention in-kernel for all Kd draft positions
            # (requires an int8-quantized cross-attn stack)
            from ..ops.fused_decode_mesh import fused_mesh_supported
            from ..ops.quant import is_quantized
            ok = (model.params.get("lora") is None
                  and (fused_supported(model.params["llm"], self.cfg,
                                       self.cache, kd=speculative_k)
                       # TP serving speculates through the single-launch
                       # mesh kernel (ops/fused_decode_mesh.py)
                       or fused_mesh_supported(
                           model.params["llm"], self.cfg, self.cache,
                           kd=speculative_k))
                  and (self._inject_len == 0
                       or (fused_inject_supported(
                               self._inject_params, self.cfg,
                               self.inject_k.shape[2])
                           # injection rides the int8 weight ring only
                           and is_quantized(
                               model.params["llm"]["layers"]["wq"]))))
            if ok:
                self.speculative_k = speculative_k
            else:
                logger.warning(
                    "speculative_k=%d requested but the fused verify "
                    "kernel is unsupported here (needs int8 weights, "
                    "bf16 cache, no LoRA; ORCA additionally needs "
                    "an int8 cross-attn stack); serving falls back to "
                    "plain decode ticks", speculative_k)
        # Adaptive speculation (measured motivation: --spec=4 on a
        # random-text load bench is 264 vs 339 tok/s — acceptance ~1
        # never pays the Kd-wide verify cost, while repetitive
        # workloads hold 3.1-3.3x).  The controller tracks an EMA of
        # accepted tokens/step from real verify ticks; when it sinks
        # below ``_spec_off`` the engine falls back to plain ticks and
        # re-probes with one spec tick (history resynced from host)
        # every ``_spec_reprobe`` ticks.  Greedy trajectories are mode-
        # invariant, so switching is correctness-free; only drafting
        # efficiency is at stake.
        self.adaptive_spec = bool(adaptive_spec) and self.speculative_k >= 2
        self.spec_quiet_ticks = int(spec_quiet_ticks)
        # Break-even is COST-AWARE: a spec tick emits acc*K tokens in
        # T_spec where a plain tick emits K in T_plain, so speculation
        # wins iff acc > T_spec/T_plain — ~1.05 for a bare verify kernel
        # but ~2x for ORCA (the in-kernel injection attends Ta audio
        # tokens per draft position).  The engine measures both tick
        # durations (consume fetch-block EMAs, admission-contaminated
        # ticks skipped) and derives the bars; until both samples exist
        # it falls back to the static ones below.
        self._spec_off = 1.12       # fallback: EMA below this -> plain
        self._spec_on = 1.35        # fallback: probe >= this -> spec
        self._spec_reprobe = 24     # plain ticks between spec probes
        # Each FAILED probe doubles the next probe interval (cap 16x =
        # 384 ticks): a probe is not free — entering/leaving spec mode
        # drains the pipelined in-flight tick twice and resyncs the
        # n-gram history, so probing a workload that keeps refusing
        # speculation every 24 ticks taxed spec-enabled engines ~25% on
        # random text (r5 load bench: 324 vs 429 tok/s no-spec).  A
        # successful probe or a live->off transition resets the backoff
        # (fresh evidence the workload changed).
        # Arrival-awareness (r5 load benches): on a steady-arrival
        # workload the tick budget is ADMISSION-bound — 48 requests at
        # ~1 admission/tick need ~45 ticks no matter how many tokens a
        # verify tick accepts — so speculation cannot raise sustained
        # throughput; it only adds verify cost and collides its mode-
        # switch drains with admissions (ORCA --spec=4: 138 vs 378
        # tok/s with acceptance ~2 sitting right at the cost-aware bar;
        # plain --spec=4: 446 vs 477).  An adaptive engine therefore
        # speculates only when QUIET: spec ticks require
        # > spec_quiet_ticks consecutive dispatches with no pending
        # queue and no admission.  Saturated drain workloads (the 3x
        # repetitive win) go quiet right after their admission burst and
        # keep the win; steady-arrival workloads pin the no-spec
        # baseline.  adaptive_spec=False bypasses the gate (forced
        # speculation every tick).
        self._quiet_ticks = 0
        self._reprobe_backoff = 1
        self._spec_ema = self._spec_on
        # Optimistic start, but as a PROBE: the first spec tick gets the
        # one-tick probe verdict (refused -> plain mode + backoff)
        # instead of waiting for the EMA to decay from the optimistic
        # seed — on random text the decay took ~5 spec ticks plus two
        # pipeline drains each (r5 load bench: 9 of 90 ticks ran
        # speculative, 445.6 vs 477.0 tok/s no-spec = 6.6% tax; a
        # repetitive workload passes the first-tick verdict and stays
        # live, so the 'keep trying' upside is preserved).
        self._spec_live = True
        self._spec_probing = True
        self._hist_dirty = False    # plain ticks skip n-gram upkeep
        self._ticks_since_probe = 0
        self._ticks_since_plain_probe = 0
        self._dur_ema = {"spec": None, "plain": None}
        self._n_admissions = 0
        self._n_spec_ticks = 0   # observability: dispatched tick mix
        self._n_plain_ticks = 0
        self.pipeline_ticks = bool(pipeline_ticks)
        # device-resident slot state (pipelined mode): dispatches chain
        # on these without a host sync; admissions patch them.  Spec
        # ticks additionally chain cache index / rope position (their
        # per-tick advance is data-dependent).
        self._cur_dev = jnp.zeros((n_slots,), jnp.int32)
        self._ci_dev = jnp.zeros((n_slots,), jnp.int32)
        self._pos_dev = jnp.zeros((n_slots,), jnp.int32)
        self._inflight = None  # (kind, payload, [(slot, req)], ...)
        # pipelined admissions whose first-token fetch is deferred to
        # the consume phase: [(slots, reqs, device_tok)]
        self._pending_admits: List[Tuple[List[int], List[_Request],
                                         Any]] = []

        # per-slot n-gram history (device-resident across ticks); slack
        # covers the worst-case device overshoot within one tick
        hcap = self.t_max + self.steps_per_tick * max(speculative_k, 1) + 8
        self.hist = jnp.zeros((n_slots, hcap), jnp.int32)
        self.hlen = jnp.zeros((n_slots,), jnp.int32)
        self.slot_decode_start = np.zeros(n_slots, np.int32)

        self._decode_jit = jax.jit(self._decode_steps)
        self._spec_jit = jax.jit(self._spec_steps,
                                 static_argnames=("sample_positions",))
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=("t_bucket",))

    # -- jitted programs ---------------------------------------------------

    def _inject_fn(self, inject_params, inj_k, inj_v, inject_on):
        """extra_layer_fn over per-batch precomputed injection K/V +
        on-flags.

        inject_params is a jit ARGUMENT (stacked orca_cross_attns layers),
        never a closure constant — closing over a big param tree would bake
        the weights into the HLO.  inj_k/inj_v are the per-layer audio
        K/V from precompute_cross_kv ([L, B, Ta, D])."""
        if self._inject_len == 0:
            return None
        from ..models.orca import gated_cross_attention_apply
        heads = self.cfg.num_attention_heads
        # buffers may be Ta-padded for the fused kernel; the XLA math
        # attends over the real rows only (no mask in the reference MHA)
        inj_k = inj_k[:, :, :self._inject_len]
        inj_v = inj_v[:, :, :self._inject_len]

        def fn(idx, h):
            lp = jax.tree.map(lambda x: x[idx], inject_params["layers"])
            out = gated_cross_attention_apply(
                lp, h, None, heads, cached_kv=(inj_k[idx], inj_v[idx]))
            # where (not a lerp) keeps audio slots bit-exact with the
            # one-shot generate path and text-only slots untouched
            return jnp.where(inject_on[:, None, None] > 0, out, h)

        return fn

    def _prefill(self, params, inject_params, embeds, mask, inject_kv,
                 inject_on, temp, top_p, do_sample, key, t_bucket):
        """Batched prefill: R same-bucket requests in ONE program (each
        per-request dispatch would otherwise pay tunnel RTT + pipeline
        fill).  R is padded to a power of two by the caller; padded rows
        carry all-zero masks and are discarded host-side."""
        R = embeds.shape[0]
        if self._inject_len:
            from ..models.orca import precompute_cross_kv
            inj_k, inj_v = precompute_cross_kv(inject_params, inject_kv)
            inj_k = inj_k.astype(self.model.dtype)
            inj_v = inj_v.astype(self.model.dtype)
        else:
            inj_k = inj_v = jnp.zeros(
                (1,) + inject_kv.shape, self.model.dtype)
        cache = jllm.init_kv_cache(self.cfg, R, self.t_max,
                                   dtype=self.model.dtype)
        full_mask = jnp.zeros((R, self.t_max), jnp.int32
                              ).at[:, :t_bucket].set(mask)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, cache, _ = jllm.llm_apply(
            params, self.cfg, inputs_embeds=embeds,
            attention_mask=full_mask, positions=positions,
            cache=cache, cache_index=0,
            lora=params.get("lora"),
            lora_scale=self.model.config.lora_scale,
            extra_layer_fn=self._inject_fn(inject_params, inj_k, inj_v,
                                           inject_on))
        tok = sample_token_dynamic(logits[:, -1].astype(jnp.float32), key,
                                   temp, top_p, do_sample)
        return tok, cache.k, cache.v, positions[:, -1], inj_k, inj_v

    def _decode_steps(self, params, inject_params, cache, toks, rope_pos,
                      write_pos, mask, inj_k, inj_v, inject_on, temp,
                      top_p, do_sample, key):
        """``steps_per_tick`` decode steps in ONE program (lax.scan) —
        every host<->device round trip costs tunnel RTT, so the host only
        syncs once per tick.  Rows that emit a stop token freeze (keep
        re-emitting it); the host consumes each slot's tokens up to its
        stop/budget and discards the rest."""
        eos = (jnp.asarray(sorted(self._eos), jnp.int32)
               if self._eos else None)
        extra = self._inject_fn(inject_params, inj_k, inj_v, inject_on)
        fspec = None
        if self._inject_len:
            from ..ops.fused_decode import fused_inject_supported
            if fused_inject_supported(inject_params, self.cfg,
                                      inj_k.shape[2]):
                # in-kernel gated cross-attention: the injection runs
                # inside the single-launch fused kernel (weights on the
                # int8 ring, audio K/V through VMEM ring buffers) instead
                # of per-layer XLA between launches
                fspec = dict(params=inject_params, k=inj_k, v=inj_v,
                             ta_real=self._inject_len,
                             heads=self.cfg.num_attention_heads,
                             on=inject_on)
        t_idx = jnp.arange(self.t_max)

        def body(carry, step):
            cur, cache, mask, done = carry
            step_mask = mask | (t_idx[None, :]
                                == (write_pos + step)[:, None]).astype(
                                    mask.dtype)
            logits, cache, _ = jllm.llm_apply(
                params, self.cfg, input_ids=cur[:, None],
                attention_mask=step_mask,
                positions=(rope_pos + step)[:, None],
                cache=cache, cache_index=write_pos + step,
                lora=params.get("lora"),
                lora_scale=self.model.config.lora_scale,
                extra_layer_fn=extra, fused_injection=fspec)
            nxt = sample_token_dynamic(
                logits[:, -1].astype(jnp.float32),
                jax.random.fold_in(key, step), temp, top_p, do_sample)
            nxt = jnp.where(done, cur, nxt)
            new_done = done if eos is None else (
                done | jnp.any(nxt[:, None] == eos[None, :], axis=-1))
            return (nxt, cache, step_mask, new_done), nxt

        init = (toks, cache, mask, jnp.zeros(toks.shape, bool))
        (_, cache, _, _), outs = jax.lax.scan(
            body, init, jnp.arange(self.steps_per_tick))
        return outs, cache  # outs: [K, n_slots]

    def _spec_steps(self, params, inject_params, cache, toks, rope_pos,
                    write_pos, mask, inj_k, inj_v, inject_on, decode_start,
                    hist, hlen, temp, top_p, do_sample, key,
                    sample_positions: int = 1):
        """``steps_per_tick`` speculative-verify steps in ONE program.

        Each step drafts Kd-1 tokens per slot by bigram prompt-lookup
        over the slot's history buffer (generate/speculative.ngram_
        propose), verifies all Kd in one fused weight stream
        (ops/fused_decode.fused_verify_layers with per-row cache
        indices) and accepts the longest draft prefix matching the
        model's own token draws — argmax for greedy slots, a
        temperature/top-p sample per verify position for sampled slots
        (the token-matching coupling: distribution-identical to plain
        sampling, see generate/speculative.py).  ``sample_positions``
        (static) is how many verify positions run the sampler — the
        host passes Kd when any active slot samples and 1 otherwise, so
        pure-greedy ticks never pay the extra sampler passes; sampled
        rows' acceptance is capped at ``sample_positions``.  Rows freeze
        when an accepted stop token lands or the cache can no longer
        hold a Kd-token write (ci > S - Kd — the host surfaces that as
        ``cache_full``).

        Returns (emits [K, B, Kd], ms [K, B] accepted counts, cur,
        cache, hist, hlen)."""
        from ..generate.speculative import ngram_propose
        from ..models.llm import _head_logits, rms_norm
        fspec = None
        if self._inject_len:
            # in-kernel ORCA injection during verify (eligibility —
            # int8 cross-attn stack — was checked at engine init)
            fspec = dict(params=inject_params, k=inj_k, v=inj_v,
                         ta_real=self._inject_len,
                         heads=self.cfg.num_attention_heads,
                         on=inject_on)
        Kd = self.speculative_k
        cfg = self.cfg
        S = self.t_max
        eos = (jnp.asarray(sorted(self._eos), jnp.int32)
               if self._eos else None)
        t_idx = jnp.arange(S)
        jidx = jnp.arange(Kd)[None, :]
        # the verify bias admits keys < each row's write index, so every
        # position from the slot's decode start can be pre-marked valid
        full_mask = mask | (t_idx[None, :]
                            >= decode_start[:, None]).astype(mask.dtype)

        def is_eos(t):
            if eos is None:
                return jnp.zeros(t.shape, bool)
            return jnp.any(t[..., None] == eos, axis=-1)

        from ..ops.fused_decode_mesh import pick_verify_fn
        verify_fn = pick_verify_fn(
            params, cfg, cache, Kd,
            inject_params=fspec["params"] if fspec else None,
            ta_padded=fspec["k"].shape[2] if fspec else 0)
        assert verify_fn is not None, \
            "spec ticks require an eligible fused verify kernel " \
            "(checked at engine init)"

        def body(carry, step):
            cur, cache, ci, pos, hist, hlen, done = carry
            draft = ngram_propose(hist, hlen, Kd - 1)
            toks_k = jnp.concatenate([cur[:, None], draft], axis=1)
            posn = pos[:, None] + jidx
            embeds = params["embed"][toks_k]
            hidden, cache = verify_fn(
                params, cfg, embeds, full_mask, posn, cache, ci,
                inject=fspec)
            hidden = rms_norm(params["norm"], hidden, cfg.rms_norm_eps)
            lg = _head_logits(params, cfg, hidden)       # [B, Kd, V]
            g = jnp.argmax(lg, -1).astype(jnp.int32)
            nsp = sample_positions
            if nsp > 1:
                # sampled slots: one draw per verify position, batched as
                # ONE [B*nsp, V] sampler pass (per-position passes would
                # each pay the full-vocab argmax/logsumexp).  Greedy rows
                # fall out of sample_token_dynamic as their exact argmax,
                # so the overwrite is an identity for them.
                B_ = g.shape[0]
                drawn = sample_token_dynamic(
                    lg[:, :nsp].astype(jnp.float32).reshape(
                        B_ * nsp, -1),
                    jax.random.fold_in(key, step),
                    jnp.repeat(temp, nsp), jnp.repeat(top_p, nsp),
                    jnp.repeat(do_sample, nsp))
                g = g.at[:, :nsp].set(drawn.reshape(B_, nsp))
            else:
                # greedy-only tick except possibly position 0
                t0_ = sample_token_dynamic(
                    lg[:, 0].astype(jnp.float32),
                    jax.random.fold_in(key, step), temp, top_p,
                    do_sample)
                g = g.at[:, 0].set(t0_)
            match = (toks_k[:, 1:] == g[:, :-1]).astype(jnp.int32)
            m = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
            # a sampled row may only accept positions whose token came
            # from the sampler
            m = jnp.where(do_sample, jnp.minimum(m, sample_positions), m)
            eos_hit = is_eos(g)
            eos_pos = jnp.min(jnp.where(eos_hit & (jidx < m[:, None]),
                                        jidx, Kd), axis=1)
            m = jnp.minimum(m, eos_pos + 1)
            m = jnp.where(done, 0, m)
            # history append: all Kd candidates written at hlen; junk
            # past m is overwritten by the next append (buffers carry
            # slack; ngram_propose never reads past hlen)
            hist = jax.vmap(
                lambda b, v, i: jax.lax.dynamic_update_slice(b, v, (i,))
            )(hist, g, hlen)
            nxt = jnp.take_along_axis(
                g, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
            cur = jnp.where(m > 0, nxt, cur)
            done = done | (eos_pos < m) | (ci + m > S - Kd)
            return ((cur, cache, ci + m, pos + m, hist, hlen + m, done),
                    (g, m))

        done0 = write_pos > S - Kd
        init = (toks, cache, write_pos, rope_pos, hist, hlen, done0)
        (cur, cache, ci_f, pos_f, hist, hlen, _), (emits, ms) = \
            jax.lax.scan(body, init, jnp.arange(self.steps_per_tick))
        return emits, ms, cur, cache, hist, hlen, ci_f, pos_f

    @functools.cached_property
    def _rope_jit(self):
        from ..ops.rope import fractional_rope_apply
        scale = self.model.config.orca_audio_position_scale
        theta = self.cfg.rope_theta
        return jax.jit(lambda t: fractional_rope_apply(t, scale, theta))

    # -- host API -----------------------------------------------------------

    def submit(self, messages, max_new_tokens: Optional[int] = None,
               temperature: float = 0.0, top_p: float = 1.0,
               do_sample: bool = False,
               deadline_s: Optional[float] = None,
               stop: Optional[List[str]] = None,
               stop_token_ids: Optional[List[int]] = None) -> int:
        """Prepare a request (host phases + perception) and queue it."""
        return self.submit_many([messages], max_new_tokens=max_new_tokens,
                                temperature=temperature, top_p=top_p,
                                do_sample=do_sample,
                                deadline_s=deadline_s, stop=stop,
                                stop_token_ids=stop_token_ids)[0]

    def submit_many(self, messages_list,
                    max_new_tokens: Optional[int] = None,
                    temperature: float = 0.0, top_p: float = 1.0,
                    do_sample: bool = False,
                    deadline_s: Optional[float] = None,
                    stop: Optional[List[str]] = None,
                    stop_token_ids: Optional[List[int]] = None
                    ) -> List[int]:
        """Queue several conversations with ONE batched host+perception
        pass (per-request perception dispatches would each pay tunnel RTT
        and run the encoder at batch 1 — VERDICT r1 weak #5)."""
        embeds, attn_mask, inject, prompt_ids = \
            self.model._prepare_generation_inputs(messages_list)
        am = np.asarray(attn_mask)
        rids: List[int] = []
        if self._inject_len and inject is not None:
            if (inject.shape[0] != len(messages_list)
                    or inject.shape[1] != self._inject_len):
                raise ValueError(
                    "ORCA serving requests must carry exactly one 30 s "
                    f"audio each (injection kv {inject.shape}, expected "
                    f"[{len(messages_list)}, {self._inject_len}, d])")
            inject = self._rope_jit(inject)
        for r in range(embeds.shape[0]):
            e, ctx_len, truncated = self._bucket_row(embeds[r:r + 1],
                                                     am[r])
            inj = (inject[r:r + 1]
                   if self._inject_len and inject is not None else None)
            valid_ids = np.asarray(prompt_ids[r])[am[r] > 0][-ctx_len:] \
                if prompt_ids is not None else None
            rid = next(self._ids)
            self.queue.append(_Request(
                rid=rid, embeds=e, ctx_len=ctx_len,
                max_new_tokens=min(max_new_tokens or self.max_new,
                                   self.max_new),
                temperature=temperature, top_p=top_p, do_sample=do_sample,
                inject=inj, prompt_ids=valid_ids, truncated=truncated,
                deadline_s=deadline_s, t_submit=time.monotonic(),
                stop_strs=tuple(stop or ()),
                stop_token_ids=frozenset(stop_token_ids or ())))
            rids.append(rid)
        return rids

    # -- cancellation / deadlines ----------------------------------------

    def _retire_unslotted(self, req: _Request, reason: str):
        """Record a terminal result for a request that never reached (or
        no longer holds) a slot."""
        req.done = True
        req.finish_reason = reason
        self.finished[req.rid] = req.tokens
        self.finished_info[req.rid] = {
            "tokens": req.tokens,
            "finish_reason": reason,
            "truncated": req.truncated,
            "prompt_tokens": req.ctx_len,
        }
        if req.final_text is not None:
            self.finished_info[req.rid]["text"] = req.final_text

    def flush(self) -> List[int]:
        """Materialize the in-flight pipelined tick (if any) WITHOUT
        dispatching a new one, returning request ids it finished.  The
        chained device state is untouched, so a subsequent step() resumes
        the identical trajectory.  No-op for sequential engines."""
        fin0 = self._drain_pending_admits()
        if self._inflight is None:
            return fin0
        kind, *payload = self._inflight
        self._inflight = None
        payload.pop()  # admission marker; no duration sampling here
        if kind == "spec":
            outs, ms, slot_reqs = payload
            return fin0 + self._consume_spec_tick(
                slot_reqs, np.asarray(outs), np.asarray(ms),
                self.slot_pos.copy())
        return fin0 + self._consume_tick(*payload)

    def cancel(self, rid: int) -> bool:
        """Cancel a queued or running request.  Tokens generated so far
        are kept in the result with finish_reason="cancelled" (the
        in-flight pipelined tick is flushed first so "so far" includes
        it); a slot freed mid-tick is safe (the in-flight tick's writes
        for it are discarded as a zombie, same as slot reuse).  Returns
        False when the id is unknown or already finished."""
        self.flush()
        for i, r in enumerate(self.queue):
            if r.rid == rid:
                self.queue.pop(i)
                self._retire_unslotted(r, "cancelled")
                return True
        for s in range(self.n_slots):
            req = self.slot_req[s]
            if req is not None and req.rid == rid:
                self._finish(s, "cancelled")
                return True
        return False

    def _expire_deadlines(self) -> List[int]:
        """Retire every request (queued or active) whose wall budget ran
        out — queue wait counts, so deadlines shed load under backlog."""
        now = time.monotonic()
        expired: List[int] = []
        for s in range(self.n_slots):
            req = self.slot_req[s]
            if (req is not None and req.deadline_s is not None
                    and now - req.t_submit > req.deadline_s):
                expired.append(req.rid)
                self._finish(s, "deadline")
        still: List[_Request] = []
        for r in self.queue:
            if (r.deadline_s is not None
                    and now - r.t_submit > r.deadline_s):
                expired.append(r.rid)
                self._retire_unslotted(r, "deadline")
            else:
                still.append(r)
        self.queue = still
        return expired

    def _bucket_row(self, embeds, mask_row) -> Tuple[Any, int, bool]:
        """Left-pad/trim one [1, T, D] context to its ctx bucket.

        Contexts longer than ``max_ctx`` are rejected (on_overflow=
        "error", the default) or left-clipped with the request flagged
        ``truncated`` — never silently (VERDICT r2 weak #2)."""
        T = embeds.shape[1]
        ctx_len = int(mask_row.sum())
        truncated = False
        if ctx_len > self.max_ctx:
            if self.on_overflow == "error":
                raise ValueError(
                    f"request context is {ctx_len} tokens but the engine "
                    f"was built with max_ctx={self.max_ctx}; raise "
                    "max_ctx or pass on_overflow='truncate' to clip "
                    "(the clipped request is flagged truncated)")
            truncated = True
        # batched prepare left-pads to the longest row; re-tighten to this
        # row's own bucket before slotting
        Tr = min(-(-ctx_len // self.ctx_bucket) * self.ctx_bucket
                 if ctx_len else self.ctx_bucket, self.max_ctx)
        if T < Tr:
            embeds = jnp.pad(embeds, ((0, 0), (Tr - T, 0), (0, 0)))
        elif T > Tr:
            embeds = embeds[:, -Tr:]
            ctx_len = min(ctx_len, Tr)
        return embeds, ctx_len, truncated

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _admit(self, reqs: List[_Request], slots: List[int], Tb: int):
        """Prefill R same-bucket requests in one program and place them
        into ``slots``."""
        R = len(reqs)
        Rp = 1 << (R - 1).bit_length()  # pad to pow2: bounded compile set
        dtype = reqs[0].embeds.dtype
        D = self.cfg.hidden_size
        embeds = jnp.concatenate(
            [r.embeds for r in reqs]
            + ([jnp.zeros((Rp - R, Tb, D), dtype)] if Rp != R else []),
            axis=0)
        mask = np.zeros((Rp, Tb), np.int32)
        for i, r in enumerate(reqs):
            mask[i, Tb - r.ctx_len:] = 1
        Ta = max(self._inject_len, 1)
        zero_inject = jnp.zeros((1, Ta, D), dtype)
        inject_kv = jnp.concatenate(
            [r.inject if r.inject is not None else zero_inject
             for r in reqs]
            + ([jnp.zeros((Rp - R, Ta, D), dtype)] if Rp != R else []),
            axis=0)
        on = np.zeros(Rp, np.float32)
        temp = np.zeros(Rp, np.float32)
        top_p = np.ones(Rp, np.float32)
        do_sample = np.zeros(Rp, bool)
        for i, r in enumerate(reqs):
            on[i] = 1.0 if r.inject is not None else 0.0
            temp[i], top_p[i], do_sample[i] = (r.temperature, r.top_p,
                                               r.do_sample)

        tok, k_all, v_all, last_pos, inj_k, inj_v = self._prefill_jit(
            self.model.params["llm"], self._inject_params,
            embeds, jnp.asarray(mask), inject_kv,
            jnp.asarray(on), jnp.asarray(temp), jnp.asarray(top_p),
            jnp.asarray(do_sample), self._next_key(), t_bucket=Tb)
        sl = jnp.asarray(slots)
        self.cache = jllm.KVCache(
            self.cache.k.at[:, sl].set(k_all[:, :R]),
            self.cache.v.at[:, sl].set(v_all[:, :R]))
        if self._inject_len:
            # buffers are Ta-padded (8-aligned); write the real rows only
            self.inject_k = self.inject_k.at[
                :, sl, :self._inject_len].set(inj_k[:, :R])
            self.inject_v = self.inject_v.at[
                :, sl, :self._inject_len].set(inj_v[:, :R])
        # the post-prefill rope position is host-derivable (last real
        # position = ctx_len - 1, exactly what _prefill returns); the
        # sampled first token is the ONLY device-only admission state.
        # Pipelined engines therefore never block on the prefill fetch:
        # device mirrors are patched with the device-resident token and
        # the host-side bookkeeping (req.tokens / stop checks / stream
        # callback) is deferred to the consume phase, where the fetch
        # overlaps the already-dispatched tick's device time (r5 load
        # bench: the blocking fetch cost ~15% sustained throughput).
        last_pos_h = np.maximum(mask.sum(axis=1) - 1, 0).astype(np.int32)
        if self.speculative_k:
            # seed the n-gram history: [context-with-transcription ids]
            # host-side, then the first sampled token appended by a
            # device scatter (no host fetch)
            hcap = self.hist.shape[1]
            seeds = np.zeros((R, hcap), np.int32)
            lens = np.zeros(R, np.int32)
            for i, req in enumerate(reqs):
                ids = (req.prompt_ids if req.prompt_ids is not None
                       else np.zeros(0, np.int32))
                seeds[i, :len(ids)] = ids
                lens[i] = len(ids)
            sl_arr = jnp.asarray(slots)
            lens_d = jnp.asarray(lens)
            # merge the device token at each row's length elementwise —
            # a [R]x[R] diagonal scatter would be a NEW program shape
            # per admission group (and a remote-compile risk); the row
            # scatter below is the same program family admissions have
            # always used
            seeded = jnp.asarray(seeds) + (
                jnp.arange(hcap)[None, :] == lens_d[:, None]
            ) * tok[:R, None]
            self.hist = self.hist.at[sl_arr].set(seeded)
            self.hlen = self.hlen.at[sl_arr].set(lens_d + 1)
        for i, (req, s) in enumerate(zip(reqs, slots)):
            req.slot = s
            self.slot_req[s] = req
            self.slot_mask[s] = 0
            self.slot_mask[s, :Tb] = mask[i]
            self.slot_pos[s] = Tb
            self.slot_decode_start[s] = Tb
            self.slot_rope[s] = int(last_pos_h[i]) + 1
            self.slot_temp[s] = req.temperature
            self.slot_top_p[s] = req.top_p
            self.slot_sample[s] = req.do_sample
            self.inject_on[s] = on[i]
        self._n_admissions += 1
        self._quiet_ticks = 0  # admission: the engine is not quiet
        if self.pipeline_ticks:
            # patch the device-resident slot state for the admitted
            # slots (continuing slots keep their device-chained values)
            sl_d = jnp.asarray(slots)
            self._cur_dev = self._cur_dev.at[sl_d].set(tok[:R])
            self._ci_dev = self._ci_dev.at[sl_d].set(Tb)
            self._pos_dev = self._pos_dev.at[sl_d].set(
                jnp.asarray(last_pos_h[:R]) + 1)
            self._pending_admits.append((list(slots), list(reqs), tok))
        else:
            self._apply_admit_tokens(slots, reqs, np.asarray(tok))

    def _apply_admit_tokens(self, slots, reqs, tokh) -> List[int]:
        """Token-dependent admission bookkeeping: record each admitted
        request's first sampled token, stream it, and run stop checks.
        Called inline (sequential engines) or from the deferred-drain
        path (pipelined engines).  Returns finished request ids."""
        finished: List[int] = []
        for i, (req, s) in enumerate(zip(reqs, slots)):
            if req.done or self.slot_req[s] is not req:
                continue  # retired (deadline/cancel) before the drain
            t = int(tokh[i])
            req.tokens.append(t)
            if self.on_token is not None:
                self.on_token(req.rid, t)
            self.cur_tok[s] = t
            fin = self._check_stop(req, t)
            if fin:
                finished.append(req.rid)
                self._finish(s, fin)
        return finished

    def _drain_pending_admits(self) -> List[int]:
        """Fetch the deferred first tokens of pipelined admissions and
        apply their host bookkeeping.  Runs in the consume phase (after
        the next tick has been dispatched) so the fetch blocks on device
        time the pipeline already paid for; also before anything that
        reads authoritative host token state (flush, spec resync)."""
        finished: List[int] = []
        for slots, reqs, tok in self._pending_admits:
            finished += self._apply_admit_tokens(slots, reqs,
                                                 np.asarray(tok))
        self._pending_admits = []
        return finished

    def _admit_queued(self):
        """Admit queued requests into free slots — requests sharing the
        head-of-line request's ctx bucket prefill together in one program
        (others keep their queue order for the next group)."""
        while self.queue:
            free = [s for s in range(self.n_slots)
                    if self.slot_req[s] is None]
            if not free:
                break
            Tb = self.queue[0].embeds.shape[1]
            take: List[_Request] = []
            rest: List[_Request] = []
            for r in self.queue:
                if r.embeds.shape[1] == Tb and len(take) < len(free):
                    take.append(r)
                else:
                    rest.append(r)
            self.queue = rest
            self._admit(take, free[:len(take)], Tb)

    def step(self) -> List[int]:
        """One engine tick.  Dispatches the decode program for the active
        slots FIRST (device busy immediately), then runs admission —
        prefill host prep and dispatch overlap the in-flight decode, so
        admissions never stall the active slots' tick (VERDICT r1 weak
        #5); admitted requests join the next tick.  Returns request ids
        finished during this tick."""
        expired = self._expire_deadlines()
        # quiet-tick counter for the arrival-aware speculation gate (see
        # __init__): a pending queue at dispatch (or any admission —
        # _admit resets it) marks the tick as non-quiet
        self._quiet_ticks = 0 if self.queue else self._quiet_ticks + 1
        if self.pipeline_ticks and self.queue:
            # VERDICT r4 #7: admit pending arrivals BEFORE dispatching the
            # lookahead tick so a new request's first decode rides THIS
            # tick instead of the next (admission always trailing the
            # dispatch cost TTFT p50 325 -> 518 ms under load).  The
            # blocking prefill fetch briefly stalls the pipeline, but
            # admissions are rare relative to ticks; the post-dispatch
            # _admit_queued below still catches requests submitted
            # concurrently during this tick.
            self._admit_queued()
        active = [s for s in range(self.n_slots)
                  if self.slot_req[s] is not None]
        # adaptive speculation: fall back to plain ticks while measured
        # acceptance is below break-even; re-probe periodically, and
        # while speculating occasionally run one plain calibration tick
        # to keep the spec-vs-plain cost ratio measured (see __init__)
        use_spec = bool(self.speculative_k)
        if use_spec and self.adaptive_spec \
                and self._quiet_ticks <= self.spec_quiet_ticks:
            # arrivals in flight: admission-bound ticks can't profit
            # from speculation (see __init__) — force plain, leave the
            # controller state (EMA / probe clocks) untouched
            use_spec = False
        elif use_spec and self.adaptive_spec:
            if not self._spec_live:
                self._ticks_since_probe += 1
                if active and self._ticks_since_probe \
                        >= self._spec_reprobe * self._reprobe_backoff:
                    self._spec_live = True
                    self._spec_probing = True
                    self._ticks_since_probe = 0
                else:
                    use_spec = False
            else:
                self._ticks_since_plain_probe += 1
                cadence = (self._spec_reprobe
                           if self._dur_ema["plain"] is None
                           else 4 * self._spec_reprobe)
                if active and self._ticks_since_plain_probe >= cadence:
                    self._ticks_since_plain_probe = 0
                    use_spec = False  # one plain calibration tick
        if (self.pipeline_ticks and self._inflight is not None and active
                and self._inflight[0] != ("spec" if use_spec
                                          else "plain")):
            # mode switch: drain the in-flight tick so host mirrors are
            # current before the next dispatch reads them
            expired += self.flush()
            active = [s for s in range(self.n_slots)
                      if self.slot_req[s] is not None]
        if use_spec and self._hist_dirty and active:
            # the resync rebuilds hist/cur mirrors from req.tokens —
            # deferred admission tokens must land first (a drained
            # first-token stop can also retire a slot)
            expired += self._drain_pending_admits()
            active = [s for s in range(self.n_slots)
                      if self.slot_req[s] is not None]
            if active:
                self._resync_spec_state(active)
            self._hist_dirty = False
        outs = ms = None
        K = self.steps_per_tick
        write_pos = self.slot_pos.copy()

        # SNAPSHOT every host-mutable numpy array handed to a dispatch.
        # jnp.asarray on the CPU backend can alias the numpy buffer
        # zero-copy, and with async dispatch the program may read it
        # AFTER this tick's optimistic advance / admission mutates it —
        # nondeterministic greedy trajectories under pipeline_ticks
        # (1-in-4 flake in tests/test_serving.py until r4).  .copy() on
        # these few-KB arrays is noise next to a tick.
        def snap(a):
            return jnp.asarray(a.copy())

        if active:
            if use_spec:
                self._n_spec_ticks += 1
            else:
                self._n_plain_ticks += 1
                if self.speculative_k:
                    # plain ticks skip n-gram history upkeep; the next
                    # spec tick must resync it from host state
                    self._hist_dirty = True
        if active and use_spec:
            # spec tick: K verify steps, each accepting 1..Kd tokens per
            # slot; history buffers ride on-device across ticks.  The
            # sampler runs at every verify position only when a sampled
            # slot is actually active (static arg -> at most two
            # compiled variants).
            nsp = (self.speculative_k
                   if any(self.slot_sample[s] for s in active) else 1)
            pipe = self.pipeline_ticks
            outs, ms, cur, self.cache, self.hist, self.hlen, ci_f, \
                pos_f = self._spec_jit(
                    self.model.params["llm"], self._inject_params,
                    self.cache,
                    self._cur_dev if pipe else snap(self.cur_tok),
                    self._pos_dev if pipe
                    else snap(self.slot_rope),
                    self._ci_dev if pipe else snap(write_pos),
                    snap(self.slot_mask),
                    self.inject_k, self.inject_v,
                    snap(self.inject_on),
                    snap(self.slot_decode_start), self.hist,
                    self.hlen, snap(self.slot_temp),
                    snap(self.slot_top_p),
                    snap(self.slot_sample), self._next_key(),
                    sample_positions=nsp)
            if pipe:
                self._cur_dev, self._ci_dev, self._pos_dev = \
                    cur, ci_f, pos_f
        elif active:
            # ``steps_per_tick`` decode steps for every slot in one
            # program (inactive slots compute on garbage and are ignored —
            # the batch shape stays fixed; the scan sets its own per-step
            # mask bits).  Pipelined mode chains on the device-resident
            # token vector instead of the host copy.
            toks_in = (self._cur_dev if self.pipeline_ticks
                       else snap(self.cur_tok))
            outs, self.cache = self._decode_jit(
                self.model.params["llm"], self._inject_params, self.cache,
                toks_in, snap(self.slot_rope),
                snap(write_pos), snap(self.slot_mask),
                self.inject_k, self.inject_v,
                snap(self.inject_on),
                snap(self.slot_temp), snap(self.slot_top_p),
                snap(self.slot_sample), self._next_key())

        if self.pipeline_ticks:
            new_inflight = None
            if outs is not None:
                slot_reqs = [(s, self.slot_req[s]) for s in active]
                if use_spec:
                    # spec advance is data-dependent: slot cursors stay
                    # lagged (consume-updated); device state chains
                    new_inflight = ("spec", outs, ms, slot_reqs,
                                    self._n_admissions)
                else:
                    # optimistic host advance (zombies corrected at
                    # consume: a retired slot's state is zeroed by
                    # _finish, and admissions overwrite the slot
                    # wholesale)
                    self._cur_dev = outs[K - 1]
                    for s in active:
                        self.slot_mask[s,
                                       write_pos[s]:write_pos[s] + K] = 1
                        self.slot_pos[s] = min(self.slot_pos[s] + K,
                                               self.t_max)
                        self.slot_rope[s] += K
                    new_inflight = ("plain", outs, slot_reqs, write_pos,
                                    self._n_admissions)
            # pendings admitted before this dispatch drain NOW (their
            # prefill preceded the just-dispatched tick on device, so
            # the fetch overlaps device time already paid for);
            # post-dispatch admissions below queue behind the new tick
            # and drain at the NEXT consume
            pending = self._pending_admits
            self._pending_admits = []
            self._admit_queued()
            finished = []
            for p_slots, p_reqs, p_tok in pending:
                finished += self._apply_admit_tokens(p_slots, p_reqs,
                                                     np.asarray(p_tok))
            if self._inflight is not None:
                kind, *payload = self._inflight
                n_adm0 = payload.pop()
                t0 = time.monotonic()
                if kind == "spec":
                    e, m_, sr = payload
                    finished = self._consume_spec_tick(
                        sr, np.asarray(e), np.asarray(m_),
                        self.slot_pos.copy())
                else:
                    finished = self._consume_tick(*payload)
                self._record_tick_dur(kind, time.monotonic() - t0,
                                      clean=self._n_admissions == n_adm0)
            self._inflight = new_inflight
            return expired + finished

        n_adm0 = self._n_admissions
        self._admit_queued()
        if outs is None:
            return expired
        t0 = time.monotonic()
        if use_spec:
            fin = self._consume_spec_tick(
                [(s, self.slot_req[s]) for s in active],
                np.asarray(outs), np.asarray(ms), write_pos)
        else:
            fin = self._consume_tick(
                outs, [(s, self.slot_req[s]) for s in active], write_pos,
                advance=True)
        self._record_tick_dur("spec" if use_spec else "plain",
                              time.monotonic() - t0,
                              clean=self._n_admissions == n_adm0)
        return expired + fin

    def _check_stop(self, req: _Request, tok: int) -> Optional[str]:
        """Per-token finish check (host side; tokens arrive in tick
        bursts).  Order: eos > user stop token > user stop string >
        length budget.  Stop matches trim the result text at the match
        (OpenAI semantics — the stop sequence is excluded); tokens
        already streamed via on_token may include part of it."""
        if tok in self._eos:
            return "eos"
        if tok in req.stop_token_ids:
            req.final_text = self.model.tokenizer.decode(
                req.tokens[:-1], skip_special_tokens=True)
            return "stop"
        if req.stop_strs:
            # decode a tail window; BPE tokens are >=1 char so a window
            # of len(stop) tokens always covers a just-completed match
            w = 4 + max(len(s_) for s_ in req.stop_strs)
            tail = self.model.tokenizer.decode(
                req.tokens[-w:], skip_special_tokens=True)
            for s_ in req.stop_strs:
                if s_ in tail:
                    full = self.model.tokenizer.decode(
                        req.tokens, skip_special_tokens=True)
                    j = full.rfind(s_)
                    req.final_text = full[:j] if j >= 0 else full
                    return "stop"
        if len(req.tokens) >= req.max_new_tokens:
            return "length"
        return None

    def _consume_tick(self, outs, slot_reqs, write_pos,
                      advance: bool = False) -> List[int]:
        """Host bookkeeping for a plain tick.  ``advance=True``
        (sequential mode) also moves the slot cursors; pipelined mode
        pre-advanced them at dispatch and here only retires finished
        requests and discards zombie-tick tokens."""
        K = self.steps_per_tick
        outs = np.asarray(outs)  # [K, n_slots] (sync point)
        finished = []
        for s, req in slot_reqs:
            if req.done or self.slot_req[s] is not req:
                continue  # zombie tick of an already-retired request
            fin = None
            # only writes that landed inside the cache count
            steps_ok = min(K, self.t_max - int(write_pos[s]))
            for j in range(steps_ok):
                tok = int(outs[j, s])
                req.tokens.append(tok)
                if self.on_token is not None:
                    self.on_token(req.rid, tok)
                fin = self._check_stop(req, tok)
                if fin:
                    break
            if fin is None and steps_ok < K:
                # the cache filled mid-tick: surfaced, not silent
                fin = "cache_full"
            if fin:
                finished.append(req.rid)
                self._finish(s, fin)
            elif advance:
                self.slot_mask[s, write_pos[s]:write_pos[s] + K] = 1
                self.slot_pos[s] += K
                self.slot_rope[s] += K
                self.cur_tok[s] = int(outs[K - 1, s])
        return finished

    def _consume_spec_tick(self, slot_reqs, outs, ms, write_pos):
        """Host bookkeeping for a spec tick.  outs: [K, n_slots, Kd]
        candidate tokens per step; ms: [K, n_slots] accepted counts.
        ``write_pos`` is each slot's pre-tick cursor (captured at
        dispatch in sequential mode; in pipelined mode the lagged
        ``slot_pos`` mirror at consume time is exactly that)."""
        K = self.steps_per_tick
        finished = []
        tot_acc = tot_steps = 0
        for s, req in slot_reqs:
            if req.done or self.slot_req[s] is not req:
                continue  # zombie tick of an already-retired request
            fin = None
            advanced = 0
            for j in range(K):
                m = int(ms[j, s])
                for t in outs[j, s, :m]:
                    tok = int(t)
                    req.tokens.append(tok)
                    if self.on_token is not None:
                        self.on_token(req.rid, tok)
                    fin = self._check_stop(req, tok)
                    if fin:
                        break
                advanced += m
                tot_acc += m
                tot_steps += 1
                if fin:
                    break
            if fin is None and int(write_pos[s]) + advanced \
                    > self.t_max - self.speculative_k:
                fin = "cache_full"
            if fin:
                finished.append(req.rid)
                self._finish(s, fin)
            else:
                # keep the host mask mirror current: the spec program
                # derives decode-region mask bits from the cache index,
                # but a later PLAIN tick (adaptive fallback) reads this
                # mirror and must see the spec-written rows
                wp = int(write_pos[s])
                self.slot_mask[s, wp:wp + advanced] = 1
                self.slot_pos[s] += advanced
                self.slot_rope[s] += advanced
                if advanced:
                    self.cur_tok[s] = req.tokens[-1]
        if self.adaptive_spec and tot_steps:
            self._spec_controller_update(tot_acc / tot_steps)
        return finished

    def _spec_controller_update(self, rate: float):
        """Adaptive-speculation decision on one spec tick's measured
        acceptance (tokens/step).  Bars are cost-aware once both tick
        durations are measured — speculation pays iff acceptance >
        T_spec/T_plain (±hysteresis) — and fall back to the static
        thresholds until then."""
        ds, dp = self._dur_ema["spec"], self._dur_ema["plain"]
        be = max(1.0, ds / dp) if (ds and dp) else None
        off_bar = be * 0.98 if be is not None else self._spec_off
        on_bar = be * 1.10 if be is not None else self._spec_on
        if self._spec_probing:
            # probe verdict: stay speculative only on clear wins; a
            # refused probe backs off exponentially (see __init__)
            self._spec_probing = False
            self._spec_live = rate >= on_bar
            self._spec_ema = max(rate, on_bar)
            self._reprobe_backoff = (1 if self._spec_live else
                                     min(self._reprobe_backoff * 2, 16))
        else:
            self._spec_ema = 0.7 * self._spec_ema + 0.3 * rate
            if self._spec_live and self._spec_ema < off_bar:
                self._spec_live = False
                self._ticks_since_probe = 0
                self._spec_ema = on_bar
                self._reprobe_backoff = 1

    def _record_tick_dur(self, kind: str, dt: float, clean: bool):
        """EMA of the consume fetch-block time per tick kind — the
        leftover device time of the consumed tick, the signal behind the
        adaptive-speculation break-even.  Admission-contaminated ticks
        are skipped (the admission prefill's own device sync absorbed
        the wait) and so are sub-2ms samples (host-bound floor where the
        spec/plain ratio is meaningless noise)."""
        if not (self.adaptive_spec and clean) or dt < 2e-3:
            return
        cur = self._dur_ema[kind]
        self._dur_ema[kind] = dt if cur is None else 0.7 * cur + 0.3 * dt

    def _resync_spec_state(self, active: List[int]):
        """Rebuild the device-resident n-gram history (and, in pipelined
        mode, the chained slot mirrors) from host state before a
        speculative probe tick — plain ticks do not maintain them.
        Drafting quality is all that rides on the history; acceptance is
        verified exactly either way."""
        hcap = self.hist.shape[1]
        rows = np.zeros((len(active), hcap), np.int32)
        lens = np.zeros(len(active), np.int32)
        for i, s in enumerate(active):
            req = self.slot_req[s]
            ids = (np.asarray(req.prompt_ids, np.int32)
                   if req.prompt_ids is not None
                   else np.zeros(0, np.int32))
            seq = np.concatenate([ids,
                                  np.asarray(req.tokens, np.int32)])
            if len(seq) > hcap:
                seq = seq[-hcap:]
            rows[i, :len(seq)] = seq
            lens[i] = len(seq)
            # req.tokens is the authoritative last token: pipelined
            # plain ticks chain the token on-device and never refresh
            # the host cur_tok mirror
            self.cur_tok[s] = req.tokens[-1]
        sl = jnp.asarray(active)
        self.hist = self.hist.at[sl].set(jnp.asarray(rows))
        self.hlen = self.hlen.at[sl].set(jnp.asarray(lens))
        if self.pipeline_ticks:
            # host mirrors are authoritative after the drain above
            self._cur_dev = jnp.asarray(self.cur_tok.copy())
            self._ci_dev = jnp.asarray(self.slot_pos.copy())
            self._pos_dev = jnp.asarray(self.slot_rope.copy())

    def _finish(self, slot: int, reason: str = "eos"):
        req = self.slot_req[slot]
        req.done = True
        req.finish_reason = reason
        if reason == "cache_full":
            req.truncated = True
        self.finished[req.rid] = req.tokens
        self.finished_info[req.rid] = {
            "tokens": req.tokens,
            "finish_reason": reason,
            "truncated": req.truncated,
            "prompt_tokens": req.ctx_len,
        }
        if req.final_text is not None:
            self.finished_info[req.rid]["text"] = req.final_text
        self.slot_req[slot] = None
        self.slot_mask[slot] = 0
        self.slot_pos[slot] = 0
        self.slot_rope[slot] = 0
        self.inject_on[slot] = 0.0

    def run_until_done(self, max_ticks: int = 100000) -> Dict[int, str]:
        tk = self.model.tokenizer
        for _ in range(max_ticks):
            if not self.queue and all(r is None for r in self.slot_req):
                break
            self.step()
        return {rid: tk.decode(toks, skip_special_tokens=True)
                for rid, toks in self.finished.items()}

    def results(self) -> Dict[int, Dict[str, Any]]:
        """Detailed per-request results: {rid: {"text", "tokens",
        "finish_reason" ("eos" | "stop" | "length" | "cache_full" |
        "cancelled" | "deadline"), "truncated", "prompt_tokens"}}.
        ``truncated`` is True when the context was clipped at admission
        (on_overflow="truncate") or the KV cache filled before the
        request hit eos/budget — truncation is always surfaced, never
        silent.  A request finished by a user stop sequence / stop token
        carries text trimmed at the match (the stop itself excluded).
        Flushes the in-flight pipelined tick first, so every dispatched
        tick's outcome is visible."""
        self.flush()
        tk = self.model.tokenizer
        return {
            rid: {**info,
                  "text": info.get("text") if "text" in info
                  else tk.decode(info["tokens"],
                                 skip_special_tokens=True)}
            for rid, info in self.finished_info.items()
        }
