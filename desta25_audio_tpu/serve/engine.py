"""Continuous-batching serving engine.

Beyond the reference (which has no serving layer — SURVEY §1): a slot-based
decode engine for production inference.  A shared KV cache holds
``n_slots`` independent request contexts; each engine tick runs ONE decode
step for every active slot in a single jitted program with per-slot cache
positions, so requests join and leave the batch without stalling others
(continuous batching).  Prefills run per request into a scratch cache and
are scattered into the slot.

Request flow:
  submit(messages)  -> host phases A/B (audio decode, VAD/ASR, templating,
                       splice maps) + device perception/splice -> queued
  step()            -> admit queued requests into free slots (prefill),
                       then one decode step for all active slots
  run_until_done()  -> drain everything, returning {request_id: text}

Shapes are bucketed (context padded to multiples of ``ctx_bucket``) so the
engine compiles a handful of programs total.

Current limitations: greedy sampling only; ORCA deep injection is not
wired into the engine's decode step (use ``model.generate`` for ORCA
checkpoints); text-only requests must carry at least one audio.
"""

from __future__ import annotations

import itertools
import logging
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llm as jllm
from ..models.desta import DeSTA25AudioModel

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    rid: int
    embeds: Any          # [1, Tc, D] device
    ctx_len: int         # valid context length (right-aligned)
    max_new_tokens: int
    tokens: List[int] = field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False


class ContinuousBatchingEngine:
    def __init__(self, model: DeSTA25AudioModel, n_slots: int = 8,
                 max_ctx: int = 256, max_new_tokens: int = 128,
                 ctx_bucket: int = 64):
        self.model = model
        self.cfg = model.llm_cfg
        self.n_slots = n_slots
        self.max_ctx = max_ctx
        self.max_new = max_new_tokens
        self.ctx_bucket = ctx_bucket
        self.t_max = max_ctx + max_new_tokens

        self.cache = jllm.init_kv_cache(self.cfg, n_slots, self.t_max,
                                        dtype=model.dtype)
        # host-side slot state
        self.slot_req: List[Optional[_Request]] = [None] * n_slots
        self.slot_pos = np.zeros(n_slots, np.int32)      # next cache index
        self.slot_rope = np.zeros(n_slots, np.int32)     # next rope position
        self.slot_mask = np.zeros((n_slots, self.t_max), np.int32)
        self.cur_tok = np.zeros(n_slots, np.int32)
        self.queue: List[_Request] = []
        self.finished: Dict[int, List[int]] = {}
        self._ids = itertools.count()
        self._eos = set(model._terminators())
        self._decode_jit = jax.jit(self._decode_step)
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=("t_bucket",))

    # -- jitted programs ---------------------------------------------------

    def _prefill(self, params, embeds, mask, t_bucket):
        """Single-request prefill into a fresh batch-1 cache of t_max."""
        cache = jllm.init_kv_cache(self.cfg, 1, self.t_max,
                                   dtype=self.model.dtype)
        full_mask = jnp.zeros((1, self.t_max), jnp.int32
                              ).at[:, :t_bucket].set(mask)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, cache, _ = jllm.llm_apply(
            params, self.cfg, inputs_embeds=embeds,
            attention_mask=full_mask, positions=positions,
            cache=cache, cache_index=0,
            lora=params.get("lora"))
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return tok[0], cache.k[:, 0], cache.v[:, 0], positions[0, -1]

    def _decode_step(self, params, cache, toks, rope_pos, write_pos, mask):
        logits, cache, _ = jllm.llm_apply(
            params, self.cfg, input_ids=toks[:, None],
            attention_mask=mask, positions=rope_pos[:, None],
            cache=cache, cache_index=write_pos,
            lora=params.get("lora"))
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return nxt, cache

    # -- host API -----------------------------------------------------------

    def submit(self, messages, max_new_tokens: Optional[int] = None) -> int:
        """Prepare a request (host phases + perception) and queue it."""
        prep = self._prepare(messages)
        rid = next(self._ids)
        self.queue.append(_Request(
            rid=rid, embeds=prep[0], ctx_len=prep[1],
            max_new_tokens=min(max_new_tokens or self.max_new,
                               self.max_new)))
        return rid

    def _prepare(self, messages) -> Tuple[Any, int]:
        """Run the model's host pipeline for ONE conversation, returning
        bucket-padded context embeddings."""
        out = self.model._prepare_generation_inputs([messages])
        embeds, attn_mask = out
        T = embeds.shape[1]
        ctx_len = int(np.asarray(attn_mask).sum())
        Tb = min(-(-T // self.ctx_bucket) * self.ctx_bucket, self.max_ctx)
        if T < Tb:  # left-pad to the bucket
            pad = Tb - T
            embeds = jnp.pad(embeds, ((0, 0), (pad, 0), (0, 0)))
        elif T > Tb:
            embeds = embeds[:, -Tb:]
            ctx_len = min(ctx_len, Tb)
        return embeds, ctx_len

    def step(self) -> List[int]:
        """Admit queued requests, run one decode step.  Returns request ids
        finished during this tick."""
        # 1. admit into free slots (prefill)
        for s in range(self.n_slots):
            if self.slot_req[s] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            Tb = req.embeds.shape[1]
            mask = np.zeros((1, Tb), np.int32)
            mask[0, Tb - req.ctx_len:] = 1
            tok, k_slot, v_slot, last_pos = self._prefill_jit(
                self.model.params["llm"], req.embeds, jnp.asarray(mask),
                t_bucket=Tb)
            self.cache = jllm.KVCache(
                self.cache.k.at[:, s].set(k_slot),
                self.cache.v.at[:, s].set(v_slot))
            req.slot = s
            self.slot_req[s] = req
            self.slot_mask[s] = 0
            self.slot_mask[s, :Tb] = mask[0]
            self.slot_pos[s] = Tb
            self.slot_rope[s] = int(last_pos) + 1
            tok = int(tok)
            req.tokens.append(tok)
            self.cur_tok[s] = tok
            if tok in self._eos or len(req.tokens) >= req.max_new_tokens:
                self._finish(s)

        active = [s for s in range(self.n_slots)
                  if self.slot_req[s] is not None]
        if not active:
            return []

        # 2. one decode step for every slot (inactive slots compute on
        # garbage and are ignored — the batch shape stays fixed)
        write_pos = self.slot_pos.copy()
        mask = self.slot_mask.copy()
        for s in active:
            mask[s, write_pos[s]] = 1
        nxt, self.cache = self._decode_jit(
            self.model.params["llm"], self.cache,
            jnp.asarray(self.cur_tok), jnp.asarray(self.slot_rope),
            jnp.asarray(write_pos), jnp.asarray(mask))
        nxt = np.asarray(nxt)

        finished = []
        for s in active:
            self.slot_mask[s] = mask[s]
            self.slot_pos[s] += 1
            self.slot_rope[s] += 1
            req = self.slot_req[s]
            tok = int(nxt[s])
            req.tokens.append(tok)
            self.cur_tok[s] = tok
            if (tok in self._eos
                    or len(req.tokens) >= req.max_new_tokens
                    or self.slot_pos[s] >= self.t_max - 1):
                finished.append(req.rid)
                self._finish(s)
        return finished

    def _finish(self, slot: int):
        req = self.slot_req[slot]
        req.done = True
        self.finished[req.rid] = req.tokens
        self.slot_req[slot] = None
        self.slot_mask[slot] = 0
        self.slot_pos[slot] = 0
        self.slot_rope[slot] = 0

    def run_until_done(self, max_ticks: int = 100000) -> Dict[int, str]:
        tk = self.model.tokenizer
        for _ in range(max_ticks):
            if not self.queue and all(r is None for r in self.slot_req):
                break
            self.step()
        return {rid: tk.decode(toks, skip_special_tokens=True)
                for rid, toks in self.finished.items()}
