"""Fused single-kernel decode parity vs the XLA scan path.

Runs the pallas kernel through the TPU interpreter on CPU
(DESTA_FUSED_INTERPRET=1) against ``llm_apply`` with the fused path
disabled (DESTA_FUSED_DECODE=0).  Shapes are nano but satisfy the
kernel's tiling constraints (Dh=128, D % 256 == 0, S % 128 == 0).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import LLMConfig
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.core import tree_cast
from desta25_audio_tpu.ops.quant import quantize_llm_params


def _nano_cfg(qk_norm=False):
    return LLMConfig(
        model_id="test/fused-nano", vocab_size=512, hidden_size=512,
        intermediate_size=768, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, rope_scaling=None, tie_word_embeddings=False,
        qk_norm=qk_norm, bos_token_id=0, eos_token_id=1)


def _setup(qk_norm, B, S, seed=0):
    cfg = _nano_cfg(qk_norm)
    params = jllm.init_llm(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    qparams = quantize_llm_params(tree_cast(params, jnp.bfloat16))
    cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    return cfg, qparams, cache


def _prefill(cfg, qparams, cache, B, T_ctx, S, rng):
    """XLA prefill (shared by both paths)."""
    ids = jnp.asarray(
        rng.integers(2, cfg.vocab_size - 2, size=(B, T_ctx)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T_ctx].set(1)
    logits, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids, attention_mask=mask,
        cache=cache, cache_index=0)
    return logits, cache, mask


def _one_step(cfg, qparams, cache, tok, mask, positions, cache_index):
    return jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask,
        positions=positions, cache=cache, cache_index=cache_index)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_fused_single_step_matches_xla(qk_norm, rng, monkeypatch):
    B, T_ctx, S = 2, 8, 128
    cfg, qparams, cache = _setup(qk_norm, B, S)
    _, cache, mask = _prefill(cfg, qparams, cache, B, T_ctx, S, rng)
    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    mask = mask.at[:, T_ctx].set(1)
    pos = jnp.full((B, 1), T_ctx, jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = _one_step(cfg, qparams, cache, tok, mask,
                                         pos, T_ctx)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.ops.fused_decode import fused_supported
    assert fused_supported(qparams, cfg, cache)
    got_logits, got_cache, _ = _one_step(cfg, qparams, cache, tok, mask,
                                         pos, T_ctx)

    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - got)) / scale < 3e-2
    # cache updated identically (same positions, bf16 values)
    rk = np.asarray(ref_cache.k, np.float32)
    gk = np.asarray(got_cache.k, np.float32)
    assert np.max(np.abs(rk - gk)) < 0.05
    rv = np.asarray(ref_cache.v, np.float32)
    gv = np.asarray(got_cache.v, np.float32)
    assert np.max(np.abs(rv - gv)) < 0.05
    # the write landed at the right position and nowhere else
    changed = np.abs(gk - np.asarray(cache.k, np.float32)).sum(axis=(0, 3))
    assert (changed[:, T_ctx] > 0).all()
    assert (changed[:, T_ctx + 1:] == 0).all()


def test_fused_per_row_cache_index(rng, monkeypatch):
    """Continuous-batching shape: every row decodes at its own position
    with left-padded context."""
    B, S = 3, 128
    cfg, qparams, cache = _setup(False, B, S, seed=1)
    ctx = np.array([5, 9, 3], np.int32)
    mask_np = np.zeros((B, S), np.int32)
    for b in range(B):
        mask_np[b, :ctx[b]] = 1
    mask = jnp.asarray(mask_np)
    ids = jnp.asarray(rng.integers(2, 500, size=(B, 16)), jnp.int32)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids[:, :16],
        attention_mask=jnp.zeros((B, S), jnp.int32).at[:, :16].set(1),
        cache=cache, cache_index=0)
    # overwrite masks so each row only sees its own prefix
    ci = jnp.asarray(ctx)
    step_mask = mask_np.copy()
    for b in range(B):
        step_mask[b, ctx[b]] = 1
    step_mask = jnp.asarray(step_mask)
    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    pos = jnp.asarray(ctx)[:, None]

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = _one_step(cfg, qparams, cache, tok,
                                         step_mask, pos, ci)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    got_logits, got_cache, _ = _one_step(cfg, qparams, cache, tok,
                                         step_mask, pos, ci)
    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2
    for b in range(B):
        rk = np.asarray(ref_cache.k[:, b, ctx[b]], np.float32)
        gk = np.asarray(got_cache.k[:, b, ctx[b]], np.float32)
        assert np.max(np.abs(rk - gk)) < 0.05


def test_fused_teacher_forced_trajectory(rng, monkeypatch):
    """Multi-step: feed the XLA path's greedy tokens to both paths; logits
    must stay close step over step (cache round-trips through the fused
    writes)."""
    B, T_ctx, S, STEPS = 2, 6, 128, 4
    cfg, qparams, cache0 = _setup(True, B, S, seed=2)
    logits0, cache0, mask0 = _prefill(cfg, qparams, cache0, B, T_ctx, S, rng)
    tok = jnp.argmax(logits0[:, -1], -1).astype(jnp.int32)[:, None]

    def run(env, cache, mask, forced=None):
        toks = tok
        outs, chosen = [], []
        for t in range(STEPS):
            monkeypatch.setenv("DESTA_FUSED_DECODE",
                               "1" if env else "0")
            monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
            mask = mask.at[:, T_ctx + t].set(1)
            lg, cache, _ = _one_step(
                cfg, qparams, cache, toks, mask,
                jnp.full((B, 1), T_ctx + t, jnp.int32), T_ctx + t)
            outs.append(np.asarray(lg[:, 0], np.float32))
            if forced is None:
                toks = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
                chosen.append(toks)
            else:
                toks = forced[t]
        return outs, chosen

    ref, ref_toks = run(False, cache0, mask0)
    got, _ = run(True, cache0, mask0, forced=ref_toks)
    for t, (r, g) in enumerate(zip(ref, got)):
        assert np.max(np.abs(r - g)) / (np.abs(r).max() + 1e-6) < 5e-2, t


@pytest.mark.parametrize("qk_norm", [False, True])
def test_fused_verify_matches_xla_multitoken(qk_norm, rng, monkeypatch):
    """Spec-verify (Kd tokens per row, one weight stream) vs the XLA path
    run with the same Kd tokens as a T=Kd cached call: logits AND cache
    writes must agree at every draft position."""
    B, T_ctx, S, Kd = 2, 8, 128, 4
    cfg, qparams, cache = _setup(qk_norm, B, S, seed=3)
    _, cache, mask = _prefill(cfg, qparams, cache, B, T_ctx, S, rng)
    toks = jnp.asarray(rng.integers(2, 500, size=(B, Kd)), jnp.int32)
    mask = mask.at[:, T_ctx:T_ctx + Kd].set(1)
    pos = T_ctx + jnp.arange(Kd)[None, :] + jnp.zeros((B, 1), jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = _one_step(cfg, qparams, cache, toks, mask,
                                         pos, T_ctx)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.models.llm import _head_logits, rms_norm
    from desta25_audio_tpu.ops.fused_decode import (
        fused_supported,
        fused_verify_layers,
    )
    assert fused_supported(qparams, cfg, cache, kd=Kd)
    embeds = qparams["embed"][toks]
    hidden, got_cache = fused_verify_layers(
        qparams, cfg, embeds, mask, pos, cache, T_ctx)
    hidden = rms_norm(qparams["norm"], hidden, cfg.rms_norm_eps)
    got_logits = _head_logits(qparams, cfg, hidden)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - got)) / scale < 3e-2
    # all Kd cache rows written identically, nothing else disturbed
    rk = np.asarray(ref_cache.k, np.float32)
    gk = np.asarray(got_cache.k, np.float32)
    assert np.max(np.abs(rk - gk)) < 0.05
    rv = np.asarray(ref_cache.v, np.float32)
    gv = np.asarray(got_cache.v, np.float32)
    assert np.max(np.abs(rv - gv)) < 0.05
    changed = np.abs(gk - np.asarray(cache.k, np.float32)).sum(axis=(0, 3))
    assert (changed[:, T_ctx:T_ctx + Kd] > 0).all()
    assert (changed[:, T_ctx + Kd:] == 0).all()


def test_fused_verify_per_row_positions(rng, monkeypatch):
    """Verify step with per-row cache positions (serving shape)."""
    B, S, Kd = 3, 128, 3
    cfg, qparams, cache = _setup(False, B, S, seed=4)
    ctx = np.array([5, 9, 16], np.int32)
    ids = jnp.asarray(rng.integers(2, 500, size=(B, 16)), jnp.int32)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids,
        attention_mask=jnp.zeros((B, S), jnp.int32).at[:, :16].set(1),
        cache=cache, cache_index=0)
    ci = jnp.asarray(ctx)
    mask_np = np.zeros((B, S), np.int32)
    for b in range(B):
        mask_np[b, :ctx[b] + Kd] = 1
    mask = jnp.asarray(mask_np)
    toks = jnp.asarray(rng.integers(2, 500, size=(B, Kd)), jnp.int32)
    pos = ci[:, None] + jnp.arange(Kd)[None, :]

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = _one_step(cfg, qparams, cache, toks, mask,
                                         pos, ci)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.models.llm import _head_logits, rms_norm
    from desta25_audio_tpu.ops.fused_decode import fused_verify_layers
    embeds = qparams["embed"][toks]
    hidden, got_cache = fused_verify_layers(
        qparams, cfg, embeds, mask, pos, cache, ci)
    hidden = rms_norm(qparams["norm"], hidden, cfg.rms_norm_eps)
    got_logits = _head_logits(qparams, cfg, hidden)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2
    for b in range(B):
        for j in range(Kd):
            rk = np.asarray(ref_cache.k[:, b, ctx[b] + j], np.float32)
            gk = np.asarray(got_cache.k[:, b, ctx[b] + j], np.float32)
            assert np.max(np.abs(rk - gk)) < 0.05


def test_fused_bf16_tower_matches_xla(rng, monkeypatch):
    """Unquantized (bf16) towers stream through the same fused kernel
    (2x the bytes, no scales) — parity vs the XLA scan path."""
    B, T_ctx, S = 2, 8, 128
    cfg = _nano_cfg(False)
    params = jllm.init_llm(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    bp = tree_cast(params, jnp.bfloat16)
    cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    _, cache, mask = _prefill(cfg, bp, cache, B, T_ctx, S, rng)
    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    mask = mask.at[:, T_ctx].set(1)
    pos = jnp.full((B, 1), T_ctx, jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = _one_step(cfg, bp, cache, tok, mask,
                                         pos, T_ctx)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.ops.fused_decode import fused_supported
    assert fused_supported(bp, cfg, cache)
    got_logits, got_cache, _ = _one_step(cfg, bp, cache, tok, mask,
                                         pos, T_ctx)

    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2
    gk = np.asarray(got_cache.k, np.float32)
    rk = np.asarray(ref_cache.k, np.float32)
    assert np.max(np.abs(rk - gk)) < 0.05
    # f32 towers stay on the XLA path
    assert not fused_supported(tree_cast(params, jnp.float32), cfg, cache)
