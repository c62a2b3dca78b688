"""Weight-only int8 quantization tests (XLA fallback path on CPU; the
Pallas kernel itself is exercised on TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    quant_matmul,
    quantize_llm_params,
    quantize_weight,
)


def test_quantize_roundtrip_error(rng):
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
    leaf = quantize_weight(jnp.asarray(w))
    assert leaf["q"].dtype == jnp.int8
    deq = np.asarray(dequantize_weight(leaf, jnp.float32))
    # max per-channel error bounded by scale/2
    scales = np.asarray(leaf["s"])
    assert (np.abs(deq - w) <= scales[None, :] * 0.5 + 1e-7).all()


def test_quant_matmul_matches_dequant(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
    leaf = quantize_weight(jnp.asarray(w))
    got = np.asarray(quant_matmul(jnp.asarray(x), leaf))
    ref = x @ np.asarray(dequantize_weight(leaf, jnp.float32))
    assert np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9) < 2e-2


def test_quantized_llm_logits_close(rng):
    cfg = llm_config_for("test/llama-nano")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_llm_params(params)
    assert is_quantized(qparams["layers"]["wq"])
    assert is_quantized(qparams["lm_head"])

    ids = rng.integers(5, cfg.vocab_size - 5, size=(2, 10)).astype(np.int32)
    ref, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    got, _, _ = jllm.llm_apply(qparams, cfg, input_ids=jnp.asarray(ids))
    ref = np.asarray(ref)
    got = np.asarray(got)
    # logits drift bounded; top-1 agreement high
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_quantized_tied_model_gets_lm_head():
    cfg = llm_config_for("test/qwen3-nano")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    assert "lm_head" not in params  # tied
    qparams = quantize_llm_params(params)
    assert is_quantized(qparams["lm_head"])
    # logits path must use the quantized head and still run
    ids = jnp.ones((1, 4), jnp.int32)
    logits, _, _ = jllm.llm_apply(qparams, cfg, input_ids=ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_quantized_decode_runs(rng):
    from desta25_audio_tpu.generate.decode import llm_generate
    cfg = llm_config_for("test/llama-nano")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_llm_params(params)
    ids = rng.integers(5, 500, size=(1, 6)).astype(np.int32)
    embeds = jllm.embed_tokens(qparams, jnp.asarray(ids))
    tokens, _ = llm_generate(qparams, cfg, embeds,
                             jnp.ones((1, 6), jnp.int32),
                             jax.random.PRNGKey(0), max_new_tokens=4,
                             do_sample=False, eos_ids=(), pad_id=0)
    assert np.asarray(tokens).shape == (1, 4)
