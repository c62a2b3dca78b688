"""Greedy decode parity: our jit while-loop llm_generate vs HF
``model.generate`` on a tiny random Llama (validates the full prefill +
KV-cache decode loop + stop handling end-to-end)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.ckpt.hf_convert import convert_llm_state
from desta25_audio_tpu.generate.decode import llm_generate, sample_token
from desta25_audio_tpu.models import llm as jllm

torch = pytest.importorskip("torch")

jax.config.update("jax_default_matmul_precision", "highest")


def test_greedy_matches_hf_generate(rng):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = llm_config_for("test/llama-nano")
    hf = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, max_position_embeddings=2048,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf).eval()
    params = convert_llm_state(model.state_dict(), cfg, dtype=jnp.float32)

    ids = rng.integers(5, cfg.vocab_size - 5, size=(2, 10)).astype(np.int64)
    MAX_NEW = 12
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=MAX_NEW, do_sample=False,
            pad_token_id=0, eos_token_id=None)
    ref = hf_out[:, 10:].numpy()

    embeds = jllm.embed_tokens(params, jnp.asarray(ids.astype(np.int32)))
    tokens, n_gen = llm_generate(
        params, cfg, embeds, jnp.ones((2, 10), jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=MAX_NEW, do_sample=False,
        eos_ids=(), pad_id=0)
    got = np.asarray(tokens)
    np.testing.assert_array_equal(got, ref)

    # and with left padding: pad row 1's context, same continuation
    pad_ids = np.concatenate([np.zeros((2, 3), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((2, 3), np.int32),
                           np.ones((2, 10), np.int32)], axis=1)
    embeds_p = jllm.embed_tokens(params,
                                 jnp.asarray(pad_ids.astype(np.int32)))
    tokens_p, _ = llm_generate(
        params, cfg, embeds_p, jnp.asarray(mask), jax.random.PRNGKey(0),
        max_new_tokens=MAX_NEW, do_sample=False, eos_ids=(), pad_id=0)
    np.testing.assert_array_equal(np.asarray(tokens_p), ref)


def test_eos_stops_generation(rng):
    """Force the first sampled token to be eos -> generation halts and pads."""
    cfg = llm_config_for("test/llama-nano")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = rng.integers(5, 500, size=(1, 4)).astype(np.int32)
    embeds = jllm.embed_tokens(params, jnp.asarray(ids))
    # run unconstrained to find the greedy first token, then declare it eos
    tokens, _ = llm_generate(params, cfg, embeds, jnp.ones((1, 4), jnp.int32),
                             jax.random.PRNGKey(0), max_new_tokens=6,
                             do_sample=False, eos_ids=(), pad_id=0)
    first = int(np.asarray(tokens)[0, 0])
    tokens2, n_gen = llm_generate(
        params, cfg, embeds, jnp.ones((1, 4), jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=6, do_sample=False,
        eos_ids=(first,), pad_id=0)
    t2 = np.asarray(tokens2)[0]
    assert t2[0] == first
    assert (t2[1:] == 0).all()


def test_top_p_sampling_distribution():
    """top_p=0 keeps only the argmax; top_p=1 samples the full dist."""
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    for i in range(5):
        t = sample_token(logits, jax.random.PRNGKey(i), temperature=1.0,
                         top_p=0.01, do_sample=True)
        assert int(t[0]) == 3
    seen = {int(sample_token(logits, jax.random.PRNGKey(i), 2.0, 1.0, True)[0])
            for i in range(64)}
    assert len(seen) >= 3  # high temp + full nucleus explores
