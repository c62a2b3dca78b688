"""LLM decoder parity vs randomly-initialized HF Llama / Qwen3 (hub-free),
plus KV-cache decode consistency and left-padding semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.ckpt.hf_convert import convert_llm_state
from desta25_audio_tpu.models import llm as jllm

torch = pytest.importorskip("torch")

jax.config.update("jax_default_matmul_precision", "highest")


def _build_llama():
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
        attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = __import__("transformers").LlamaForCausalLM(hf).eval()
    params = convert_llm_state(model.state_dict(), cfg, dtype=jnp.float32)
    return model, cfg, params


def _build_qwen3():
    from transformers import Qwen3Config, Qwen3ForCausalLM
    cfg = llm_config_for("test/qwen3-nano")
    hf = Qwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, max_position_embeddings=2048,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf).eval()
    params = convert_llm_state(model.state_dict(), cfg, dtype=jnp.float32)
    return model, cfg, params


@pytest.mark.parametrize("builder", [_build_llama, _build_qwen3],
                         ids=["llama", "qwen3"])
def test_logits_parity(builder, rng):
    model, cfg, params = builder()
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    got = np.asarray(got)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 5e-4


def test_llama3_rope_scaling_parity(rng):
    """Llama-3.1 NTK rope scaling must match HF exactly."""
    from transformers import LlamaConfig, LlamaForCausalLM
    from desta25_audio_tpu.config import LLMConfig, RopeScalingConfig
    cfg = LLMConfig(
        model_id="test/llama-scaled", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=16, rope_theta=500000.0,
        rope_scaling=RopeScalingConfig(), max_position_embeddings=131072,
        bos_token_id=0, eos_token_id=1)
    hf = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, rope_theta=500000.0, rms_norm_eps=cfg.rms_norm_eps,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        max_position_embeddings=131072, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf).eval()
    params = convert_llm_state(model.state_dict(), cfg, dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 12)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    assert np.max(np.abs(np.asarray(got) - ref)) < 5e-4


def test_left_padding_matches_unpadded(rng):
    """Left-padded batch must produce the same suffix logits as unpadded
    (padding semantics are load-bearing for the reference's collate,
    simple_dataset.py:196-236)."""
    _, cfg, params = _build_llama()
    ids = rng.integers(3, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    pad = np.zeros((1, 3), np.int32)
    padded = np.concatenate([pad, ids], axis=1)
    mask = np.concatenate([np.zeros((1, 3), np.int32),
                           np.ones((1, 6), np.int32)], axis=1)
    lg_ref, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    lg_pad, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(padded),
                                  attention_mask=jnp.asarray(mask))
    d = np.abs(np.asarray(lg_pad)[:, 3:] - np.asarray(lg_ref))
    assert d.max() < 1e-4


def test_kv_cache_matches_full(rng):
    _, cfg, params = _build_llama()
    ids = rng.integers(3, cfg.vocab_size, size=(2, 8)).astype(np.int32)
    full, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))

    cache = jllm.init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    mask = np.zeros((2, 16), np.int32)
    mask[:, :8] = 1
    lg, cache, _ = jllm.llm_apply(
        params, cfg, input_ids=jnp.asarray(ids[:, :5]),
        attention_mask=jnp.asarray(mask), cache=cache, cache_index=0)
    outs = [lg[:, -1]]
    for t in range(5, 8):
        lg, cache, _ = jllm.llm_apply(
            params, cfg, input_ids=jnp.asarray(ids[:, t:t + 1]),
            attention_mask=jnp.asarray(mask), cache=cache, cache_index=t)
        outs.append(lg[:, -1])
    inc = np.stack([np.asarray(o) for o in outs], axis=1)
    ref = np.asarray(full[:, 4:8])
    assert np.max(np.abs(inc - ref)) < 1e-4


def test_lora_zero_b_is_identity(rng):
    """Freshly-initialized LoRA (B=0) must not change the logits."""
    _, cfg, params = _build_llama()
    lora = jllm.init_lora(jax.random.PRNGKey(0), cfg, rank=4)
    ids = rng.integers(3, cfg.vocab_size, size=(1, 7)).astype(np.int32)
    base, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    wl, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids),
                              lora=lora, lora_scale=1.0)
    assert np.max(np.abs(np.asarray(base) - np.asarray(wl))) < 1e-5
