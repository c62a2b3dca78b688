"""Decompose single-clip TTFT into stages (VERDICT r2 weak #1).

Times each stage of bench.py's TTFT path in its own scan-amortized jit:
mel, encoder, qformer, 128-ctx prefill (with / without last-token-only
head), so the 56.7 -> 63.6 ms regression can be attributed.

Run on TPU: python scripts/profile_ttft.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, "/root/repo")

from desta25_audio_tpu.config import DeSTA25Config, llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.models import whisper as jw
from desta25_audio_tpu.models.qformer import (
    init_qformer_connector,
    qformer_connector_apply,
)
from desta25_audio_tpu.ops.mel_pallas import log_mel_pallas
from desta25_audio_tpu.ops.quant import quantize_llm_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 20


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def timed(name, fn, *args, rtt=0.0):
    """fn must reduce to a scalar; scan-amortized inside."""
    f = jax.jit(fn)
    float(f(*args))
    best = None
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        dt = (time.time() - t0 - rtt) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:40s} {best*1e3:8.2f} ms")
    return best


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        prompt_size=64, dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    llm_cfg = llm_config_for("DeSTA-ntu/Llama-3.1-8B-Instruct")

    key = jax.random.PRNGKey(0)
    enc_params = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    conn_params = random_tree_like(
        key, lambda k: init_qformer_connector(k, cfg, dtype=jnp.bfloat16))
    qshape = jax.eval_shape(
        lambda k: quantize_llm_params(
            jllm.init_llm(k, llm_cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape,
                          scale=0.02)
    jax.block_until_ready((enc_params, conn_params, lp))
    print("init done", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")

    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 30 * 16000),
                              jnp.float32) * 0.1
    T_CTX = 128

    def scan_over(body):
        def outer(*args):
            def it(c, i):
                return c + body(i, *args), None
            acc, _ = jax.lax.scan(it, jnp.float32(0.0), jnp.arange(ITERS))
            return acc
        return outer

    # stage 1: mel
    def mel_body(i, a):
        m = log_mel_pallas(a + i * 1e-6, enc_cfg.num_mel_bins)
        return jnp.sum(m.astype(jnp.float32))
    timed("mel (B=1)", scan_over(mel_body), audio, rtt=rtt)

    # stage 2: mel+encoder
    def enc_body(i, ep, a):
        m = log_mel_pallas(a + i * 1e-6,
                           enc_cfg.num_mel_bins).astype(jnp.bfloat16)
        _, taps = jw.whisper_encoder_apply(ep, m, enc_cfg,
                                           cfg.target_layer_ids)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in taps)
    timed("mel+encoder (B=1)", scan_over(enc_body), enc_params, audio,
          rtt=rtt)

    # stage 3: mel+encoder+qformer
    def perc_body(i, ep, cp, a):
        m = log_mel_pallas(a + i * 1e-6,
                           enc_cfg.num_mel_bins).astype(jnp.bfloat16)
        _, taps = jw.whisper_encoder_apply(ep, m, enc_cfg,
                                           cfg.target_layer_ids)
        f = qformer_connector_apply(cp, taps, cfg)
        return jnp.sum(f.astype(jnp.float32))
    timed("mel+encoder+qformer (B=1)", scan_over(perc_body), enc_params,
          conn_params, audio, rtt=rtt)

    # stage 3b/3c: int8 encoder variants (FFN-only vs FFN+attention)
    from desta25_audio_tpu.ops.quant import quantize_encoder_params
    enc_q = jax.jit(
        lambda p: quantize_encoder_params(p, include_attention=False)
    )(enc_params)
    enc_qa = jax.jit(
        lambda p: quantize_encoder_params(p, include_attention=True)
    )(enc_params)
    jax.block_until_ready((enc_q, enc_qa))
    timed("mel+enc(int8 ffn)+qformer (B=1)", scan_over(perc_body), enc_q,
          conn_params, audio, rtt=rtt)
    timed("mel+enc(int8 ffn+attn)+qformer (B=1)", scan_over(perc_body),
          enc_qa, conn_params, audio, rtt=rtt)

    # stage 4: prefill alone (embeds ready), full-sequence head
    embeds = jax.random.normal(jax.random.PRNGKey(3),
                               (1, T_CTX, llm_cfg.hidden_size),
                               jnp.bfloat16) * 0.02

    def prefill_body(i, p, e):
        cache = jllm.init_kv_cache(llm_cfg, 1, T_CTX + 8,
                                   dtype=jnp.bfloat16)
        mask = jnp.ones((1, T_CTX + 8), jnp.int32)
        logits, _, _ = jllm.llm_apply(
            p, llm_cfg, inputs_embeds=e + i * 1e-6, attention_mask=mask,
            cache=cache, cache_index=0)
        return jnp.sum(logits[0, -1])
    timed("prefill 128ctx (full head)", scan_over(prefill_body), lp,
          embeds, rtt=rtt)

    # stage 5: prefill, last-token head only
    def prefill_lt_body(i, p, e):
        cache = jllm.init_kv_cache(llm_cfg, 1, T_CTX + 8,
                                   dtype=jnp.bfloat16)
        mask = jnp.ones((1, T_CTX + 8), jnp.int32)
        _, _, hidden = jllm.llm_apply(
            p, llm_cfg, inputs_embeds=e + i * 1e-6, attention_mask=mask,
            cache=cache, cache_index=0, skip_head=True,
            return_hidden=True)
        from desta25_audio_tpu.models.llm import _head_logits
        lg = _head_logits(p, llm_cfg, hidden[:, -1:])
        return jnp.sum(lg[0, -1])
    timed("prefill 128ctx (last-tok head)", scan_over(prefill_lt_body),
          lp, embeds, rtt=rtt)

    # stage 5b: prefill layer stack only (no head) + head only at M=1
    def prefill_nohead_body(i, p, e):
        cache = jllm.init_kv_cache(llm_cfg, 1, T_CTX + 8,
                                   dtype=jnp.bfloat16)
        mask = jnp.ones((1, T_CTX + 8), jnp.int32)
        _, _, hidden = jllm.llm_apply(
            p, llm_cfg, inputs_embeds=e + i * 1e-6, attention_mask=mask,
            cache=cache, cache_index=0, skip_head=True,
            return_hidden=True)
        return jnp.sum(hidden[0, -1].astype(jnp.float32))
    timed("prefill 128ctx (no head)", scan_over(prefill_nohead_body),
          lp, embeds, rtt=rtt)

    hid1 = jax.random.normal(jax.random.PRNGKey(4),
                             (1, 1, llm_cfg.hidden_size),
                             jnp.bfloat16) * 0.02

    def head_body(i, p, h):
        from desta25_audio_tpu.models.llm import _head_logits
        return jnp.sum(_head_logits(p, llm_cfg, h + i * 1e-6)[0, -1])
    timed("head only (M=1, int8)", scan_over(head_body), lp, hid1, rtt=rtt)

    # stage 6: full TTFT program as bench.py builds it
    def ttft_body(i, ep, cp, p, a):
        m = log_mel_pallas(a + i * 1e-6,
                           enc_cfg.num_mel_bins).astype(jnp.bfloat16)
        _, taps = jw.whisper_encoder_apply(ep, m, enc_cfg,
                                           cfg.target_layer_ids)
        feats = qformer_connector_apply(cp, taps, cfg)
        ids = jnp.ones((1, T_CTX), jnp.int32)
        e = jllm.embed_tokens(p, ids)
        e = jax.lax.dynamic_update_slice(
            e, feats.astype(e.dtype), (0, 4, 0))
        cache = jllm.init_kv_cache(llm_cfg, 1, T_CTX + 8,
                                  dtype=jnp.bfloat16)
        mask = jnp.ones((1, T_CTX + 8), jnp.int32)
        logits, _, _ = jllm.llm_apply(
            p, llm_cfg, inputs_embeds=e, attention_mask=mask,
            cache=cache, cache_index=0)
        return jnp.max(logits[0, -1])
    timed("full TTFT program", scan_over(ttft_body), enc_params,
          conn_params, lp, audio, rtt=rtt)

    # stage 7: the deployed default — int8 ffn+attn encoder, last-token
    # head (what bench.py's headline ttft_p50 measures single-shot)
    def ttft_def_body(i, ep, cp, p, a):
        m = log_mel_pallas(a + i * 1e-6,
                           enc_cfg.num_mel_bins).astype(jnp.bfloat16)
        _, taps = jw.whisper_encoder_apply(ep, m, enc_cfg,
                                           cfg.target_layer_ids)
        feats = qformer_connector_apply(cp, taps, cfg)
        ids = jnp.ones((1, T_CTX), jnp.int32)
        e = jllm.embed_tokens(p, ids)
        e = jax.lax.dynamic_update_slice(
            e, feats.astype(e.dtype), (0, 4, 0))
        cache = jllm.init_kv_cache(llm_cfg, 1, T_CTX + 8,
                                   dtype=jnp.bfloat16)
        mask = jnp.ones((1, T_CTX + 8), jnp.int32)
        _, _, hidden = jllm.llm_apply(
            p, llm_cfg, inputs_embeds=e, attention_mask=mask,
            cache=cache, cache_index=0, skip_head=True,
            return_hidden=True)
        from desta25_audio_tpu.models.llm import _head_logits
        return jnp.sum(_head_logits(p, llm_cfg, hidden[:, -1:])[0, -1])
    timed("full TTFT program (int8 enc default)", scan_over(ttft_def_body),
          enc_qa, conn_params, lp, audio, rtt=rtt)


if __name__ == "__main__":
    main()
