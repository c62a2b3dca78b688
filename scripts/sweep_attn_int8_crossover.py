"""Crossover sweep for the dual-leaf encoder attention dispatch
(VERDICT r4 #3): with quantize_encoder_params(attention="dual") the
attention q/k/v/o carry BOTH int8 and bf16 arms and
models/whisper._enc_self_attn picks per trace-time batch via
DESTA_ENC_ATTN_INT8_MAXB.  This sweep measures both arms of the SAME
dual tree at B = 1/2/4/8 to pin the crossover batch (the env default).

r4 single-arm data (scripts/ab_enc_attn_w8a8.py, v5e 2026-08-19):
B=1 13.8 (int8 attn) vs 15.2 (ffn-only); b8 122.5 vs 120.6 — int8
attention wins at B=1, loses at b8; the crossover is somewhere in
2..8.

Usage: python scripts/sweep_attn_int8_crossover.py [batches...]
       (default: 1 2 4 8)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.models import whisper as jw
from desta25_audio_tpu.ops.quant import quantize_encoder_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 10


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    key = jax.random.PRNGKey(0)
    enc = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    dual = jax.jit(
        lambda p: quantize_encoder_params(p, attention="dual"))(enc)
    jax.block_until_ready(dual)
    print("init done", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")

    def fwd(ep, mel):
        _, taps = jw.whisper_encoder_apply(ep, mel, enc_cfg,
                                           cfg.target_layer_ids)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in taps)

    def make_many():
        # FRESH function object per mode: jax.jit caches per OBJECT, and
        # the env flag is read at trace time (CLAUDE.md jit-cache gotcha)
        def many(ep, mel0):
            def body(c, i):
                return c + fwd(ep, mel0 + i.astype(jnp.bfloat16) * 1e-3), \
                    None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc
        return jax.jit(many)

    for B in batches:
        mel = (jax.random.normal(jax.random.PRNGKey(1),
                                 (B, enc_cfg.expected_mel_frames,
                                  enc_cfg.num_mel_bins),
                                 jnp.float32) * 0.1).astype(jnp.bfloat16)
        times = {}
        for name, maxb in (("bf16-attn", "0"), ("int8-attn", "1000000")):
            os.environ["DESTA_ENC_ATTN_INT8_MAXB"] = maxb
            f = make_many()
            t0 = time.time()
            float(f(dual, mel))
            tc = time.time() - t0
            best = None
            for _ in range(3):
                t0 = time.time()
                float(f(dual, mel))
                dt = (time.time() - t0 - rtt) / ITERS
                best = dt if best is None else min(best, dt)
            times[name] = best
            print(f"B={B} {name:10s} {best*1e3:8.2f} ms/fwd "
                  f"(compile {tc:.0f}s)")
        win = "int8" if times["int8-attn"] < times["bf16-attn"] else "bf16"
        print(f"B={B} -> {win} attention wins by "
              f"{abs(times['int8-attn']-times['bf16-attn'])*1e3:.2f} ms")
    os.environ.pop("DESTA_ENC_ATTN_INT8_MAXB", None)


if __name__ == "__main__":
    main()
