"""A/B: encoder attention projections through the fused-quant W8A8
kernels (ops/w8a8_proj.py) vs FFN-only int8 vs bf16.

Round 2 measured the XLA dyn-int8 wiring of q/k/v/o SLOWER end-to-end
(175 vs 166 ms b8: quant epilogues break fusion).  The fused kernels do
the act quant in-launch; this script decides whether
quantize_encoder_params(include_attention=True) becomes the
encoder_quant="int8" default.

Usage: python scripts/ab_enc_attn_w8a8.py [batches...]   (default: 8 1)
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
    batches = [int(a) for a in sys.argv[1:]] or [8, 1]
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
    enc_ffn = jax.jit(
        lambda p: quantize_encoder_params(p, include_attention=False))(enc)
    enc_all = jax.jit(
        lambda p: quantize_encoder_params(p, include_attention=True))(enc)
    jax.block_until_ready((enc, enc_ffn, enc_all))
    print("init done", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")

    def fwd(ep, mel):
        _, taps = jw.whisper_encoder_apply(ep, mel, enc_cfg,
                                           cfg.target_layer_ids)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in taps)

    def make_many():
        def many(ep, mel0):
            def body(c, i):
                return c + fwd(ep, mel0 + i.astype(jnp.bfloat16) * 1e-3), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc
        return jax.jit(many)

    for B in batches:
        mel = (jax.random.normal(jax.random.PRNGKey(1),
                                 (B, enc_cfg.expected_mel_frames,
                                  enc_cfg.num_mel_bins),
                                 jnp.float32) * 0.1).astype(jnp.bfloat16)
        for name, ep in (("bf16", enc), ("int8-ffn", enc_ffn),
                         ("int8-ffn+attn", enc_all)):
            f = make_many()
            t0 = time.time()
            float(f(ep, mel))
            tc = time.time() - t0
            best = None
            for _ in range(3):
                t0 = time.time()
                float(f(ep, mel))
                dt = (time.time() - t0 - rtt) / ITERS
                best = dt if best is None else min(best, dt)
            print(f"B={B} {name:14s} {best*1e3:8.2f} ms/fwd "
                  f"(compile {tc:.0f}s)")


if __name__ == "__main__":
    main()
