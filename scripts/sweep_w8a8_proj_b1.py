"""Sweep the fused-quant attention-projection block size (DESTA_ENC_PROJ_BM)
and the packed-attention block_q at B=1 on the fully-quantized encoder
(ffn+attn int8 — the inference default since r4).

Each mode builds a FRESH jitted function object (the env knobs are read at
trace time and jax.jit caches per function object — CLAUDE.md gotcha).

Usage: python scripts/sweep_w8a8_proj_b1.py [B]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    enc = random_tree_like(
        jax.random.PRNGKey(0),
        lambda k: jw.init_whisper_encoder(k, enc_cfg, dtype=jnp.bfloat16))
    enc_q = jax.jit(quantize_encoder_params)(enc)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 3000, enc_cfg.num_mel_bins), jnp.bfloat16)
    jax.block_until_ready((enc_q, mel))
    print("init done", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")

    def run(bpm, bq):
        os.environ["DESTA_ENC_PROJ_BM"] = str(bpm)
        os.environ["DESTA_ENC_BQ"] = str(bq)

        def fwd(ep, m):  # fresh function object per mode
            def body(c, i):
                _, taps = jw.whisper_encoder_apply(
                    ep, m + i.astype(jnp.bfloat16) * 1e-3, enc_cfg,
                    cfg.target_layer_ids)
                return c + jnp.sum(taps[-1].astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        f = jax.jit(fwd)
        t0 = time.time()
        try:
            float(f(enc_q, mel))
        except Exception as e:  # noqa: BLE001
            print(f"B={B} bpm={bpm:5d} bq={bq:5d}: FAILED "
                  f"{type(e).__name__}: {e}"[:160])
            return
        tc = time.time() - t0
        t0 = time.time()
        float(f(enc_q, mel))
        dt = (time.time() - t0 - rtt) / ITERS
        print(f"B={B} bpm={bpm:5d} bq={bq:5d}: {dt*1e3:7.2f} ms/fwd "
              f"(compile {tc:.0f}s)")

    default_bq = 768 if B == 1 else 512
    for bpm in (256, 512, 768, 1536):
        run(bpm, default_bq)
    for bq in ((256, 512, 1536) if B == 1 else (256, 768)):
        run(512, bq)


if __name__ == "__main__":
    main()
