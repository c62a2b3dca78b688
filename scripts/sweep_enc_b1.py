"""B=1 block-shape sweep for the encoder kernels (VERDICT r3 #3: TTFT).

The packed-attention block_q=512 and fused-FFN block_m=256 defaults were
tuned at b8; at B=1 the grid is 10x smaller and the MXU underfilled.
Sweeps DESTA_ENC_BQ x DESTA_ENC_BM on the full 32-layer encoder forward
at B=1 (and re-checks the winner at B=8), bf16 and int8-FFN variants.

Each mode builds a FRESH jitted function object (env flags are read at
trace time; jit caches per function object — CLAUDE.md).

Run on TPU: python scripts/sweep_enc_b1.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.models import whisper as jw
from desta25_audio_tpu.ops.quant import quantize_encoder_params
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


def make_fwd(enc_cfg, taps):
    """Fresh function object per mode (env read at trace time)."""
    def fwd(ep, mel):
        def body(c, i):
            _, tp = jw.whisper_encoder_apply(ep, mel + i * 1e-6, enc_cfg,
                                             taps)
            return c + sum(jnp.sum(t.astype(jnp.float32)) for t in tp), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc
    return jax.jit(fwd)


def timed(f, *args, rtt=0.0):
    float(f(*args))
    best = None
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        dt = (time.time() - t0 - rtt) / ITERS
        best = dt if best is None else min(best, dt)
    return best


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    key = jax.random.PRNGKey(0)
    ep = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    ep_q = quantize_encoder_params(ep, include_attention=False)
    jax.block_until_ready((ep, ep_q))
    print("init done", file=sys.stderr)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")

    mels = {}
    for B in (1, 8):
        mels[B] = (jax.random.normal(
            jax.random.PRNGKey(B), (B, enc_cfg.expected_mel_frames,
                                    enc_cfg.num_mel_bins), jnp.float32)
            * 0.1).astype(jnp.bfloat16)

    def run(tag, params, B, bq, bm):
        os.environ["DESTA_ENC_BQ"] = str(bq)
        os.environ["DESTA_ENC_BM"] = str(bm)
        f = make_fwd(enc_cfg, cfg.target_layer_ids)
        t0 = time.time()
        try:
            dt = timed(f, params, mels[B], rtt=rtt)
        except Exception as e:  # Mosaic may reject some block shapes
            print(f"{tag:6s} B={B} bq={bq:5d} bm={bm:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            return float("inf")
        print(f"{tag:6s} B={B} bq={bq:5d} bm={bm:4d}: {dt*1e3:7.2f} ms/fwd"
              f"  (first call {time.time()-t0:.0f}s)")
        return dt

    # phase 1: attention block_q at B=1 (bm fixed at default)
    results = {}
    for bq in (256, 512, 768, 1536):
        results[bq] = run("bf16", ep, 1, bq, 256)
    best_bq = min(results, key=results.get)
    # phase 2: FFN block_m at B=1 with the best bq
    fres = {}
    for bm in (128, 256, 512, 1536):
        if (best_bq, bm) == (best_bq, 256):
            fres[bm] = results[best_bq]
            continue
        fres[bm] = run("bf16", ep, 1, best_bq, bm)
    best_bm = min(fres, key=fres.get)
    print(f"best B=1: bq={best_bq} bm={best_bm} "
          f"{fres[best_bm]*1e3:.2f} ms (default was "
          f"{results[512]*1e3:.2f})")
    # phase 3: int8 FFN at B=1 with the winning shapes
    for bm in sorted({128, 256, best_bm}):
        run("w8a8", ep_q, 1, best_bq, bm)
    # phase 4: sanity — winner must not regress B=8
    run("bf16", ep, 8, 512, 256)
    run("bf16", ep, 8, best_bq, best_bm)


if __name__ == "__main__":
    main()
