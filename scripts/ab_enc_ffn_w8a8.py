"""In-context A/B of the W8A8 fused encoder FFN (ops/enc_ffn.py
encoder_ffn_w8a8): full 32-layer whisper-large-v3 encoder on v5e.

Variants:
  bf16_fused      — the bf16 fused fc1->gelu->fc2 kernel (default path)
  int8_xla        — encoder_quant="int8" weights through the per-op XLA
                    dyn-int8 linears (round-2 path: fusion-breaking
                    quant epilogues)
  int8_fused@bm   — the new in-kernel-act-quant W8A8 kernel, bm sweep

Run on TPU: python scripts/ab_enc_ffn_w8a8.py [batch]
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
from desta25_audio_tpu.ops import enc_ffn as ef
from desta25_audio_tpu.ops.quant import quantize_encoder_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 10
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    ep = random_tree_like(
        jax.random.PRNGKey(0),
        lambda k: jw.init_whisper_encoder(k, enc_cfg, dtype=jnp.bfloat16))
    ep_q_inner = jax.jit(
        lambda p: quantize_encoder_params(p, include_attention=False))(ep)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 3000, enc_cfg.num_mel_bins), jnp.bfloat16)
    jax.block_until_ready((ep, ep_q_inner, mel))
    ep_q = ep_q_inner
    rtt = measure_rtt()
    print(f"B={B} rtt {rtt*1e3:.1f} ms")

    def enc(params, mel, eps):
        out, _ = jw.whisper_encoder_apply(
            params, mel + eps.astype(mel.dtype), enc_cfg,
            cfg.target_layer_ids)
        return jnp.sum(out.astype(jnp.float32)), out

    variants = {
        "bf16_fused": (ep, "1", None),
        "int8_xla": (ep_q, "0", None),
    }
    for bm in (256, 512):
        variants[f"int8_fused@{bm}"] = (ep_q, "1", bm)

    orig = ef.encoder_ffn_w8a8
    outs, times = {}, {}
    for name, (params, env, bm) in variants.items():
        os.environ["DESTA_FUSED_ENC_FFN"] = env
        if bm is not None:
            def wrap(x, q1, s1, b1, q2, s2, b2, block_m=256,
                     interpret=False, _bm=bm, _orig=orig):
                return _orig(x, q1, s1, b1, q2, s2, b2, _bm, interpret)
            ef.encoder_ffn_w8a8 = wrap
        else:
            ef.encoder_ffn_w8a8 = orig

        def many(params, mel):
            def body(c, i):
                s, _ = enc(params, mel, jnp.float32(i) * 1e-6)
                return c + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(ITERS))
            return acc
        f = jax.jit(many)
        t0 = time.time()
        float(f(params, mel))
        print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
        best = None
        for _ in range(4):
            t0 = time.time()
            float(f(params, mel))
            dt = (time.time() - t0 - rtt) / ITERS
            best = dt if best is None else min(best, dt)
        times[name] = best
        outs[name] = jax.jit(
            lambda p, m: enc(p, m, jnp.float32(0.0))[1])(params, mel)
    ef.encoder_ffn_w8a8 = orig
    os.environ["DESTA_FUSED_ENC_FFN"] = "1"

    import numpy as np
    base = np.asarray(outs["bf16_fused"], np.float32)
    scale = np.abs(base).max()
    for name in variants:
        err = np.abs(np.asarray(outs[name], np.float32) - base).max()
        print(f"{name:16s} {times[name]*1e3:8.2f} ms   "
              f"max|err|/scale {err/scale:.4f}")


if __name__ == "__main__":
    main()
