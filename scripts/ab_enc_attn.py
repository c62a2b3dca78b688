"""Focused A/B of packed encoder-attention variants with per-rep samples."""

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

from sweep_enc_attn import _kernel_ilv, _kernel_phase, build, measure_rtt

ITERS = 50
REPS = 8


def main():
    B, H, T, DM = 8, 20, 1500, 1280
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, DM), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, DM), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, DM), jnp.bfloat16)
    jax.block_until_ready((q, k, v))
    flops = 4 * B * H * T * T * (DM // H)

    from desta25_audio_tpu.ops.enc_attention import packed_encoder_attention

    cands = {}
    for bq in (256, 768):
        def cur(q, k, v, eps, bq=bq):
            o = packed_encoder_attention(q + eps.astype(q.dtype), k, v, H,
                                         block_q=bq)
            return jnp.sum(o.astype(jnp.float32))
        cands[f"current@{bq}"] = cur
    for name, kern in (("phase", _kernel_phase), ("ilv", _kernel_ilv)):
        for bq in (256, 512):
            c = build(kern, B, T, DM, H, bq)

            def f(q, k, v, eps, c=c):
                return jnp.sum(c(q + eps.astype(q.dtype), k, v
                                 ).astype(jnp.float32))
            cands[f"{name}@{bq}"] = f

    fns = {}
    for name, fn in cands.items():
        def many(q, k, v, fn=fn):
            def body(c, i):
                return c + fn(q, k, v, jnp.float32(i) * 1e-6), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc
        f = jax.jit(many)
        float(f(q, k, v))
        fns[name] = f
    for name, f in fns.items():  # second warmup round-robin
        float(f(q, k, v))

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    for name, f in fns.items():
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            float(f(q, k, v))
            samples.append((time.time() - t0 - rtt) / ITERS)
        best = min(samples)
        med = sorted(samples)[len(samples) // 2]
        print(f"{name:12s} best {best*1e3:7.3f} med {med*1e3:7.3f} ms "
              f"({flops/best/1e12:5.1f} TF/s best) "
              + " ".join(f"{s*1e3:.2f}" for s in samples))


if __name__ == "__main__":
    main()
