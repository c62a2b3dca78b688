"""Find a fast cross-attention for Q-Former shapes on TPU.

Shape: q [32, 64, 20, 64] (B_eff=n_taps*B, K=64 queries, H=20, D=64),
kv [32, 1536, 20, 64].  The XLA einsum path measures ~3 ms/layer — 35x off
roofline.  Candidates: pallas flash with small block_q, head-folded
einsums, and scores-in-bf16 variants.
"""

import functools
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

ITERS = 30
B, QL, H, D = 32, 64, 20, 64
KL = 1536


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def timed(name, fn, *args):
    def many(*a):
        def body(c, i):
            return c + fn(*a, jnp.float32(i) * 1e-6), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc
    f = jax.jit(many)
    try:
        float(f(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAIL {type(e).__name__}: {e}"[:140])
        return
    for _ in range(3):
        float(f(*args))
    rtt = measure_rtt()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        best = min(best, (time.time() - t0 - rtt) / ITERS)
    print(f"{name:26s} {best*1e3:8.3f} ms")


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, QL, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, KL, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, KL, H, D), jnp.bfloat16)
    jax.block_until_ready((q, k, v))
    scale = D ** -0.5

    def xla_btHD(q, k, v, eps):
        qq = q + eps.astype(q.dtype)
        s = jnp.einsum("bqhd,bkhd->bhqk", qq, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bqhd", p, v)
        return jnp.sum(o.astype(jnp.float32))

    timed("xla bqhd (current)", xla_btHD, q, k, v)

    def xla_pret(q, k, v, eps):
        # pre-transpose kv to [B, H, KL, D] once
        qq = jnp.swapaxes(q + eps.astype(q.dtype), 1, 2)  # [B,H,QL,D]
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qq, kt,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vt)
        return jnp.sum(o.astype(jnp.float32))

    timed("xla pre-transposed", xla_pret, q, k, v)

    def xla_bf16_scores(q, k, v, eps):
        qq = jnp.swapaxes(q + eps.astype(q.dtype), 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qq, kt,
                       preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", e, vt,
                       preferred_element_type=jnp.float32)
        den = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        return jnp.sum(o / den)

    timed("xla bf16 probs", xla_bf16_scores, q, k, v)

    # fold heads into the M dim: one [B, QL*H... ] won't work directly; but
    # fold B*H into batch and keep one big N: scores as one dot per (b):
    # [QL*H, D] x [D, KL*H] is wrong across heads.  Instead fold q heads
    # into M via block-diag trick is wasteful; skip.

    # pallas flash with small block_q
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    for bq in (64,):
        for bkv in (512, 1536):
            def fa(q, k, v, eps, bq=bq, bkv=bkv):
                qq = jnp.swapaxes(q + eps.astype(q.dtype), 1, 2)
                kt = jnp.swapaxes(k, 1, 2)
                vt = jnp.swapaxes(v, 1, 2)
                bs = BlockSizes(
                    block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bkv,
                    block_q_dkv=bq, block_k_dkv=bkv, block_q_dq=bq,
                    block_k_dq=bkv, block_k_major_dq=bkv)
                o = flash_attention(qq, kt, vt, causal=False,
                                    sm_scale=scale, block_sizes=bs)
                return jnp.sum(o.astype(jnp.float32))

            timed(f"flash bq={bq} bkv={bkv}", fa, q, k, v)

    # vmapped-over-B full-head matmul: [QL*H? ] alternative — fold heads
    # into M by stacking: q' [B, H*QL, D], k' [B, KL, D] per head... needs
    # block-diagonal; instead: batch dim (B*H) with M=QL=64:
    def xla_bh_batch(q, k, v, eps):
        qq = (q + eps.astype(q.dtype)).transpose(0, 2, 1, 3).reshape(
            B * H, QL, D)
        kt = k.transpose(0, 2, 3, 1).reshape(B * H, D, KL)
        vt = v.transpose(0, 2, 1, 3).reshape(B * H, KL, D)
        s = jax.lax.batch_matmul(qq.astype(jnp.bfloat16), kt,
                                 preferred_element_type=jnp.float32)
        s = s * scale
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.batch_matmul(p, vt,
                                 preferred_element_type=jnp.float32)
        return jnp.sum(o)

    timed("xla (B*H) batch_matmul", xla_bh_batch, q, k, v)


if __name__ == "__main__":
    main()
