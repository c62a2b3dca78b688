"""Probe: does Mosaic lower int8 x int8 -> int32 jnp.dot on v5e, and at
what rate vs bf16?  Feeds the W8A8 fused encoder-FFN design decision.

Run on TPU: python scripts/probe_int8_mxu_pallas.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")

M, K, N = 1024, 1280, 5120
ITERS = 50


def _kernel_i8(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.int32)


def _kernel_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32)


def run(dtype, kern, out_dtype):
    x = jnp.ones((M, K), dtype)
    w = jnp.ones((K, N), dtype)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def amortized(x, w):
        def it(c, i):
            o = f(x + i.astype(dtype), w)
            return c + o.astype(jnp.float32)[0, 0], None
        acc, _ = jax.lax.scan(it, jnp.float32(0.0), jnp.arange(ITERS,
                              dtype=jnp.int32))
        return acc

    g = jax.jit(amortized)
    float(g(x, w))  # compile
    best = None
    for _ in range(3):
        t0 = time.time()
        float(g(x, w))
        dt = (time.time() - t0 - 0.027) / ITERS
        best = dt if best is None else min(best, dt)
    tf = 2 * M * K * N / best / 1e12
    print(f"{dtype.__name__:8s} {best*1e3:7.3f} ms  {tf:7.1f} TF/s")
    return best


if __name__ == "__main__":
    run(jnp.bfloat16, _kernel_bf16, jnp.float32)
    run(jnp.int8, _kernel_i8, jnp.int32)
