"""Probe: int4 weight handling on v5e — storage density and dequant cost.

Decode is weight-bandwidth-bound (8 GB int8 -> 10.4 ms/step at b8); int4
halves bytes IF (a) XLA stores jnp.int4 packed 2/byte, and (b) the
dequant-to-bf16 unpack doesn't eat the saving.  Three measurements:

1. does device_put of an int4 array allocate K*N/2 bytes?
2. XLA decode-shaped matmul: bf16 x dequant(int4) vs dequant(int8) timing
   at M=16 (pure bandwidth regime).
3. same inside a Pallas kernel (does Mosaic lower int4 loads at all?).

Run on TPU: python scripts/probe_int4.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")

M, K, N = 16, 4096, 14336   # decode-shaped (gate proj of 8B)
ITERS = 100
RTT = 0.027


def timeit(f, *args):
    float(f(*args))
    best = None
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        dt = (time.time() - t0 - RTT) / ITERS
        best = dt if best is None else min(best, dt)
    return best


def scan_mm(w, s, dtype_name):
    x = jnp.ones((M, K), jnp.bfloat16)

    def many(x0, w, s):
        def body(c, i):
            wf = (w.astype(jnp.bfloat16) * s)
            y = jnp.dot(x0 + c.astype(jnp.bfloat16) * 1e-6, wf,
                        preferred_element_type=jnp.float32)
            # full-tensor reduce so XLA cannot slice the dot away
            return c + jnp.sum(y) * 1e-9, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    f = jax.jit(many)
    dt = timeit(f, x, w, s)
    gbs = K * N * (0.5 if dtype_name == "int4" else 1.0) / dt / 1e9
    print(f"{dtype_name:6s} dequant-matmul {dt*1e3:7.3f} ms "
          f"-> {gbs:6.0f} GB/s effective weight stream")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    s = jnp.asarray(rng.random((1, N)), jnp.bfloat16) * 0.01
    try:
        # the tunnel's host transfer path chokes on int4 — build on device
        w4 = jax.jit(
            lambda w: jnp.clip(w.astype(jnp.int32) // 16, -8,
                               7).astype(jnp.int4))(w8)
        jax.block_until_ready(w4)
        nbytes = w4.nbytes if hasattr(w4, "nbytes") else -1
        print(f"int4 [K={K},N={N}] device nbytes={nbytes} "
              f"(packed would be {K*N//2})")
    except Exception as e:  # noqa: BLE001
        print("int4 on-device cast FAILED:", type(e).__name__, str(e)[:200])
        return

    scan_mm(w8, s, "int8")
    scan_mm(w4, s, "int4")

    # Pallas: int4 ref load + dequant in-kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, w_ref, s_ref, o_ref):
        wf = w_ref[...].astype(jnp.bfloat16) * s_ref[...]
        o_ref[...] = jnp.dot(x_ref[...], wf,
                             preferred_element_type=jnp.float32)

    try:
        x = jnp.ones((M, K), jnp.bfloat16)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        o = f(x, w4, s)
        jax.block_until_ready(o)
        print("pallas int4 load+dequant: OK, out[0,0] =",
              float(o[0, 0]))
    except Exception as e:  # noqa: BLE001
        print("pallas int4 FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
