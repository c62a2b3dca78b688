"""Compare quant-matmul dispatches at prefill-sized M (VERDICT r2 #1).

At M <= 256 quant_matmul routes to the Pallas weight-streaming kernel
(decode-optimal); the TTFT profile shows 128-ctx prefill at 24.7 ms vs a
~10.7 ms weight-read roofline — per-projection launch overhead at M=128.
This measures one 8B-shaped layer stack worth of projections at several M
under each dispatch to pick the W8A8 cutoff.

Run on TPU: python scripts/bench_prefill_dispatch.py
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

from desta25_audio_tpu.ops.quant import _qmm_dispatch, quantize_weight

ITERS = 30
L = 32


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def main():
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    key = jax.random.PRNGKey(0)
    # one 8B layer's worth of (K, N): q k v o up gate down
    dims = [(4096, 4096), (4096, 1024), (4096, 1024), (4096, 4096),
            (4096, 14336), (4096, 14336), (14336, 4096)]
    leaves = []
    for i, (K, N) in enumerate(dims):
        w = jax.random.normal(jax.random.fold_in(key, i), (K, N),
                              jnp.bfloat16) * 0.02
        leaves.append(quantize_weight(w))
    jax.block_until_ready(leaves)
    bytes_per_layer = sum(K * N for K, N in dims)
    print(f"int8 weight bytes/layer {bytes_per_layer/2**20:.0f} MiB; "
          f"x{L} layers = {L*bytes_per_layer/2**30:.2f} GiB")

    for M in (128, 256):
        for mode, fn in (
            ("pallas-stream", lambda x, lf: _qmm_dispatch(
                x, lf["q"], lf["s"], False) if x.shape[0] <= 256 else None),
            ("w8a8-xla", None),
            ("dequant-dot", None),
        ):
            def one_layer(x, mode=mode):
                outs = []
                for lf in leaves:
                    K, N = lf["q"].shape
                    xi = x[:, :K] if x.shape[1] >= K else jnp.pad(
                        x, ((0, 0), (0, K - x.shape[1])))
                    if mode == "pallas-stream":
                        y = _qmm_dispatch(xi, lf["q"], lf["s"], False) \
                            if M <= 256 else None
                        if y is None:
                            return None
                    elif mode == "w8a8-xla":
                        xf = xi.astype(jnp.float32)
                        a = jnp.maximum(
                            jnp.max(jnp.abs(xf), 1, keepdims=True),
                            1e-8) / 127.0
                        qx = jnp.round(xf / a).astype(jnp.int8)
                        y = jax.lax.dot_general(
                            qx, lf["q"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * a * lf["s"][None, :]
                    else:
                        w = (lf["q"].astype(jnp.float32)
                             * lf["s"][None, :]).astype(jnp.bfloat16)
                        y = jnp.dot(xi.astype(jnp.bfloat16), w,
                                    preferred_element_type=jnp.float32)
                    outs.append(jnp.sum(y))
                return sum(outs)

            probe = one_layer(jnp.ones((M, 14336), jnp.bfloat16))
            if probe is None:
                continue

            def many(x0):
                def body(c, i):
                    def layer_body(c2, j):
                        return (c2 + one_layer(
                            x0 + (i + j).astype(jnp.bfloat16) * 0), None)
                    acc, _ = jax.lax.scan(layer_body, jnp.float32(0),
                                          jnp.arange(L))
                    return c + acc, None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(ITERS))
                return acc

            f = jax.jit(many)
            x0 = jax.random.normal(jax.random.PRNGKey(1), (M, 14336),
                                   jnp.bfloat16) * 0.1
            try:
                float(f(x0))
            except Exception as e:  # noqa: BLE001
                print(f"M={M:4d} {mode:14s} FAILED {type(e).__name__}")
                continue
            best = None
            for _ in range(3):
                t0 = time.time()
                float(f(x0))
                dt = (time.time() - t0 - rtt) / ITERS
                best = dt if best is None else min(best, dt)
            gbps = L * bytes_per_layer / best / 2**30
            print(f"M={M:4d} {mode:14s} {best*1e3:7.2f} ms/32-layer pass "
                  f"({gbps:5.0f} GiB/s weight stream)")


if __name__ == "__main__":
    main()
