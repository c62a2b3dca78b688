"""Engine-shaped 8B int8 decode bench: per-row cache indices, K-step ticks.

Mirrors serve/engine._decode_steps: ``n_slots`` rows decode at their OWN
cache positions (continuous batching), ``steps_per_tick`` fused decode
steps per jitted tick with per-request dynamic sampling.  Reports ms/tick
and serving tok/s for slot counts given on the CLI (default 8 16 32).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.generate.decode import sample_token_dynamic
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.quant import quantize_llm_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

K = 8          # steps per tick
T_MAX = 384    # max_ctx + max_new


def main():
    slots = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    cfg = llm_config_for("DeSTA-ntu/Llama-3.1-8B-Instruct")
    qshape = jax.eval_shape(
        lambda k: quantize_llm_params(
            jllm.init_llm(k, cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape,
                          scale=0.02)
    jax.block_until_ready(lp)
    x0 = jnp.zeros((), jnp.float32)
    f0 = jax.jit(lambda v: v + 1)
    float(f0(x0))
    t0 = time.time()
    for _ in range(5):
        float(f0(x0))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    for B in slots:
        cache = jllm.init_kv_cache(cfg, B, T_MAX, dtype=jnp.bfloat16)
        # staggered per-row positions, engine-style
        ci0 = (64 + 16 * jnp.arange(B, dtype=jnp.int32)) % 256
        mask0 = (jnp.arange(T_MAX)[None, :] < ci0[:, None]).astype(
            jnp.int32)
        toks0 = jnp.ones((B,), jnp.int32)
        temp = jnp.full((B,), 0.7, jnp.float32)
        top_p = jnp.full((B,), 0.9, jnp.float32)
        do_sample = (jnp.arange(B) % 2 == 0)
        t_idx = jnp.arange(T_MAX)

        def tick(params, cache, toks, ci, mask, key):
            def body(carry, s):
                cur, cache, ci, mask = carry
                step_mask = mask | (t_idx[None, :] == ci[:, None]
                                    ).astype(jnp.int32)
                lg, cache, _ = jllm.llm_apply(
                    params, cfg, input_ids=cur[:, None],
                    attention_mask=step_mask, positions=ci[:, None],
                    cache=cache, cache_index=ci)
                nxt = sample_token_dynamic(
                    lg[:, -1].astype(jnp.float32),
                    jax.random.fold_in(key, s), temp, top_p, do_sample)
                return (nxt, cache, ci + 1, step_mask), nxt

            (cur, cache, ci, mask), out = jax.lax.scan(
                body, (toks, cache, ci, mask), jnp.arange(K))
            return cur, cache, ci, mask, out

        f = jax.jit(tick)
        key = jax.random.PRNGKey(0)
        state = (toks0, cache, ci0, mask0)
        t0 = time.time()
        cur, cache2, ci, mask, out = f(lp, state[1], state[0], state[2],
                                       state[3], key)
        jax.block_until_ready(out)
        print(f"slots={B} compile+run {time.time()-t0:.1f}s",
              file=sys.stderr)
        # forced-fetch warmups (remote compile bleeds into early calls)
        for _ in range(3):
            cur, cache2, ci, mask, out = f(lp, cache, toks0, ci0, mask0,
                                           key)
            float(jnp.sum(out))
        best = None
        for _ in range(4):
            t0 = time.time()
            cur, cache2, ci, mask, out = f(lp, cache, toks0, ci0, mask0,
                                           key)
            float(jnp.sum(out))
            dt = time.time() - t0 - rtt
            best = dt if best is None else min(best, dt)
        print(f"slots={B}: {best*1e3:.1f} ms/tick  "
              f"{B*K/best:.0f} tok/s serving")


if __name__ == "__main__":
    main()
