"""Quick decode-only microbench on the real TPU (8B int8 fused kernel).

Usage: python scripts/bench_decode_only.py [B ...]   (default 8 32)
Prints ms/step and tok/s per batch size.  Mirrors bench.py's decode loop
(scan of STEPS fused decode steps inside one jit, scalar fetch).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.quant import quantize_llm_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

CTX, STEPS = 192, 64


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 32]
    llm_cfg = llm_config_for("DeSTA-ntu/Llama-3.1-8B-Instruct")
    qshape = jax.eval_shape(
        lambda k: quantize_llm_params(
            jllm.init_llm(k, llm_cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape,
                          scale=0.02)
    jax.block_until_ready(lp)
    print("init done", file=sys.stderr)

    # RTT estimate
    x = jnp.zeros((), jnp.float32)
    f0 = jax.jit(lambda v: v + 1)
    float(f0(x))
    t0 = time.time()
    for _ in range(5):
        float(f0(x))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    for B in bs:
        Tmax = CTX + STEPS
        mask = jnp.ones((B, Tmax), jnp.int32)

        def prefill(params):
            cache = jllm.init_kv_cache(llm_cfg, B, Tmax, dtype=jnp.bfloat16)
            ids = jnp.ones((B, CTX), jnp.int32)
            logits, cache, _ = jllm.llm_apply(
                params, llm_cfg, input_ids=ids, attention_mask=mask,
                cache=cache, cache_index=0)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

        def decode_scan(params, tok, cache):
            def body(carry, t):
                tok, cache = carry
                lg, cache, _ = jllm.llm_apply(
                    params, llm_cfg, input_ids=tok[:, None],
                    attention_mask=mask, positions=(CTX + t)[None, None]
                    + jnp.zeros((B, 1), jnp.int32),
                    cache=cache, cache_index=CTX + t)
                nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
                return (nxt, cache), None

            (tok, cache), _ = jax.lax.scan(body, (tok, cache),
                                           jnp.arange(STEPS))
            # cache is returned (device-resident, never fetched) so the
            # donated input buffer is actually usable for aliasing
            return jnp.sum(tok), cache

        pf = jax.jit(prefill)
        dec = jax.jit(decode_scan, donate_argnums=(2,))
        t0 = time.time()
        tok, cache = pf(lp)
        jax.block_until_ready(cache)
        float(dec(lp, tok, cache)[0])
        print(f"b{B} compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        best = None
        for _ in range(3):
            tok, cache = pf(lp)
            jax.block_until_ready(cache)
            t0 = time.time()
            float(dec(lp, tok, cache)[0])
            dt = time.time() - t0 - rtt
            best = dt if best is None else min(best, dt)
        ms = best / STEPS * 1e3
        print(f"B={B}: {ms:.2f} ms/step  {B*STEPS/best:.0f} tok/s")


if __name__ == "__main__":
    main()
