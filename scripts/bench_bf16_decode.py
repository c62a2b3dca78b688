"""Re-measure bf16 (non-quantized) decode after the packed-cache change
(ADVICE r2 #2): the XLA decode path reshapes the packed [B,S,Hkv*Dh]
cache to [B,S,Hkv,Dh] per step, which may reintroduce a relayout copy
for models that can't use the fused kernel.

Run on TPU: python scripts/bench_bf16_decode.py [model_id]
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

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.utils.fast_init import random_tree_like

B, CTX, STEPS = 8, 192, 64


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "Qwen/Qwen3-4B"
    cfg = llm_config_for(model)
    lp = random_tree_like(
        jax.random.PRNGKey(0),
        lambda k: jax.eval_shape(
            lambda kk: jllm.init_llm(kk, cfg, dtype=jnp.bfloat16), k),
        scale=0.02)
    jax.block_until_ready(lp)
    f0 = jax.jit(lambda v: v + 1)
    float(f0(jnp.float32(0)))
    t0 = time.time()
    for _ in range(5):
        float(f0(jnp.float32(0)))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms  model={model}")

    Tmax = CTX + STEPS
    mask = jnp.ones((B, Tmax), jnp.int32)

    @jax.jit
    def prefill(params):
        cache = jllm.init_kv_cache(cfg, B, Tmax, dtype=jnp.bfloat16)
        ids = jnp.ones((B, CTX), jnp.int32)
        lg, cache, _ = jllm.llm_apply(params, cfg, input_ids=ids,
                                      attention_mask=mask, cache=cache,
                                      cache_index=0)
        return jnp.argmax(lg[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def decode(params, tok, cache):
        def body(carry, t):
            tok, cache = carry
            lg, cache, _ = jllm.llm_apply(
                params, cfg, input_ids=tok[:, None], attention_mask=mask,
                positions=(CTX + t)[None, None]
                + jnp.zeros((B, 1), jnp.int32),
                cache=cache, cache_index=CTX + t)
            return (jnp.argmax(lg[:, -1], -1).astype(jnp.int32),
                    cache), None

        (tok, cache), _ = jax.lax.scan(body, (tok, cache),
                                       jnp.arange(STEPS))
        return jnp.sum(tok), cache

    tok, cache = prefill(lp)
    jax.block_until_ready(cache)
    t0 = time.time()
    float(decode(lp, tok, cache)[0])
    print(f"compile {time.time()-t0:.0f}s")
    best = None
    for _ in range(3):
        tok, cache = prefill(lp)
        jax.block_until_ready(cache)
        t0 = time.time()
        float(decode(lp, tok, cache)[0])
        dt = time.time() - t0 - rtt
        best = dt if best is None else min(best, dt)
    print(f"bf16 decode b{B}: {B*STEPS/best:.0f} tok/s "
          f"({best/STEPS*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
