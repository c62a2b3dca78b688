"""Bisect the ORCA serving-tick remote-compile pathology (round 5).

bench.py's bench_orca_decode serving-tick program (Qwen3-4B int8 fused
in-kernel injection x per-row cache indices x dynamic sampling x K=8
scan) has NEVER compiled on the tunnel: r4's driver bench and two r5
runs all died there (broken pipe from the remote compiler, then a
wedged pool).  Host-side trace (0.8 s) and Mosaic lowering (1.0 s,
0.2 MB StableHLO) are clean — the kill happens inside the remote
backend, so the toxic ingredient must be found empirically.

Each variant runs in its OWN process (drive with
scripts/bisect_orca_tick.sh) so a compiler crash can't take the ladder
down.  Ladder, least -> most suspicious:

  v1  per-row ci + sampling + K=8 scan, NO injection   (bench_serving
      proved this exact structure on Llama-8B; this pins Qwen3-4B)
  v2  v1 + greedy argmax instead of sampling, + injection
  v3  v1 + injection, K=1 (no scan)
  v4  v1 + injection, scalar ci (positions/cache_index scalars)
  v5  the full combo = bench_orca_decode's tick verbatim

Usage: python scripts/bisect_orca_tick.py v1|v2|v3|v4|v5 [Tmax]
(Tmax default 256 = bench shape; the engine's working ORCA program
runs the same combo at S=384, so "v5 384" isolates the S dependence.)
Prints "<variant> ok compile=<s> step=<s>" or raises.
"""
import faulthandler
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.generate.decode import sample_token_dynamic
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.core import (init_layer_norm, init_linear,
                                        stack_layers)
from desta25_audio_tpu.ops.quant import (quantize_llm_params,
                                         quantize_orca_cross_attns)
from desta25_audio_tpu.utils.fast_init import random_tree_like

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

# TPU-only: the env pins jax_platforms to "axon,cpu" regardless of
# JAX_PLATFORMS=cpu (CLAUDE.md), so a "CPU sanity run" of this script
# actually claims the chip and executes a 4B model on it — and killing
# it mid-remote-compile wedges the tunnel.  Refuse to run elsewhere.
assert jax.default_backend() == "tpu", (
    f"bisect probes are TPU-only (backend={jax.default_backend()}); "
    "trace/lowering repros live in the round-5 notes, not here")

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "v1"
B, CTX, TA = 8, 192, 440
K = 1 if VARIANT == "v3" else 8
llm_cfg = llm_config_for("Qwen/Qwen3-4B")
L, D, H = (llm_cfg.num_hidden_layers, llm_cfg.hidden_size,
           llm_cfg.num_attention_heads)

qshape = jax.eval_shape(
    lambda k: quantize_llm_params(
        jllm.init_llm(k, llm_cfg, dtype=jnp.bfloat16)),
    jax.random.PRNGKey(0))
lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape, scale=0.02)


def build_xattn(key):
    layers = []
    for _ in range(L):
        key, kq, kk, kv, ko, kg1 = jax.random.split(key, 6)
        layers.append({
            "q": init_linear(kq, D, D), "k": init_linear(kk, D, D),
            "v": init_linear(kv, D, D), "o": init_linear(ko, D, D),
            "gate1": init_linear(kg1, D, D // 4),
            "gate2": {"w": jnp.zeros((D // 4, 1), jnp.float32),
                      "b": jnp.zeros((1,), jnp.float32)},
            "ln": init_layer_norm(D),
        })
    return quantize_orca_cross_attns({"layers": stack_layers(layers)})


inject = VARIANT != "v1"
if inject:
    xshape = jax.eval_shape(build_xattn, jax.random.PRNGKey(0))
    xp = random_tree_like(jax.random.PRNGKey(3), lambda k: xshape,
                          scale=0.02)
    ka = (jax.random.normal(jax.random.PRNGKey(4), (L, B, TA, D),
                            jnp.bfloat16) * 0.1)
    va = (jax.random.normal(jax.random.PRNGKey(5), (L, B, TA, D),
                            jnp.bfloat16) * 0.1)
    fspec0 = dict(params=xp, k=ka, v=va, ta_real=TA, heads=H,
                  on=jnp.ones((B,), jnp.float32))
else:
    fspec0 = None

Tmax = int(sys.argv[2]) if len(sys.argv) > 2 else 256
t_idx = jnp.arange(Tmax)
temp = jnp.full((B,), 0.7, jnp.float32)
top_p = jnp.full((B,), 0.9, jnp.float32)
do_sample = (jnp.arange(B) % 2 == 0)
greedy = VARIANT == "v2"
scalar_ci = VARIANT == "v4"


def tick(params, cache, toks, ci, mask, key):
    fspec = fspec0

    def body(carry, s):
        cur, cache, ci, mask = carry
        if scalar_ci:
            ci_s = ci[0]
            step_mask = mask | (t_idx[None, :]
                                == ci_s).astype(jnp.int32)
            lg, cache, _ = jllm.llm_apply(
                params, llm_cfg, input_ids=cur[:, None],
                attention_mask=step_mask,
                positions=ci_s[None, None] + jnp.zeros((B, 1), jnp.int32),
                cache=cache, cache_index=ci_s, fused_injection=fspec)
        else:
            step_mask = mask | (t_idx[None, :]
                                == ci[:, None]).astype(jnp.int32)
            lg, cache, _ = jllm.llm_apply(
                params, llm_cfg, input_ids=cur[:, None],
                attention_mask=step_mask, positions=ci[:, None],
                cache=cache, cache_index=ci, fused_injection=fspec)
        if greedy:
            nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        else:
            nxt = sample_token_dynamic(
                lg[:, -1].astype(jnp.float32),
                jax.random.fold_in(key, s), temp, top_p, do_sample)
        return (nxt, cache, ci + 1, step_mask), nxt

    (cur, cache, ci, mask), outs = jax.lax.scan(
        body, (toks, cache, ci, mask), jnp.arange(K))
    return cache, jnp.sum(outs)


ci0 = ((64 + 16 * jnp.arange(B, dtype=jnp.int32)) % 192
       if not scalar_ci else jnp.full((B,), 64, jnp.int32))
mask0 = (jnp.arange(Tmax)[None, :] < ci0[:, None]).astype(jnp.int32)
cache = jllm.init_kv_cache(llm_cfg, B, Tmax, dtype=jnp.bfloat16)
toks0 = jnp.ones((B,), jnp.int32)
jax.block_until_ready((lp, cache))
print(f"{VARIANT} init done", file=sys.stderr, flush=True)

f = jax.jit(tick, donate_argnums=(1,))
t0 = time.time()
cache, s = f(lp, cache, toks0, ci0, mask0, jax.random.PRNGKey(0))
float(s)
dt_c = time.time() - t0
t0 = time.time()
cache, s = f(lp, cache, toks0, ci0, mask0, jax.random.PRNGKey(0))
float(s)
print(f"{VARIANT} ok compile={dt_c:.1f}s step={time.time()-t0:.3f}s",
      flush=True)
