"""A/B: ORCA deep-injection decode — in-kernel fused vs per-layer XLA.

Usage: python scripts/ab_orca_inject.py [B] [STEPS]   (default 8 32)

Flagship geometry (Qwen3-4B int8 tower + int8 gated cross-attn stack,
Ta=440 audio tokens).  Three modes:
  xla    — extra_layer_fn injection between XLA scan layers (the
           pre-round-4 production path, ~22 ms/step at b8)
  fused  — injection INSIDE the single-launch fused kernel
           (fused_injection spec; weights on the int8 ring, audio K/V
           through VMEM ring buffers)
  none   — fused kernel without injection (tower floor, for attribution)

Mirrors scripts/bench_decode_only.py's timing discipline: scan of STEPS
decode steps inside ONE jit, scalar fetch, RTT subtracted.  Kept small
(one prefill + one decode program per mode) — a nested scan-of-scans
A/B wedged the tunnel in round 3.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("AB_NANO") == "1":
    # something pins jax_platforms to "axon,cpu" regardless of the env
    # var (CLAUDE.md); force CPU before any backend touch or the nano
    # smoke run hangs in backend init whenever the tunnel is busy
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.models.orca import gated_cross_attention_apply
from desta25_audio_tpu.ops.quant import (
    quantize_llm_params,
    quantize_orca_cross_attns,
)
from desta25_audio_tpu.utils.fast_init import random_tree_like

CTX = 192
TA = 440


def _init_xattn_shapes(cfg, L):
    """eval_shape template for the quantized cross-attn stack."""
    from desta25_audio_tpu.ops.core import (
        init_layer_norm,
        init_linear,
        stack_layers,
    )

    def build(key):
        d = cfg.hidden_size
        layers = []
        for _ in range(L):
            key, kq, kk, kv, ko, kg1 = jax.random.split(key, 6)
            layers.append({
                "q": init_linear(kq, d, d),
                "k": init_linear(kk, d, d),
                "v": init_linear(kv, d, d),
                "o": init_linear(ko, d, d),
                "gate1": init_linear(kg1, d, d // 4),
                "gate2": {"w": jnp.zeros((d // 4, 1), jnp.float32),
                          "b": jnp.zeros((1,), jnp.float32)},
                "ln": init_layer_norm(d),
            })
        return quantize_orca_cross_attns({"layers": stack_layers(layers)})

    return jax.eval_shape(build, jax.random.PRNGKey(0))


def main():
    global TA, CTX
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # AB_NANO=1: CPU smoke run (interpret mode, nano shapes) — validate
    # the program BEFORE pointing it at the tunnel (a crashed remote
    # compile can wedge the chip claim for hours)
    nano = os.environ.get("AB_NANO") == "1"
    if nano:
        os.environ["DESTA_FUSED_INTERPRET"] = "1"
        TA, CTX, STEPS = 16, 8, 2
    llm_cfg = llm_config_for("test/llama-nano128" if nano
                             else "Qwen/Qwen3-4B")
    L = llm_cfg.num_hidden_layers
    D = llm_cfg.hidden_size
    H = llm_cfg.num_attention_heads

    qshape = jax.eval_shape(
        lambda k: quantize_llm_params(
            jllm.init_llm(k, llm_cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape,
                          scale=0.02)
    xshape = _init_xattn_shapes(llm_cfg, L)
    xp = random_tree_like(jax.random.PRNGKey(3), lambda k: xshape,
                          scale=0.02)
    ka = (jax.random.normal(jax.random.PRNGKey(4), (L, B, TA, D),
                            jnp.bfloat16) * 0.1)
    va = (jax.random.normal(jax.random.PRNGKey(5), (L, B, TA, D),
                            jnp.bfloat16) * 0.1)
    jax.block_until_ready((lp, xp, ka, va))
    print("init done", file=sys.stderr)

    x0 = jnp.zeros((), jnp.float32)
    f0 = jax.jit(lambda v: v + 1)
    float(f0(x0))
    t0 = time.time()
    for _ in range(5):
        float(f0(x0))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    Tmax = -(-(CTX + STEPS) // 128) * 128
    mask = jnp.ones((B, Tmax), jnp.int32)

    def prefill(params):
        cache = jllm.init_kv_cache(llm_cfg, B, Tmax, dtype=jnp.bfloat16)
        ids = jnp.ones((B, CTX), jnp.int32)
        logits, cache, _ = jllm.llm_apply(
            params, llm_cfg, input_ids=ids, attention_mask=mask,
            cache=cache, cache_index=0)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    def make_decode(mode):
        def decode_scan(params, xattn, inj_k, inj_v, tok, cache):
            extra = None
            fspec = None
            if mode == "xla":
                def extra(idx, h):
                    lpz = jax.tree.map(lambda a: a[idx], xattn["layers"])
                    return gated_cross_attention_apply(
                        lpz, h, None, H,
                        cached_kv=(inj_k[idx], inj_v[idx]))
            elif mode == "fused":
                fspec = dict(params=xattn, k=inj_k, v=inj_v, ta_real=TA,
                             heads=H, on=jnp.ones((B,), jnp.float32))

                def extra(idx, h):  # fallback only; never taken on TPU
                    return h

            def body(carry, t):
                tok, cache = carry
                lg, cache, _ = jllm.llm_apply(
                    params, llm_cfg, input_ids=tok[:, None],
                    attention_mask=mask,
                    positions=(CTX + t)[None, None]
                    + jnp.zeros((B, 1), jnp.int32),
                    cache=cache, cache_index=CTX + t,
                    extra_layer_fn=extra, fused_injection=fspec)
                nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
                return (nxt, cache), None

            (tok, cache), _ = jax.lax.scan(body, (tok, cache),
                                           jnp.arange(STEPS))
            return jnp.sum(tok), cache

        return jax.jit(decode_scan, donate_argnums=(5,))

    from desta25_audio_tpu.ops.fused_decode import fused_inject_supported
    from desta25_audio_tpu.ops.quant import is_quantized
    assert fused_inject_supported(xp, llm_cfg, TA), "inject kernel gated off"
    assert is_quantized(lp["layers"]["wq"]), "tower must be int8"

    pf = jax.jit(prefill)
    for mode in ("none", "xla", "fused"):
        dec = make_decode(mode)
        t0 = time.time()
        tok, cache = pf(lp)
        jax.block_until_ready(cache)
        float(dec(lp, xp, ka, va, tok, cache)[0])
        print(f"{mode}: compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        best = None
        for _ in range(3):
            tok, cache = pf(lp)
            jax.block_until_ready(cache)
            t0 = time.time()
            float(dec(lp, xp, ka, va, tok, cache)[0])
            dt = time.time() - t0 - rtt
            best = dt if best is None else min(best, dt)
        ms = best / STEPS * 1e3
        print(f"{mode:5s} B={B}: {ms:.2f} ms/step  {B*STEPS/best:.0f} tok/s")


if __name__ == "__main__":
    main()
