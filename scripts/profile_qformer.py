"""Sub-piece timing of the Q-Former connector on TPU."""

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

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.models.qformer import (
    _bert_attn_apply,
    init_qformer_connector,
    qformer_connector_apply,
)
from desta25_audio_tpu.ops.core import gelu, layer_norm, linear, mha
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 20


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
    float(f(*args))
    for _ in range(3):
        float(f(*args))
    rtt = measure_rtt()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        best = min(best, (time.time() - t0 - rtt) / ITERS)
    print(f"{name:28s} {best*1e3:8.2f} ms")
    return best


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        prompt_size=64, dtype="bfloat16")
    qcfg = cfg.qformer_config
    B, T, D = 8, 1500, 1280
    n_taps = 4
    key = jax.random.PRNGKey(0)
    conn = random_tree_like(
        key, lambda k: init_qformer_connector(k, cfg, dtype=jnp.bfloat16))
    taps = jax.random.normal(key, (n_taps, B, T, D), jnp.bfloat16)
    jax.block_until_ready((conn, taps))
    H = qcfg.num_attention_heads
    layers = conn["qformer"]["layers"]

    timed("full connector", lambda c, t, e: jnp.sum(
        qformer_connector_apply(c, t + e.astype(t.dtype), cfg)
        .astype(jnp.float32)), conn, taps)

    # cross K/V projections alone: 6 layers x 2 proj over [n_taps*B*T, D]
    def kv_only(ls, t, e):
        x = (t + e.astype(t.dtype)).reshape(-1, D)

        def body(c, p):
            k = linear(p["cross"]["k"], x)
            v = linear(p["cross"]["v"], x)
            s = jnp.sum(k.astype(jnp.float32)) + jnp.sum(
                v.astype(jnp.float32))
            return c + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), ls)
        return acc

    timed("cross K/V proj (6L)", kv_only, layers, taps)

    # one cross-attention (q=64) with in-scan kv proj, 6 layers
    q0 = jax.random.normal(key, (n_taps * B, 64, D), jnp.bfloat16)

    def cross_only(ls, q, t, e):
        kv = (t + e.astype(t.dtype)).reshape(n_taps * B, T, D)

        def body(h, p):
            return _bert_attn_apply(p["cross"], h, kv, H), None
        h, _ = jax.lax.scan(body, q, ls)
        return jnp.sum(h.astype(jnp.float32))

    timed("cross attn stack (6L)", cross_only, layers, q0, taps)

    # self-attention stack on the 64 queries only
    def self_only(ls, q, e):
        def body(h, p):
            return _bert_attn_apply(p["self"], h, h, H), None
        h, _ = jax.lax.scan(body, q + e.astype(q.dtype), ls)
        return jnp.sum(h.astype(jnp.float32))

    timed("self attn stack (6L)", self_only, layers, q0)

    # MLP stack on the 64 queries
    def mlp_only(ls, q, e):
        def body(h, p):
            inter = gelu(linear(p["inter"], h))
            out = linear(p["out"], inter)
            return layer_norm(p["out_ln"], out + h, 1e-12), None
        h, _ = jax.lax.scan(body, q + e.astype(q.dtype), ls)
        return jnp.sum(h.astype(jnp.float32))

    timed("mlp stack (6L)", mlp_only, layers, q0)

    # cross attention WITHOUT scan: unrolled 6 layers
    def cross_unrolled(ls, q, t, e):
        kv = (t + e.astype(t.dtype)).reshape(n_taps * B, T, D)
        h = q
        for i in range(qcfg.num_hidden_layers):
            p = jax.tree.map(lambda a: a[i], ls)
            h = _bert_attn_apply(p["cross"], h, kv, H)
        return jnp.sum(h.astype(jnp.float32))

    timed("cross attn unrolled (6L)", cross_unrolled, layers, q0, taps)


if __name__ == "__main__":
    main()
