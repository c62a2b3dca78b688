"""Attribute per-op cost inside one whisper-large-v3 encoder layer on v5e.

Times a 32-iteration scan of a single layer with components ablated:
full, attention-kernel->identity, whole-attn-block->skip, gelu->identity,
FFN->skip, layer_norms->skip.  Differences attribute per-layer cost.
"""

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
from desta25_audio_tpu.models import whisper as jw
from desta25_audio_tpu.ops.core import gelu, layer_norm, linear
from desta25_audio_tpu.ops.enc_attention import packed_encoder_attention
from desta25_audio_tpu.utils.fast_init import random_tree_like

B, T, LAYERS_PER_RUN = 8, 1500, 32
H = 20


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def make_layer(mode):
    def attn_block(p, x):
        q = linear(p["q"], x)
        k = linear(p["k"], x)
        v = linear(p["v"], x)
        if mode == "attn_identity":
            out = q
        else:
            out = packed_encoder_attention(q, k, v, H)
        return linear(p["o"], out)

    def layer(p, x):
        if mode == "no_ln":
            a_in = x
        else:
            a_in = layer_norm(p["ln1"], x)
        if mode != "no_attn_block":
            x = x + attn_block(p["attn"], a_in)
        if mode != "no_ffn":
            h = x if mode == "no_ln" else layer_norm(p["ln2"], x)
            h1 = linear(p["fc1"], h)
            if mode != "no_gelu":
                h1 = gelu(h1)
            x = x + linear(p["fc2"], h1)
        return x

    return layer


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    ep = random_tree_like(
        jax.random.PRNGKey(0),
        lambda k: jw.init_whisper_encoder(k, enc_cfg, dtype=jnp.bfloat16))
    p0 = jax.tree.map(lambda a: a[0], ep["layers"])
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1280),
                           jnp.bfloat16)
    jax.block_until_ready((p0, x0))

    modes = ("full", "attn_identity", "no_attn_block", "no_gelu",
             "no_ffn", "no_ln")
    fns = {}
    for mode in modes:
        layer = make_layer(mode)

        def many(p, x, layer=layer):
            def body(h, i):
                h = layer(p, h + (i * 1e-6).astype(h.dtype))
                # keep magnitudes bounded across 32 applications
                return (h * 0.5).astype(h.dtype), None
            h, _ = jax.lax.scan(body, x,
                                jnp.arange(LAYERS_PER_RUN, dtype=jnp.float32))
            return jnp.sum(h.astype(jnp.float32))
        f = jax.jit(many)
        t0 = time.time()
        float(f(p0, x0))
        print(f"{mode}: compile {time.time()-t0:.0f}s", flush=True)
        fns[mode] = f
    for f in fns.values():
        float(f(p0, x0))
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    res = {}
    for mode, f in fns.items():
        samples = []
        for _ in range(6):
            t0 = time.time()
            float(f(p0, x0))
            samples.append((time.time() - t0 - rtt) / LAYERS_PER_RUN)
        res[mode] = sorted(samples)[len(samples) // 2]
        print(f"{mode:14s} med {res[mode]*1e3:6.3f} ms/layer  "
              + " ".join(f"{s*1e3:.2f}" for s in samples))
    full = res["full"]
    print(f"\nattribution (full {full*1e3:.2f} ms):")
    print(f"  attention kernel : {(full-res['attn_identity'])*1e3:6.3f}")
    print(f"  attn block total : {(full-res['no_attn_block'])*1e3:6.3f}")
    print(f"  gelu             : {(full-res['no_gelu'])*1e3:6.3f}")
    print(f"  ffn total        : {(full-res['no_ffn'])*1e3:6.3f}")
    print(f"  layer_norms      : {(full-res['no_ln'])*1e3:6.3f}")


if __name__ == "__main__":
    main()
