"""In-context A/B of the fused encoder FFN kernel (ops/enc_ffn.py):
full 32-layer encoder with DESTA_FUSED_ENC_FFN on vs off, plus block_m
sweep, on v5e."""

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
from desta25_audio_tpu.ops import enc_ffn as ef
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 10
B = 8


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    ep = random_tree_like(
        jax.random.PRNGKey(0),
        lambda k: jw.init_whisper_encoder(k, enc_cfg, dtype=jnp.bfloat16))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 3000, enc_cfg.num_mel_bins), jnp.bfloat16)
    jax.block_until_ready((ep, mel))

    def enc(ep, mel, eps):
        out, _ = jw.whisper_encoder_apply(
            ep, mel + eps.astype(mel.dtype), enc_cfg, cfg.target_layer_ids)
        return jnp.sum(out.astype(jnp.float32)), out

    variants = {"xla_ffn": ("0", None)}
    for bm in (256, 512, 1024, 1536):
        variants[f"fused@{bm}"] = ("1", bm)

    fns, outs = {}, {}
    orig = ef.encoder_ffn
    for name, (env, bm) in variants.items():
        os.environ["DESTA_FUSED_ENC_FFN"] = env
        if bm is not None:
            def wrap(x, w1, b1, w2, b2, block_m=512, interpret=False,
                     _bm=bm, _orig=orig):
                return _orig(x, w1, b1, w2, b2, _bm, interpret)
            ef.encoder_ffn = wrap
        else:
            ef.encoder_ffn = orig

        def many(ep, mel):
            def body(c, i):
                s, _ = enc(ep, mel, jnp.float32(i) * 1e-6)
                return c + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc
        f = jax.jit(many)
        t0 = time.time()
        float(f(ep, mel))
        print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
        fns[name] = f
        outs[name] = jax.jit(
            lambda ep, mel: enc(ep, mel, jnp.float32(0.0))[1])(ep, mel)
    ef.encoder_ffn = orig
    os.environ["DESTA_FUSED_ENC_FFN"] = "1"

    base = outs["xla_ffn"].astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(base)))
    for name, o in outs.items():
        d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - base)))
        print(f"{name}: max|d| vs xla = {d:.3e} (rel {d/scale:.2e})")

    for f in fns.values():
        float(f(ep, mel))
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    for name, f in fns.items():
        samples = []
        for _ in range(6):
            t0 = time.time()
            float(f(ep, mel))
            samples.append((time.time() - t0 - rtt) / ITERS)
        best, med = min(samples), sorted(samples)[len(samples) // 2]
        print(f"{name:12s} best {best*1e3:7.2f} med {med*1e3:7.2f} ms  "
              + " ".join(f"{s*1e3:.1f}" for s in samples))


if __name__ == "__main__":
    main()
