"""A/B encoder tap-extraction designs under the fused-FFN kernel regime.

After the fused FFN kernel landed, the cond-guarded DUS tap carry costs
~5.5 ms (enc+taps 140.2 vs notaps 134.75) — consistent with XLA copying
the whole [4, B, T, D] carry once per layer instead of updating in
place.  Candidates:

- cond_dus  : current (lax.cond around a dynamic_update_slice)
- dead_slot : carry [n_taps+1, ...]; every layer writes slot
              (hit ? tap_slot : n_taps) — no cond, always aliasable
- ys_gather : emit every layer's hidden via scan ys, gather 4 taps
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
from desta25_audio_tpu.models.whisper import _enc_layer_apply
from desta25_audio_tpu.ops.core import conv1d, gelu, layer_norm
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


def encoder_with_taps(params, mel, cfg, tap_ids, design):
    x = gelu(conv1d(params["conv1"], mel, stride=1, padding=1))
    x = gelu(conv1d(params["conv2"], x, stride=2, padding=1))
    x = x + params["embed_positions"][None, :x.shape[1]].astype(x.dtype)
    n_taps = len(tap_ids)
    tap_arr = jnp.asarray(tap_ids)
    H = cfg.encoder_attention_heads

    if design == "cond_dus":
        def body(carry, p_i):
            hidden, taps = carry
            p, i = p_i
            h = _enc_layer_apply(p, hidden, H)
            hit = tap_arr == i
            slot = jnp.argmax(hit)
            taps = jax.lax.cond(
                jnp.any(hit),
                lambda tp: jax.lax.dynamic_update_slice(
                    tp, h[None], (slot, 0, 0, 0)),
                lambda tp: tp, taps)
            return (h, taps), None
        taps0 = jnp.zeros((n_taps,) + x.shape, x.dtype)
        (x, taps), _ = jax.lax.scan(
            body, (x, taps0),
            (params["layers"], jnp.arange(cfg.encoder_layers)))
    elif design == "dead_slot":
        def body(carry, p_i):
            hidden, taps = carry
            p, i = p_i
            h = _enc_layer_apply(p, hidden, H)
            hit = tap_arr == i
            slot = jnp.where(jnp.any(hit), jnp.argmax(hit), n_taps)
            taps = jax.lax.dynamic_update_slice(
                taps, h[None], (slot, 0, 0, 0))
            return (h, taps), None
        taps0 = jnp.zeros((n_taps + 1,) + x.shape, x.dtype)
        (x, taps), _ = jax.lax.scan(
            body, (x, taps0),
            (params["layers"], jnp.arange(cfg.encoder_layers)))
        taps = taps[:n_taps]
    elif design == "ys_gather":
        def body(hidden, p):
            h = _enc_layer_apply(p, hidden, H)
            return h, h
        x, ys = jax.lax.scan(body, x, params["layers"])
        taps = ys[tap_arr]
    else:
        raise ValueError(design)
    final = layer_norm(params["ln_post"], x)
    return final, taps


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
    tap_ids = cfg.target_layer_ids

    fns, outs = {}, {}
    for design in ("cond_dus", "dead_slot", "ys_gather"):
        def many(ep, mel, design=design):
            def body(c, i):
                f, taps = encoder_with_taps(
                    ep, mel + (i * 1e-6).astype(mel.dtype), enc_cfg,
                    tap_ids, design)
                return c + jnp.sum(f.astype(jnp.float32)) \
                    + jnp.sum(taps.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(ITERS, dtype=jnp.float32))
            return acc
        f = jax.jit(many)
        t0 = time.time()
        float(f(ep, mel))
        print(f"{design}: compile {time.time()-t0:.0f}s", flush=True)
        fns[design] = f
        outs[design] = jax.jit(
            lambda ep, mel, design=design: encoder_with_taps(
                ep, mel, enc_cfg, tap_ids, design)[1])(ep, mel)

    base = outs["cond_dus"].astype(jnp.float32)
    for k, o in outs.items():
        print(f"{k}: max|d| = "
              f"{float(jnp.max(jnp.abs(o.astype(jnp.float32)-base))):.2e}")

    for f in fns.values():
        float(f(ep, mel))
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    for k, f in fns.items():
        samples = []
        for _ in range(6):
            t0 = time.time()
            float(f(ep, mel))
            samples.append((time.time() - t0 - rtt) / ITERS)
        best, med = min(samples), sorted(samples)[len(samples) // 2]
        print(f"{k:10s} best {best*1e3:7.2f} med {med*1e3:7.2f} ms  "
              + " ".join(f"{s*1e3:.1f}" for s in samples))


if __name__ == "__main__":
    main()
