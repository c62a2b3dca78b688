"""In-context A/B: 32-layer encoder forward with old vs new attention kernel.

The isolated-kernel A/B (ab_enc_attn.py) showed 1.27 -> 0.91 ms/layer for
the software-pipelined head loop, but profile_perception barely moved on
the encoder.  This times whisper_encoder_apply itself with the kernel
swapped via monkeypatch.
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
from desta25_audio_tpu.ops import enc_attention as ea
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 10
B = 8


def kernel_old(q_ref, k_ref, v_ref, o_ref, *, heads, dh, t_kv, scale):
    """Round-2 head-major kernel (pre-pipeline), for the A/B."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    tkv = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], tkv), 1)
    valid = col < t_kv
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    v = jnp.where(vrow < t_kv, v, 0).astype(v.dtype)
    outs = []
    for h in range(heads):
        lo = h * dh
        s = jax.lax.dot_general(
            q[:, lo:lo + dh], k[:, lo:lo + dh], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(jnp.bfloat16), v[:, lo:lo + dh],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(o / den)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


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
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        prompt_size=64, dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    key = jax.random.PRNGKey(0)
    ep = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 3000, enc_cfg.num_mel_bins), jnp.bfloat16)
    jax.block_until_ready((ep, mel))

    kern_new = ea._kernel

    variants = {}
    for kname, kern in (("new", kern_new), ("old", kernel_old)):
        for bq in (256, 512):
            variants[f"{kname}@{bq}"] = (kern, bq)

    fns = {}
    outs = {}
    for name, (kern, bq) in variants.items():
        ea._kernel = kern
        orig_attn = ea.packed_encoder_attention

        def enc(ep, mel, eps):
            out, taps = jw.whisper_encoder_apply(
                ep, mel + eps.astype(mel.dtype), enc_cfg,
                cfg.target_layer_ids)
            return jnp.sum(out.astype(jnp.float32)), out

        def many(ep, mel):
            def body(c, i):
                s, _ = enc(ep, mel, jnp.float32(i) * 1e-6)
                return c + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc

        # block_q override: patch the default by wrapping
        def wrap(q, k, v, n_heads, block_q=None, interpret=False, _bq=bq,
                 _orig=orig_attn):
            return _orig(q, k, v, n_heads, _bq, interpret)
        ea.packed_encoder_attention = wrap
        jw.packed_encoder_attention = wrap  # in case of direct import
        t0 = time.time()
        f = jax.jit(many)
        float(f(ep, mel))
        print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
        fns[name] = f
        outs[name] = jax.jit(lambda ep, mel: enc(ep, mel,
                                                 jnp.float32(0.0))[1]
                             )(ep, mel)
        ea.packed_encoder_attention = orig_attn
    ea._kernel = kern_new

    base = outs["new@512"].astype(jnp.float32)
    for name, o in outs.items():
        d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - base)))
        print(f"{name}: max|d| vs new@512 = {d:.2e}")

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
        print(f"{name:9s} best {best*1e3:7.2f} med {med*1e3:7.2f} ms  "
              + " ".join(f"{s*1e3:.1f}" for s in samples))


if __name__ == "__main__":
    main()
