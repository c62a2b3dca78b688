"""A/B: whole-encoder-stack fused kernel vs the per-op encoder path.

Usage: python scripts/ab_enc_stack.py [B] [ITERS]   (default 8 20)

Measures whisper-large-v3 encoder forward (conv stem + 32 layers + taps
+ final LN) at flagship shapes with DESTA_FUSED_ENC_LAYERS=0 vs 1,
scan-amortized inside one jit (tunnel RTT subtracted).  AB_NANO=1 runs a
CPU interpret smoke first.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("AB_NANO") == "1":
    jax.config.update("jax_platforms", "cpu")
    os.environ["DESTA_FUSED_INTERPRET"] = "1"

import jax.numpy as jnp

from desta25_audio_tpu.config import WhisperConfig, whisper_config_for
from desta25_audio_tpu.models.whisper import (
    init_whisper_encoder,
    whisper_encoder_apply,
)
from desta25_audio_tpu.utils.fast_init import random_tree_like

TAPS = (7, 15, 23, 31)


def main():
    nano = os.environ.get("AB_NANO") == "1"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (2 if nano else 8)
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else (2 if nano else 20)
    if nano:
        # interpret-mode smoke: tiny tiling-compatible encoder
        cfg = WhisperConfig(
            model_id="test/ab-nano", num_mel_bins=80, d_model=128,
            encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=512, decoder_layers=1,
            decoder_attention_heads=2, decoder_ffn_dim=128,
            vocab_size=256, max_source_positions=64,
            max_target_positions=32, decoder_start_token_id=250,
            eos_token_id=251, no_timestamps_token_id=254,
            transcribe_token_id=253, first_language_token_id=252,
            num_language_tokens=1)
        taps = (0,)
    else:
        cfg = whisper_config_for("openai/whisper-large-v3")
        taps = TAPS

    eshape = jax.eval_shape(
        lambda k: init_whisper_encoder(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    ep = random_tree_like(jax.random.PRNGKey(1), lambda k: eshape,
                          scale=0.02)
    mel = (jax.random.normal(
        jax.random.PRNGKey(2), (B, cfg.expected_mel_frames,
                                cfg.num_mel_bins), jnp.bfloat16) * 0.3)
    jax.block_until_ready((ep, mel))
    print("init done", file=sys.stderr)

    x0 = jnp.zeros((), jnp.float32)
    f0 = jax.jit(lambda v: v + 1)
    float(f0(x0))
    t0 = time.time()
    for _ in range(5):
        float(f0(x0))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    def make_many():
        # fresh function object per mode: jax.jit shares its cache per
        # function object, so re-jitting the SAME ``many`` after an env
        # flip silently reuses the first mode's program (caught in the
        # nano smoke: fused=1 "compiled" in 0.0 s)
        def many(params, m0):
            def body(carry, i):
                m = m0 + (i.astype(m0.dtype) * 1e-4)
                final, tps = whisper_encoder_apply(params, m, cfg, taps)
                return carry + jnp.sum(final[:, 0, 0].astype(jnp.float32)) \
                    + jnp.sum(tps[:, :, 0, 0].astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(ITERS))
            return out

        return many

    for mode in ("0", "1"):
        os.environ["DESTA_FUSED_ENC_LAYERS"] = mode
        f = jax.jit(make_many())
        t0 = time.time()
        float(f(ep, mel))
        print(f"fused={mode}: compile+run {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            float(f(ep, mel))
            dt = time.time() - t0 - rtt
            best = dt if best is None else min(best, dt)
        ms = best / ITERS * 1e3
        aud = B * 30.0 / (best / ITERS)
        print(f"fused={mode} B={B}: {ms:.2f} ms/fwd  "
              f"{aud:.0f} audio-sec/s (encoder-only)")


if __name__ == "__main__":
    main()
