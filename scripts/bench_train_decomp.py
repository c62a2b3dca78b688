"""Training-step roofline decomposition (VERDICT r2 weak #4).

Breaks the flagship 1.5 s/step (b12, seq300, whisper-large-v3 bf16 +
frozen int8 8B + 6L Q-Former f32, remat, adafactor) into measured
components, each in its own scan-amortized jit:

  1. perception forward only (mel + encoder + qformer) — the encoder is
     FROZEN AND FEEDS ONLY THE CONNECTOR, so training never
     backpropagates into it: its cost is one forward.
  2. LLM forward (skip_head) at [B, T] with the dequant-dot int8 path.
  3. full loss forward (perception + splice + LLM + chunked CE).
  4. loss fwd + bwd (jax.grad over the connector).
  5. full train step (grad + adafactor update, donated).

Against bounds: LLM fwd ~= 2*P*T FLOPs at the 192 TF/s dequant-dot
measured peak; bwd-through-activations ~= 2x fwd + remat recompute.

Run on TPU: python scripts/bench_train_decomp.py
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

ITERS = 4
B, L = 12, 300


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def timed(name, fn, *args, rtt=0.0, iters=ITERS):
    def many(*a):
        def body(c, i):
            return c + fn(i, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    f = jax.jit(many)
    t0 = time.time()
    float(f(*args))
    cs = time.time() - t0
    for _ in range(2):
        float(f(*args))
    best = None
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        dt = (time.time() - t0 - rtt) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best*1e3:8.1f} ms   (compile {cs:.0f}s)")
    return best


def main():
    from desta25_audio_tpu.train.bench_utils import (
        build_flagship_train_setup,
        synth_train_batch,
    )
    from desta25_audio_tpu.train.step import _forward

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    cfg, step, trainable, frozen, opt_state, batch = \
        build_flagship_train_setup(batch_size=B, seq_len=L)
    jax.block_until_ready((trainable, frozen))
    print("setup done", file=sys.stderr)

    from desta25_audio_tpu.models.perception import perception_apply
    from desta25_audio_tpu.audio.mel import log_mel

    def perception_fwd(i, tr, fr, batch):
        params = {**fr, "connector": tr["connector"]}
        mel = log_mel(batch["audio"] + i * 1e-6,
                      cfg.encoder_config.num_mel_bins,
                      layout="btm").astype(jnp.bfloat16)
        feats, _ = perception_apply(params, mel, cfg)
        return jnp.sum(feats.astype(jnp.float32))

    timed("perception fwd (mel+enc+qf)", perception_fwd, trainable,
          frozen, batch, rtt=rtt)

    from desta25_audio_tpu.models import llm as jllm

    def llm_fwd(i, fr, batch):
        embeds = jllm.embed_tokens(fr["llm"], batch["input_ids"])
        _, _, hidden = jllm.llm_apply(
            fr["llm"], cfg.llm_config,
            inputs_embeds=embeds + i * 1e-6,
            attention_mask=batch["attention_mask"],
            skip_head=True, return_hidden=True, remat=True, w8a8=False)
        return jnp.sum(hidden.astype(jnp.float32))

    timed("LLM fwd (skip_head, remat)", llm_fwd, frozen, batch, rtt=rtt)

    def loss_fwd(i, tr, fr, batch):
        b2 = dict(batch)
        b2["audio"] = batch["audio"] + i * 1e-6
        loss, _ = _forward({**fr, **tr}, b2, cfg, remat=True,
                           training=False)
        return loss

    timed("full loss fwd", loss_fwd, trainable, frozen, batch, rtt=rtt)

    def loss_bwd(i, tr, fr, batch):
        b2 = dict(batch)
        b2["audio"] = batch["audio"] + i * 1e-6

        def lf(t):
            loss, _ = _forward({**fr, **t}, b2, cfg, remat=True,
                               training=True)
            return loss

        g = jax.grad(lf)(tr)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(g))

    timed("loss fwd+bwd (grad connector)", loss_bwd, trainable, frozen,
          batch, rtt=rtt)

    # full step timing (donated; fresh state per call, so time manually)
    t0 = time.time()
    tr, opt, m = step(trainable, frozen, opt_state, batch)
    float(m["lm_loss"])
    print(f"full step compile+run {time.time()-t0:.0f}s", file=sys.stderr)
    for _ in range(2):
        tr, opt, m = step(tr, frozen, opt, batch)
        float(m["lm_loss"])
    best = None
    for _ in range(4):
        t0 = time.time()
        tr, opt, m = step(tr, frozen, opt, batch)
        float(m["lm_loss"])
        dt = time.time() - t0 - rtt
        best = dt if best is None else min(best, dt)
    print(f"{'full train step':34s} {best*1e3:8.1f} ms")

    # bounds
    P = 8.03e9
    T = B * L
    fwd_tf = 2 * P * T / 1e12
    print(f"\nbounds: LLM fwd {fwd_tf:.0f} TF -> "
          f"{fwd_tf/192*1000:.0f} ms @192TF/s dequant-dot peak; "
          f"bwd ~2x + remat recompute ~1x -> "
          f"{3*fwd_tf/192*1000:.0f} ms LLM total")
    enc_tf = 18.0 * B / 8
    print(f"encoder fwd {enc_tf:.0f} TF -> {enc_tf/125*1000:.0f} ms at "
          f"the measured 125 TF/s encoder rate")


if __name__ == "__main__":
    main()
