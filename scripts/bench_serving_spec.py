"""Speculative serving upside proof (VERDICT r2 #2).

Engine-shaped comparison of plain decode ticks vs speculative-verify
ticks (serve/engine._spec_steps math) on two workloads at 8 slots:

- "repetitive": weights scaled so greedy output falls into short cycles
  (the regime transcription echo / JSON / lists live in) — the bigram
  drafter should accept ~Kd tokens/step;
- "random": ordinary random weights whose greedy continuations carry no
  n-gram structure — acceptance ~1, the worst case.

Reports tok/s for both engines on both workloads plus measured
acceptance.  Done-bar from the verdict: >=1.3x on the repetitive
workload, no regression beyond the known ~5% verify overhead on random.

Run on TPU: python scripts/bench_serving_spec.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.generate.speculative import ngram_propose
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.models.llm import _head_logits, rms_norm
from desta25_audio_tpu.ops.fused_decode import fused_verify_layers
from desta25_audio_tpu.ops.quant import quantize_llm_params
from desta25_audio_tpu.utils.fast_init import random_tree_like

B = 8
K = 8           # steps per tick
KD = 4          # draft+verify width
T_MAX = 384
N_TICKS = 6     # ticks per timing rep


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def build_params(scale):
    cfg = llm_config_for("DeSTA-ntu/Llama-3.1-8B-Instruct")
    qshape = jax.eval_shape(
        lambda k: quantize_llm_params(
            jllm.init_llm(k, cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    lp = random_tree_like(jax.random.PRNGKey(2), lambda k: qshape,
                          scale=scale)
    return cfg, lp


def _sampler_args(sampled):
    """Per-row sampling settings for the sampled-workload variant: the
    regime a temperature-sampled chat deployment runs (temp 0.7,
    nucleus 0.9)."""
    temp = jnp.full((B,), 0.7, jnp.float32)
    top_p = jnp.full((B,), 0.9, jnp.float32)
    ds = jnp.full((B,), bool(sampled))
    return temp, top_p, ds


def plain_tick(cfg, sampled=False):
    from desta25_audio_tpu.generate.decode import sample_token_dynamic
    t_idx = jnp.arange(T_MAX)
    temp, top_p, ds = _sampler_args(sampled)

    def tick(params, cache, toks, ci, mask, key):
        def body(carry, s):
            cur, cache, ci, mask = carry
            step_mask = mask | (t_idx[None, :] == ci[:, None]
                                ).astype(jnp.int32)
            lg, cache, _ = jllm.llm_apply(
                params, cfg, input_ids=cur[:, None],
                attention_mask=step_mask, positions=ci[:, None],
                cache=cache, cache_index=ci)
            nxt = sample_token_dynamic(
                lg[:, -1].astype(jnp.float32),
                jax.random.fold_in(key, s), temp, top_p, ds)
            return (nxt, cache, ci + 1, step_mask), nxt

        (cur, cache, ci, mask), outs = jax.lax.scan(
            body, (toks, cache, ci, mask), jnp.arange(K))
        # every plain step emits exactly one token per slot
        return cache, cur, ci, mask, jnp.sum(outs), jnp.float32(B * K)

    return jax.jit(tick, donate_argnums=(1,))


def spec_tick(cfg, sampled=False):
    from desta25_audio_tpu.generate.decode import sample_token_dynamic
    t_idx = jnp.arange(T_MAX)
    jidx = jnp.arange(KD)[None, :]
    temp, top_p, ds = _sampler_args(sampled)

    def tick(params, cache, toks, ci, mask, hist, hlen, key):
        full_mask = mask | (t_idx[None, :] >= 64).astype(jnp.int32)

        def body(carry, s):
            cur, cache, ci, hist, hlen = carry
            draft = ngram_propose(hist, hlen, KD - 1)
            toks_k = jnp.concatenate([cur[:, None], draft], axis=1)
            posn = ci[:, None] + jidx
            embeds = params["embed"][toks_k]
            hidden, cache = fused_verify_layers(
                params, cfg, embeds, full_mask, posn, cache, ci)
            hidden = rms_norm(params["norm"], hidden, cfg.rms_norm_eps)
            lg = _head_logits(params, cfg, hidden)
            g = jnp.argmax(lg, -1).astype(jnp.int32)
            if sampled:
                # token-matching coupling (serve/engine._spec_steps):
                # all B*KD positions in ONE batched sampler pass
                drawn = sample_token_dynamic(
                    lg.astype(jnp.float32).reshape(B * KD, -1),
                    jax.random.fold_in(key, s),
                    jnp.repeat(temp, KD), jnp.repeat(top_p, KD),
                    jnp.repeat(ds, KD))
                g = drawn.reshape(B, KD)
            match = (toks_k[:, 1:] == g[:, :-1]).astype(jnp.int32)
            m = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
            m = jnp.minimum(m, T_MAX - KD - ci)  # freeze near cache end
            m = jnp.maximum(m, 0)
            hist = jax.vmap(
                lambda b, v, i: jax.lax.dynamic_update_slice(b, v, (i,))
            )(hist, g, hlen)
            nxt = jnp.take_along_axis(
                g, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
            return (nxt, cache, ci + m, hist, hlen + m), (jnp.sum(g),
                                                          jnp.sum(m))

        (cur, cache, ci, hist, hlen), (chk, ms) = jax.lax.scan(
            body, (toks, cache, ci, hist, hlen), jnp.arange(K))
        return (cache, cur, ci, hist, hlen, jnp.sum(chk),
                jnp.sum(ms).astype(jnp.float32))

    return jax.jit(tick, donate_argnums=(1,))


def run(workload, scale, rtt, sampled=False, head_sharpen=1.0):
    cfg, lp = build_params(scale)
    if head_sharpen != 1.0:
        # scale ONLY the lm_head: argmax (the greedy trajectory) is
        # unchanged, but the sampled distribution sharpens to the peaked
        # regime real text lives in (p(top1) ~ 0.9) — tiny random weights
        # otherwise emit near-uniform 128k-way logits that no sample ever
        # matches, which says nothing about real acceptance
        lh = dict(lp["lm_head"])
        lh["s"] = lh["s"] * head_sharpen
        lp = dict(lp, lm_head=lh)
    hcap = T_MAX + K * KD + 8
    rng = np.random.default_rng(0)

    def fresh_state():
        cache = jllm.init_kv_cache(cfg, B, T_MAX, dtype=jnp.bfloat16)
        ci0 = jnp.full((B,), 64, jnp.int32)
        mask0 = jnp.tile((jnp.arange(T_MAX)[None, :] < 64
                          ).astype(jnp.int32), (B, 1))
        toks0 = jnp.asarray(rng.integers(2, 1000, size=(B,)), jnp.int32)
        # seed histories with a 64-token context; for the repetitive
        # workload the model's own (cyclic) continuation will extend it
        hist0 = np.zeros((B, hcap), np.int32)
        hist0[:, :64] = rng.integers(2, 1000, size=(B, 64))
        hlen0 = np.full((B,), 64, np.int32)
        return (cache, toks0, ci0, mask0, jnp.asarray(hist0),
                jnp.asarray(hlen0))

    results = {}
    # Both engines sync once per tick (the real engine's cadence): the
    # per-tick emitted-token count is force-fetched host-side.
    # plain
    f = plain_tick(cfg, sampled)
    key = jax.random.PRNGKey(7)
    cache, toks0, ci0, mask0, _, _ = fresh_state()
    out = f(lp, cache, toks0, ci0, mask0, key)
    float(out[4])  # compile
    best = None
    for _ in range(3):
        cache, toks0, ci0, mask0, _, _ = fresh_state()
        st = (cache, toks0, ci0, mask0)
        t0 = time.time()
        tokens = 0.0
        for _t in range(N_TICKS):
            c, cur, cin, mk, s, n = f(lp, *st, jax.random.fold_in(key, _t))
            st = (c, cur, cin, mk)
            tokens += float(n)
        dt = time.time() - t0 - rtt * N_TICKS
        if best is None or dt < best[0]:
            best = (dt, tokens)
    results["plain_tok_s"] = best[1] / best[0]

    # spec
    g = spec_tick(cfg, sampled)
    cache, toks0, ci0, mask0, hist0, hlen0 = fresh_state()
    out = g(lp, cache, toks0, ci0, mask0, hist0, hlen0, key)
    float(out[5])  # compile
    accepted_probe = None
    best = None
    for rep in range(3):
        cache, toks0, ci0, mask0, hist0, hlen0 = fresh_state()
        st = (cache, toks0, ci0, mask0, hist0, hlen0)
        t0 = time.time()
        tokens = 0.0
        for _t in range(N_TICKS):
            c, cur, cin, hi, hl, chk, ms = g(
                lp, st[0], st[1], st[2], st[3], st[4], st[5],
                jax.random.fold_in(key, 100 + _t))
            st = (c, cur, cin, st[3], hi, hl)
            tokens += float(ms)
        dt = time.time() - t0 - rtt * N_TICKS
        if best is None or dt / max(tokens, 1) < best[0] / max(best[1], 1):
            best = (dt, tokens)
        accepted_probe = tokens / (N_TICKS * K * B)
    results["spec_tok_s"] = best[1] / best[0]
    results["acceptance"] = accepted_probe
    print(f"{workload:12s} plain {results['plain_tok_s']:7.0f} tok/s   "
          f"spec {results['spec_tok_s']:7.0f} tok/s   "
          f"acceptance {results['acceptance']:.2f} tok/step   "
          f"speedup {results['spec_tok_s']/results['plain_tok_s']:.2f}x")
    return results


def main():
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms")
    # scale ~0: logits dominated by norm/embedding structure -> greedy
    # output collapses to short cycles (repetitive-text proxy)
    run("repetitive", 0.001, rtt)
    run("random", 0.02, rtt)
    # sampled variants: token-matching speculative sampling (temp 0.7 /
    # top-p 0.9 per row) vs a plain sampled tick.  rep+sampled sharpens
    # the head (x1000 — tiny-scale random weights emit ~0.001-magnitude
    # logits, flat at temp 0.7) so the sampled distribution is peaked
    # over the cyclic continuation, the regime transcription echo lives
    # in under sampling (p(top1) ~ 0.9); flat+sampled keeps the
    # near-uniform distribution (acceptance floor: every draw misses the
    # draft, measures pure overhead).
    run("rep+sampled", 0.001, rtt, sampled=True, head_sharpen=1000.0)
    run("flat+sampled", 0.001, rtt, sampled=True)
    run("rnd+sampled", 0.02, rtt, sampled=True)


if __name__ == "__main__":
    main()
