"""Attribute the real engine's per-tick wall time (flagship 8B int8).

bench_serving_load.py measured ~204 ms/tick where the engine-shaped
program suggests ~82 (device) + ~35 (RTT) = ~117.  This splits one tick
into: host arg prep (np->device transfers), device program + fetch, and
host consume, plus times the jitted tick with pre-staged device args.

Run on TPU: python scripts/profile_engine_tick.py
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
sys.path.insert(0, "/root/repo/scripts")

from bench_serving_load import build_model, ContinuousBatchingEngine


def main():
    t0 = time.time()
    model = build_model()
    print(f"model init {time.time()-t0:.0f}s", file=sys.stderr)
    eng = ContinuousBatchingEngine(
        model, n_slots=8, max_ctx=256, max_new_tokens=512,
        ctx_bucket=128, steps_per_tick=8)

    from desta25_audio_tpu.audio.io import write_wav
    clip = (0.1 * np.random.default_rng(0).standard_normal(16000 * 30)
            ).astype(np.float32)
    p = "/tmp/prof_tick_clip.wav"
    write_wav(p, clip)
    msgs = [[{"role": "user", "content": "describe: <|AUDIO|>",
              "audios": [{"audio": p, "text": "speech"}]}]
            for _ in range(8)]
    eng.submit_many(msgs)
    eng.step()  # admit + first tick (compiles)
    eng.step()

    # phase timing over 10 ticks
    n = 10
    t_prep = t_exec = t_fetch = 0.0
    for _ in range(n):
        wp = eng.slot_pos.copy()
        t1 = time.time()
        args = (model.params["llm"], eng._inject_params, eng.cache,
                jnp.asarray(eng.cur_tok), jnp.asarray(eng.slot_rope),
                jnp.asarray(wp), jnp.asarray(eng.slot_mask),
                eng.inject_k, eng.inject_v, jnp.asarray(eng.inject_on),
                jnp.asarray(eng.slot_temp), jnp.asarray(eng.slot_top_p),
                jnp.asarray(eng.slot_sample), eng._next_key())
        jax.block_until_ready(
            [a for a in args[3:] if isinstance(a, jax.Array)])
        t2 = time.time()
        outs, eng.cache = eng._decode_jit(*args)
        t3 = time.time()
        outs_np = np.asarray(outs)
        t4 = time.time()
        t_prep += t2 - t1
        t_exec += t3 - t2
        t_fetch += t4 - t3
        # advance host state like the engine would
        for s in range(8):
            eng.slot_mask[s, wp[s]:wp[s] + 8] = 1
            eng.slot_pos[s] += 8
            eng.slot_rope[s] += 8
            eng.cur_tok[s] = int(outs_np[-1, s])
    print(f"arg prep+transfer {t_prep/n*1e3:7.1f} ms")
    print(f"dispatch          {t_exec/n*1e3:7.1f} ms")
    print(f"fetch outs        {t_fetch/n*1e3:7.1f} ms")
    print(f"tick total        {(t_prep+t_exec+t_fetch)/n*1e3:7.1f} ms")

    # device-only: pre-staged args, scan-amortized over 5 ticks
    def many(params, inject_params, cache, tok, rope, wp, mask, ik, iv,
             ion, te, tp, ds, key):
        # inject_params rides as a jit ARGUMENT (CLAUDE.md: never close a
        # jit over a big param tree — it bakes into the HLO)
        def body(carry, i):
            cache, tok, rope, wp = carry
            outs, cache = eng._decode_steps(
                params, inject_params, cache, tok, rope, wp, mask,
                ik, iv, ion, te, tp, ds, jax.random.fold_in(key, i))
            return (cache, outs[-1], rope + 8, wp + 8), None
        (cache, tok, _, _), _ = jax.lax.scan(
            body, (cache, tok, rope, wp), jnp.arange(5))
        return jnp.sum(tok), cache

    wp = eng.slot_pos.copy()
    f = jax.jit(many, donate_argnums=(2,))
    args = (model.params["llm"], eng._inject_params, eng.cache,
            jnp.asarray(eng.cur_tok),
            jnp.asarray(eng.slot_rope), jnp.asarray(wp),
            jnp.asarray(eng.slot_mask), eng.inject_k, eng.inject_v,
            jnp.asarray(eng.inject_on), jnp.asarray(eng.slot_temp),
            jnp.asarray(eng.slot_top_p), jnp.asarray(eng.slot_sample),
            eng._next_key())
    s, cache = f(*args)
    float(s)
    best = None
    for _ in range(3):
        args = (model.params["llm"], eng._inject_params, cache) + args[3:]
        t0 = time.time()
        s, cache = f(*args)
        float(s)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"device tick (scan of 5, amortized, incl 1 RTT): "
          f"{(best - 0.032)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()
