"""ORCA-hybrid flagship train step on one v5e (VERDICT r2 weak #5).

Same geometry as the Q-Former flagship bench (b12, seq300, 8B int8
frozen, remat, adafactor) but with the ORCA hybrid connector + gated
cross-attention deep injection after every LLM layer — the per-layer
cross-attn activations ride the 8B backprop, changing the remat
economics.  Reports step time, samples/s, and HBM analysis (does it
fit?).

Run on TPU: python scripts/bench_train_orca.py [batch]
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

import numpy as np

from desta25_audio_tpu.train.bench_utils import (
    build_flagship_train_setup,
    hbm_analysis,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    f0 = jax.jit(lambda v: v + 1)
    float(f0(jnp.float32(0)))
    t0 = time.time()
    for _ in range(5):
        float(f0(jnp.float32(0)))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms  batch {B}")

    t0 = time.time()
    cfg, step, trainable, frozen, opt_state, batch = \
        build_flagship_train_setup(batch_size=B, seq_len=300,
                                   connector_mode="orca_hybrid")
    jax.block_until_ready((trainable, frozen))
    print(f"setup {time.time()-t0:.1f}s")
    print("hbm:", hbm_analysis(step, trainable, frozen, opt_state, batch))
    t0 = time.time()
    trainable, opt_state, m = step(trainable, frozen, opt_state, batch)
    loss = float(m["lm_loss"])
    print(f"compile+step {time.time()-t0:.0f}s loss={loss:.3f} "
          f"(aux keys: {sorted(m)})")
    for i in range(2):
        trainable, opt_state, m = step(trainable, frozen, opt_state,
                                       batch)
        print(f"warm {i}: " + " ".join(
            f"{k}={float(v):.3f}" for k, v in sorted(m.items())
            if getattr(v, 'ndim', 1) == 0))
    best = None
    for _ in range(4):
        t0 = time.time()
        trainable, opt_state, m = step(trainable, frozen, opt_state,
                                       batch)
        lm = float(m["lm_loss"])
        dt = time.time() - t0 - rtt
        print(f"timed: lm={lm:.3f} grad_norm={float(m['grad_norm']):.3f} "
              f"{dt*1e3:.0f} ms")
        best = dt if best is None else min(best, dt)
    assert np.isfinite(lm)
    print(f"ORCA train step: {best*1e3:.0f} ms -> "
          f"{B/best:.2f} samples/s/chip")


if __name__ == "__main__":
    main()
