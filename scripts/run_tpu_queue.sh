#!/bin/bash
# Round-3/4 TPU measurement queue — run once the axon tunnel is healthy.
#
# Each step runs as its own process (per-process env flags; jit caches
# are per-process so DESTA_* A/Bs stay honest) with a LONG timeout:
# killing a python mid-remote-compile can wedge the tunnel for hours
# (CLAUDE.md), so the budget must cover a cold Mosaic compile (~5-15 min
# for the big fused kernels), not just the measured run.
#
# Logs land in /tmp/tpuq/<step>.log; a step that fails does not stop the
# queue (later steps are independent).

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p /tmp/tpuq

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout 2400 "$@" > "/tmp/tpuq/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ($((SECONDS - t0))s); tail:"
  tail -5 "/tmp/tpuq/$name.log"
}

# 0. health probe (trivial jit; 150 s bound is safe — nothing to wedge)
timeout 150 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128)))
print('TPU OK', float(y))" || { echo "TPU still wedged; aborting"; exit 1; }

# 1. in-kernel ORCA injection A/B (expected ~22 -> ~8-10 ms/step)
run orca_inject python scripts/ab_orca_inject.py 8 32

# 2. bf16 fused decode A/B (gate the bf16 branch if slower than XLA 592)
# NB: use `env VAR=… python` — `VAR=x run …` persists VAR after a bash
# *function* call and would contaminate later queue steps.
run bf16_xla env DESTA_FUSED_DECODE=0 python scripts/bench_bf16_decode.py
run bf16_fused env DESTA_FUSED_DECODE=1 python scripts/bench_bf16_decode.py

# 3. whole-encoder-stack kernel A/B (flip default only if it beats 1560)

# 4. serving load benches (ORCA, ORCA+spec, pipelined ticks)
run load_orca python scripts/bench_serving_load.py 8 48 --orca
run load_orca_spec python scripts/bench_serving_load.py 8 48 --orca --spec=4
run load_pipeline python scripts/bench_serving_load.py 8 48 --pipeline

# 5. driver bench
# run bench python bench.py  # run manually at end of round, after bench.py edits land

echo "=== queue done; logs in /tmp/tpuq/ ==="
