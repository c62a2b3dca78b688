"""Fast random parameter initialization for benchmarks / dry runs.

Proper per-layer initializers build an unrolled graph with hundreds of
random ops (32 distinct layers x ~10 leaves), which is slow to compile on a
remote-compile TPU and wasteful when the weights only need plausible
magnitudes (perf benchmarks, compile checks).  ``random_tree_like`` uses
``jax.eval_shape`` on the real init to get the exact tree structure, then
fills every leaf with one ``jax.random.normal`` — a ~N-op program for N
leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_tree_like(key, init_fn, scale: float = 0.02):
    """init_fn: key -> param tree (never executed; only shape-evaluated)."""
    shapes = jax.eval_shape(init_fn, key)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))

    @jax.jit
    def build(key_stack):
        out = []
        for i, leaf in enumerate(leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                x = (jax.random.normal(key_stack[i], leaf.shape, jnp.float32)
                     * scale).astype(leaf.dtype)
            elif leaf.dtype == jnp.int8:
                x = jax.random.randint(key_stack[i], leaf.shape, -127, 128,
                                       jnp.int32).astype(jnp.int8)
            else:
                x = jnp.zeros(leaf.shape, leaf.dtype)
            out.append(x)
        return jax.tree_util.tree_unflatten(treedef, out)

    return build(keys)
