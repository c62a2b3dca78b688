"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the SURVEY §4 rebuild plan: multi-device semantics are tested on CPU
with ``xla_force_host_platform_device_count`` — "multi-node without a
cluster".
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (tunneled TPU) — tests must run on
# the virtual CPU mesh unless explicitly opted onto hardware.
if os.environ.get("DESTA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

if os.environ.get("DESTA_TEST_TPU") != "1":
    # Something in the sandbox pins jax_platforms to "axon,cpu" regardless
    # of the env var; override the config directly before any backend
    # initializes.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache — XLA CPU compiles of scanned towers dominate
# test wall-clock otherwise (CPU entries feature-keyed: see
# utils/compilation_cache).  cache_everything: profiling one spec-serving
# test showed 47 small (~0.2 s) CPU compiles = ~10 s/test never cached
# under the default 1 s threshold; across the suite that is minutes of
# re-compiling identical engine/decode programs every run.
from desta25_audio_tpu.utils.compilation_cache import (  # noqa: E402
    setup_compilation_cache,
)

setup_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    cache_everything=True)


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same stream regardless of
    # execution order (a session-scoped generator made tolerances flaky)
    return np.random.default_rng(0)
