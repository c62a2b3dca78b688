"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the SURVEY §4 rebuild plan: multi-device semantics are tested on CPU
with ``xla_force_host_platform_device_count`` — "multi-node without a
cluster".
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
