"""TPU-gated flagship training smoke (VERDICT r1 #2): whisper-large-v3 +
frozen int8 Llama-3.1-8B + 6L Q-Former train step must fit and run on one
v5e chip.  Opt in with DESTA_TEST_TPU=1 (tests default to the virtual CPU
mesh, conftest.py)."""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("DESTA_TEST_TPU") != "1",
    reason="flagship-scale train smoke runs on real TPU only "
           "(DESTA_TEST_TPU=1)")


def test_flagship_train_step_on_tpu():
    assert jax.devices()[0].platform == "tpu"
    from desta25_audio_tpu.train.bench_utils import (
        build_flagship_train_setup,
    )
    cfg, step, trainable, frozen, opt_state, batch = \
        build_flagship_train_setup(batch_size=4, seq_len=192,
                                   warmup_steps=0)
    losses = []
    for _ in range(2):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state,
                                             batch)
        losses.append(float(metrics["lm_loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm"]) > 0.0
    # same batch twice through an adafactor step: loss must move
    assert losses[1] != losses[0]
