"""Pipeline parallelism (parallel/pipeline.py) on the 8-way virtual CPU
mesh: GPipe fill-drain forward equals the single-stage scan, gradients
flow through the schedule, and the full dp x tp x pp train step runs.

The reference has no model parallelism at all (SURVEY §2.7); these tests
pin the rebuild's own 3-D (data, model, pipe) composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from desta25_audio_tpu.config import DeSTA25Config, llm_config_for
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.parallel.mesh import make_mesh, use_mesh
from desta25_audio_tpu.parallel.sharding import (
    apply_sharding,
    llm_partition_specs,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _nano_setup(rng, B=4, T=24):
    cfg = llm_config_for("test/llama-dryrun")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[0, :5] = 0  # left padding exercises the per-micro masks
    return cfg, params, ids, jnp.asarray(mask)


def test_pp_forward_matches_unsharded(rng):
    cfg, params, ids, mask = _nano_setup(rng)
    ref, _, _ = jllm.llm_apply(params, cfg, input_ids=ids,
                               attention_mask=mask)
    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    with use_mesh(mesh):
        sharded = apply_sharding(params, llm_partition_specs(params))
        # the stacked layer axis must actually shard over "pipe"
        assert sharded["layers"]["wq"].sharding.spec[0] == "pipe"

        @jax.jit
        def fwd(p, i, m):
            out, _, _ = jllm.llm_apply(p, cfg, input_ids=i,
                                       attention_mask=m,
                                       pipeline_microbatches=2)
            return out

        got = fwd(sharded, ids, mask)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 1e-3


def test_pp_single_microbatch_and_remat(rng):
    """M=1 (degenerate schedule: pure fill/drain) and remat both keep
    parity."""
    cfg, params, ids, mask = _nano_setup(rng)
    ref, _, _ = jllm.llm_apply(params, cfg, input_ids=ids,
                               attention_mask=mask)
    mesh = make_mesh(n_data=4, n_model=1, n_pipe=2)
    with use_mesh(mesh):
        sharded = apply_sharding(params, llm_partition_specs(params))
        for m_, rm in ((1, False), (4, True)):
            got, _, _ = jax.jit(
                lambda p, i, a, m_=m_, rm=rm: jllm.llm_apply(
                    p, cfg, input_ids=i, attention_mask=a,
                    pipeline_microbatches=m_, remat=rm))(sharded, ids, mask)
            assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 1e-3


def test_pp_gradients_match(rng):
    """Gradients w.r.t. layer params and embeddings flow through the
    ppermute schedule and match the single-stage scan."""
    cfg, params, ids, mask = _nano_setup(rng)

    def loss(p, pp_micro):
        logits, _, _ = jllm.llm_apply(
            p, cfg, input_ids=ids, attention_mask=mask,
            pipeline_microbatches=pp_micro)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.roll(ids, -1, axis=1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(nll * mask)

    ref_grads = jax.grad(lambda p: loss(p, None))(params)
    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    with use_mesh(mesh):
        sharded = apply_sharding(params, llm_partition_specs(params))
        pp_grads = jax.jit(jax.grad(lambda p: loss(p, 2)))(sharded)
    ref_flat = jax.tree.leaves(ref_grads)
    pp_flat = jax.tree.leaves(pp_grads)
    assert len(ref_flat) == len(pp_flat)
    for g_ref, g_pp in zip(ref_flat, pp_flat):
        np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-5)


def test_dp_tp_pp_train_step(rng):
    """Full DeSTA train step under a (2 data, 2 model, 2 pipe) mesh with
    pipeline microbatching; loss matches the single-device step."""
    from desta25_audio_tpu import DeSTA25AudioModel
    from desta25_audio_tpu.parallel.sharding import (
        replicated_specs,
        whisper_partition_specs,
    )
    from desta25_audio_tpu.train.optimizer import (
        OptimizerConfig,
        make_optimizer,
    )
    from desta25_audio_tpu.train.step import make_train_step

    cfg = DeSTA25Config(
        llm_model_id="test/llama-dryrun",
        encoder_model_id="test/whisper-dryrun",
        connector_mode="qformer_1", qformer_num_hidden_layers=2,
        prompt_size=8, dtype="float32")
    model = DeSTA25AudioModel(cfg, seed=0)

    B, L, N, S = 4, 64, 4, 16000
    ids = rng.integers(0, 500, size=(B, L)).astype(np.int32)
    labels = ids.copy()
    labels[:, :L // 2] = -100
    kind = np.zeros((B, L), np.int32)
    kind[:, 4:4 + cfg.prompt_size] = 1
    aidx = np.zeros((B, L), np.int32)
    pos = np.zeros((B, L), np.int32)
    pos[:, 4:4 + cfg.prompt_size] = np.arange(cfg.prompt_size)
    batch_np = {
        "input_ids": ids,
        "attention_mask": np.ones((B, L), np.int32),
        "labels": labels,
        "audio": rng.standard_normal((N, S)).astype(np.float32) * 0.1,
        "trans_ids": np.zeros((N, 8), np.int32),
        "trans_mask": np.zeros((N, 8), np.int32),
        "kind": kind, "aidx": aidx, "pos": pos,
    }

    # single-device reference loss (one optimizer step, same seed)
    trainable0, frozen0 = model.split_params()
    optimizer = make_optimizer(OptimizerConfig(
        lr=1e-3, warmup_steps=1, total_steps=10))
    step_ref = make_train_step(cfg, optimizer)
    _, _, m_ref = step_ref(
        jax.tree.map(jnp.copy, trainable0), frozen0,
        optimizer.init(trainable0),
        {k: jnp.asarray(v) for k, v in batch_np.items()})
    ref_loss = float(m_ref["lm_loss"])

    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    with use_mesh(mesh):
        trainable, frozen = model.split_params()
        frozen = {
            "llm": apply_sharding(frozen["llm"],
                                  llm_partition_specs(frozen["llm"])),
            "whisper": apply_sharding(
                frozen["whisper"],
                whisper_partition_specs(frozen["whisper"])),
        }
        trainable = apply_sharding(trainable, replicated_specs(trainable))
        opt_state = optimizer.init(trainable)
        step = make_train_step(cfg, optimizer, pipeline_microbatches=2)
        dbatch = {
            k: jax.device_put(
                jnp.asarray(v),
                NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
            for k, v in batch_np.items()
        }
        losses = []
        new_trainable = trainable
        for _ in range(3):
            new_trainable, opt_state, metrics = step(
                new_trainable, frozen, opt_state, dbatch)
            losses.append(float(metrics["lm_loss"]))

    assert all(np.isfinite(l) for l in losses)
    assert abs(losses[0] - ref_loss) < 1e-3, (losses[0], ref_loss)
    assert losses[-1] < losses[0], losses
    leaf = jax.tree.leaves(new_trainable)[0]
    assert leaf.sharding.is_fully_replicated
