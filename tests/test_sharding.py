"""Multi-device semantics on the 8-way virtual CPU mesh: tensor-parallel
LLM forward equals the unsharded result; data+tensor-parallel train step
compiles, runs, and keeps gradients replicated."""

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


def test_tp_forward_matches_unsharded(rng):
    cfg = llm_config_for("test/llama-dryrun")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(4, 12)).astype(np.int32)
    ref, _, _ = jllm.llm_apply(params, cfg, input_ids=jnp.asarray(ids))
    ref = np.asarray(ref)

    mesh = make_mesh(n_data=2, n_model=4)
    with use_mesh(mesh):
        specs = llm_partition_specs(params)
        sharded = apply_sharding(params, specs)
        batch_sharding = NamedSharding(mesh, P("data", None))
        dids = jax.device_put(jnp.asarray(ids), batch_sharding)

        @jax.jit
        def fwd(p, x):
            logits, _, _ = jllm.llm_apply(p, cfg, input_ids=x)
            return logits

        got = np.asarray(fwd(sharded, dids))
    assert np.max(np.abs(got - ref)) < 1e-3

    # weights must actually be distributed: a wq shard lives on 4 devices
    wq = sharded["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8 or \
        wq.sharding.spec == P(None, None, "model")


def test_dp_tp_train_step(rng, tmp_path):
    """Full DeSTA train step under a (2 data, 4 model) mesh."""
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
    mesh = make_mesh(n_data=2, n_model=4)

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
        optimizer = make_optimizer(OptimizerConfig(
            lr=1e-3, warmup_steps=1, total_steps=10))
        opt_state = optimizer.init(trainable)
        step = make_train_step(cfg, optimizer)

        dbatch = {
            k: jax.device_put(
                jnp.asarray(v),
                NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
            for k, v in batch_np.items()
        }
        losses = []
        new_trainable = trainable
        for _ in range(3):  # step 0 has lr=0 (warmup), so run a few
            new_trainable, opt_state, metrics = step(
                new_trainable, frozen, opt_state, dbatch)
            losses.append(float(metrics["lm_loss"]))

    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    # trainable params stay replicated (no accidental sharding drift)
    leaf = jax.tree.leaves(new_trainable)[0]
    assert leaf.sharding.is_fully_replicated

def test_sequence_parallel_forward_matches_unsharded(rng):
    """sequence_parallel=True: same logits, residual stream actually
    seq-sharded over the "model" axis (Megatron SP semantics)."""
    cfg = llm_config_for("test/llama-dryrun")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(4, 16)).astype(np.int32)
    ref, _, ref_hidden = jllm.llm_apply(params, cfg,
                                        input_ids=jnp.asarray(ids),
                                        return_hidden=True)
    ref, ref_hidden = np.asarray(ref), np.asarray(ref_hidden)

    mesh = make_mesh(n_data=2, n_model=4)
    with use_mesh(mesh):
        sharded = apply_sharding(params, llm_partition_specs(params))
        dids = jax.device_put(jnp.asarray(ids),
                              NamedSharding(mesh, P("data", None)))

        @jax.jit
        def fwd(p, x):
            logits, _, hidden = jllm.llm_apply(
                p, cfg, input_ids=x, return_hidden=True,
                sequence_parallel=True)
            return logits, hidden

        logits, hidden = fwd(sharded, dids)
        got, got_hidden = np.asarray(logits), np.asarray(hidden)
    assert np.max(np.abs(got - ref)) < 1e-3
    assert np.max(np.abs(got_hidden - ref_hidden)) < 1e-3


def test_sequence_parallel_train_step_matches(rng):
    """Train-step loss with sequence_parallel=True equals the plain
    dp+tp loss on the same batch (fresh params both times)."""
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
    mesh = make_mesh(n_data=2, n_model=4)

    B, L, N, S = 4, 64, 4, 16000
    ids = rng.integers(0, 500, size=(B, L)).astype(np.int32)
    labels = ids.copy()
    labels[:, :L // 2] = -100
    kind = np.zeros((B, L), np.int32)
    kind[:, 4:4 + cfg.prompt_size] = 1
    pos = np.zeros((B, L), np.int32)
    pos[:, 4:4 + cfg.prompt_size] = np.arange(cfg.prompt_size)
    batch_np = {
        "input_ids": ids,
        "attention_mask": np.ones((B, L), np.int32),
        "labels": labels,
        "audio": rng.standard_normal((N, S)).astype(np.float32) * 0.1,
        "trans_ids": np.zeros((N, 8), np.int32),
        "trans_mask": np.zeros((N, 8), np.int32),
        "kind": kind, "aidx": np.zeros((B, L), np.int32), "pos": pos,
    }

    losses = {}
    # one init serves both arms; per-arm deep copies keep the train
    # step's donation away from model.params (apply_sharding is a no-op
    # copy-wise when the spec matches the current placement)
    model = DeSTA25AudioModel(cfg, seed=0)
    for sp in (False, True):
        with use_mesh(mesh):
            trainable, frozen = jax.tree.map(jnp.array,
                                             model.split_params())
            frozen = {
                "llm": apply_sharding(frozen["llm"],
                                      llm_partition_specs(frozen["llm"])),
                "whisper": apply_sharding(
                    frozen["whisper"],
                    whisper_partition_specs(frozen["whisper"])),
            }
            trainable = apply_sharding(trainable,
                                       replicated_specs(trainable))
            optimizer = make_optimizer(OptimizerConfig(
                lr=1e-3, warmup_steps=1, total_steps=10))
            opt_state = optimizer.init(trainable)
            step = make_train_step(cfg, optimizer, sequence_parallel=sp)
            dbatch = {
                k: jax.device_put(
                    jnp.asarray(v),
                    NamedSharding(mesh,
                                  P("data", *([None] * (v.ndim - 1)))))
                for k, v in batch_np.items()
            }
            _, _, metrics = step(trainable, frozen, opt_state, dbatch)
            losses[sp] = float(metrics["lm_loss"])
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 1e-3, losses


def test_orca_fsdp_train_step(rng):
    """ORCA hybrid with deep injection trains under dp+tp with ZeRO-3
    fsdp-sharded trainables — the fit strategy docs/perf_roofline.md §4
    prescribes for the 8B ORCA flagship (9.1 GB xattn params + grads
    cannot replicate per chip).  Loss must match the unsharded step."""
    from desta25_audio_tpu import DeSTA25AudioModel
    from desta25_audio_tpu.parallel.sharding import (
        fsdp_partition_specs,
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
        connector_mode="orca_hybrid",
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        dtype="float32")

    B, L, K = 4, 48, cfg.orca_global_num_tokens
    ids = rng.integers(0, 500, size=(B, L)).astype(np.int32)
    labels = ids.copy()
    labels[:, :L // 2] = -100
    kind = np.zeros((B, L), np.int32)
    kind[:, 2:2 + K] = 1
    kind[:, 2 + K:2 + K + 3] = 2
    aidx = np.zeros((B, L), np.int32)
    for b in range(B):
        aidx[b, 2:2 + K + 3] = b
    pos = np.zeros((B, L), np.int32)
    pos[:, 2:2 + K] = np.arange(K)
    pos[:, 2 + K:2 + K + 3] = np.arange(3)
    batch_np = {
        "input_ids": ids,
        "attention_mask": np.ones((B, L), np.int32),
        "labels": labels,
        "audio": (0.1 * rng.standard_normal((B, 16000))
                  ).astype(np.float32),
        "trans_ids": rng.integers(10, 200, size=(B, 8)).astype(np.int32),
        "trans_mask": np.ones((B, 8), np.int32),
        "kind": kind, "aidx": aidx, "pos": pos,
    }

    losses = {}
    shard_counts = {}
    # one init serves both arms; per-arm deep copies keep the train
    # step's donation away from model.params
    model = DeSTA25AudioModel(cfg, seed=0)
    for on_mesh in (False, True):
        optimizer = make_optimizer(OptimizerConfig(
            lr=1e-3, warmup_steps=1, total_steps=10))
        step = make_train_step(cfg, optimizer)
        trainable, frozen = jax.tree.map(jnp.array,
                                         model.split_params())
        if not on_mesh:
            opt_state = optimizer.init(trainable)
            _, _, metrics = step(trainable, frozen, opt_state,
                                 {k: jnp.asarray(v)
                                  for k, v in batch_np.items()})
            losses[on_mesh] = float(metrics["loss"])
            continue
        mesh = make_mesh(n_data=2, n_model=4)
        with use_mesh(mesh):
            frozen = {
                "llm": apply_sharding(frozen["llm"],
                                      llm_partition_specs(frozen["llm"])),
                "whisper": apply_sharding(
                    frozen["whisper"],
                    whisper_partition_specs(frozen["whisper"])),
            }
            specs = fsdp_partition_specs(trainable, min_size=128)
            trainable = apply_sharding(trainable, specs)
            shard_counts["in"] = sum(
                1 for x in jax.tree.leaves(trainable)
                if not x.sharding.is_fully_replicated)
            opt_state = optimizer.init(trainable)
            dbatch = {
                k: jax.device_put(
                    jnp.asarray(v),
                    NamedSharding(mesh,
                                  P("data", *([None] * (v.ndim - 1)))))
                for k, v in batch_np.items()
            }
            new_tr, _, metrics = step(trainable, frozen, opt_state, dbatch)
            losses[on_mesh] = float(metrics["loss"])
            shard_counts["out"] = sum(
                1 for x in jax.tree.leaves(new_tr)
                if not x.sharding.is_fully_replicated)
    assert shard_counts["in"] > 0, "nothing fsdp-sharded at dryrun scale"
    assert shard_counts["out"] == shard_counts["in"]
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 1e-3, losses
