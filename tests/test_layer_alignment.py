"""Checkpoint layer-count auto-reconfiguration (reference root-level
test_layer_alignment.py): loading an ORCA checkpoint trained with
orca_use_all_layers into a config with selected taps (or vice versa) must
reconfigure the connector from the checkpoint shapes instead of failing."""

import dataclasses

import numpy as np
import pytest

import jax

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config


@pytest.fixture()
def orca_cfg():
    return DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano6",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=1,
        orca_global_num_tokens=4,
        dtype="float32",
    )


def test_all_layers_ckpt_loads_into_selected_config(orca_cfg, tmp_path):
    # train-time config tapped ALL encoder layers
    all_cfg = dataclasses.replace(orca_cfg, orca_use_all_layers=True)
    src = DeSTA25AudioModel(all_cfg, seed=0)
    assert np.asarray(
        src.params["connector"]["global_queries"]).shape[0] == \
        all_cfg.encoder_config.encoder_layers
    d = str(tmp_path / "ckpt")
    src.save_pretrained(d)

    # rewrite config.json to claim selected taps (simulating a stale config)
    import json
    import os
    cfg_path = os.path.join(d, "config.json")
    cfg_d = json.load(open(cfg_path))
    cfg_d["orca_use_all_layers"] = False
    json.dump(cfg_d, open(cfg_path, "w"))

    loaded = DeSTA25AudioModel.from_pretrained(d)
    assert loaded.config.orca_use_all_layers is True
    for a, b in zip(jax.tree.leaves(src.params["connector"]),
                    jax.tree.leaves(loaded.params["connector"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


def test_matching_config_loads_without_reconfig(orca_cfg, tmp_path):
    src = DeSTA25AudioModel(orca_cfg, seed=0)
    d = str(tmp_path / "ckpt2")
    src.save_pretrained(d)
    loaded = DeSTA25AudioModel.from_pretrained(d)
    assert loaded.config.orca_use_all_layers is False
    n_sel = len(orca_cfg.target_layer_ids)
    assert np.asarray(
        loaded.params["connector"]["global_queries"]).shape[0] == n_sel
