"""Training-loop e2e on the nano config: synthetic JSONL + wavs ->
collate -> jit train step -> loss decreases; eval report; checkpoint
resume.  Mirrors the reference's desta25_debug smoke run (SURVEY §4)."""

import json
import os

import numpy as np
import pytest

import jax

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav
from desta25_audio_tpu.data.dataset import (
    AudioTextDataset,
    CollateFn,
    DataConfig,
    data_loader,
)
from desta25_audio_tpu.train.optimizer import OptimizerConfig
from desta25_audio_tpu.train.trainer import DeSTA25Trainer, TrainerConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        t = np.arange(8000) / 16000.0
        sig = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(
            np.float32)
        rel = f"clips/a{i}.wav"
        os.makedirs(root / "clips", exist_ok=True)
        write_wav(str(root / rel), sig)
        rows.append({"id": rel, "dataset": "synthetic",
                     "prompt": f"Describe sound {i} <|AUDIO|>",
                     "response": f"tone {i}"})
    # one row with a missing audio file and one with empty prompt: must be
    # skipped with reasons, not crash (simple_dataset.py:454-520 behavior)
    rows.append({"id": "clips/missing.wav", "prompt": "x <|AUDIO|>",
                 "response": "y"})
    rows.append({"id": rows[0]["id"], "prompt": "", "response": "y"})
    manifest = root / "train.jsonl"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(manifest), str(root)


@pytest.fixture(scope="module")
def nano_cfg():
    return DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="qformer_1",
        qformer_num_hidden_layers=2,
        prompt_size=8,
        dtype="float32",
    )


def _build(nano_cfg, corpus, tmp_path, **tkw):
    manifest, root = corpus
    model = DeSTA25AudioModel(nano_cfg, seed=0)
    dcfg = DataConfig(manifest_filepaths=[manifest], data_root=root,
                      batch_size=4, max_seq_length=96,
                      num_audio_samples=48000, trans_max_tokens=8)
    ds = AudioTextDataset(nano_cfg, dcfg, model.tokenizer)
    collate = CollateFn(nano_cfg, dcfg, model.tokenizer)
    tcfg = TrainerConfig(exp_dir=str(tmp_path / "exp"), max_epochs=1,
                         log_every_n_steps=1, eval_max_new_tokens=4,
                         eval_before_train=False, val_check_interval=1e9,
                         **tkw)
    ocfg = OptimizerConfig(lr=1e-3, warmup_steps=2, total_steps=20,
                           gradient_clip_val=1.0)
    trainer = DeSTA25Trainer(model, ds, ds, collate, ocfg, tcfg)
    return model, trainer, ds, collate, dcfg


def test_dataset_skips_invalid(nano_cfg, corpus, tmp_path):
    _, _, ds, _, _ = _build(nano_cfg, corpus, tmp_path)
    items = list(ds.iter_valid())
    assert len(items) == 12  # 14 rows, 2 skipped
    assert ds.skip_reasons["audio_file_not_found"] == 1
    assert ds.skip_reasons["empty_prompt"] == 1


def test_collate_shapes_and_labels(nano_cfg, corpus, tmp_path):
    model, _, ds, collate, dcfg = _build(nano_cfg, corpus, tmp_path)
    items = list(ds.iter_valid())[:4]
    batch = collate(items)
    B, L = 4, dcfg.max_seq_length
    assert batch["input_ids"].shape == (B, L)
    assert batch["labels"].shape == (B, L)
    assert batch["audio"].shape == (4, 48000)
    # labels: only the answer region is supervised
    for i in range(B):
        sup = batch["labels"][i] != -100
        n_target = len(model.tokenizer.encode(items[i]["target"]))
        assert sup.sum() == n_target
        # supervised ids must equal the target token ids
        tgt = model.tokenizer.encode(items[i]["target"])
        np.testing.assert_array_equal(batch["input_ids"][i][sup], tgt)
    # splice maps mark prompt_size audio positions per sample
    assert (batch["kind"] == 1).sum() == B * nano_cfg.prompt_size


def test_collate_clamps_transcription_splice(nano_cfg, corpus, tmp_path):
    """Splice entries must not reference transcription embeddings beyond
    trans_max_tokens — apply_splice would silently repeat the last
    embedding otherwise (VERDICT r1 weak #4)."""
    model, _, ds, collate, dcfg = _build(nano_cfg, corpus, tmp_path)
    items = list(ds.iter_valid())[:2]
    long_text = " ".join(f"word{i}" for i in range(40))
    for it in items:
        it["transcription_list"] = [long_text]
    batch = collate(items)
    Ttr = dcfg.trans_max_tokens
    # every row's transcription-splice region is capped at Ttr positions
    for i in range(len(items)):
        n_trans = int((batch["kind"][i] == 2).sum())
        assert n_trans == Ttr
        tpos = batch["pos"][i][batch["kind"][i] == 2]
        assert tpos.max() < Ttr
    # trans_ids carries exactly the clamped tokens
    assert batch["trans_ids"].shape[1] == Ttr
    assert (batch["trans_mask"].sum(axis=1) == Ttr).all()


def test_collate_prosody_fields(nano_cfg, corpus, tmp_path):
    """Optional ORCA prosody fields (simple_dataset.py:266-299): zero-fill
    for samples lacking them, fixed local shape [B, T(pad8), 2]."""
    _, _, ds, collate, _ = _build(nano_cfg, corpus, tmp_path)
    items = list(ds.iter_valid())[:3]
    # no prosody anywhere -> no prosody keys emitted
    plain = collate(items)
    assert "f0_energy_global" not in plain
    assert "f0_energy_local" not in plain

    items[0]["f0_energy_global"] = [1.0, 2.0, 3.0, 4.0]
    items[0]["f0_energy_local"] = [[0.5, 0.6]] * 10
    batch = collate(items)
    g = batch["f0_energy_global"]
    assert g.shape == (3, 4)
    np.testing.assert_array_equal(g[0], [1, 2, 3, 4])
    np.testing.assert_array_equal(g[1], np.zeros(4))
    loc = batch["f0_energy_local"]
    assert loc.shape == (3, 16, 2)  # 10 padded up to a multiple of 8
    np.testing.assert_array_equal(
        loc[0, :10], np.full((10, 2), [.5, .6], np.float32))
    assert (loc[1:] == 0).all() and (loc[0, 10:] == 0).all()


def test_train_loss_decreases_and_eval(nano_cfg, corpus, tmp_path):
    model, trainer, *_ = _build(nano_cfg, corpus, tmp_path)
    trainer.train()
    metrics_path = os.path.join(trainer.tcfg.exp_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(metrics_path)]
    losses = [r["train/lm_loss"] for r in recs if "train/lm_loss" in r]
    assert len(losses) >= 3
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    report = trainer.evaluate(tag="final")
    assert "accuracy" in report and "ppl" in report
    assert os.path.exists(
        os.path.join(trainer.tcfg.exp_dir, "val@final-report.json"))


def test_checkpoint_resume(nano_cfg, corpus, tmp_path):
    model, trainer, *_ = _build(nano_cfg, corpus, tmp_path,
                                max_steps=2, save_strategy="epoch")
    trainer.train()
    step1 = trainer.global_step
    assert step1 == 2
    assert os.path.exists(
        os.path.join(trainer.tcfg.exp_dir, "checkpoint-latest"))

    model2, trainer2, *_ = _build(nano_cfg, corpus, tmp_path, max_steps=3)
    trainer2.train(resume_from_checkpoint=trainer.tcfg.exp_dir)
    assert trainer2.global_step == 3


def test_auto_find_batch_size_oom_backoff(nano_cfg, corpus, tmp_path):
    """Device OOM on the first step halves the batch size and restarts the
    epoch (reference TrainingArguments(auto_find_batch_size=True),
    train_desta.py:161)."""
    model, trainer, ds, collate, dcfg = _build(nano_cfg, corpus, tmp_path,
                                               max_steps=3)
    assert collate.data_cfg.batch_size == 4
    real_step = trainer.train_step

    def oom_step(trainable, frozen, opt_state, batch):
        if int(batch["input_ids"].shape[0]) > 2:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to "
                "allocate 18.3GiB")
        return real_step(trainable, frozen, opt_state, batch)

    trainer.train_step = oom_step
    trainer.train()
    assert collate.data_cfg.batch_size == 2  # 4 -> OOM -> 2 -> ran
    assert trainer.global_step == 3


def test_auto_find_batch_size_off_reraises(nano_cfg, corpus, tmp_path):
    model, trainer, *_ = _build(nano_cfg, corpus, tmp_path, max_steps=1,
                                auto_find_batch_size=False)

    def oom_step(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")

    trainer.train_step = oom_step
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        trainer.train()
