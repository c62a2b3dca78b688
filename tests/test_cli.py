"""CLI smoke test: the debug config trains end-to-end via
python -m desta25_audio_tpu.cli.train (reference README.md:103-110 flow)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from desta25_audio_tpu.audio.io import write_wav


def test_cli_debug_train(tmp_path):
    root = tmp_path / "data"
    os.makedirs(root / "clips")
    rows = []
    for i in range(8):
        t = np.arange(8000) / 16000.0
        sig = (0.4 * np.sin(2 * np.pi * (300 + 50 * i) * t)).astype(
            np.float32)
        write_wav(str(root / "clips" / f"c{i}.wav"), sig)
        rows.append({"id": f"clips/c{i}.wav", "dataset": "syn",
                     "prompt": f"Sound {i}? <|AUDIO|>",
                     "response": f"tone {i}"})
    manifest = root / "train.jsonl"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    exp = tmp_path / "exp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "desta25_audio_tpu.cli.train",
         "--config", "configs/desta25_debug.yaml",
         f"exp_dir={exp}",
         f"dataset.manifest_filepaths=[{manifest}]",
         f"dataset.data_root={root}",
         "trainer.max_steps=2",
         "dataset.batch_size=4"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(exp / "config.yaml")
    assert os.path.exists(exp / "metrics.jsonl")
    assert os.path.exists(exp / "checkpoint-latest")
