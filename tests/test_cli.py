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


def test_dataset_group_composition():
    """+dataset=NAME composes configs/dataset/NAME.yaml (hydra-style)."""
    from desta25_audio_tpu.cli.train import apply_overrides
    cfg = {"dataset": {"batch_size": 1}}
    out = apply_overrides(cfg, ["+dataset=debug", "trainer.max_steps=3"],
                          config_dir="configs")
    assert out["dataset"]["train_ds"]["batch_size"] == 4
    assert out["dataset"]["validation_ds"]["max_seq_length"] == 512
    assert out["trainer"]["max_steps"] == 3
    with pytest.raises(FileNotFoundError):
        apply_overrides({}, ["dataset=no_such_group"], config_dir="configs")
    # all shipped groups parse and carry both splits
    import glob

    import yaml
    groups = glob.glob("configs/dataset/*.yaml")
    assert len(groups) == 6
    for g in groups:
        d = yaml.safe_load(open(g))
        assert "train_ds" in d and "validation_ds" in d, g
        assert d["train_ds"]["batch_size"] >= 1


def test_warm_start_from_pretrained_weights(tmp_path):
    """init_from_pretrained_weights loads trainable params into the fresh
    model (train_desta.py:73-83) and is rejected alongside resume."""
    import yaml

    from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
    from desta25_audio_tpu.cli.train import build_from_config

    mcfg = DeSTA25Config(
        llm_model_id="test/llama-nano", encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    donor = DeSTA25AudioModel(mcfg, seed=5)
    donor.save_pretrained(str(tmp_path / "warm"))

    root = tmp_path / "data"
    os.makedirs(root)
    t = np.arange(8000) / 16000.0
    write_wav(str(root / "c.wav"),
              (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    manifest = root / "m.jsonl"
    with open(manifest, "w") as f:
        f.write(json.dumps({"id": "c.wav", "dataset": "syn",
                            "prompt": "S? <|AUDIO|>",
                            "response": "tone"}) + "\n")

    cfg = yaml.safe_load(open("configs/desta25_debug.yaml"))
    cfg["exp_dir"] = str(tmp_path / "exp")
    cfg["dataset"]["manifest_filepaths"] = [str(manifest)]
    cfg["dataset"]["data_root"] = str(root)
    cfg["init_from_pretrained_weights"] = str(tmp_path / "warm")

    model, _ = build_from_config(cfg)
    want = donor.params["connector"]
    got = model.params["connector"]
    import jax
    leaves_w = jax.tree.leaves(want)
    leaves_g = jax.tree.leaves(got)
    assert any(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_w, leaves_g))
    # every trainable leaf must match the donor
    for a, b in zip(leaves_w, leaves_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    cfg["resume_from_checkpoint"] = "somewhere"
    with pytest.raises(AssertionError):
        build_from_config(cfg)


def test_cli_generate_smoke(tmp_path, capsys):
    """cli.generate end-to-end: stage a nano checkpoint, run the CLI on a
    synthetic wav with a known transcription, check JSON output."""
    import json

    import numpy as np

    from desta25_audio_tpu.audio.io import write_wav
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=4, qformer_num_hidden_layers=2, dtype="float32")
    m = DeSTA25AudioModel(cfg, seed=0)
    ck = str(tmp_path / "ck")
    m.save_pretrained(ck)
    t = np.arange(12000) / 16000.0
    # speech-like (amplitude-gated) signal: energy VAD detects it, so the
    # provided transcription survives; the reference overrides the
    # transcription with " " only for non-speech clips
    # (modeling_desta25.py:1563-1567)
    sig = (0.5 * np.sin(2 * np.pi * 300 * t)
           * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
    wav = str(tmp_path / "c.wav")
    write_wav(wav, sig)

    from desta25_audio_tpu.cli.generate import main
    main(["--model", ck, "--audio", wav, "--transcription", "a tone",
          "--prompt", "Describe: <|AUDIO|>", "--max-new-tokens", "3",
          "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(out["text"][0], str)
    assert out["audios"][0][1] == "a tone"


def test_cli_serve_smoke(tmp_path):
    """cli.serve end-to-end: stage a nano checkpoint, boot the HTTP
    server on an ephemeral port (serve_http patched to non-blocking),
    POST a text-only generate, shut down."""
    import http.client
    import json
    from unittest import mock

    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=4, qformer_num_hidden_layers=2, dtype="float32")
    DeSTA25AudioModel(cfg, seed=0).save_pretrained(str(tmp_path / "ck"))

    captured = {}

    def fake_serve(engine, host, port):
        from desta25_audio_tpu.serve.http import start_http
        captured["httpd"], captured["es"] = start_http(engine, host, 0)

    from desta25_audio_tpu.cli import serve as cli_serve
    # serve_http is imported inside main(); patch at its source module
    import desta25_audio_tpu.serve.http as http_mod
    with mock.patch.object(http_mod, "serve_http",
                           side_effect=fake_serve):
        cli_serve.main(["--model", str(tmp_path / "ck"),
                        "--slots", "2", "--max-ctx", "128",
                        "--max-new-tokens", "4"])
    port = captured["httpd"].server_address[1]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/generate", body=json.dumps(
        {"messages": [{"role": "user", "content": "hi"}],
         "max_new_tokens": 3}),
        headers={"Content-Type": "application/json"})
    body = json.loads(conn.getresponse().read())
    assert isinstance(body["text"], str)
    conn.close()
    captured["httpd"].shutdown()
    captured["es"].close()
