"""Native C++ audio path + prefetching loader tests."""

import json
import os

import numpy as np
import pytest

from desta25_audio_tpu import native
from desta25_audio_tpu.audio.io import AudioSegment, write_wav


@pytest.fixture(scope="module", autouse=True)
def built_native():
    if not native.available():
        try:
            from desta25_audio_tpu.native.build import build
            build(verbose=False)
            native._lib_failed = False
        except Exception:  # noqa: BLE001
            pytest.skip("g++ unavailable; native path untested")
    assert native.available()


def test_native_decode_matches_python(tmp_path):
    t = np.arange(22050 * 2) / 22050.0
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, sr=22050)
    a = native.load_audio(p, 16000)
    from desta25_audio_tpu.audio.io import read_wav, resample, select_channels
    raw, sr = read_wav(p)
    b = resample(select_channels(raw, "average"), sr, 16000)
    m = min(len(a), len(b))
    assert abs(len(a) - len(b)) <= 2
    assert np.max(np.abs(a[:m] - b[:m])) < 5e-3


def test_native_is_default_fast_path(tmp_path, monkeypatch):
    t = np.arange(16000) / 16000.0
    p = str(tmp_path / "b.wav")
    write_wav(p, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    calls = {"native": 0}
    orig = native.load_audio

    def spy(path, sr):
        calls["native"] += 1
        return orig(path, sr)

    monkeypatch.setattr(native, "load_audio", spy)
    seg = AudioSegment.from_file(p)
    assert seg.sample_rate == 16000 and seg.num_samples == 16000
    assert calls["native"] == 1


def test_native_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.wav")
    open(p, "wb").write(b"not a wav file at all")
    with pytest.raises(ValueError):
        native.load_audio(p, 16000)
    # but AudioSegment falls back to the python parser, which also raises
    with pytest.raises(Exception):
        AudioSegment.from_file(p)


def test_prefetch_loader_order_and_content(tmp_path):
    from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
    from desta25_audio_tpu.data.dataset import (
        AudioTextDataset,
        CollateFn,
        DataConfig,
        data_loader,
    )
    from desta25_audio_tpu.data.prefetch import PrefetchLoader

    cfg = DeSTA25Config(llm_model_id="test/llama-nano",
                        encoder_model_id="test/whisper-nano",
                        prompt_size=8, qformer_num_hidden_layers=2,
                        dtype="float32")
    root = tmp_path / "d"
    os.makedirs(root / "clips")
    rows = []
    for i in range(10):
        t = np.arange(4000) / 16000.0
        write_wav(str(root / "clips" / f"{i}.wav"),
                  (0.3 * np.sin(2 * np.pi * (200 + 30 * i) * t)
                   ).astype(np.float32))
        rows.append({"id": f"clips/{i}.wav", "prompt": f"p{i} <|AUDIO|>",
                     "response": f"r{i}", "dataset": "syn"})
    manifest = root / "m.jsonl"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    model = DeSTA25AudioModel(cfg, seed=0)
    dcfg = DataConfig(manifest_filepaths=[str(manifest)],
                      data_root=str(root), batch_size=2, max_seq_length=64,
                      num_audio_samples=8000, trans_max_tokens=8,
                      shuffle=False)
    ds = AudioTextDataset(cfg, dcfg, model.tokenizer)
    collate = CollateFn(cfg, dcfg, model.tokenizer)

    serial = list(data_loader(ds, collate, 2))
    prefetched = list(PrefetchLoader(ds, collate, 2, num_workers=3))
    assert len(serial) == len(prefetched) == 5
    for a, b in zip(serial, prefetched):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["audio"], b["audio"])
