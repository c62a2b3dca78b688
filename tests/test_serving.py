"""Continuous-batching engine: results must match one-shot generate()
greedy outputs, requests of different lengths interleave, and slots are
reused across waves."""

import numpy as np
import pytest

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav
from desta25_audio_tpu.serve.engine import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    return DeSTA25AudioModel(cfg, seed=0)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    paths = []
    for i in range(3):
        t = np.arange(12000) / 16000.0
        sig = (0.5 * np.sin(2 * np.pi * (300 + 80 * i) * t)
               * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
        p = str(d / f"w{i}.wav")
        write_wav(p, sig)
        paths.append(p)
    return paths


def _msgs(path, i):
    return [{"role": "user",
             "content": f"Describe sound number {i}: <|AUDIO|>",
             "audios": [{"audio": path, "text": f"tone {i}"}]}]


def test_engine_matches_one_shot_generate(model, wavs):
    MAX_NEW = 6
    # reference outputs: one-shot greedy generate per conversation
    expected = {}
    for i, p in enumerate(wavs):
        out = model.generate(_msgs(p, i), max_new_tokens=MAX_NEW,
                             do_sample=False)
        expected[i] = out.text[0]

    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    rids = {i: eng.submit(_msgs(p, i)) for i, p in enumerate(wavs)}
    results = eng.run_until_done()
    assert set(results) == set(rids.values())
    for i, rid in rids.items():
        assert results[rid] == expected[i], (i, results[rid], expected[i])


def test_engine_slot_reuse_and_mixed_lengths(model, wavs):
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=8, ctx_bucket=128)
    # 5 requests through 2 slots with different budgets
    rids = []
    for j in range(5):
        rids.append(eng.submit(_msgs(wavs[j % 3], j),
                               max_new_tokens=2 + (j % 3)))
    results = eng.run_until_done()
    assert len(results) == 5
    for j, rid in enumerate(rids):
        assert rid in results
