"""Eval harness tests: official MMAU string_match semantics, answer
extraction, end-to-end MMAU/SAKURA loops with the nano model and a stub
judge, and the ConsecutiveWordsAccuracy metric."""

import numpy as np
import pytest

from desta25_audio_tpu.eval.judge import LLMJudge, parse_verdict
from desta25_audio_tpu.eval.metrics import (
    ConsecutiveWordsAccuracyMetric,
    basic_normalize,
)
from desta25_audio_tpu.eval.mmau import (
    build_prompt,
    evaluate_mmau,
    extract_final_answer,
    string_match,
)
from desta25_audio_tpu.eval.sakura import evaluate_sakura


def test_string_match_official_semantics():
    choices = ["a dog barking", "a cat meowing", "rain falling"]
    assert string_match("a dog barking", "The correct answer is: a dog "
                        "barking", choices)
    # prediction contains a token unique to a wrong choice -> fail
    assert not string_match("a dog barking", "a dog barking and a cat",
                            choices)
    # missing answer token -> fail
    assert not string_match("a dog barking", "a dog", choices)
    # shared tokens between answer and wrong choices are not disqualifying
    assert string_match("a dog barking", "i think a dog barking", choices)
    assert not string_match("a dog barking", "", choices)


def test_extract_final_answer():
    t = ('<think>hmm, sounds like rain</think>The correct answer is: '
         '"rain falling"')
    assert extract_final_answer(t) == "rain falling"
    assert extract_final_answer("just some text") == "just some text"
    assert extract_final_answer(
        "the correct answer is: a dog barking.") == "a dog barking"


def test_build_prompt_handles_json_choices():
    p = build_prompt({"question": "What is it?",
                      "choices": '["a", "b"]'})
    assert '"a", "b"' in p and p.endswith("<|AUDIO|>")


def test_parse_verdict():
    assert parse_verdict("CORRECT") is True
    assert parse_verdict(" incorrect extra") is False
    assert parse_verdict("maybe?") is None


def test_consecutive_words_metric():
    m = ConsecutiveWordsAccuracyMetric()
    assert m.update("The answer is a Dog barking!", "dog barking")
    assert not m.update("a dog", "dog barking")
    assert m.compute() == 0.5
    assert basic_normalize("Hello, (aside) World! [noise]") == "hello world"


@pytest.fixture(scope="module")
def nano_model():
    from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    return DeSTA25AudioModel(cfg, seed=0)


def _items(n=3):
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    return [{
        "question": f"What sound is this ({i})?",
        "choices": ["a dog barking", "a cat meowing"],
        "answer": "a dog barking",
        "task": ["sound", "music", "speech"][i % 3],
        "difficulty": "easy",
        "sub-category": "animals",
        "audio": {"array": 0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t)
                  * (np.sin(2 * np.pi * 3 * t) > 0),
                  "sampling_rate": 16000},
    } for i in range(n)]


def test_mmau_loop_with_stub_judge(nano_model, tmp_path):
    # stub judge always says CORRECT -> overall must be 100
    judge = LLMJudge(lambda messages, max_new_tokens=4: "CORRECT")
    out = str(tmp_path / "mmau.json")
    report = evaluate_mmau(nano_model, _items(3), judge=judge,
                           out_path=out, max_new_tokens=4)
    assert report["overall"] == 100.0
    assert set(report["task"]) == {"sound", "music", "speech"}
    import json as j
    data = j.load(open(out))
    assert len(data["results"]) == 3
    assert all("model_prediction" in r for r in data["results"])


def test_sakura_loop(nano_model, tmp_path):
    judge = LLMJudge(lambda messages, max_new_tokens=4: "INCORRECT")
    items = []
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000.0
    for track in ("AnimalQA", "GenderQA"):
        for hop in ("single", "multi"):
            items.append({
                "question": "What animal?", "answer": "dog",
                "track": track, "hop": hop,
                "audio": {"array": 0.3 * np.sin(2 * np.pi * 500 * t),
                          "sampling_rate": 16000},
            })
    report = evaluate_sakura(nano_model, items, judge,
                             out_path=str(tmp_path / "sak.json"),
                             max_new_tokens=4)
    assert report["n_items"] == 4
    assert report["per_track"]["AnimalQA/single"] == 0.0
    assert report["avg/single"] == 0.0
