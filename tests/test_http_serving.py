"""HTTP serving front-end: JSON generate (parity with one-shot
generate()), SSE streaming, inline-base64 audio, cancel endpoint,
deadlines, health.  All over a real localhost ThreadingHTTPServer with
the nano model."""

import base64
import http.client
import json

import numpy as np
import pytest

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav
from desta25_audio_tpu.serve.engine import ContinuousBatchingEngine
from desta25_audio_tpu.serve.http import start_http

MAX_NEW = 6


@pytest.fixture(scope="module")
def model():
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    return DeSTA25AudioModel(cfg, seed=0)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("http")
    t = np.arange(12000) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    p = str(d / "w.wav")
    write_wav(p, sig)
    return p


def _msgs(path):
    return [{"role": "user", "content": "Describe: <|AUDIO|>",
             "audios": [{"audio": path, "text": "a tone"}]}]


@pytest.fixture(scope="module")
def served(model):
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    httpd, es = start_http(eng, port=0)
    yield httpd.server_address[1]
    httpd.shutdown()
    es.close()


def _post(port, path, obj, stream=False):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", path, body=json.dumps(obj),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    if stream:
        return resp, conn
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_http_generate_matches_one_shot(model, wav_path, served):
    expected = model.generate(_msgs(wav_path), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]
    status, body = _post(served, "/v1/generate",
                         {"messages": _msgs(wav_path),
                          "max_new_tokens": MAX_NEW})
    assert status == 200
    assert body["text"] == expected
    assert body["finish_reason"] in ("eos", "length")
    assert body["truncated"] is False


def test_http_inline_base64_audio(model, wav_path, served):
    expected = model.generate(_msgs(wav_path), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]
    with open(wav_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    msgs = [{"role": "user", "content": "Describe: <|AUDIO|>",
             "audios": [{"audio_b64": b64, "text": "a tone"}]}]
    status, body = _post(served, "/v1/generate",
                         {"messages": msgs, "max_new_tokens": MAX_NEW})
    assert status == 200
    assert body["text"] == expected


def test_http_streaming_sse(model, wav_path, served):
    expected = model.generate(_msgs(wav_path), max_new_tokens=MAX_NEW,
                              do_sample=False)
    resp, conn = _post(served, "/v1/generate",
                       {"messages": _msgs(wav_path),
                        "max_new_tokens": MAX_NEW, "stream": True},
                       stream=True)
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    events = []
    for chunk in resp.read().decode().split("\n\n"):
        if chunk.startswith("data: "):
            events.append(json.loads(chunk[len("data: "):]))
    conn.close()
    toks = [e["token"] for e in events if "token" in e]
    final = events[-1]
    assert final.get("done") is True
    assert final["text"] == expected.text[0]
    # streamed ids match the one-shot generated ids prefix-exactly
    exp_ids = [int(t) for t in np.asarray(expected.generated_ids)[0]
               if int(t) != model.tokenizer.pad_token_id][:len(toks)]
    assert toks == exp_ids


def test_http_health_cancel_deadline(wav_path, served):
    conn = http.client.HTTPConnection("127.0.0.1", served, timeout=60)
    conn.request("GET", "/v1/health")
    h = json.loads(conn.getresponse().read())
    assert h["status"] == "ok" and h["slots"] == 2

    # deadline_s=0: shed before decoding
    status, body = _post(served, "/v1/generate",
                         {"messages": _msgs(wav_path),
                          "deadline_s": 0.0})
    assert status == 200 and body["finish_reason"] == "deadline"

    # cancel an unknown id
    conn.request("DELETE", "/v1/requests/999999")
    c = json.loads(conn.getresponse().read())
    assert c["cancelled"] is False
    conn.close()


def test_http_bad_requests(served):
    status, body = _post(served, "/v1/generate", {"nope": 1})
    assert status == 400 and "error" in body
    status, body = _post(served, "/v1/nothing", {})
    assert status == 404


def test_openai_chat_completions(model, wav_path, served):
    """OpenAI schema (typed content parts + inline b64 audio) returns a
    chat.completion object whose text matches one-shot generate()."""
    expected = model.generate(_msgs(wav_path), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]
    with open(wav_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    oai = {"messages": [{"role": "user", "content": [
               {"type": "text", "text": "Describe: "},
               {"type": "input_audio",
                "input_audio": {"data": b64, "format": "wav",
                                "transcription": "a tone"}}]}],
           "max_tokens": MAX_NEW, "temperature": 0}
    status, body = _post(served, "/v1/chat/completions", oai)
    assert status == 200
    assert body["object"] == "chat.completion"
    ch = body["choices"][0]
    assert ch["message"]["role"] == "assistant"
    assert ch["message"]["content"] == expected
    assert ch["finish_reason"] in ("stop", "length")
    u = body["usage"]
    assert 0 < u["completion_tokens"] <= MAX_NEW
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["prompt_tokens"] > 0


def test_openai_chat_streaming(model, wav_path, served):
    expected = model.generate(_msgs(wav_path), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]
    oai = {"messages": [{"role": "user", "content": [
               {"type": "text", "text": "Describe: "},
               {"type": "audio", "audio": wav_path,
                "transcription": "a tone"}]}],
           "max_tokens": MAX_NEW, "temperature": 0, "stream": True}
    resp, conn = _post(served, "/v1/chat/completions", oai, stream=True)
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    events = [c[len("data: "):] for c in resp.read().decode().split("\n\n")
              if c.startswith("data: ")]
    conn.close()
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert text == expected
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_openai_stop_sequence(model, served):
    """OpenAI `stop` param trims the completion at the stop match with
    finish_reason "stop"."""
    base = model.generate([{"role": "user", "content": "Say hello."}],
                          max_new_tokens=MAX_NEW, do_sample=False).text[0]
    assert len(base) >= 3
    stop = base[1:3]
    status, body = _post(served, "/v1/chat/completions",
                         {"messages": [{"role": "user",
                                        "content": "Say hello."}],
                          "max_tokens": MAX_NEW, "temperature": 0,
                          "stop": stop})
    assert status == 200
    ch = body["choices"][0]
    assert ch["finish_reason"] == "stop"
    assert stop not in ch["message"]["content"]
    assert base.startswith(ch["message"]["content"])


def test_openai_models_and_errors(served):
    conn = http.client.HTTPConnection("127.0.0.1", served, timeout=60)
    conn.request("GET", "/v1/models")
    m = json.loads(conn.getresponse().read())
    conn.close()
    assert m["object"] == "list" and m["data"][0]["object"] == "model"

    status, body = _post(served, "/v1/chat/completions",
                         {"messages": [{"role": "user", "content": [
                             {"type": "bogus"}]}]})
    assert status == 400 and "error" in body
