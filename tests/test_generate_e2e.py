"""End-to-end generate() on the nano config: synthetic wav -> VAD -> mel ->
encoder -> Q-Former -> splice -> prefill -> decode.  This is the
minimum end-to-end slice of SURVEY §7 step 6 (desta25_debug equivalent)."""

import os

import numpy as np
import pytest

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav
from desta25_audio_tpu.models.splice import (
    SpliceEntry,
    apply_splice,
    build_splice_maps,
    expand_audio_placeholders,
)


@pytest.fixture(scope="module")
def nano_model():
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="qformer_1",
        qformer_num_hidden_layers=2,
        prompt_size=8,
        dtype="float32",
    )
    return DeSTA25AudioModel(cfg, seed=0)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    # modulated tone bursts -> passes the energy VAD as "speech"-like
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
    sig += 0.01 * rng.standard_normal(16000).astype(np.float32)
    p = tmp_path_factory.mktemp("audio") / "tone.wav"
    write_wav(str(p), sig)
    return str(p)


def test_expand_placeholders():
    toks = ["a", "<|AUDIO|>", "b", "<|AUDIO|>", "c"]
    out, starts = expand_audio_placeholders(
        toks, "<|AUDIO|>", [3, 2], [2, 0], "<pad>")
    assert starts == [1, 7]
    assert out == ["a"] + ["<pad>"] * 5 + ["b"] + ["<pad>"] * 2 + ["c"]


def test_splice_maps_and_apply(rng):
    entries = [SpliceEntry(0, 2, 0, 3, 2), SpliceEntry(1, 0, 1, 3, 1)]
    kind, aidx, pos = build_splice_maps(2, 8, entries)
    assert kind[0].tolist() == [0, 0, 1, 1, 1, 2, 2, 0]
    assert kind[1].tolist() == [1, 1, 1, 2, 0, 0, 0, 0]
    import jax.numpy as jnp
    D = 4
    text = jnp.zeros((2, 8, D))
    audio = jnp.ones((2, 3, D)) * jnp.asarray([1.0, 2.0])[:, None, None]
    trans = jnp.ones((2, 2, D)) * 10.0
    out = np.asarray(apply_splice(text, audio, trans, jnp.asarray(kind),
                                  jnp.asarray(aidx), jnp.asarray(pos)))
    assert (out[0, 2:5] == 1.0).all()
    assert (out[0, 5:7] == 10.0).all()
    assert (out[0, 0:2] == 0.0).all()
    assert (out[1, 0:3] == 2.0).all()
    assert (out[1, 3] == 10.0).all()
    assert (out[1, 4:] == 0.0).all()


def test_generate_with_audio(nano_model, wav_path):
    messages = [
        {"role": "system", "content": "Focus on the audio."},
        {"role": "user",
         "content": "What do you hear? <|AUDIO|>",
         "audios": [{"audio": wav_path, "text": "a test tone"}]},
    ]
    out = nano_model.generate(messages, max_new_tokens=8, do_sample=False)
    assert len(out.text) == 1
    assert isinstance(out.text[0], str)
    assert out.audios == [(wav_path, "a test tone")]
    assert len(out.generated_ids[0]) == 8


def test_generate_batch_and_multi_audio(nano_model, wav_path):
    conv1 = [
        {"role": "user",
         "content": "Compare <|AUDIO|> and <|AUDIO|>.",
         "audios": [{"audio": wav_path, "text": "first"},
                    {"audio": wav_path, "text": "second"}]},
    ]
    conv2 = [
        {"role": "user", "content": "Describe <|AUDIO|>",
         "audios": [{"audio": wav_path, "text": None}]},
    ]
    out = nano_model.generate([conv1, conv2], max_new_tokens=4,
                              do_sample=True, temperature=0.8, top_p=0.9)
    assert len(out.text) == 2
    assert len(out.audios) == 3
    # third audio had no transcription -> VAD+ASR filled something in
    assert out.audios[2][1] is not None


def test_generate_text_only(nano_model):
    out = nano_model.generate(
        [{"role": "user", "content": "Hello!"}], max_new_tokens=5,
        do_sample=False)
    assert len(out.text) == 1


def test_generate_audio_count_mismatch(nano_model, wav_path):
    with pytest.raises(AssertionError, match="audio count"):
        nano_model.generate(
            [{"role": "user", "content": "no locator here",
              "audios": [{"audio": wav_path, "text": "x"}]}],
            max_new_tokens=2)


def test_generate_missing_file(nano_model):
    with pytest.raises(ValueError, match="does not exist"):
        nano_model.generate(
            [{"role": "user", "content": "hi <|AUDIO|>",
              "audios": [{"audio": "/nonexistent.wav", "text": "x"}]}],
            max_new_tokens=2)


def test_save_load_roundtrip(nano_model, tmp_path, wav_path):
    import jax
    d = str(tmp_path / "ckpt")
    nano_model.save_pretrained(d)
    assert os.path.exists(os.path.join(d, "config.json"))
    assert os.path.exists(os.path.join(d, "model.safetensors"))
    loaded = DeSTA25AudioModel.from_pretrained(d)
    # connector weights must round-trip exactly
    a = nano_model.params["connector"]
    b = loaded.params["connector"]
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(pa, np.float32),
                                   np.asarray(pb, np.float32), atol=1e-6)
