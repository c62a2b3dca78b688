"""Tokenizer layer.

The framework talks to tokenizers through a small protocol mirroring the
subset of HF ``PreTrainedTokenizer`` the reference uses
(modeling_desta25.py:1467-1478, :1602-1651): ``tokenize``,
``convert_tokens_to_string``, ``encode``, ``decode``/``batch_decode``,
``apply_chat_template``, left padding, pad/eos ids, and an added
``<|AUDIO|>`` special token.

Two implementations:

- :class:`HFTokenizerAdapter` wraps a real HF tokenizer (host-side, for
  production models);
- :class:`CharTokenizer` is a deterministic hub-free char-level tokenizer
  with the same chat-template shapes, used by tests and the nano configs.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

AUDIO_LOCATOR = "<|AUDIO|>"

_CHAT_TEMPLATES = {
    "llama3": {
        "bos": "<|begin_of_text|>",
        "turn": "<|start_header_id|>{role}<|end_header_id|>\n\n{content}<|eot_id|>",
        "gen": "<|start_header_id|>assistant<|end_header_id|>\n\n",
    },
    "qwen3": {
        "bos": "",
        "turn": "<|im_start|>{role}\n{content}<|im_end|>\n",
        "gen": "<|im_start|>assistant\n",
    },
}


def render_chat(messages: Sequence[Dict], template: str,
                add_generation_prompt: bool = True) -> str:
    t = _CHAT_TEMPLATES[template]
    out = t["bos"]
    for m in messages:
        out += t["turn"].format(role=m["role"], content=m["content"])
    if add_generation_prompt:
        out += t["gen"]
    return out


class CharTokenizer:
    """Deterministic char-level tokenizer for tests / nano configs.

    Special tokens are single tokens; every other character is its own
    token with id = min(ord(c), base_vocab-1) offset past the specials.
    """

    LLAMA3_SPECIALS = [
        "<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
        "<|end_header_id|>", "<|eot_id|>", "<|reserved_special_token_87|>",
        "<start_audio>", "<end_audio>", AUDIO_LOCATOR, "<|pad|>",
    ]
    QWEN3_SPECIALS = [
        "<|im_start|>", "<|im_end|>", "<|endoftext|>", "<|video_pad|>",
        "<start_audio>", "<end_audio>", AUDIO_LOCATOR, "<|pad|>",
    ]

    def __init__(self, chat_template: str = "llama3",
                 vocab_size: int = 512):
        self.chat_template = chat_template
        specials = (self.LLAMA3_SPECIALS if chat_template == "llama3"
                    else self.QWEN3_SPECIALS)
        self.specials = list(specials)
        self.vocab_size = vocab_size
        n_char = vocab_size - len(self.specials)
        self._char_base = len(self.specials)
        self._n_char = n_char
        self.special_to_id = {s: i for i, s in enumerate(self.specials)}
        self.id_to_special = {i: s for s, i in self.special_to_id.items()}
        self._split_re = re.compile(
            "(" + "|".join(re.escape(s) for s in self.specials) + ")")
        self.eos_token = ("<|eot_id|>" if chat_template == "llama3"
                          else "<|im_end|>")
        self.pad_token = "<|pad|>"
        self.padding_side = "left"

    # -- protocol ---------------------------------------------------------

    @property
    def eos_token_id(self) -> int:
        return self.special_to_id[self.eos_token]

    @property
    def pad_token_id(self) -> int:
        return self.special_to_id[self.pad_token]

    def tokenize(self, text: str, add_special_tokens: bool = False
                 ) -> List[str]:
        toks: List[str] = []
        for part in self._split_re.split(text):
            if not part:
                continue
            if part in self.special_to_id:
                toks.append(part)
            else:
                toks.extend(part)
        return toks

    def convert_tokens_to_ids(self, tokens: Union[str, List[str]]):
        single = isinstance(tokens, str)
        if single:
            tokens = [tokens]
        ids = []
        for t in tokens:
            if t in self.special_to_id:
                ids.append(self.special_to_id[t])
            else:
                ids.append(self._char_base + (ord(t) % self._n_char))
        return ids[0] if single else ids

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        return "".join(tokens)

    def encode(self, text: str, add_special_tokens: bool = False
               ) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i in self.id_to_special:
                if not skip_special_tokens:
                    out.append(self.id_to_special[i])
            elif i >= self._char_base:
                out.append(chr(i - self._char_base))
        return "".join(out)

    def batch_decode(self, batch_ids,
                     skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch_ids]

    def apply_chat_template(self, messages, tokenize: bool = False,
                            add_generation_prompt: bool = True):
        if messages and isinstance(messages[0], list):
            return [render_chat(m, self.chat_template, add_generation_prompt)
                    for m in messages]
        text = render_chat(messages, self.chat_template,
                           add_generation_prompt)
        return self.tokenize(text) if tokenize else text

    def __call__(self, texts, padding: str = "longest",
                 truncation: bool = False,
                 max_length: Optional[int] = None,
                 add_special_tokens: bool = False,
                 pad_to_multiple_of: Optional[int] = None):
        """Batch-encode with left padding. Returns dict of lists
        (input_ids, attention_mask, length)."""
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t) for t in texts]
        if truncation and max_length:
            encoded = [e[:max_length] for e in encoded]
        longest = max((len(e) for e in encoded), default=0)
        if pad_to_multiple_of:
            longest = -(-longest // pad_to_multiple_of) * pad_to_multiple_of
        ids, mask = [], []
        for e in encoded:
            pad = longest - len(e)
            assert self.padding_side == "left"
            ids.append([self.pad_token_id] * pad + e)
            mask.append([0] * pad + [1] * len(e))
        return {"input_ids": ids, "attention_mask": mask,
                "length": [longest] * len(encoded)}


class HFTokenizerAdapter:
    """Wraps an HF tokenizer with the reference's setup
    (modeling_desta25.py:1467-1478): pad=eos, left padding, add the
    ``<|AUDIO|>`` locator and assert it and the placeholder are single
    tokens."""

    def __init__(self, hf_tokenizer, placeholder_token: str,
                 audio_locator: str = AUDIO_LOCATOR):
        self.tk = hf_tokenizer
        if self.tk.pad_token is None:
            self.tk.pad_token = self.tk.eos_token
        self.tk.padding_side = "left"
        self.tk.add_tokens(audio_locator, special_tokens=True)
        assert len(self.tk.tokenize(audio_locator)) == 1, \
            f"audio_locator {audio_locator!r} must be a single token"
        assert len(self.tk.tokenize(placeholder_token)) == 1, \
            f"placeholder_token {placeholder_token!r} must be a single token"
        self.padding_side = "left"

    def __getattr__(self, name):
        return getattr(self.tk, name)

    def __call__(self, texts, **kw):
        kw.setdefault("padding", "longest")
        kw.setdefault("add_special_tokens", False)
        out = self.tk(texts, **kw)
        ids = out["input_ids"]
        out["length"] = [len(x) for x in ids] if isinstance(ids, list) \
            else [ids.shape[1]] * ids.shape[0]
        return out


def build_tokenizer(llm_model_id: str, placeholder_token: str,
                    chat_template: str = "llama3"):
    """HF tokenizer when the model id resolves locally, else CharTokenizer
    for the nano test ids."""
    if llm_model_id.startswith("test/"):
        return CharTokenizer(chat_template=chat_template)
    from transformers import AutoTokenizer
    hf = AutoTokenizer.from_pretrained(llm_model_id)
    return HFTokenizerAdapter(hf, placeholder_token)
