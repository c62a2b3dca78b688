"""HF checkpoint -> JAX param tree converters.

Converts PyTorch state dicts (from ``safetensors`` files or in-memory HF
modules) for Whisper, Llama-3.x and Qwen3 into this framework's param
trees.  Replaces the reference's reliance on
``WhisperForConditionalGeneration.from_pretrained`` /
``AutoModelForCausalLM.from_pretrained`` (modeling_desta25.py:505, :713)
with an explicit, hub-optional conversion step.

All torch linear weights are [out, in] and stored transposed here
([in, out]); conv1d weights [out, in, k] become [k, in, out].
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig, WhisperConfig


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (handles bfloat16)."""
    if isinstance(t, np.ndarray):
        return t
    try:
        import torch
        if isinstance(t, torch.Tensor):
            t = t.detach()
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def load_safetensors_state(path: str) -> Dict[str, np.ndarray]:
    """Load one .safetensors file or every shard in a directory."""
    from safetensors import safe_open
    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    else:
        files = [path]
    state: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as fp:
            for k in fp.keys():
                state[k] = fp.get_tensor(k)
    return state


class _SD:
    """State-dict view with prefix stripping and access tracking."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used = set()

    def __call__(self, key: str, transpose: bool = False) -> jnp.ndarray:
        x = _np(self.sd[key])
        if x.dtype == np.float16:
            x = x.astype(np.float32)
        # numpy has no bfloat16; safetensors-np returns uint16 views for
        # bf16 — reinterpret via jnp.
        if x.dtype == np.uint16:
            x = jnp.asarray(x.view("V2")).view(jnp.bfloat16)
            x = np.asarray(x.astype(jnp.float32))
        self.used.add(key)
        if transpose:
            x = x.T if x.ndim == 2 else x
        return jnp.asarray(x)

    def has(self, key: str) -> bool:
        return key in self.sd


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


def _conv_w(x: jnp.ndarray) -> jnp.ndarray:
    # torch [out, in, k] -> lax WIO [k, in, out]
    return jnp.transpose(x, (2, 1, 0))


def _whisper_attn(g: _SD, p: str, has_k_bias: bool = False):
    out = {
        "q": {"w": g(f"{p}.q_proj.weight", True), "b": g(f"{p}.q_proj.bias")},
        "k": {"w": g(f"{p}.k_proj.weight", True)},
        "v": {"w": g(f"{p}.v_proj.weight", True), "b": g(f"{p}.v_proj.bias")},
        "o": {"w": g(f"{p}.out_proj.weight", True),
              "b": g(f"{p}.out_proj.bias")},
    }
    if has_k_bias and g.has(f"{p}.k_proj.bias"):
        out["k"]["b"] = g(f"{p}.k_proj.bias")
    return out


def _ln(g: _SD, p: str):
    return {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}


def convert_whisper_state(sd: Mapping[str, Any], cfg: WhisperConfig,
                          dtype=jnp.float32) -> Dict[str, Any]:
    """HF WhisperForConditionalGeneration state dict -> our param tree."""
    g = _SD(sd)
    pre = "model." if g.has("model.encoder.conv1.weight") else ""

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"{pre}encoder.layers.{i}"
        enc_layers.append({
            "ln1": _ln(g, f"{p}.self_attn_layer_norm"),
            "attn": _whisper_attn(g, f"{p}.self_attn"),
            "ln2": _ln(g, f"{p}.final_layer_norm"),
            "fc1": {"w": g(f"{p}.fc1.weight", True), "b": g(f"{p}.fc1.bias")},
            "fc2": {"w": g(f"{p}.fc2.weight", True), "b": g(f"{p}.fc2.bias")},
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"{pre}decoder.layers.{i}"
        dec_layers.append({
            "ln1": _ln(g, f"{p}.self_attn_layer_norm"),
            "self_attn": _whisper_attn(g, f"{p}.self_attn"),
            "ln_x": _ln(g, f"{p}.encoder_attn_layer_norm"),
            "cross_attn": _whisper_attn(g, f"{p}.encoder_attn"),
            "ln2": _ln(g, f"{p}.final_layer_norm"),
            "fc1": {"w": g(f"{p}.fc1.weight", True), "b": g(f"{p}.fc1.bias")},
            "fc2": {"w": g(f"{p}.fc2.weight", True), "b": g(f"{p}.fc2.bias")},
        })

    from ..ops.core import stack_layers, tree_cast
    params = {
        "encoder": {
            "conv1": {"w": _conv_w(g(f"{pre}encoder.conv1.weight")),
                      "b": g(f"{pre}encoder.conv1.bias")},
            "conv2": {"w": _conv_w(g(f"{pre}encoder.conv2.weight")),
                      "b": g(f"{pre}encoder.conv2.bias")},
            "embed_positions": g(f"{pre}encoder.embed_positions.weight"),
            "layers": stack_layers(enc_layers),
            "ln_post": _ln(g, f"{pre}encoder.layer_norm"),
        },
        "decoder": {
            "embed_tokens": g(f"{pre}decoder.embed_tokens.weight"),
            "embed_positions": g(f"{pre}decoder.embed_positions.weight"),
            "layers": stack_layers(dec_layers),
            "ln": _ln(g, f"{pre}decoder.layer_norm"),
        },
    }
    return tree_cast(params, dtype)


# ---------------------------------------------------------------------------
# Llama / Qwen3
# ---------------------------------------------------------------------------


def convert_llm_state(sd: Mapping[str, Any], cfg: LLMConfig,
                      dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF LlamaForCausalLM / Qwen3ForCausalLM state dict -> our tree."""
    g = _SD(sd)
    pre = "model." if g.has("model.embed_tokens.weight") else ""

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pre}layers.{i}"
        layer = {
            "ln1": {"scale": g(f"{p}.input_layernorm.weight")},
            "wq": g(f"{p}.self_attn.q_proj.weight", True),
            "wk": g(f"{p}.self_attn.k_proj.weight", True),
            "wv": g(f"{p}.self_attn.v_proj.weight", True),
            "wo": g(f"{p}.self_attn.o_proj.weight", True),
            "ln2": {"scale": g(f"{p}.post_attention_layernorm.weight")},
            "w_gate": g(f"{p}.mlp.gate_proj.weight", True),
            "w_up": g(f"{p}.mlp.up_proj.weight", True),
            "w_down": g(f"{p}.mlp.down_proj.weight", True),
        }
        if cfg.qk_norm:
            layer["q_norm"] = {"scale": g(f"{p}.self_attn.q_norm.weight")}
            layer["k_norm"] = {"scale": g(f"{p}.self_attn.k_norm.weight")}
        layers.append(layer)

    from ..ops.core import stack_layers, tree_cast
    params = {
        "embed": g(f"{pre}embed_tokens.weight"),
        "layers": stack_layers(layers),
        "norm": {"scale": g(f"{pre}norm.weight")},
    }
    if not cfg.tie_word_embeddings:
        if g.has("lm_head.weight"):
            params["lm_head"] = g("lm_head.weight", True)
        else:
            params["lm_head"] = jnp.transpose(params["embed"])
    return tree_cast(params, dtype)


# ---------------------------------------------------------------------------
# BERT (Q-Former)
# ---------------------------------------------------------------------------


def convert_bert_encoder_state(sd: Mapping[str, Any], num_layers: int,
                               prefix: str = "",
                               dtype=jnp.float32) -> Dict[str, Any]:
    """HF BertEncoder state dict -> our qformer tree ({"layers": ...}).

    Key space matches ``BertEncoder`` as used by the reference
    (modeling_desta25.py:154-164): ``layer.{i}.attention.self.query`` etc.,
    with ``crossattention`` blocks since add_cross_attention=True.
    """
    g = _SD(sd)

    def attn(p):
        return {
            "q": {"w": g(f"{p}.self.query.weight", True),
                  "b": g(f"{p}.self.query.bias")},
            "k": {"w": g(f"{p}.self.key.weight", True),
                  "b": g(f"{p}.self.key.bias")},
            "v": {"w": g(f"{p}.self.value.weight", True),
                  "b": g(f"{p}.self.value.bias")},
            "o": {"w": g(f"{p}.output.dense.weight", True),
                  "b": g(f"{p}.output.dense.bias")},
            "ln": {"scale": g(f"{p}.output.LayerNorm.weight"),
                   "bias": g(f"{p}.output.LayerNorm.bias")},
        }

    layers = []
    for i in range(num_layers):
        p = f"{prefix}layer.{i}"
        layers.append({
            "self": attn(f"{p}.attention"),
            "cross": attn(f"{p}.crossattention"),
            "inter": {"w": g(f"{p}.intermediate.dense.weight", True),
                      "b": g(f"{p}.intermediate.dense.bias")},
            "out": {"w": g(f"{p}.output.dense.weight", True),
                    "b": g(f"{p}.output.dense.bias")},
            "out_ln": {"scale": g(f"{p}.output.LayerNorm.weight"),
                       "bias": g(f"{p}.output.LayerNorm.bias")},
        })
    from ..ops.core import stack_layers, tree_cast
    return tree_cast({"layers": stack_layers(layers)}, dtype)


def convert_from_torch_module(module, convert_fn: Callable, cfg,
                              dtype=jnp.float32):
    """Convert directly from an in-memory torch module (tests / local ckpts)."""
    sd = {k: v for k, v in module.state_dict().items()}
    return convert_fn(sd, cfg, dtype)
