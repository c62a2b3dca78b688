"""LoRA checkpoint key mapping (peft naming).

Reference applies peft LoRA on q/k/v_proj and unwraps to base model
(modeling_desta25.py:720-729), so trainable keys look like
``llm_model.model.layers.{i}.self_attn.q_proj.lora_A.default.weight``
([r, in], torch layout) / ``...lora_B.default.weight`` ([out, r]).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DeSTA25Config
from ..ops.core import stack_layers

_TARGETS = ("q", "k", "v")


def _key(i: int, t: str, ab: str) -> str:
    return (f"llm_model.model.layers.{i}.self_attn.{t}_proj."
            f"lora_{ab}.default.weight")


def lora_to_ref(lora: Dict[str, Any],
                config: DeSTA25Config) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    layers = lora["layers"]
    n = int(np.asarray(layers["q"]["a"]).shape[0])
    for i in range(n):
        for t in _TARGETS:
            # ours a: [in, r] -> torch lora_A: [r, in]
            out[_key(i, t, "A")] = np.asarray(
                layers[t]["a"], np.float32)[i].T
            # ours b: [r, out] -> torch lora_B: [out, r]
            out[_key(i, t, "B")] = np.asarray(
                layers[t]["b"], np.float32)[i].T
    return out


def lora_from_ref(lora_template: Dict[str, Any],
                  sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    layers_t = lora_template["layers"]
    n = int(np.asarray(layers_t["q"]["a"]).shape[0])
    layers = []
    for i in range(n):
        layer = {}
        for t in _TARGETS:
            layer[t] = {"a": jnp.asarray(sd[_key(i, t, "A")].T),
                        "b": jnp.asarray(sd[_key(i, t, "B")].T)}
        layers.append(layer)
    return {"layers": stack_layers(layers)}
