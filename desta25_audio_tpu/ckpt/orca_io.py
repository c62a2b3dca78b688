"""ORCA trainable-checkpoint key mapping (reference <-> JAX trees).

Reference key space (module attribute paths of ``ORCAHybridConnector``,
modeling_desta25.py:208-357, and the ``orca_cross_attns`` ModuleList,
:1101-1141):

- perception.connector.global_queries.{i}            [1, K, d_enc]
- perception.connector.global_layer_weights          [K, n_taps]
- perception.connector.global_qformer.layer.{i}.*    (BertEncoder keys)
- perception.connector.global_proj.{0,1}.*           (LayerNorm, Linear)
- perception.connector.local_layer_weights           [n_taps]
- perception.connector.local_proj_in.*               Linear
- perception.connector.local_conv.*                  Conv1d [out, in, k]
- perception.connector.local_ln.*                    LayerNorm
- orca_cross_attns.{i}.cross_attn.{in_proj_weight,in_proj_bias,
  out_proj.weight,out_proj.bias}                     torch MultiheadAttention
- orca_cross_attns.{i}.gate_proj.{0,2}.*             gate MLP
- orca_cross_attns.{i}.ln.*                          LayerNorm

Legacy checkpoints used ``ocar_*`` prefixes; the loader in desta_io renames
them before dispatch (reference load_state_dict shim,
modeling_desta25.py:1294-1310).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DeSTA25Config
from ..ops.core import stack_layers

_PRE = "perception.connector"


def orca_to_ref(trainable: Dict[str, Any],
                config: DeSTA25Config) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    c = trainable["connector"]
    gq = np.asarray(c["global_queries"], np.float32)
    for i in range(gq.shape[0]):
        out[f"{_PRE}.global_queries.{i}"] = gq[i:i + 1]
    out[f"{_PRE}.global_layer_weights"] = np.asarray(
        c["global_layer_weights"], np.float32)
    out.update(_bert_to_ref(c["global_qformer"], f"{_PRE}.global_qformer"))
    out[f"{_PRE}.global_proj.0.weight"] = np.asarray(
        c["global_proj_ln"]["scale"], np.float32)
    out[f"{_PRE}.global_proj.0.bias"] = np.asarray(
        c["global_proj_ln"]["bias"], np.float32)
    out[f"{_PRE}.global_proj.1.weight"] = np.asarray(
        c["global_proj"]["w"], np.float32).T
    out[f"{_PRE}.global_proj.1.bias"] = np.asarray(
        c["global_proj"]["b"], np.float32)

    if "local_layer_weights" in c:
        out[f"{_PRE}.local_layer_weights"] = np.asarray(
            c["local_layer_weights"], np.float32)
        out[f"{_PRE}.local_proj_in.weight"] = np.asarray(
            c["local_proj_in"]["w"], np.float32).T
        out[f"{_PRE}.local_proj_in.bias"] = np.asarray(
            c["local_proj_in"]["b"], np.float32)
        # ours [k, in, out] -> torch [out, in, k]
        out[f"{_PRE}.local_conv.weight"] = np.transpose(
            np.asarray(c["local_conv"]["w"], np.float32), (2, 1, 0))
        out[f"{_PRE}.local_conv.bias"] = np.asarray(
            c["local_conv"]["b"], np.float32)
        out[f"{_PRE}.local_ln.weight"] = np.asarray(
            c["local_ln"]["scale"], np.float32)
        out[f"{_PRE}.local_ln.bias"] = np.asarray(
            c["local_ln"]["bias"], np.float32)

    if "orca_cross_attns" in trainable:
        layers = trainable["orca_cross_attns"]["layers"]
        n = np.asarray(layers["ln"]["scale"]).shape[0]
        for i in range(n):
            li = jax.tree.map(lambda x: np.asarray(x, np.float32)[i], layers)
            pre = f"orca_cross_attns.{i}"
            # torch MHA packs q/k/v into in_proj.  concat(axis=1).T ==
            # concat([q.T, k.T, v.T], axis=0) but copies contiguously
            # and defers the transpose to a view — the .T-first version
            # was 3 strided transpose copies per layer (~30 s for the
            # 8B-scale 36-layer stack; save_file's ascontiguousarray
            # pays the transpose only when actually writing)
            out[f"{pre}.cross_attn.in_proj_weight"] = np.concatenate(
                [li["q"]["w"], li["k"]["w"], li["v"]["w"]], axis=1).T
            out[f"{pre}.cross_attn.in_proj_bias"] = np.concatenate(
                [li["q"]["b"], li["k"]["b"], li["v"]["b"]], axis=0)
            out[f"{pre}.cross_attn.out_proj.weight"] = li["o"]["w"].T
            out[f"{pre}.cross_attn.out_proj.bias"] = li["o"]["b"]
            out[f"{pre}.gate_proj.0.weight"] = li["gate1"]["w"].T
            out[f"{pre}.gate_proj.0.bias"] = li["gate1"]["b"]
            out[f"{pre}.gate_proj.2.weight"] = li["gate2"]["w"].T
            out[f"{pre}.gate_proj.2.bias"] = li["gate2"]["b"]
            out[f"{pre}.ln.weight"] = li["ln"]["scale"]
            out[f"{pre}.ln.bias"] = li["ln"]["bias"]
    return out


def orca_from_ref(params: Dict[str, Any], sd: Dict[str, np.ndarray],
                  config: DeSTA25Config) -> Dict[str, Any]:
    params = dict(params)
    c = dict(params["connector"])

    # Auto-detect tap count from checkpoint shapes and re-derive the
    # connector structure when it disagrees (reference shape-driven
    # reconfiguration, modeling_desta25.py:1312-1354).
    n_taps_ckpt = int(sd[f"{_PRE}.global_layer_weights"].shape[1])
    n_taps_ours = int(np.asarray(c["global_queries"]).shape[0])
    if n_taps_ckpt != n_taps_ours:
        raise ValueError(
            f"checkpoint has {n_taps_ckpt} tapped layers but config expects "
            f"{n_taps_ours}; set orca_use_all_layers accordingly")

    c["global_queries"] = jnp.stack([
        jnp.asarray(sd[f"{_PRE}.global_queries.{i}"][0])
        for i in range(n_taps_ckpt)])
    c["global_layer_weights"] = jnp.asarray(
        sd[f"{_PRE}.global_layer_weights"])
    n_layers = int(np.asarray(
        params["connector"]["global_qformer"]["layers"]["inter"]["w"]
    ).shape[0])
    c["global_qformer"] = _bert_from_ref(sd, f"{_PRE}.global_qformer",
                                         n_layers)
    c["global_proj_ln"] = {
        "scale": jnp.asarray(sd[f"{_PRE}.global_proj.0.weight"]),
        "bias": jnp.asarray(sd[f"{_PRE}.global_proj.0.bias"])}
    c["global_proj"] = {
        "w": jnp.asarray(sd[f"{_PRE}.global_proj.1.weight"].T),
        "b": jnp.asarray(sd[f"{_PRE}.global_proj.1.bias"])}

    if f"{_PRE}.local_layer_weights" in sd:
        c["local_layer_weights"] = jnp.asarray(
            sd[f"{_PRE}.local_layer_weights"])
        c["local_proj_in"] = {
            "w": jnp.asarray(sd[f"{_PRE}.local_proj_in.weight"].T),
            "b": jnp.asarray(sd[f"{_PRE}.local_proj_in.bias"])}
        c["local_conv"] = {
            "w": jnp.asarray(np.transpose(sd[f"{_PRE}.local_conv.weight"],
                                          (2, 1, 0))),
            "b": jnp.asarray(sd[f"{_PRE}.local_conv.bias"])}
        c["local_ln"] = {
            "scale": jnp.asarray(sd[f"{_PRE}.local_ln.weight"]),
            "bias": jnp.asarray(sd[f"{_PRE}.local_ln.bias"])}
    params["connector"] = c

    if "orca_cross_attns.0.ln.weight" in sd and \
            "orca_cross_attns" in params:
        n = int(np.asarray(
            params["orca_cross_attns"]["layers"]["ln"]["scale"]).shape[0])
        layers = []
        for i in range(n):
            pre = f"orca_cross_attns.{i}"
            ipw = sd[f"{pre}.cross_attn.in_proj_weight"]
            ipb = sd[f"{pre}.cross_attn.in_proj_bias"]
            d = ipw.shape[1]
            layers.append({
                "q": {"w": jnp.asarray(ipw[:d].T),
                      "b": jnp.asarray(ipb[:d])},
                "k": {"w": jnp.asarray(ipw[d:2 * d].T),
                      "b": jnp.asarray(ipb[d:2 * d])},
                "v": {"w": jnp.asarray(ipw[2 * d:].T),
                      "b": jnp.asarray(ipb[2 * d:])},
                "o": {"w": jnp.asarray(
                    sd[f"{pre}.cross_attn.out_proj.weight"].T),
                    "b": jnp.asarray(sd[f"{pre}.cross_attn.out_proj.bias"])},
                "gate1": {"w": jnp.asarray(sd[f"{pre}.gate_proj.0.weight"].T),
                          "b": jnp.asarray(sd[f"{pre}.gate_proj.0.bias"])},
                "gate2": {"w": jnp.asarray(sd[f"{pre}.gate_proj.2.weight"].T),
                          "b": jnp.asarray(sd[f"{pre}.gate_proj.2.bias"])},
                "ln": {"scale": jnp.asarray(sd[f"{pre}.ln.weight"]),
                       "bias": jnp.asarray(sd[f"{pre}.ln.bias"])},
            })
        params["orca_cross_attns"] = {"layers": stack_layers(layers)}
    return params


# -- BERT helpers (qformer inside the ORCA connector) -----------------------


def _bert_to_ref(tree: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    layers = tree["layers"]
    n = int(np.asarray(layers["inter"]["w"]).shape[0])

    def attn(i, block, name):
        for ours, theirs in (("q", "self.query"), ("k", "self.key"),
                             ("v", "self.value"), ("o", "output.dense")):
            out[f"{prefix}.layer.{i}.{name}.{theirs}.weight"] = \
                np.asarray(block[ours]["w"], np.float32)[i].T
            out[f"{prefix}.layer.{i}.{name}.{theirs}.bias"] = \
                np.asarray(block[ours]["b"], np.float32)[i]
        out[f"{prefix}.layer.{i}.{name}.output.LayerNorm.weight"] = \
            np.asarray(block["ln"]["scale"], np.float32)[i]
        out[f"{prefix}.layer.{i}.{name}.output.LayerNorm.bias"] = \
            np.asarray(block["ln"]["bias"], np.float32)[i]

    for i in range(n):
        attn(i, layers["self"], "attention")
        attn(i, layers["cross"], "crossattention")
        out[f"{prefix}.layer.{i}.intermediate.dense.weight"] = \
            np.asarray(layers["inter"]["w"], np.float32)[i].T
        out[f"{prefix}.layer.{i}.intermediate.dense.bias"] = \
            np.asarray(layers["inter"]["b"], np.float32)[i]
        out[f"{prefix}.layer.{i}.output.dense.weight"] = \
            np.asarray(layers["out"]["w"], np.float32)[i].T
        out[f"{prefix}.layer.{i}.output.dense.bias"] = \
            np.asarray(layers["out"]["b"], np.float32)[i]
        out[f"{prefix}.layer.{i}.output.LayerNorm.weight"] = \
            np.asarray(layers["out_ln"]["scale"], np.float32)[i]
        out[f"{prefix}.layer.{i}.output.LayerNorm.bias"] = \
            np.asarray(layers["out_ln"]["bias"], np.float32)[i]
    return out


def _bert_from_ref(sd: Dict[str, np.ndarray], prefix: str,
                   n_layers: int) -> Dict[str, Any]:
    from .hf_convert import convert_bert_encoder_state
    sub = {k[len(prefix) + 1:]: v for k, v in sd.items()
           if k.startswith(prefix + ".")}
    return convert_bert_encoder_state(sub, n_layers)
