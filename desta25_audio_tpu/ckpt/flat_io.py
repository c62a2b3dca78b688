"""Flat safetensors I/O for native param trees.

Serializes an arbitrary nested param tree (dicts of arrays, including int8
quantized ``{"q", "s"}`` leaves) to one safetensors file with '/'-joined
key paths.  Used by the ``hf_convert`` CLI to stage pre-converted (and
optionally pre-quantized) frozen towers so model load never re-runs the
torch->JAX conversion or re-quantizes 8B of weights.

bfloat16 is stored natively (safetensors dtype BF16) by viewing the
ml_dtypes array as uint16 and tagging the true dtype in the per-file
metadata — numpy itself has no bf16.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert SEP not in str(k), f"key {k!r} contains {SEP!r}"
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    else:
        out[prefix[:-1]] = tree
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split(SEP)
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def save_tree_safetensors(tree: Any, path: str):
    from safetensors.numpy import save_file
    flat = flatten_tree(tree)
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            dtypes[k] = "bfloat16"
            a = a.view(np.uint16)
        arrays[k] = np.ascontiguousarray(a)
    save_file(arrays, path, metadata={"desta_dtypes": json.dumps(dtypes)})


def load_tree_safetensors(path: str) -> Dict[str, Any]:
    """Load to host numpy (bf16 leaves come back as ml_dtypes.bfloat16)."""
    from safetensors import safe_open
    flat: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        dtypes = json.loads(meta.get("desta_dtypes", "{}"))
        for k in f.keys():
            a = f.get_tensor(k)
            if dtypes.get(k) == "bfloat16":
                a = a.view(jnp.bfloat16)
            flat[k] = a
    return unflatten_tree(flat)
