"""Tensor-parallel SINGLE-LAUNCH fused decode: the all-layer kernel of
ops/fused_decode.py run per "model"-axis shard with IN-KERNEL all-reduce.

The per-layer TP path (ops/fused_decode_tp.py) factors the step into 2L
pallas_calls with XLA psums between them — correct, but it re-fills the
weight-DMA ring on every launch and pays 2L collective dispatches.  This
module keeps the single-launch structure instead: each shard runs the
grid=(L,) kernel on its LOCAL head/ffn slice (H/p heads, Hkv/p kv heads,
I/p ffn lanes, cache sharded on the packed Hkv*Dh axis), and the wo /
w_down partial sums are all-reduced INSIDE the kernel by a one-shot
remote-DMA gather (every shard pushes its [Mp, D] f32 partial to every
peer, then sums a static loop — latency-optimal at decode-sized
payloads; see fused_decode._make_kernel's allreduce_into_h).  The
cross-layer weight prefetch chain — the reason the single-launch kernel
reaches ~100% of the weight-stream roofline single-chip — survives TP
untouched, and the ICI traffic (2L x (p-1) x Mp*D*4 bytes) hides under
the per-layer weight stream.

ORCA deep injection composes: after the w_down all-reduce the residual
is replicated, so the injection stages (q / audio cross-attn / o / gate)
run identically on every shard from REPLICATED injection weights — zero
extra communication, at the cost of p-redundant injection compute (the
injection stack is ~3% of tower FLOPs at the 4B flagship).

Speculative verify (Kd > 1) rides the same wrapper: the draft block is
replicated row-math, the per-shard score/value streams are local.

No multi-chip TPU is reachable from this build environment, so — like
the per-layer TP path — correctness is pinned by interpret-mode parity
tests on the virtual CPU mesh (tests/test_fused_mesh.py, including a
run under the interpreter's DMA race detector) and perf is by
construction, not measurement.

Replaces the decode loop of the reference's HF ``generate``
(modeling_desta25.py:1419-1427) for multi-chip serving; the reference
has no tensor parallelism at all (SURVEY §2.7).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .fused_decode import (
    _interpret_mode,
    _pick_sblk,
    _pick_tile,
    _run_fused,
    _stage_tiles,
    fused_inject_supported,
)

_RBUF_BUDGET = 24 * 1024 * 1024  # f32 bytes: pres + 2*tp peer partials


def _mesh_dims():
    """(mesh, p, n_data) when a mesh with a >1 "model" axis is active."""
    from ..parallel.mesh import current_mesh
    mesh = current_mesh()
    if mesh is None or "model" not in mesh.axis_names:
        return None, 0, 1
    p = mesh.shape["model"]
    if p <= 1:
        return None, 0, 1
    n_data = mesh.shape["data"] if "data" in mesh.axis_names else 1
    return mesh, p, n_data


def _local_cfg(cfg, p: int):
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // p,
        num_key_value_heads=cfg.num_key_value_heads // p,
        intermediate_size=cfg.intermediate_size // p)


def fused_mesh_supported(params, cfg, cache, kd: int = 1,
                         inject_params=None, ta_padded: int = 0) -> bool:
    """Trace-time predicate for the single-launch TP fused decode/verify
    step (shapes + flags only; mirrors fused_decode.fused_supported with
    per-shard dims)."""
    if os.environ.get("DESTA_FUSED_DECODE", "1") in ("0", "false"):
        return False
    if os.environ.get("DESTA_FUSED_MESH", "1") in ("0", "false"):
        return False
    mesh, p, n_data = _mesh_dims()
    if mesh is None:
        return False
    from .quant import is_quantized
    layers = params.get("layers", {})
    keys = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    quantized = all(is_quantized(layers.get(k)) for k in keys)
    if not quantized:
        if not all(
                isinstance(layers.get(k), jnp.ndarray)
                and layers[k].dtype == jnp.bfloat16 for k in keys):
            return False
    if inject_params is not None and not quantized:
        return False
    if cache.k.dtype != jnp.bfloat16 or cache.k.ndim != 4:
        return False
    L, B, S, KVD = cache.k.shape
    Hkv, Dh = cfg.num_key_value_heads, cfg.head_dim
    H, D, I = (cfg.num_attention_heads, cfg.hidden_size,
               cfg.intermediate_size)
    if KVD != Hkv * Dh or Dh != 128 or S % 128 or H % Hkv:
        return False
    if H % p or Hkv % p or I % p or B % n_data:
        return False
    Hl, Hkvl, Il = H // p, Hkv // p, I // p
    Bl = B // n_data
    if (Hl % Hkvl) or D % 256 or Il % 128:
        return False
    inj_dg = 0
    if inject_params is not None:
        if not fused_inject_supported(inject_params, cfg, ta_padded):
            return False
        inj_dg = inject_params["layers"]["gate1"]["q"].shape[2]
    if _stage_tiles(D, Hl, Hkvl, Dh, Il, inj_dg=inj_dg,
                    elem_bytes=1 if quantized else 2) is None:
        return False
    if _pick_sblk(S, Hkvl * Dh) is None:
        return False
    if Bl * kd * Hl * S * 4 > 6 * 1024 * 1024:
        return False
    Mp = max(16, -(-(Bl * kd) // 16) * 16)
    if (1 + 2 * p) * Mp * D * 4 > _RBUF_BUDGET:
        return False
    if kd > 1:
        if kd > 8 or Bl * kd * Hl * KVD * 4 > 24 * 1024 * 1024:
            return False
    if jax.default_backend() != "tpu" and not _interpret_mode():
        return False
    return True


# layer-param partition specs mirroring parallel.sharding._LLM_RULES
_SHARD_OUT = P(None, None, "model")   # [L, K, N] out-dim sharded
_SHARD_IN = P(None, "model", None)    # [L, K, N] in-dim sharded


def _layer_specs(lsub, quantized: bool):
    spec = {}
    for k in ("wq", "wk", "wv", "w_gate", "w_up"):
        spec[k] = ({"q": _SHARD_OUT, "s": P(None, "model")}
                   if quantized else _SHARD_OUT)
    for k in ("wo", "w_down"):
        spec[k] = ({"q": _SHARD_IN, "s": P(None, None)}
                   if quantized else _SHARD_IN)
    spec["ln1"] = {"scale": P(None, None)}
    spec["ln2"] = {"scale": P(None, None)}
    if "q_norm" in lsub:
        spec["q_norm"] = {"scale": P(None, None)}
        spec["k_norm"] = {"scale": P(None, None)}
    return spec


def _run_fused_mesh(params, cfg, inputs_embeds, attention_mask, positions,
                    cache, cache_index, inject=None):
    """shard_map the single-launch fused kernel over the active mesh.

    Weights must already be sharded by parallel.sharding
    (llm_partition_specs) and the cache by models.llm.init_kv_cache;
    batch rows shard over "data" when that axis is >1."""
    from jax import shard_map

    from ..models.llm import KVCache
    from ..parallel.mesh import current_mesh
    from .quant import is_quantized

    mesh, p, _n_data = _mesh_dims()
    assert mesh is not None
    axes = tuple(mesh.axis_names)
    B, Kd, D = inputs_embeds.shape
    lcfg = _local_cfg(cfg, p)
    quantized = is_quantized(params["layers"]["wq"])

    keys = ["wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
            "ln1", "ln2"]
    if cfg.qk_norm:
        keys += ["q_norm", "k_norm"]
    lsub = {k: params["layers"][k] for k in keys}

    ci_in = jnp.asarray(cache_index)
    ci = (jnp.broadcast_to(ci_in, (B,)) if ci_in.ndim == 0
          else ci_in).astype(jnp.int32)

    inj = inject is not None
    if inj:
        inj_static = {"ta_real": int(inject["ta_real"]),
                      "heads": int(inject["heads"])}

    def body(lsub, emb, mask, pos, ci, kc, vc, inj_p, inj_k, inj_v,
             inj_on):
        inject_l = None
        if inj:
            inject_l = {"params": inj_p, "k": inj_k, "v": inj_v,
                        "on": inj_on, **inj_static}
        h, new_cache = _run_fused(
            {"layers": lsub}, lcfg, emb, mask, pos,
            KVCache(kc, vc), ci, inject=inject_l, tp=p, mesh_axes=axes)
        return h, new_cache.k, new_cache.v

    lspec = _layer_specs(lsub, quantized)
    cache_spec = P(None, "data" if "data" in axes else None, None, "model")
    dspec = "data" if "data" in axes else None
    rep2, rep3 = P(dspec, None), P(dspec, None, None)
    in_specs = (lspec, rep3, rep2, rep2, P(dspec), cache_spec, cache_spec)
    if inj:
        inj_pspec = jax.tree.map(lambda _: P(), inject["params"])
        in_specs += (inj_pspec, P(None, dspec, None, None),
                     P(None, dspec, None, None), P(dspec))
        inj_args = (inject["params"], inject["k"], inject["v"],
                    inject["on"])
    else:
        in_specs += (P(), P(), P(), P())
        inj_args = (jnp.zeros((), jnp.float32),) * 4
    h, newk, newv = shard_map(
        body, mesh=mesh,
        in_specs=in_specs,
        out_specs=(rep3, cache_spec, cache_spec),
        check_vma=False,
    )(lsub, inputs_embeds, attention_mask, positions, ci, cache.k,
      cache.v, *inj_args)
    return h, KVCache(newk, newv)


def fused_decode_layers_mesh(params, cfg, inputs_embeds, attention_mask,
                             positions, cache, cache_index, inject=None):
    """One decode step, all layers in ONE kernel launch per shard, under
    the active "model" (x optional "data") mesh.  Same contract as
    ops.fused_decode.fused_decode_layers."""
    assert inputs_embeds.shape[1] == 1
    return _run_fused_mesh(params, cfg, inputs_embeds, attention_mask,
                           positions, cache, cache_index, inject=inject)


def fused_verify_layers_mesh(params, cfg, inputs_embeds, attention_mask,
                             positions, cache, cache_index, inject=None):
    """Speculative-verify step (Kd tokens per row) under the mesh; same
    contract as ops.fused_decode.fused_verify_layers."""
    assert inputs_embeds.shape[1] > 1
    return _run_fused_mesh(params, cfg, inputs_embeds, attention_mask,
                           positions, cache, cache_index, inject=inject)


def pick_verify_fn(params, cfg, cache, kd: int, inject_params=None,
                   ta_padded: int = 0):
    """Trace-time chooser for the speculative-verify kernel: the
    single-device fused kernel off-mesh, the single-launch TP kernel on a
    "model" mesh, else None.  Shared by generate/speculative.py and
    serve/engine.py so both speculate under tensor parallelism."""
    from .fused_decode import fused_supported, fused_verify_layers
    if fused_supported(params, cfg, cache, kd=kd):
        return fused_verify_layers
    if fused_mesh_supported(params, cfg, cache, kd=kd,
                            inject_params=inject_params,
                            ta_padded=ta_padded):
        return fused_verify_layers_mesh
    return None
