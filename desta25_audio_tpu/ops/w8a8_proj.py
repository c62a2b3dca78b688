"""Fused-quant W8A8 projection kernels for the encoder attention path.

Round 2 measured plain XLA dynamic-int8 on the encoder's q/k/v/o
projections SLOWER end-to-end (175 vs 166 ms at b8) even though the
isolated int8 matmul is ~1.65x bf16: the per-op activation-quant /
dequant epilogues break XLA's fusion around the packed attention kernel,
and N=1280 never amortizes them.  These kernels remove the epilogues
entirely by doing the per-row activation quant INSIDE the launch (VPU
work overlapping the int8 MXU dots, the same trick as
ops/enc_ffn._kernel_w8a8):

- :func:`qkv_w8a8` — ONE act-quant pass of the layer-normed input
  shared by all three q/k/v int8 dots, three outputs in one launch.
- :func:`proj_w8a8` — single projection (the attention output o-proj).

Weights come from ops/quant.quantize_weight ({"q" int8 [K, N],
"s" f32 [N]} per-out-channel).  Forward-only Pallas; the VJP recomputes
through the dequantized-weight XLA path (the encoder is frozen —
reference modeling_desta25.py:1439-1463 — so training gradients never
flow here; the fallback keeps jax.grad well-defined).

Reference behavior: HF WhisperAttention q/k/v/out_proj
(modeling_desta25.py:575-608 encoder loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .enc_ffn import _quant_rows


def _dequant_dot(xq, sx, w_ref, s_ref, b_ref):
    y = jnp.dot(xq, w_ref[0], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * s_ref[0, 0][None, :])
    return y + b_ref[0, 0].astype(jnp.float32)


def _kernel_qkv(x_ref, wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
                wv_ref, sv_ref, bv_ref, oq_ref, ok_ref, ov_ref):
    x = x_ref[0].astype(jnp.float32)           # [bm, D]
    xq, sx = _quant_rows(x)
    oq_ref[0] = _dequant_dot(xq, sx, wq_ref, sq_ref,
                             bq_ref).astype(oq_ref.dtype)
    ok_ref[0] = _dequant_dot(xq, sx, wk_ref, sk_ref,
                             bk_ref).astype(ok_ref.dtype)
    ov_ref[0] = _dequant_dot(xq, sx, wv_ref, sv_ref,
                             bv_ref).astype(ov_ref.dtype)


def _kernel_one(x_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    xq, sx = _quant_rows(x)
    o_ref[0] = _dequant_dot(xq, sx, w_ref, s_ref, b_ref).astype(o_ref.dtype)


def proj_w8a8_supported(d: int, n: int, dtype) -> bool:
    # weights must fit VMEM alongside the row blocks
    return (dtype == jnp.bfloat16 and d % 128 == 0 and n % 128 == 0
            and d * n < 16 * 1024 * 1024)


def _xla_proj(x, leaf):
    """Dequantized-weight reference path (also the VJP recompute)."""
    w = (leaf["q"].astype(jnp.float32) * leaf["s"][None, :]).astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if leaf.get("b") is not None:
        y = y + leaf["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _bias_f32(leaf, n):
    b = leaf.get("b")
    if b is None:
        return jnp.zeros((n,), jnp.float32)
    return b.astype(jnp.float32)


def _wsb(leaf, n):
    return (leaf["q"][None], leaf["s"].astype(jnp.float32)[None, None],
            _bias_f32(leaf, n)[None, None])


def _wsb_specs(d, n):
    return [
        pl.BlockSpec((1, d, n), lambda m: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda m: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda m: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def qkv_w8a8(x, lq, lk, lv, block_m: int = 512, interpret: bool = False):
    """x [B, T, D] bf16; lq/lk/lv {"q" int8 [D, N], "s" [N], "b"? [N]} ->
    (q, k, v) each [B, T, N].  One shared in-kernel act-quant pass feeds
    all three int8 dots.  Callers should check :func:`proj_w8a8_supported`
    and fall back otherwise."""
    return _forward_qkv(x, lq, lk, lv, block_m, interpret)


def _forward_qkv(x, lq, lk, lv, block_m, interpret):
    B, T, D = x.shape
    N = lq["q"].shape[1]
    if not proj_w8a8_supported(D, N, x.dtype):
        return _xla_proj(x, lq), _xla_proj(x, lk), _xla_proj(x, lv)
    M = B * T
    bm = min(block_m, M)
    grid = (pl.cdiv(M, bm),)
    row_spec = pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bm, N), lambda m: (0, m, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((1, M, N), x.dtype)
    outs = pl.pallas_call(
        _kernel_qkv,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[row_spec] + _wsb_specs(D, N) * 3,
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(M, D)[None], *_wsb(lq, N), *_wsb(lk, N), *_wsb(lv, N))
    return tuple(o[0].reshape(B, T, N) for o in outs)


def _fwd_qkv(x, lq, lk, lv, block_m, interpret):
    return _forward_qkv(x, lq, lk, lv, block_m, interpret), (x, lq, lk, lv)


def _bwd_qkv(block_m, interpret, res, g):
    x, lq, lk, lv = res
    _, vjp = jax.vjp(
        lambda x, lq, lk, lv: (_xla_proj(x, lq), _xla_proj(x, lk),
                               _xla_proj(x, lv)), x, lq, lk, lv)
    return vjp(g)


qkv_w8a8.defvjp(_fwd_qkv, _bwd_qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def proj_w8a8(x, leaf, block_m: int = 512, interpret: bool = False):
    """x [B, T, D] bf16; leaf {"q" int8 [D, N], "s" [N], "b"? [N]} ->
    [B, T, N] with in-kernel per-row activation quant."""
    return _forward_one(x, leaf, block_m, interpret)


def _forward_one(x, leaf, block_m, interpret):
    B, T, D = x.shape
    N = leaf["q"].shape[1]
    if not proj_w8a8_supported(D, N, x.dtype):
        return _xla_proj(x, leaf)
    M = B * T
    bm = min(block_m, M)
    grid = (pl.cdiv(M, bm),)
    out = pl.pallas_call(
        _kernel_one,
        out_shape=jax.ShapeDtypeStruct((1, M, N), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                               memory_space=pltpu.VMEM)]
        + _wsb_specs(D, N),
        out_specs=pl.BlockSpec((1, bm, N), lambda m: (0, m, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(M, D)[None], *_wsb(leaf, N))
    return out[0].reshape(B, T, N)


def _fwd_one(x, leaf, block_m, interpret):
    return _forward_one(x, leaf, block_m, interpret), (x, leaf)


def _bwd_one(block_m, interpret, res, g):
    x, leaf = res
    _, vjp = jax.vjp(_xla_proj, x, leaf)
    return vjp(g)


proj_w8a8.defvjp(_fwd_one, _bwd_one)
