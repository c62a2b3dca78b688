"""Fused fc1 -> gelu -> fc2 Pallas kernel for the Whisper encoder FFN.

Round-3 decomposition (scripts/decomp_enc_layer.py, v5e b8 T1500) showed
the erf-gelu on the [12000, 5120] fc1 output costs ~0.63 ms/layer of VPU
work serialized between the two FFN matmuls — ~20 ms over the 32-layer
encoder.  This kernel tiles rows and chunks the 5120-wide hidden dim:

    for c in chunks(F):  h_c = x @ w1[:, c] + b1[c]
                         g_c = gelu_f32(h_c)
                         acc += g_c @ w2[c, :]

so chunk c's gelu (VPU) overlaps chunk c+1's fc1 / c-1's fc2 (MXU), and
the f32 fc1 accumulator feeds gelu directly (the XLA path rounds fc1 to
bf16 first — the kernel is slightly *more* precise).

Forward-only Pallas; the VJP recomputes through the XLA ops (the encoder
is frozen — reference modeling_desta25.py:1439-1463 — so gradients never
flow here in training; the fallback keeps jax.grad correct).

Reference behavior: HF WhisperEncoderLayer fc1/activation_fn/fc2
(modeling_desta25.py:575-608 encoder loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 resolution).  Mosaic has no erf primitive; this builds it
    from exp/div which it does lower."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * _SQRT_HALF))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc, *,
            chunk_f: int):
    x = x_ref[0]                       # [bm, D] bf16
    F = w1_ref.shape[2]
    n_chunks = F // chunk_f
    for c in range(n_chunks):
        sl = pl.ds(c * chunk_f, chunk_f)
        h = jnp.dot(x, w1_ref[0, :, sl],
                    preferred_element_type=jnp.float32)
        h = h + b1_ref[0, 0, sl].astype(jnp.float32)
        g = _gelu_f32(h).astype(jnp.bfloat16)
        p = jnp.dot(g, w2_ref[0, sl, :],
                    preferred_element_type=jnp.float32)
        if c == 0:
            acc[:] = p
        else:
            acc[:] += p
    o_ref[0] = (acc[:] + b2_ref[0, 0].astype(jnp.float32)
                ).astype(o_ref.dtype)


def ffn_supported(d: int, f: int, dtype) -> bool:
    return (dtype == jnp.bfloat16 and d % 128 == 0 and f % 1280 == 0
            and 2 * (d * f) * 2 < 60 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def encoder_ffn(x, w1, b1, w2, b2, block_m: int = 256,
                interpret: bool = False):
    """x [B, T, D] bf16; w1 [D, F]; b1 [F]; w2 [F, D]; b2 [D] ->
    [B, T, D] = fc2(gelu(fc1(x))).  Callers should check
    :func:`ffn_supported` and fall back otherwise."""
    return _forward(x, w1, b1, w2, b2, block_m, interpret)


def _xla_ffn(x, w1, b1, w2, b2):
    from .core import gelu
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = (h + b1.astype(jnp.float32)).astype(x.dtype)
    h = gelu(h)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(x.dtype)


def _forward(x, w1, b1, w2, b2, block_m, interpret):
    B, T, D = x.shape
    F = w1.shape[1]
    if not ffn_supported(D, F, x.dtype):
        return _xla_ffn(x, w1, b1, w2, b2)
    M = B * T
    x2 = x.reshape(M, D)
    # bm=256 measured fastest in-context on v5e (scripts/ab_enc_ffn.py:
    # 134.8 / 144.1 / 141.2 / 139.8 ms encoder at bm 256/512/1024/1536)
    bm = min(block_m, M)
    chunk_f = 1280
    grid = (pl.cdiv(M, bm),)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk_f=chunk_f),
        out_shape=jax.ShapeDtypeStruct((1, M, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, F), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2[None], w1[None], b1[None, None], w2[None], b2[None, None])
    return out[0].reshape(B, T, D)


def _fwd(x, w1, b1, w2, b2, block_m, interpret):
    return _forward(x, w1, b1, w2, b2, block_m, interpret), \
        (x, w1, b1, w2, b2)


def _bwd(block_m, interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_xla_ffn, x, w1, b1, w2, b2)
    return vjp(g)


encoder_ffn.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# W8A8 variant: int8 weights (ops/quant.quantize_encoder_params) + in-kernel
# per-row dynamic activation quant -> int8 MXU (~1.7x the bf16 dot rate on
# v5e, scripts/probe_int8_mxu_pallas.py).  The encoder_quant="int8" XLA path
# pays a quant/dequant epilogue per matmul that breaks fusion; doing both
# quantizations inside the chunk loop overlaps them (VPU) with the int8 dots
# (MXU), like the gelu in the bf16 kernel above.
# ---------------------------------------------------------------------------


def _quant_rows(x):
    """f32 [m, k] -> (int8 [m, k], f32 [m, 1] scale); symmetric per-row."""
    ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _kernel_w8a8(x_ref, q1_ref, s1_ref, b1_ref, q2_ref, s2_ref, b2_ref,
                 o_ref, acc, *, chunk_f: int):
    x = x_ref[0].astype(jnp.float32)       # [bm, D]
    xq, sx = _quant_rows(x)
    F = q1_ref.shape[2]
    n_chunks = F // chunk_f
    for c in range(n_chunks):
        sl = pl.ds(c * chunk_f, chunk_f)
        hi = jnp.dot(xq, q1_ref[0, :, sl],
                     preferred_element_type=jnp.int32)
        h = hi.astype(jnp.float32) * (sx * s1_ref[0, 0, sl][None, :])
        h = h + b1_ref[0, 0, sl].astype(jnp.float32)
        g = _gelu_f32(h)
        gq, sg = _quant_rows(g)
        pi = jnp.dot(gq, q2_ref[0, sl, :],
                     preferred_element_type=jnp.int32)
        p = pi.astype(jnp.float32) * sg * s2_ref[0, 0][None, :]
        if c == 0:
            acc[:] = p
        else:
            acc[:] += p
    o_ref[0] = (acc[:] + b2_ref[0, 0].astype(jnp.float32)
                ).astype(o_ref.dtype)


def ffn_w8a8_supported(d: int, f: int, dtype) -> bool:
    return (dtype == jnp.bfloat16 and d % 128 == 0 and f % 1280 == 0
            and 2 * (d * f) < 60 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def encoder_ffn_w8a8(x, q1, s1, b1, q2, s2, b2, block_m: int = 256,
                     interpret: bool = False):
    """x [B, T, D] bf16; q1 int8 [D, F] / s1 [F]; q2 int8 [F, D] / s2 [D]
    (per-out-channel scales from ops/quant.quantize_weight); b1 [F], b2 [D].
    Activations are quantized per-row inside the kernel.  Callers should
    check :func:`ffn_w8a8_supported` and fall back otherwise."""
    return _forward_w8a8(x, q1, s1, b1, q2, s2, b2, block_m, interpret)


def _xla_ffn_w8a8(x, q1, s1, b1, q2, s2, b2):
    """Dequantized-weight reference path (also the VJP recompute — the
    encoder is frozen, so this only keeps jax.grad well-defined)."""
    w1 = (q1.astype(jnp.float32) * s1[None, :]).astype(x.dtype)
    w2 = (q2.astype(jnp.float32) * s2[None, :]).astype(x.dtype)
    return _xla_ffn(x, w1, b1, w2, b2)


def _forward_w8a8(x, q1, s1, b1, q2, s2, b2, block_m, interpret):
    B, T, D = x.shape
    F = q1.shape[1]
    if not ffn_w8a8_supported(D, F, x.dtype):
        return _xla_ffn_w8a8(x, q1, s1, b1, q2, s2, b2)
    M = B * T
    x2 = x.reshape(M, D)
    bm = min(block_m, M)
    chunk_f = 1280
    grid = (pl.cdiv(M, bm),)
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel_w8a8, chunk_f=chunk_f),
        out_shape=jax.ShapeDtypeStruct((1, M, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, F), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, D), lambda m: (0, m, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2[None], q1[None], s1.astype(f32)[None, None],
      b1[None, None], q2[None], s2.astype(f32)[None, None],
      b2[None, None])
    return out[0].reshape(B, T, D)


def _fwd_w8a8(x, q1, s1, b1, q2, s2, b2, block_m, interpret):
    return _forward_w8a8(x, q1, s1, b1, q2, s2, b2, block_m, interpret), \
        (x, q1, s1, b1, q2, s2, b2)


def _bwd_w8a8(block_m, interpret, res, g):
    _, vjp = jax.vjp(_xla_ffn_w8a8, *res)
    return vjp(g)


encoder_ffn_w8a8.defvjp(_fwd_w8a8, _bwd_w8a8)
