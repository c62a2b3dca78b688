"""Packed-layout flash attention for the Whisper encoder.

The stock Pallas flash kernel wants [B, H, T, D] tensors; getting there
from the projection outputs costs four [B, T, H*D] <-> [B, H, T, D]
transposes plus T-padding copies per layer — ~1.3 ms/layer of pure HBM
traffic on v5e (measured: in-context attention 2.55 ms/layer vs 1.23 ms
for the kernel alone, scripts/sweep_flash.py + /tmp/enc_parts.py).

This kernel consumes the projection outputs directly: q/k/v are
[B, T, H*Dh] bf16 with heads packed in the minor dim.  Each program owns
one (batch, head-group, q-block) cell where a head group is the
128 // Dh heads living in one 128-lane slice — lane-aligned loads, no
relayout anywhere.  kv length is masked in-kernel against the true T, so
the 1500-frame encoder needs no padding to 1536 and no segment ids.

Bidirectional (no causal mask), single kv block (encoder T fits VMEM).
Forward-only Pallas; the VJP falls back to the XLA path (the encoder is
frozen in this framework — reference modeling_desta25.py:1439-1463 — so
gradients never actually flow through it, but the fallback keeps
jax.grad correct if they ever do).

Reference behavior: HF WhisperAttention (encoder self-attention),
modeling_desta25.py:575-608 inner loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, dh: int, t_kv: int,
            scale: float):
    """One (batch, head-group, q-block) cell.

    q_ref: [1, bq, 128]; k_ref/v_ref: [1, Tkv_block, 128];
    o_ref: [1, bq, 128].  ``heads`` = 128 // dh heads in this lane group.

    The head loop is software-pipelined: head ``h+1``'s QK^T (MXU) is
    issued before head ``h``'s softmax (VPU) + PV, so the scheduler can
    overlap the two units.  At encoder shape (B8, T1500, Dh64) the
    per-layer softmax is ~369M exp ≈ 0.6 ms of VPU work — serializing it
    with the dots cost ~0.35 ms/layer (A/B: scripts/ab_enc_attn.py,
    1.27 → 0.91 ms median with the pipeline + bq=512).
    """
    q = q_ref[0]  # [bq, 128]
    k = k_ref[0]
    v = v_ref[0]
    tkv = k.shape[0]
    # mask for kv rows beyond the true sequence (edge-block padding reads
    # garbage — must not leak into the softmax)
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], tkv), 1)
    valid = col < t_kv
    # zero garbage v rows too: their probs are exp(-1e30)=0, but 0 * NaN
    # would still poison the PV matmul
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    v = jnp.where(vrow < t_kv, v, 0).astype(v.dtype)
    # fold the attention scale into q when it is a power of two (exact in
    # bf16 — Dh=64 -> 1/8; saves a [bq, tkv] f32 multiply per head);
    # otherwise scale the f32 scores to keep numerics identical
    folded = math.log2(scale) == round(math.log2(scale))
    if folded:
        q = q * jnp.asarray(scale, q.dtype)

    def score(h):
        lo = h * dh
        s = jax.lax.dot_general(
            q[:, lo:lo + dh], k[:, lo:lo + dh], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, tkv]
        if not folded:
            s = s * scale
        return jnp.where(valid, s, -1e30)

    ss = [None] * heads
    ss[0] = score(0)
    outs = []
    for h in range(heads):
        if h + 1 < heads:
            ss[h + 1] = score(h + 1)
        s = ss[h]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(jnp.bfloat16), v[:, h * dh:(h + 1) * dh],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, dh]
        outs.append(o / den)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _xla_attention(q, k, v, n_heads: int, scale: float):
    from .core import mha as xla_mha
    B, Tq, DM = q.shape
    Tkv = k.shape[1]
    dh = DM // n_heads
    qs = q.reshape(B, Tq, n_heads, dh)
    ks = k.reshape(B, Tkv, n_heads, dh)
    vs = v.reshape(B, Tkv, n_heads, dh)
    out = xla_mha(qs, ks, vs, scale=scale)
    return out.reshape(B, Tq, DM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_encoder_attention(q, k, v, n_heads: int, block_q: int = 512,
                             interpret: bool = False):
    """Bidirectional MHA on packed [B, T, H*Dh] bf16 tensors.

    Requires (H*Dh) % 128 == 0 and 128 % Dh == 0 on the Pallas path;
    callers should check :func:`packed_supported` and fall back otherwise.
    """
    return _forward(q, k, v, n_heads, block_q, interpret)


def packed_supported(n_heads: int, d_model: int) -> bool:
    if d_model % _LANES:
        return False
    dh = d_model // n_heads
    return _LANES % dh == 0


def _forward(q, k, v, n_heads, block_q, interpret):
    B, T, DM = q.shape
    Tkv = k.shape[1]
    dh = DM // n_heads
    scale = 1.0 / math.sqrt(dh)
    if not packed_supported(n_heads, DM):
        return _xla_attention(q, k, v, n_heads, scale)
    heads_per_group = _LANES // dh
    n_groups = DM // _LANES
    bq = min(block_q, T)
    # pad the kv block to the bf16 sublane multiple (16)
    tkv_block = -(-Tkv // 16) * 16

    grid = (B, n_groups, pl.cdiv(T, bq))
    kern = functools.partial(_kernel, heads=heads_per_group, dh=dh,
                             t_kv=Tkv, scale=scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, T, DM), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, _LANES), lambda b, g, t: (b, t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tkv_block, _LANES), lambda b, g, t: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tkv_block, _LANES), lambda b, g, t: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, _LANES), lambda b, g, t: (b, t, g),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


def _fwd(q, k, v, n_heads, block_q, interpret):
    return _forward(q, k, v, n_heads, block_q, interpret), (q, k, v)


def _bwd(n_heads, block_q, interpret, res, g):
    # Gradients recompute through the XLA path — correct, unfused.  Never
    # hot: the encoder is frozen (no grads flow through it in training).
    q, k, v = res
    B, T, DM = q.shape
    dh = DM // n_heads
    scale = 1.0 / math.sqrt(dh)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention(q_, k_, v_, n_heads, scale),
        q, k, v)
    return vjp(g)


packed_encoder_attention.defvjp(_fwd, _bwd)
