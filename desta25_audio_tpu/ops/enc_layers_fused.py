"""Whole-encoder-stack fusion: all L whisper-encoder layers in ONE
pallas_call, residual stream resident in VMEM.

Round-3 attribution (scripts/decomp_enc_layer.py + docs/perf_roofline.md
§1): the encoder runs at ~63% MXU with the per-op path — the packed
attention and fused-FFN kernels removed the worst relayouts, but every
layer still round-trips the [B*T, D] activation stream through HBM at
each kernel boundary (~0.4-0.5 ms/layer at b8) and re-pays pipeline fill
per launch.  This kernel keeps the hidden state in a VMEM scratch across
ALL layers and batch rows:

- ``grid = (L, B, G)`` with G = D // 128 lane groups — sequential grid
  steps on one core; step (l, b, g) runs lane-group g's attention for
  batch row b in layer l (g == 0 additionally does LN1 + the q/k/v
  projections for ALL groups; g == G-1 finishes with o-proj + residual
  + LN2 + FFN).  Putting the group axis on the GRID instead of an
  unrolled body loop is what makes Mosaic compile this kernel: with
  groups unrolled, a whole layer's score volume became
  register-allocator spill slots (the r3 "Invalid input layout" /
  tpu_compile_helper failures).  The residual stream lives in
  ``hbuf [B, Tp, D]`` (b8 whisper-large-v3: 30.8 MB) and never touches
  HBM between layers; taps and the final hidden are DMA'd out at their
  layers.
- Per-layer weights (q/k/v/o + fc1/fc2, ~39 MB bf16 at large-v3) are
  manually DMA'd into resident VMEM buffers once per layer (at b == 0)
  and reused for every batch row — single-buffered; the ~48 µs fetch
  stall per layer is ~2% of the layer's compute.
- Attention reuses the packed-layout design of ops/enc_attention.py:
  heads live in 128-lane groups (128 // Dh per group), scores per head
  are one [Tp, Dh] x [Dh, Tp] MXU dot on lane slices, the head loop is
  software-pipelined (head h+1's QK^T issues before head h's softmax),
  and kv columns >= the true T are masked.  The attention output reuses
  the q scratch (group g's output lands in q's group-g lanes after
  both of its heads have consumed them).
- The FFN phase chunks fc1/fc2 over the hidden dim like ops/enc_ffn.py
  (f32 fc1 accumulation feeds the erf-gelu directly, chunk c's gelu
  overlaps chunk c+1's MXU work).

Numerics match the per-op path: LayerNorm f32, projections f32-accum +
bias then bf16, residual adds in bf16, softmax f32, PV bf16, gelu f32 of
the f32 fc1 accumulator (the enc_ffn kernel's convention — slightly MORE
precise than XLA's bf16 round between fc1 and gelu).

Forward-only (the encoder is frozen — reference
modeling_desta25.py:1439-1463); the custom-VJP backward recomputes
through the per-op path.  Dispatch is OPT-IN via
``DESTA_FUSED_ENC_LAYERS=1`` until the TPU A/B lands (the per-op path is
the measured 1560 audio-sec/s baseline); ``DESTA_FUSED_INTERPRET=1``
runs it on the CPU interpreter for tests.

Reference behavior: the whisper encoder hot loop,
modeling_desta25.py:575-608.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .enc_ffn import _gelu_f32

_LANES = 128
_HBUF_CAP = 40 * 1024 * 1024   # VMEM bytes for the resident hidden state
_F_CHUNK = 1280                # fc hidden-dim chunk (matches the proven
#                                ops/enc_ffn.py chunk_f; fewer unrolled
#                                chunk iterations = fewer spill slots)


class _Meta(NamedTuple):
    L: int
    B: int
    T: int       # true sequence length (kv mask bound)
    Tp: int      # padded rows (multiple of 8)
    D: int
    F: int
    H: int
    taps: Tuple[int, ...]   # target layer ids (static)
    eps: float


def fused_enc_supported(B: int, T: int, D: int, F: int, H: int,
                        dtype) -> bool:
    """Static dispatch predicate for the whole-stack kernel."""
    if os.environ.get("DESTA_FUSED_ENC_LAYERS", "0") in ("0", "false"):
        return False
    if dtype != jnp.bfloat16:
        return False
    if D % _LANES or F % min(_F_CHUNK, F):
        return False
    dh = D // H
    if _LANES % dh:
        return False
    Tp = -(-T // 8) * 8
    if B * Tp * D * 2 > _HBUF_CAP:
        return False
    if jax.default_backend() != "tpu" and not _interpret():
        return False
    return True


def _interpret() -> bool:
    return os.environ.get("DESTA_FUSED_INTERPRET", "0") == "1"


def _make_kernel(m: _Meta):
    dh = m.D // m.H
    groups = m.D // _LANES
    hpg = _LANES // dh          # heads per 128-lane group
    scale = 1.0 / math.sqrt(dh)
    folded = math.log2(scale) == round(math.log2(scale))
    f_chunk = min(_F_CHUNK, m.F)
    n_chunks = m.F // f_chunk
    n_taps = len(m.taps)

    def kernel(*refs):
        (ln1s, ln1b, ln2s, ln2b, bq, bv, bo, b1, b2,
         x, wq, wk, wv, wo, f1, f2,
         hid_out, taps_out,
         hbuf, qs, ks, vs,
         wqb, wkb, wvb, wob, f1b, f2b,
         insem, wsem, fsem, osem) = refs

        l = pl.program_id(0)
        b = pl.program_id(1)
        g = pl.program_id(2)

        def cp(src, dst, sem):
            return pltpu.make_async_copy(src, dst, sem)

        # load the whole batch's hidden stream once
        @pl.when(jnp.logical_and(jnp.logical_and(l == 0, b == 0), g == 0))
        def _():
            for bb in range(m.B):
                cp(x.at[bb], hbuf.at[bb], insem.at[bb]).start()
            for bb in range(m.B):
                cp(x.at[bb], hbuf.at[bb], insem.at[bb]).wait()

        # layer weights: fetched once per layer, reused for every row.
        # Single-buffered — the ~39 MB fetch (~48 us) is ~2% of the
        # layer's ~3 ms of compute at b8.
        @pl.when(jnp.logical_and(b == 0, g == 0))
        def _():
            cp(wq.at[l], wqb, wsem.at[0]).start()
            cp(wk.at[l], wkb, wsem.at[1]).start()
            cp(wv.at[l], wvb, wsem.at[2]).start()
            cp(wo.at[l], wob, wsem.at[3]).start()
            cp(f1.at[l], f1b, fsem.at[0]).start()
            cp(f2.at[l], f2b, fsem.at[1]).start()
            for i in range(4):
                cp(wq.at[l], wqb, wsem.at[i]).wait()
            cp(f1.at[l], f1b, fsem.at[0]).wait()
            cp(f2.at[l], f2b, fsem.at[1]).wait()

        def ln(val, s_ref, b_ref):
            xf = val.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + m.eps)
            return (y * s_ref[0].astype(jnp.float32)
                    + b_ref[0].astype(jnp.float32))

        # Row blocks bound live f32 values to [rb, D]; the GROUP axis
        # rides the grid (see below) so only ONE group's [rb, Tp] scores
        # exist per grid step.  With groups unrolled in the body the
        # score volume of a whole layer (H * Tp^2 f32 ~ 181 MB at
        # large-v3) became register-allocator spill slots — the r3/r4
        # compile failures.  Mosaic does not coalesce spill slots across
        # unrolled iterations; the grid is the spill-bounding tool.
        rb_rows = min(512, m.Tp)

        # ---- phase A (g == 0): LN1 + q/k/v projections ----------------
        # q/k/v scratches are [G, Tp, 128]: the attention step indexes
        # its group on the LEADING axis (dynamic leading-axis indexing is
        # legal; dynamic LANE slicing is not).
        @pl.when(g == 0)
        def _():
            for r0 in range(0, m.Tp, rb_rows):
                nb = min(rb_rows, m.Tp - r0)
                hb = hbuf[b, r0:r0 + nb]              # [nb, D] bf16
                x1 = ln(hb, ln1s, ln1b).astype(jnp.bfloat16)
                for gg in range(groups):
                    gsl = slice(gg * _LANES, (gg + 1) * _LANES)
                    qs[gg, r0:r0 + nb] = (
                        jnp.dot(x1, wqb[:, gsl],
                                preferred_element_type=jnp.float32)
                        + bq[0, 0, gsl].astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    ks[gg, r0:r0 + nb] = jnp.dot(
                        x1, wkb[:, gsl],
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    vs[gg, r0:r0 + nb] = (
                        jnp.dot(x1, wvb[:, gsl],
                                preferred_element_type=jnp.float32)
                        + bv[0, 0, gsl].astype(jnp.float32)
                    ).astype(jnp.bfloat16)

        # ---- packed attention for THIS grid step's group --------------
        bq_rows = min(512, m.Tp)
        vrow = jax.lax.broadcasted_iota(jnp.int32, (m.Tp, _LANES), 0)
        colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, m.Tp), 1)
                   < m.T)
        kg = ks[g]                                     # [Tp, 128] bf16
        vg = jnp.where(vrow < m.T, vs[g], 0).astype(jnp.bfloat16)
        for r0 in range(0, m.Tp, bq_rows):
            nb = min(bq_rows, m.Tp - r0)
            qg = qs[g, r0:r0 + nb]
            if folded:
                qg = qg * jnp.asarray(scale, qg.dtype)

            def score(hh):
                lo = hh * dh
                s = jax.lax.dot_general(
                    qg[:, lo:lo + dh], kg[:, lo:lo + dh],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if not folded:
                    s = s * scale
                return jnp.where(colmask, s, -1e30)

            outs = []
            for hh in range(hpg):
                s = score(hh)
                mx = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - mx)
                den = jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    e.astype(jnp.bfloat16),
                    vg[:, hh * dh:(hh + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(o / den)
            # this block's q lanes are dead: reuse them for the output
            qs[g, r0:r0 + nb] = jnp.concatenate(
                outs, axis=-1).astype(jnp.bfloat16)

        # ---- phase C (g == G-1): o-proj + residual + LN2 + FFN --------
        # (the FFN bias is sliced at REF load — value-slicing the loaded
        # [1, F] row gives the broadcast a non-zero lane-offset layout
        # Mosaic rejects, "Invalid input layout", BENCH_r03)
        @pl.when(g == groups - 1)
        def _():
            for r0 in range(0, m.Tp, rb_rows):
                nb = min(rb_rows, m.Tp - r0)
                att = None
                for gg in range(groups):
                    rsl = slice(gg * _LANES, (gg + 1) * _LANES)
                    pa = jnp.dot(qs[gg, r0:r0 + nb], wob[rsl, :],
                                 preferred_element_type=jnp.float32)
                    att = pa if att is None else att + pa
                att = (att + bo[0].astype(jnp.float32)
                       ).astype(jnp.bfloat16)
                h = hbuf[b, r0:r0 + nb] + att          # residual
                x2 = ln(h, ln2s, ln2b).astype(jnp.bfloat16)
                acc = None
                for c in range(n_chunks):
                    cs = slice(c * f_chunk, (c + 1) * f_chunk)
                    fh = jnp.dot(x2, f1b[:, cs],
                                 preferred_element_type=jnp.float32)
                    fh = fh + b1[0, 0, cs].astype(jnp.float32)
                    g2 = _gelu_f32(fh).astype(jnp.bfloat16)
                    p = jnp.dot(g2, f2b[cs, :],
                                preferred_element_type=jnp.float32)
                    acc = p if acc is None else acc + p
                ffn = (acc + b2[0].astype(jnp.float32)
                       ).astype(jnp.bfloat16)
                hbuf[b, r0:r0 + nb] = h + ffn

            # tap / final emission (post-layer, pre-final-LN — reference
            # inline connector inputs, modeling_desta25.py:575-598)
            for ti, tl in enumerate(m.taps):
                @pl.when(l == tl)
                def _(ti=ti):
                    cp(hbuf.at[b], taps_out.at[ti, b],
                       osem.at[0]).start()
                    cp(hbuf.at[b], taps_out.at[ti, b],
                       osem.at[0]).wait()

            @pl.when(l == m.L - 1)
            def _():
                cp(hbuf.at[b], hid_out.at[b], osem.at[0]).start()
                cp(hbuf.at[b], hid_out.at[b], osem.at[0]).wait()

    return kernel


@functools.lru_cache(maxsize=8)
def _build_call(m: _Meta, interpret: bool):
    vm = pltpu.VMEM
    bf16, f32 = jnp.bfloat16, jnp.float32
    n_taps = max(len(m.taps), 1)
    groups = m.D // _LANES

    def lvec(n):
        return pl.BlockSpec((1, 1, n), lambda l, b, g: (l, 0, 0),
                            memory_space=vm)

    # order: ln1s ln1b ln2s ln2b bq bv bo b1 b2
    in_specs = [lvec(m.D)] * 7 + [lvec(m.F)] + [lvec(m.D)]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 7  # x + 6 weights

    out_shape = [
        jax.ShapeDtypeStruct((m.B, m.Tp, m.D), bf16),           # hidden
        jax.ShapeDtypeStruct((n_taps, m.B, m.Tp, m.D), bf16),   # taps
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((m.B, m.Tp, m.D), bf16),   # hbuf (resident stream)
        pltpu.VMEM((groups, m.Tp, _LANES), bf16),  # qs (q, then attn out)
        pltpu.VMEM((groups, m.Tp, _LANES), bf16),  # ks
        pltpu.VMEM((groups, m.Tp, _LANES), bf16),  # vs
        pltpu.VMEM((m.D, m.D), bf16),         # wqb
        pltpu.VMEM((m.D, m.D), bf16),         # wkb
        pltpu.VMEM((m.D, m.D), bf16),         # wvb
        pltpu.VMEM((m.D, m.D), bf16),         # wob
        pltpu.VMEM((m.D, m.F), bf16),         # f1b
        pltpu.VMEM((m.F, m.D), bf16),         # f2b
        pltpu.SemaphoreType.DMA((m.B,)),      # insem
        pltpu.SemaphoreType.DMA((4,)),        # wsem
        pltpu.SemaphoreType.DMA((2,)),        # fsem
        pltpu.SemaphoreType.DMA((1,)),        # osem
    ]
    return pl.pallas_call(
        _make_kernel(m),
        grid=(m.L, m.B, groups),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )


def _xla_stack(layers: dict, x: jnp.ndarray, n_heads: int,
               target_layer_ids: Tuple[int, ...]):
    """Pure-XLA replica of the stack (the VJP recompute path — the
    encoder is frozen so this is never hot; forced off the pallas
    sub-kernels so jax.vjp traces only differentiable ops)."""
    import os as _os

    from ..models.whisper import _enc_layer_apply
    saved = _os.environ.get("DESTA_FUSED_ENC_FFN")
    _os.environ["DESTA_FUSED_ENC_FFN"] = "0"
    try:
        h = x
        by_layer = {}
        L = layers["ln1"]["scale"].shape[0]
        for i in range(L):
            p = jax.tree.map(lambda a: a[i], layers)
            h = _enc_layer_apply(p, h, n_heads)
            if i in target_layer_ids:
                by_layer[i] = h
        # emit taps in target_layer_ids ORDER (the kernel writes slot ti
        # at l == taps[ti]) — ascending-layer order would mispair
        # cotangents for unsorted tap ids
        tap_arr = (jnp.stack([by_layer[t] for t in target_layer_ids])
                   if target_layer_ids
                   else jnp.zeros((1,) + h.shape, h.dtype))
        return h, tap_arr
    finally:
        if saved is None:
            _os.environ.pop("DESTA_FUSED_ENC_FFN", None)
        else:
            _os.environ["DESTA_FUSED_ENC_FFN"] = saved


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_encoder_layers(layers: dict, x: jnp.ndarray, cfg,
                         target_layer_ids: Tuple[int, ...] = ()
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run all encoder layers in one kernel.

    layers: stacked encoder layer params ([L, ...] leaves, bf16 "w"
    weights); x: [B, T, D] bf16 (post conv + positions).  Returns
    (hidden [B, T, D] pre-final-LN, taps [n_taps, B, T, D]).
    """
    return _fused_forward(layers, x, cfg, target_layer_ids)


def _fused_fwd(layers, x, cfg, target_layer_ids):
    return _fused_forward(layers, x, cfg, target_layer_ids), (layers, x)


def _fused_bwd(cfg, target_layer_ids, res, g):
    # Gradients recompute through the XLA path — correct, unfused.
    # Never hot: the encoder is frozen (reference
    # modeling_desta25.py:1439-1463).
    layers, x = res
    _, vjp = jax.vjp(
        lambda ly, xx: _xla_stack(ly, xx, cfg.encoder_attention_heads,
                                  target_layer_ids), layers, x)
    return vjp(g)


fused_encoder_layers.defvjp(_fused_fwd, _fused_bwd)


def _fused_forward(layers: dict, x: jnp.ndarray, cfg,
                   target_layer_ids: Tuple[int, ...] = ()
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, T, D = x.shape
    L = layers["fc1"]["w"].shape[0]
    F = layers["fc1"]["w"].shape[2]
    H = cfg.encoder_attention_heads
    Tp = -(-T // 8) * 8
    meta = _Meta(L=L, B=B, T=T, Tp=Tp, D=D, F=F, H=H,
                 taps=tuple(int(t) for t in target_layer_ids), eps=1e-5)
    call = _build_call(meta, _interpret())

    xp = x.astype(jnp.bfloat16)
    if Tp != T:
        xp = jnp.pad(xp, ((0, 0), (0, Tp - T), (0, 0)))
    a = layers["attn"]
    f32 = jnp.float32
    args = [
        layers["ln1"]["scale"].astype(f32)[:, None, :],
        layers["ln1"]["bias"].astype(f32)[:, None, :],
        layers["ln2"]["scale"].astype(f32)[:, None, :],
        layers["ln2"]["bias"].astype(f32)[:, None, :],
        a["q"]["b"].astype(f32)[:, None, :],
        a["v"]["b"].astype(f32)[:, None, :],
        a["o"]["b"].astype(f32)[:, None, :],
        layers["fc1"]["b"].astype(f32)[:, None, :],
        layers["fc2"]["b"].astype(f32)[:, None, :],
        xp,
        a["q"]["w"].astype(jnp.bfloat16),
        a["k"]["w"].astype(jnp.bfloat16),
        a["v"]["w"].astype(jnp.bfloat16),
        a["o"]["w"].astype(jnp.bfloat16),
        layers["fc1"]["w"].astype(jnp.bfloat16),
        layers["fc2"]["w"].astype(jnp.bfloat16),
    ]
    hidden, taps = call(*args)
    return hidden[:, :T], taps[:len(target_layer_ids) or 1, :, :T]
