"""Single-kernel fused decode step: all L decoder layers in ONE pallas_call.

Round-1 profiling showed 8B int8 decode at ~54% of its HBM roofline: the
per-projection Pallas launches (7 per layer x 32 layers = 224 per step)
each pay pipeline-fill + launch overhead that dominates at decode-sized M.
This kernel replaces them with ONE launch per decode step:

- ``grid=(L,)`` runs the layers as sequential grid steps on one core; the
  residual stream lives in a VMEM scratch that persists across grid steps.
- int8 weights stay in HBM (``pl.ANY``); the kernel streams [bk, bn] tiles
  through a double-buffered manual-DMA ring.  The DMA chain is continuous
  ACROSS projection stages and ACROSS layers (the last tile of w_down
  kicks off the next layer's wq tile), so the weight stream never re-pays
  pipeline fill — the whole step is a single ~7 GB HBM read.
- Attention runs in-kernel: the KV cache streams through a second DMA
  ring.  GQA scores use a block-diagonal q packing ([H, Hkv*Dh] with
  zeros off the group block) so one [H, Hkv*Dh] x [S_blk, Hkv*Dh]^T MXU
  dot per (row, tile) computes every head against its own kv head.  The
  current token's score joins the softmax separately (position ``ci`` is
  masked out of the streamed scores), and the (k, v) pair is written back
  into the cache IN-KERNEL: the cache rides through the call with
  ``input_output_aliases``, and each batch row does an 8-row-aligned
  read-modify-write (aligned block DMA in, masked-select row merge, DMA
  back) — a [1, KVD] row is sub-(8,128)-tile and cannot be DMA'd
  directly, but the aligned RMW can, and it replaces an XLA
  dynamic_update_slice that cost ~1 ms/step (scalar index) to ~1.8 ms
  (per-row indices, the serving-engine shape) in round 2 measurements.
  The RMW reads overlap the score/value streaming; the write-backs
  overlap the next layer's weight stream.

Numerics mirror the XLA scan path (models/llm.py): bf16 residual stream,
f32 matmul accumulation and softmax, bf16 P@V.  Replaces the decode loop
of the reference's HF ``generate`` (modeling_desta25.py:1419-1427).

ORCA deep injection can run INSIDE the kernel: with an int8-quantized
gated cross-attention stack (ops/quant.quantize_orca_cross_attns), each
grid step appends inj_q -> audio cross-attention -> inj_o -> LayerNorm ->
gate to the layer (reference semantics modeling_desta25.py:359-490).
The inj_q/inj_o/gate1 weights ride the SAME int8 DMA ring as the tower
projections; the precomputed per-layer audio K/V ([L, B, Ta, D],
decode-loop constants — models/orca.py precompute_cross_kv) stream
through dedicated VMEM ring buffers.  Since the injection head dim
(D / n_heads, e.g. 80 on Qwen3-4B) usually isn't lane-aligned, per-head
scores come from one MXU dot of the elementwise q*k product against a
[D, 128] head-indicator matrix (a block segment-sum), and P is broadcast
back to lanes the same way — no sub-128 lane slicing anywhere.

Dispatch: ``models.llm.llm_apply`` routes T==1 cached steps here when the
LLM weights are int8-quantized OR plain bf16 (the weight ring streams
either; bf16 moves 2x the bytes but still skips the per-projection
launch overhead), there is no LoRA / mesh, and the shapes tile cleanly
(see :func:`fused_supported`); ORCA injection joins the
kernel when :func:`fused_inject_supported` also holds, and otherwise
falls back to per-layer XLA injection.  Set ``DESTA_FUSED_DECODE=0`` to
force the XLA path; ``DESTA_FUSED_INTERPRET=1`` runs the kernel through
the TPU interpreter (CPU tests).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rope import llm_rope_cos_sin

_W_TILE_BUDGET = 8 * 1024 * 1024   # int8 bytes per streamed weight tile
_W_RING = 3                        # weight-tile ring depth (prefetch R-1)
_BN_CAP = 2048                     # lane cap per weight tile
_KV_TILE_BUDGET = 2 * 1024 * 1024  # bf16 bytes per streamed KV tile
_SCORES_BUDGET = 6 * 1024 * 1024   # f32 scores scratch cap ([B, H, S])


class _Meta(NamedTuple):
    L: int
    D: int
    H: int
    Hkv: int
    Dh: int
    I: int
    qk_norm: bool
    eps: float
    B: int
    Kd: int   # tokens per row this step (1 = decode; >1 = spec verify)
    Mp: int
    S: int
    s_blk: int
    tiles: Tuple[Tuple[int, int], ...]
    # ORCA deep injection (in-kernel gated cross-attention per layer):
    inj: bool = False
    Ta: int = 0        # padded audio-token count (multiple of 8)
    Ta_real: int = 0   # valid audio tokens (rows >= Ta_real are masked)
    Dg: int = 0        # gate1 hidden dim (D // 4 in the reference)
    Hi: int = 0        # injection heads (LLM heads; head dim = D // Hi)
    # weight stream dtype: True = int8 + per-column scales (quantized
    # towers), False = bf16 (unquantized towers stream 2x the bytes but
    # still beat the per-projection XLA path's pipeline-fill overhead)
    w_int8: bool = True
    # tensor parallelism: tp > 1 runs this kernel per "model"-axis shard
    # under shard_map with H / Hkv / I already LOCAL in this meta (D stays
    # full).  The wo / w_down partial sums are all-reduced IN-KERNEL via
    # one-shot remote-DMA gathers (ops/fused_decode_mesh.py), so the
    # single-launch structure — and its cross-layer weight prefetch —
    # survives TP.  mesh_axes is the full mesh axis order (remote device
    # ids name every mesh axis; non-"model" axes keep their own index).
    tp: int = 1
    mesh_axes: Tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# Static shape policy
# ---------------------------------------------------------------------------


def _stage_dims(D, H, Hkv, Dh, I):
    """(K, N) of the seven projections in stream order: q k v o up gate
    down."""
    HDh, KVD = H * Dh, Hkv * Dh
    return [(D, HDh), (D, KVD), (D, KVD), (HDh, D),
            (D, I), (D, I), (I, D)]


def _meta_dims(m: "_Meta"):
    """All streamed-weight stages: the 7 tower projections plus, with
    in-kernel ORCA injection, inj_q / inj_o / inj_gate1 (the injection
    k/v projections never stream — audio K/V are decode-loop constants,
    precomputed per request; models/orca.py precompute_cross_kv)."""
    dims = _stage_dims(m.D, m.H, m.Hkv, m.Dh, m.I)
    if m.inj:
        dims += [(m.D, m.D), (m.D, m.D), (m.D, m.Dg)]
    return dims


def _pick_tile(K, N, elem_bytes: int = 1):
    """Largest (bk, bn) tile under the budget — fewer, fatter DMAs win at
    decode-sized M (pipeline-fill bound, CLAUDE.md round-1 analysis)."""
    best = None
    for bn in range(128, min(N, _BN_CAP) + 1, 128):
        if N % bn:
            continue
        bks = [b for b in range(256, K + 1, 256)
               if K % b == 0 and b * bn * elem_bytes <= _W_TILE_BUDGET]
        if bks and (best is None or bks[-1] * bn >= best[0] * best[1]):
            best = (bks[-1], bn)
    return best


def _stage_tiles(D, H, Hkv, Dh, I, inj_dg: int = 0, elem_bytes: int = 1):
    dims = _stage_dims(D, H, Hkv, Dh, I)
    if inj_dg:
        dims += [(D, D), (D, D), (D, inj_dg)]
    tiles = []
    for K, N in dims:
        t = _pick_tile(K, N, elem_bytes)
        if t is None:
            return None
        tiles.append(t)
    return tuple(tiles)


def _pick_sblk(S, KVD):
    best = None
    for b in range(128, S + 1, 128):
        if S % b == 0 and b * KVD * 2 <= _KV_TILE_BUDGET:
            best = b
    return best


def _interpret_mode() -> bool:
    return os.environ.get("DESTA_FUSED_INTERPRET", "0") == "1"


def fused_supported(params, cfg, cache, kd: int = 1) -> bool:
    """Static dispatch predicate (trace-time; shapes + flags only).

    ``kd > 1`` checks eligibility for the spec-verify step (kd tokens
    per row in one pass)."""
    if os.environ.get("DESTA_FUSED_DECODE", "1") in ("0", "false"):
        return False
    from ..parallel.mesh import current_mesh
    if current_mesh() is not None:
        return False
    from .quant import is_quantized
    layers = params.get("layers", {})
    keys = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    quantized = all(is_quantized(layers.get(k)) for k in keys)
    if not quantized:
        # bf16 weight stream: unquantized towers still beat the
        # per-projection XLA path (2x the bytes, zero pipeline re-fill).
        # Measured (scripts/bench_bf16_decode.py, v5e Qwen3-4B b8
        # CTX=192): fused 718 tok/s (11.15 ms/step) vs XLA 595
        # (13.44 ms/step) — default stays on.
        if not all(
                isinstance(layers.get(k), jnp.ndarray)
                and layers[k].dtype == jnp.bfloat16 for k in keys):
            return False
    if cache.k.dtype != jnp.bfloat16 or cache.k.ndim != 4:
        return False
    L, B, S, KVD = cache.k.shape
    Hkv, Dh = cfg.num_key_value_heads, cfg.head_dim
    H, D, I = (cfg.num_attention_heads, cfg.hidden_size,
               cfg.intermediate_size)
    if KVD != Hkv * Dh:
        return False
    if Dh != 128 or S % 128 != 0 or H % Hkv != 0:
        return False
    if D % 256 != 0 or I % 128 != 0:
        return False
    if _stage_tiles(D, H, Hkv, Dh, I,
                    elem_bytes=1 if quantized else 2) is None:
        return False
    if _pick_sblk(S, Hkv * Dh) is None:
        return False
    if B * kd * H * S * 4 > _SCORES_BUDGET:
        return False
    if kd > 1:
        # draft block must fit the RMW window and VMEM (ofull f32)
        if kd > 8 or B * kd * H * KVD * 4 > 24 * 1024 * 1024:
            return False
    if jax.default_backend() != "tpu" and not _interpret_mode():
        return False
    return True


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(m: _Meta):
    HDh, KVD = m.H * m.Dh, m.Hkv * m.Dh
    G = m.H // m.Hkv
    R = m.B * m.Kd            # query rows: Kd tokens per batch row
    KH = m.Kd * m.H           # score rows per batch row (token-major)
    W = 8 if m.Kd == 1 else 16  # RMW window (Kd<=8 rows from an 8-aligned
    #                             base always fit in 16)
    nst = m.S // m.s_blk
    kv_total = m.B * nst
    att_scale = m.Dh ** -0.5
    dims = _meta_dims(m)
    n_st = len(dims)
    offs, totals = [], []
    off = 0
    for (K, N), (bk, bn) in zip(dims, m.tiles):
        offs.append(off)
        totals.append((K // bk) * (N // bn))
        off += totals[-1]
    T_w = off  # weight tiles per layer

    def kernel(*refs):
        i = 0
        x, ln1, ln2 = refs[i:i + 3]
        i += 3
        if m.qk_norm:
            qn, kn = refs[i:i + 2]
            i += 2
        cos, sin, bias, ci = refs[i:i + 4]
        i += 4
        if m.inj:
            inj_on, bq, bo, bg1, wg2, bg2, lns, lnb = refs[i:i + 8]
            i += 8
        if m.w_int8:
            s_refs = refs[i:i + n_st]
            i += n_st
        else:
            s_refs = None
        w_refs = refs[i:i + n_st]
        i += n_st
        if m.inj:
            ka, va = refs[i:i + 2]
            i += 2
        kc, vc = refs[i:i + 2]
        i += 2
        h_out, kc_out, vc_out = refs[i:i + 3]
        i += 3
        (h, xn, qs, ks, vs, qpad, scores, ofull, attn, mid, acc,
         wbuf, kvbuf, kwbuf, vwbuf) = refs[i:i + 15]
        i += 15
        if m.inj:
            iq, iat, iao, ig, imind, kabuf, vabuf = refs[i:i + 7]
            i += 7
        (wsem, kvsem, krsem, vrsem, kwsem, vwsem) = refs[i:i + 6]
        i += 6
        if m.inj:
            kasem, vasem = refs[i:i + 2]
            i += 2
        if m.tp > 1:
            # pres: this shard's wo / w_down partial [Mp, D] f32;
            # rbuf[slot, d]: peer d's partial (slot 0 = attn round,
            # slot 1 = mlp round — the alternation double-buffers the
            # comm target across layers); ssem/rsem: per-(slot, peer)
            # send / receive DMA semaphores.
            pres, rbuf, ssem, rsem = refs[i:i + 4]
            my = jax.lax.axis_index("model")

            def _coords(model_idx):
                return tuple(
                    model_idx if a == "model" else jax.lax.axis_index(a)
                    for a in m.mesh_axes)

        l = pl.program_id(0)
        RING = _W_RING

        def wdma(si, l_idx, ti, slot):
            K, N = dims[si]
            bk, bn = m.tiles[si]
            nk = K // bk
            kk = ti % nk
            n = ti // nk
            return pltpu.make_async_copy(
                w_refs[si].at[l_idx, pl.ds(kk * bk, bk), pl.ds(n * bn, bn)],
                wbuf.at[slot, pl.ds(0, bk), pl.ds(0, bn)],
                wsem.at[slot])

        def wslot(l_idx, g):
            """Ring slot of layer-local weight tile g (absolute over the
            whole step so the ring stays consistent across layers)."""
            return jax.lax.rem(l_idx * T_w + g, RING)

        def start_local(l_idx, g, lo, hi):
            """Start layer-local tile index g (traced, g in [lo, hi]
            statically) — static pruning picks the candidate stages."""
            for sj in range(n_st):
                s0, s1 = offs[sj], offs[sj] + totals[sj]
                if s1 <= lo or s0 > hi:
                    continue

                @pl.when(jnp.logical_and(g >= s0, g < s1))
                def _(sj=sj, s0=s0):
                    wdma(sj, l_idx, g - s0, wslot(l_idx, g)).start()

        def kv_dma(cref, l_idx, ti, slot):
            return pltpu.make_async_copy(
                cref.at[l_idx, ti // nst,
                        pl.ds((ti % nst) * m.s_blk, m.s_blk), :],
                kvbuf.at[slot], kvsem.at[slot])

        # Bootstrap: warm the weight ring once (the per-tile prefetch then
        # self-chains across stages and layers); KV K-tile 0 per layer
        # (overlaps the q/k/v weight stream).
        @pl.when(l == 0)
        def _():
            if m.tp > 1:
                # zero the comm buffer (slot [*, my] is never written —
                # peers write their own ids — so it must read as 0 in the
                # static reduction sum), then barrier the model group:
                # a peer may only send once WE have signaled (i.e. after
                # our zeroing), and we may only proceed once every peer
                # has (their first-round data can then land any time).
                rbuf[:] = jnp.zeros_like(rbuf)
                bar = pltpu.get_barrier_semaphore()
                for off in range(1, m.tp):
                    pltpu.semaphore_signal(
                        bar, inc=1,
                        device_id=_coords(jax.lax.rem(my + off, m.tp)),
                        device_id_type=pltpu.DeviceIdType.MESH)
                pltpu.semaphore_wait(bar, m.tp - 1)
            for g in range(min(_W_RING - 1, T_w)):
                start_local(0, g, g, g)
            h[:] = x[:]
            qpad[:] = jnp.zeros_like(qpad)
            if m.Mp > R:
                attn[R:, :] = jnp.zeros((m.Mp - R, HDh), attn.dtype)
            if m.inj:
                # head-indicator matrix: imind[d, h2] = 1 iff lane d
                # belongs to injection head h2.  Head dim D/Hi is often
                # NOT 128 (Qwen3-4B: 80), so per-head lane slices don't
                # tile; instead scores come from one [Ta, D] x [D, 128]
                # MXU dot of the elementwise q*k product against this
                # indicator (a block-segment-sum on the MXU).
                di = jax.lax.broadcasted_iota(jnp.int32, (m.D, 128), 0)
                hi2 = jax.lax.broadcasted_iota(jnp.int32, (m.D, 128), 1)
                imind[:] = (di // (m.D // m.Hi) == hi2).astype(
                    jnp.bfloat16)
                if m.Mp > R:
                    iat[R:, :] = jnp.zeros((m.Mp - R, m.D), iat.dtype)

        kv_dma(kc, l, 0, 0).start()

        def rmsn(ref_val, w_ref):
            xf = ref_val.astype(jnp.float32)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(var + m.eps)
                    * w_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

        xn[:] = rmsn(h[:], ln1)

        # ---- streamed int8 matmul stages --------------------------------
        def run_stage(si, x_ref, flush):
            K, N = dims[si]
            bk, bn = m.tiles[si]
            nk = K // bk
            total = totals[si]
            off_s = offs[si]

            def body(ti, _):
                # prefetch RING-1 tiles ahead; the target may live in a
                # later stage of this layer or spill into the next layer —
                # the ring keeps the HBM weight stream saturated through
                # the attention phase and across layer boundaries.
                nxt = off_s + ti + (RING - 1)
                lo = off_s + RING - 1
                hi = off_s + total - 1 + RING - 1
                if lo < T_w:
                    start_local(l, nxt, lo, min(hi, T_w - 1))
                if hi >= T_w:
                    spill = nxt - T_w

                    @pl.when(jnp.logical_and(spill >= 0, l + 1 < m.L))
                    def _():
                        start_local(l + 1, spill, max(lo - T_w, 0),
                                    hi - T_w)

                wdma(si, l, ti, wslot(l, off_s + ti)).wait()
                slot = wslot(l, off_s + ti)
                kk = jax.lax.rem(ti, nk)
                n = ti // nk
                wt = wbuf[slot, :bk, :bn]
                if m.w_int8:
                    wt = wt.astype(jnp.bfloat16)
                xt = x_ref[:, pl.ds(kk * bk, bk)]
                p = jnp.dot(xt, wt, preferred_element_type=jnp.float32)
                sv = (s_refs[si][0, :, pl.ds(n * bn, bn)].astype(
                    jnp.float32) if m.w_int8 else jnp.float32(1.0))
                if nk == 1:
                    flush(n, p * sv)
                else:
                    @pl.when(kk == 0)
                    def _():
                        acc[:, :bn] = p

                    @pl.when(jnp.logical_and(kk > 0, kk < nk - 1))
                    def _():
                        acc[:, :bn] += p

                    @pl.when(kk == nk - 1)
                    def _():
                        flush(n, (acc[:, :bn] + p) * sv)
                return 0

            jax.lax.fori_loop(0, total, body, 0)

        def store_to(out_ref, bn):
            def f(n, val):
                out_ref[:, pl.ds(n * bn, bn)] = val.astype(out_ref.dtype)
            return f

        def resid(bn):
            def f(n, val):
                sl = pl.ds(n * bn, bn)
                h[:, sl] += val.astype(jnp.bfloat16)
            return f

        def swiglu(bn):
            def f(n, val):
                sl = pl.ds(n * bn, bn)
                g32 = val.astype(jnp.bfloat16).astype(jnp.float32)
                mid[:, sl] = (jax.nn.silu(g32).astype(jnp.bfloat16)
                              * mid[:, sl])
            return f

        run_stage(0, xn, store_to(qs, m.tiles[0][1]))
        run_stage(1, xn, store_to(ks, m.tiles[1][1]))
        run_stage(2, xn, store_to(vs, m.tiles[2][1]))

        # ---- rope + qk-norm; emit (k, v); build block-diagonal q --------
        q = qs[:R].astype(jnp.float32).reshape(R, m.H, m.Dh)
        k = ks[:R].astype(jnp.float32).reshape(R, m.Hkv, m.Dh)
        if m.qk_norm:
            qw = qn[0].astype(jnp.float32).reshape(1, 1, m.Dh)
            kw = kn[0].astype(jnp.float32).reshape(1, 1, m.Dh)
            q = q * jax.lax.rsqrt(
                jnp.mean(jnp.square(q), -1, keepdims=True) + m.eps) * qw
            k = k * jax.lax.rsqrt(
                jnp.mean(jnp.square(k), -1, keepdims=True) + m.eps) * kw
        # NB: newaxis indexing (x[:, None]) lowers to a gather Mosaic
        # rejects — use reshape/keepdims for every broadcast in-kernel.
        cosv = cos[:].astype(jnp.float32).reshape(R, 1, m.Dh)
        sinv = sin[:].astype(jnp.float32).reshape(R, 1, m.Dh)

        def rot(t):
            t1, t2 = t[..., :m.Dh // 2], t[..., m.Dh // 2:]
            return jnp.concatenate([-t2, t1], axis=-1)

        q = q * cosv + rot(q) * sinv
        k = k * cosv + rot(k) * sinv
        kb = k.astype(jnp.bfloat16).reshape(R, KVD)
        ks[:R] = kb  # post-rope k, for the in-register draft-block scores

        # ---- in-place cache write: aligned W-row RMW ---------------------
        # A [1, KVD] row at arbitrary position ci is sub-(8,128)-tile and
        # cannot be DMA'd; instead DMA the 8-aligned W-row block holding
        # rows ci..ci+Kd-1, merge the new rows with masked selects, and
        # DMA it back into the aliased cache output.  Reads start here
        # (overlapping the score / value streaming below); positions
        # >= ci are masked out of the streamed scores so ordering vs
        # those reads is irrelevant (draft tokens attend each other via
        # the in-register block, not the cache).
        def kv_rmw_copy(buf, cref, l_idx, b, sem, to_cache):
            s0 = ci[0, b]
            al = pl.multiple_of(
                jnp.minimum((s0 // 8) * 8, m.S - W), 8)
            blk = cref.at[l_idx, b, pl.ds(al, W), :]
            if to_cache:
                return pltpu.make_async_copy(buf.at[b], blk, sem.at[b])
            return pltpu.make_async_copy(blk, buf.at[b], sem.at[b])

        # the previous layer's write-backs stream out of kwbuf/vwbuf —
        # they must land before this layer's reads reuse the buffers
        @pl.when(l > 0)
        def _():
            for b in range(m.B):
                kv_rmw_copy(kwbuf, kc_out, l - 1, b, kwsem, True).wait()
                kv_rmw_copy(vwbuf, vc_out, l - 1, b, vwsem, True).wait()
        for b in range(m.B):
            kv_rmw_copy(kwbuf, kc, l, b, krsem, False).start()
            kv_rmw_copy(vwbuf, vc, l, b, vrsem, False).start()

        # qpad rows per batch row are token-major: row (j, h) = j*H + h
        qb = q.astype(jnp.bfloat16)
        if m.Kd == 1:
            for kv in range(m.Hkv):
                qpad[:, kv * G:(kv + 1) * G,
                     kv * m.Dh:(kv + 1) * m.Dh] = qb[:, kv * G:(kv + 1) * G]
        else:
            qb4 = qb.reshape(m.B, m.Kd, m.H, m.Dh)
            for j in range(m.Kd):
                for kv in range(m.Hkv):
                    qpad[:, j * m.H + kv * G:j * m.H + (kv + 1) * G,
                         kv * m.Dh:(kv + 1) * m.Dh] = (
                        qb4[:, j, kv * G:(kv + 1) * G])

        # ---- scores: stream K cache -------------------------------------
        def kbody(ti, _):
            slot = jax.lax.rem(ti, 2)

            @pl.when(ti + 1 < kv_total)
            def _():
                kv_dma(kc, l, ti + 1, jax.lax.rem(ti + 1, 2)).start()

            @pl.when(ti + 1 == kv_total)
            def _():
                kv_dma(vc, l, 0, jax.lax.rem(ti + 1, 2)).start()

            kv_dma(kc, l, ti, slot).wait()
            b = ti // nst
            s = jax.lax.rem(ti, nst)
            qpb = qpad[b]
            sc = jax.lax.dot_general(
                qpb, kvbuf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores[b, :, pl.ds(s * m.s_blk, m.s_blk)] = sc * att_scale
            return 0

        jax.lax.fori_loop(0, kv_total, kbody, 0)

        # kc[l] streaming is done: merge the new k rows into their aligned
        # RMW block and start the write-back (overlaps softmax + V pass)
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (W, KVD), 0)

        def merge_rows(buf, src, b):
            """Masked-select the Kd new rows into RMW window row ci-al+j."""
            s0 = ci[0, b]
            r0 = s0 - jnp.minimum((s0 // 8) * 8, m.S - W)
            out = buf[b]
            for j in range(m.Kd):
                out = jnp.where(rowsel == r0 + j,
                                src[b * m.Kd + j].reshape(1, KVD), out)
            buf[b] = out

        for b in range(m.B):
            kv_rmw_copy(kwbuf, kc, l, b, krsem, False).wait()
            merge_rows(kwbuf, ks, b)
            kv_rmw_copy(kwbuf, kc_out, l, b, kwsem, True).start()

        # ---- softmax over cache + in-register draft block ---------------
        # The Kd current tokens' k/v never ride the streamed cache this
        # layer: each score row (j, h) takes its draft-block scores from
        # registers (block-diagonal packing makes the flat dot equal
        # q_h . k_{kv(h)}), causally masked so token j sees drafts <= j.
        sfull = scores[:] + bias[:].reshape(m.B, 1, m.S)
        qp32 = qpad[:].astype(jnp.float32)                # [B, KH, KVD]
        kdr = ks[:R].astype(jnp.float32).reshape(m.B, m.Kd, KVD)
        jrow = (jax.lax.broadcasted_iota(jnp.int32, (1, KH, 1), 1)
                // m.H)
        sdr = []
        for j2 in range(m.Kd):
            s = (jnp.sum(qp32 * kdr[:, j2:j2 + 1, :], axis=-1,
                         keepdims=True) * att_scale)      # [B, KH, 1]
            if m.Kd > 1:
                s = jnp.where(jrow >= j2, s, jnp.float32(-1e30))
            sdr.append(s)
        mx = jnp.max(sfull, axis=-1, keepdims=True)
        for s in sdr:
            mx = jnp.maximum(mx, s)
        e = jnp.exp(sfull - mx)
        edr = [jnp.exp(s - mx) for s in sdr]
        den = jnp.sum(e, axis=-1, keepdims=True)
        for ev in edr:
            den = den + ev
        inv = 1.0 / den
        scores[:] = e * inv
        pdr = [ev * inv for ev in edr]                    # [B, KH, 1] each

        # ---- output: stream V cache --------------------------------------
        def vbody(ti, _):
            slot = jax.lax.rem(kv_total + ti, 2)

            @pl.when(ti + 1 < kv_total)
            def _():
                kv_dma(vc, l, ti + 1,
                       jax.lax.rem(kv_total + ti + 1, 2)).start()

            kv_dma(vc, l, ti, slot).wait()
            b = ti // nst
            s = jax.lax.rem(ti, nst)
            pt = scores[b, :, pl.ds(s * m.s_blk, m.s_blk)
                        ].astype(jnp.bfloat16)
            ov = jnp.dot(pt, kvbuf[slot],
                         preferred_element_type=jnp.float32)  # [H, KVD]

            @pl.when(s == 0)
            def _():
                ofull[b] = ov

            @pl.when(s > 0)
            def _():
                ofull[b] += ov
            return 0

        jax.lax.fori_loop(0, kv_total, vbody, 0)

        # vc[l] streaming is done: merge + write back the new v rows
        for b in range(m.B):
            kv_rmw_copy(vwbuf, vc, l, b, vrsem, False).wait()
            merge_rows(vwbuf, vs, b)
            kv_rmw_copy(vwbuf, vc_out, l, b, vwsem, True).start()

        # fold the draft tokens' PV into ofull (the full-KVD outer
        # product is harmless: the extract below reads only each row's
        # kv(h) slice), then block-diagonal extract: head h takes its
        # kv(h) slice of the packed [KH, Hkv*Dh] output.
        of = ofull[:]                                   # [B, KH, KVD] f32
        vdr = vs[:R].astype(jnp.float32).reshape(m.B, m.Kd, KVD)
        for j2 in range(m.Kd):
            of = of + pdr[j2] * vdr[:, j2:j2 + 1, :]
        ofr = of.reshape(R, m.H, KVD)
        for kv in range(m.Hkv):
            hs = slice(kv * G, (kv + 1) * G)
            ds_ = slice(kv * m.Dh, (kv + 1) * m.Dh)
            slab = ofr[:, hs, ds_]                       # [R, G, Dh]
            attn[:R, kv * G * m.Dh:(kv + 1) * G * m.Dh] = (
                slab.reshape(R, G * m.Dh).astype(jnp.bfloat16))

        # ---- tensor-parallel partial-sum all-reduce ----------------------
        # One-shot gather: every shard remote-DMAs its [Mp, D] f32 partial
        # (pres) into slot [slot, my] of every peer's rbuf, waits the
        # tp-1 receives, and adds the static-loop sum into the residual.
        # Latency-optimal for decode-sized payloads (Mp*D f32 ≈ 256 KB at
        # the 8B flagship — one ICI hop beats a 2(tp-1)-hop ring).  Slot
        # alternation (attn=0, mlp=1) double-buffers reuse: a peer's
        # layer-l+1 attn send can only start after it received our
        # layer-l mlp partial, which we send only after consuming its
        # layer-l attn data — so slot-0 data is never overwritten before
        # the reduction reads it (validated under the interpret-mode race
        # detector, tests/test_fused_mesh.py).
        if m.tp > 1:
            def allreduce_into_h(slot):
                for off in range(1, m.tp):
                    peer = jax.lax.rem(my + off, m.tp)
                    pltpu.make_async_remote_copy(
                        src_ref=pres, dst_ref=rbuf.at[slot, my],
                        send_sem=ssem.at[slot, off],
                        recv_sem=rsem.at[slot, my],
                        device_id=_coords(peer),
                        device_id_type=pltpu.DeviceIdType.MESH).start()
                for off in range(1, m.tp):
                    src = jax.lax.rem(my - off + m.tp, m.tp)
                    pltpu.make_async_remote_copy(
                        src_ref=pres, dst_ref=rbuf.at[slot, src],
                        send_sem=ssem.at[slot, off],
                        recv_sem=rsem.at[slot, src],
                        device_id=_coords(my),
                        device_id_type=pltpu.DeviceIdType.MESH).wait_recv()
                tot = pres[...]
                for d in range(m.tp):
                    tot = tot + rbuf[slot, d]
                h[:] += tot.astype(jnp.bfloat16)
                # sends must land before pres is overwritten by the next
                # projection stage's flush
                for off in range(1, m.tp):
                    pltpu.make_async_remote_copy(
                        src_ref=pres, dst_ref=rbuf.at[slot, my],
                        send_sem=ssem.at[slot, off],
                        recv_sem=rsem.at[slot, my],
                        device_id=_coords(my),
                        device_id_type=pltpu.DeviceIdType.MESH).wait_send()

        # ---- wo + residual, MLP ------------------------------------------
        if m.tp > 1:
            run_stage(3, attn, store_to(pres, m.tiles[3][1]))
            allreduce_into_h(0)
        else:
            run_stage(3, attn, resid(m.tiles[3][1]))
        xn[:] = rmsn(h[:], ln2)
        if m.inj:
            # audio K/V stream for the injection phase: start rows 0/1
            # here so the [Ta, D] DMAs hide under the MLP weight stream
            def ka_dma(src, buf, b, slot, sem):
                return pltpu.make_async_copy(
                    src.at[l, b], buf.at[slot], sem.at[slot])

            ka_dma(ka, kabuf, 0, 0, kasem).start()
            ka_dma(va, vabuf, 0, 0, vasem).start()
            if m.B > 1:
                ka_dma(ka, kabuf, 1, 1, kasem).start()
                ka_dma(va, vabuf, 1, 1, vasem).start()
        run_stage(4, xn, store_to(mid, m.tiles[4][1]))   # up
        run_stage(5, xn, swiglu(m.tiles[5][1]))          # gate
        if m.tp > 1:
            run_stage(6, mid, store_to(pres, m.tiles[6][1]))  # down
            allreduce_into_h(1)
        else:
            run_stage(6, mid, resid(m.tiles[6][1]))      # down

        # ---- ORCA gated cross-attention (deep injection) -----------------
        # h' = h + on * sigmoid(g2(gelu(g1 h))) * LN(Wo MHA(Wq h, Ka, Va))
        # (models/orca.py gated_cross_attention_apply; reference
        # modeling_desta25.py:359-490).  Audio K/V are precomputed
        # decode-loop constants streamed per (layer, row); only the
        # q / o / gate1 weights ride the int8 ring.
        if m.inj:
            inj_scale = (m.D // m.Hi) ** -0.5

            def ibias(ref, bn):
                def f(n, val):
                    return val + ref[0, :, pl.ds(n * bn, bn)].astype(
                        jnp.float32)
                return f

            bq_f = ibias(bq, m.tiles[7][1])
            run_stage(7, h, lambda n, val: iq.__setitem__(
                (slice(None), pl.ds(n * m.tiles[7][1], m.tiles[7][1])),
                bq_f(n, val).astype(jnp.bfloat16)))

            # per-row attention over the audio tokens.  Scores for all
            # heads in one MXU dot: (k ⊙ q_row) @ indicator -> [Ta, 128]
            # (cols >= Hi are dead).  Softmax over the Ta sublanes.
            # With Kd > 1 (spec verify) every draft token of a batch row
            # attends the SAME audio K/V — one (ka, va) DMA per row, Kd
            # q-rows against it.
            tmask = jax.lax.broadcasted_iota(
                jnp.int32, (m.Ta, 128), 0) < m.Ta_real
            for b in range(m.B):
                slot = b % 2
                pltpu.make_async_copy(
                    ka.at[l, b], kabuf.at[slot], kasem.at[slot]).wait()
                pltpu.make_async_copy(
                    va.at[l, b], vabuf.at[slot], vasem.at[slot]).wait()
                kab = kabuf[slot].astype(jnp.float32)           # [Ta, D]
                vab = vabuf[slot].astype(jnp.float32)           # [Ta, D]
                for j in range(m.Kd):
                    r = b * m.Kd + j
                    qrow = iq[r:r + 1, :].astype(jnp.float32)   # [1, D]
                    mq = (kab * qrow).astype(jnp.bfloat16)
                    sc = jnp.dot(mq, imind[:],
                                 preferred_element_type=jnp.float32)
                    sc = sc * inj_scale
                    sc = jnp.where(tmask, sc, jnp.float32(-1e30))
                    mx = jnp.max(sc, axis=0, keepdims=True)
                    e = jnp.exp(sc - mx)
                    den = jnp.sum(e, axis=0, keepdims=True)
                    p = (e / den).astype(jnp.bfloat16)          # [Ta, 128]
                    # broadcast per-head probs back to lanes: [Ta, D]
                    # f32 acc: Mosaic rejects bf16 matmul accumulators
                    # on real TPU (interpret mode accepts them).
                    pf = jax.lax.dot_general(
                        p, imind[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ov = jnp.sum(pf * vab,
                                 axis=0, keepdims=True)         # [1, D]
                    iat[r:r + 1, :] = ov.astype(jnp.bfloat16)
                if b + 2 < m.B:
                    pltpu.make_async_copy(
                        ka.at[l, b + 2], kabuf.at[slot],
                        kasem.at[slot]).start()
                    pltpu.make_async_copy(
                        va.at[l, b + 2], vabuf.at[slot],
                        vasem.at[slot]).start()

            bo_f = ibias(bo, m.tiles[8][1])
            run_stage(8, iat, lambda n, val: iao.__setitem__(
                (slice(None), pl.ds(n * m.tiles[8][1], m.tiles[8][1])),
                bo_f(n, val).astype(jnp.bfloat16)))

            from .enc_ffn import _gelu_f32
            bg_f = ibias(bg1, m.tiles[9][1])
            run_stage(9, h, lambda n, val: ig.__setitem__(
                (slice(None), pl.ds(n * m.tiles[9][1], m.tiles[9][1])),
                _gelu_f32(bg_f(n, val).astype(jnp.bfloat16).astype(
                    jnp.float32)).astype(jnp.bfloat16)))

            # gate2 matvec (VPU) + sigmoid; LayerNorm(eps=1e-5) of the
            # o-projection; gated residual (contribution rounded to bf16
            # before the add — bit-matches the XLA path's cast order)
            gs = jnp.sum(ig[:].astype(jnp.float32)
                         * wg2[0].astype(jnp.float32),
                         axis=-1, keepdims=True)
            gs = gs + bg2[0][:, :1].astype(jnp.float32)
            gate = jax.nn.sigmoid(gs)                           # [Mp, 1]
            xo = iao[:].astype(jnp.float32)
            mu = jnp.mean(xo, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xo - mu), axis=-1, keepdims=True)
            lno = ((xo - mu) * jax.lax.rsqrt(var + 1e-5)
                   * lns[0].astype(jnp.float32)
                   + lnb[0].astype(jnp.float32))
            contrib = (gate * lno).astype(jnp.bfloat16)
            h[:] = h[:] + inj_on[:].astype(jnp.bfloat16)[:, :1] * contrib

        @pl.when(l == m.L - 1)
        def _():
            h_out[:] = h[:]
            # drain the last layer's cache write-backs before kernel exit
            for b in range(m.B):
                kv_rmw_copy(kwbuf, kc_out, m.L - 1, b, kwsem, True).wait()
                kv_rmw_copy(vwbuf, vc_out, m.L - 1, b, vwsem, True).wait()

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(m: _Meta, interpret: bool, detect_races: bool = False):
    HDh, KVD = m.H * m.Dh, m.Hkv * m.Dh
    R = m.B * m.Kd
    KH = m.Kd * m.H
    W = 8 if m.Kd == 1 else 16
    bk_max = max(t[0] for t in m.tiles)
    bn_max = max(t[1] for t in m.tiles)
    vm = pltpu.VMEM
    bf16, f32 = jnp.bfloat16, jnp.float32

    in_specs = [
        pl.BlockSpec((m.Mp, m.D), lambda l: (0, 0), memory_space=vm),   # x
        # per-layer vectors ride as [L, 1, N] so the (1, N) trailing block
        # matches Mosaic's block-divisibility rule
        pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0), memory_space=vm),
        pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0), memory_space=vm),
    ]
    if m.qk_norm:
        in_specs += [
            pl.BlockSpec((1, 1, m.Dh), lambda l: (l, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m.Dh), lambda l: (l, 0, 0),
                         memory_space=vm),
        ]
    in_specs += [
        pl.BlockSpec((R, m.Dh), lambda l: (0, 0), memory_space=vm),   # cos
        pl.BlockSpec((R, m.Dh), lambda l: (0, 0), memory_space=vm),   # sin
        pl.BlockSpec((m.B, m.S), lambda l: (0, 0), memory_space=vm),  # bias
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # ci
    ]
    dims = _meta_dims(m)
    if m.inj:
        in_specs += [
            pl.BlockSpec((m.Mp, 128), lambda l: (0, 0),
                         memory_space=vm),                      # inj_on
            pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0),
                         memory_space=vm),                      # bq
            pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0),
                         memory_space=vm),                      # bo
            pl.BlockSpec((1, 1, m.Dg), lambda l: (l, 0, 0),
                         memory_space=vm),                      # bg1
            pl.BlockSpec((1, 1, m.Dg), lambda l: (l, 0, 0),
                         memory_space=vm),                      # wg2
            pl.BlockSpec((1, 1, 128), lambda l: (l, 0, 0),
                         memory_space=vm),                      # bg2
            pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0),
                         memory_space=vm),                      # ln scale
            pl.BlockSpec((1, 1, m.D), lambda l: (l, 0, 0),
                         memory_space=vm),                      # ln bias
        ]
    if m.w_int8:
        for _, N in dims:
            in_specs.append(
                pl.BlockSpec((1, 1, N), lambda l: (l, 0, 0),
                             memory_space=vm))
    # weights (ANY) + [audio K/V when injecting] + cache k/v (ANY, last
    # two so the input->output aliases below stay positional)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * (
        len(dims) + (2 if m.inj else 0) + 2)

    out_shape = [
        jax.ShapeDtypeStruct((m.Mp, m.D), bf16),
        jax.ShapeDtypeStruct((m.L, m.B, m.S, KVD), bf16),  # aliased k cache
        jax.ShapeDtypeStruct((m.L, m.B, m.S, KVD), bf16),  # aliased v cache
    ]
    out_specs = [
        pl.BlockSpec((m.Mp, m.D), lambda l: (0, 0), memory_space=vm),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # cache inputs are the last two args; alias them onto outputs 1/2 so
    # the in-kernel RMW write-back is truly in place (no XLA copy)
    n_in = len(in_specs)
    aliases = {n_in - 2: 1, n_in - 1: 2}
    scratch = [
        pltpu.VMEM((m.Mp, m.D), bf16),            # h
        pltpu.VMEM((m.Mp, m.D), bf16),            # xn
        pltpu.VMEM((m.Mp, HDh), bf16),            # qs
        pltpu.VMEM((m.Mp, KVD), bf16),            # ks
        pltpu.VMEM((m.Mp, KVD), bf16),            # vs
        pltpu.VMEM((m.B, KH, KVD), bf16),         # qpad (block-diag q)
        pltpu.VMEM((m.B, KH, m.S), f32),          # scores
        pltpu.VMEM((m.B, KH, KVD), f32),          # ofull
        pltpu.VMEM((m.Mp, HDh), bf16),            # attn
        pltpu.VMEM((m.Mp, m.I), bf16),            # mid
        pltpu.VMEM((m.Mp, bn_max), f32),          # acc
        pltpu.VMEM((_W_RING, bk_max, bn_max),
                   jnp.int8 if m.w_int8 else jnp.bfloat16),  # wbuf ring
        pltpu.VMEM((2, m.s_blk, KVD), bf16),      # kvbuf
        pltpu.VMEM((m.B, W, KVD), bf16),          # kwbuf (k cache RMW)
        pltpu.VMEM((m.B, W, KVD), bf16),          # vwbuf (v cache RMW)
    ]
    if m.inj:
        scratch += [
            pltpu.VMEM((m.Mp, m.D), bf16),        # iq (inj q rows)
            pltpu.VMEM((m.Mp, m.D), bf16),        # iat (inj attn rows)
            pltpu.VMEM((m.Mp, m.D), bf16),        # iao (inj o-proj out)
            pltpu.VMEM((m.Mp, m.Dg), bf16),       # ig (gelu(gate1))
            pltpu.VMEM((m.D, 128), bf16),         # imind (head indicator)
            pltpu.VMEM((2, m.Ta, m.D), bf16),     # kabuf
            pltpu.VMEM((2, m.Ta, m.D), bf16),     # vabuf
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((_W_RING,)),      # wsem
        pltpu.SemaphoreType.DMA((2,)),            # kvsem
        pltpu.SemaphoreType.DMA((m.B,)),          # krsem
        pltpu.SemaphoreType.DMA((m.B,)),          # vrsem
        pltpu.SemaphoreType.DMA((m.B,)),          # kwsem
        pltpu.SemaphoreType.DMA((m.B,)),          # vwsem
    ]
    if m.inj:
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),        # kasem
            pltpu.SemaphoreType.DMA((2,)),        # vasem
        ]
    if m.tp > 1:
        scratch += [
            pltpu.VMEM((m.Mp, m.D), f32),             # pres (local partial)
            pltpu.VMEM((2, m.tp, m.Mp, m.D), f32),    # rbuf (peer partials)
            pltpu.SemaphoreType.DMA((2, m.tp)),       # ssem
            pltpu.SemaphoreType.DMA((2, m.tp)),       # rsem
        ]
    cparams = dict(dimension_semantics=("arbitrary",),
                   vmem_limit_bytes=100 * 1024 * 1024)
    if m.tp > 1:
        # remote DMAs into peers are invisible side effects; collective_id
        # binds the model group's barrier semaphore
        cparams.update(collective_id=0, has_side_effects=True)
    interp = (pltpu.InterpretParams(detect_races=detect_races)
              if interpret else False)
    return pl.pallas_call(
        _make_kernel(m),
        grid=(m.L,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(**cparams),
        interpret=interp,
    )


# ---------------------------------------------------------------------------
# XLA-side wrapper
# ---------------------------------------------------------------------------


def _run_fused(params, cfg, inputs_embeds, attention_mask, positions,
               cache, cache_index, inject=None, tp: int = 1,
               mesh_axes: Tuple[str, ...] = ()):
    """Shared driver for the fused decode (Kd=1) / verify (Kd>1) step.

    inputs_embeds [B, Kd, D]; positions [B, Kd]; cache_index scalar or
    [B] (position of each row's FIRST token).  Returns
    (hidden [B, Kd, D] bf16 pre-final-norm, new KVCache).

    inject: optional in-kernel ORCA deep injection (any Kd — verify
    steps run the cross-attention for every draft position) — a
    dict with ``params`` (int8-quantized orca_cross_attns tree), ``k`` /
    ``v`` ([L, B, Ta, D] audio K/V, Ta padded to a multiple of 8),
    ``ta_real`` (valid audio tokens, static), ``heads`` (static) and
    ``on`` ([B] float, 1.0 = inject this row).
    """
    B, Kd, D = inputs_embeds.shape
    R = B * Kd
    L, _, S, _KVD = cache.k.shape
    Hkv, Dh = cfg.num_key_value_heads, cfg.head_dim
    ci_in = jnp.asarray(cache_index)
    ci = (jnp.broadcast_to(ci_in, (B,)) if ci_in.ndim == 0
          else ci_in).astype(jnp.int32)
    cos, sin = llm_rope_cos_sin(cfg, positions.reshape(R))  # [R, Dh]

    # streamed-score bias: keys strictly below each row's first token.
    # Draft tokens (positions >= ci) attend each other via the kernel's
    # in-register causal block, never through the streamed cache.
    key_idx = jnp.arange(S)[None, :]
    valid = (attention_mask[:, :S] > 0) & (key_idx < ci[:, None])
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    Mp = max(16, -(-R // 16) * 16)
    xp = inputs_embeds.reshape(R, D).astype(jnp.bfloat16)
    if Mp != R:
        xp = jnp.pad(xp, ((0, Mp - R), (0, 0)))

    inj = inject is not None
    if inj:
        il = inject["params"]["layers"]
        Dg = il["gate1"]["q"].shape[2]
        Ta = inject["k"].shape[2]
        assert Ta % 8 == 0, "audio K/V must be padded to a multiple of 8"
    else:
        Dg = Ta = 0

    layers = params["layers"]
    from .quant import is_quantized
    w_int8 = is_quantized(layers["wq"])
    if inj:
        assert w_int8, "in-kernel injection needs the int8 tower stream"
    meta = _Meta(
        L=L, D=D, H=cfg.num_attention_heads, Hkv=Hkv, Dh=Dh,
        I=cfg.intermediate_size, qk_norm=bool(cfg.qk_norm),
        eps=float(cfg.rms_norm_eps), B=B, Kd=Kd, Mp=Mp, S=S,
        s_blk=_pick_sblk(S, Hkv * Dh),
        tiles=_stage_tiles(D, cfg.num_attention_heads, Hkv, Dh,
                           cfg.intermediate_size, inj_dg=Dg,
                           elem_bytes=1 if w_int8 else 2),
        inj=inj, Ta=Ta, Ta_real=int(inject["ta_real"]) if inj else 0,
        Dg=Dg, Hi=int(inject["heads"]) if inj else 0, w_int8=w_int8,
        tp=tp, mesh_axes=tuple(mesh_axes))
    call = _build_call(
        meta, _interpret_mode(),
        detect_races=(tp > 1 and os.environ.get(
            "DESTA_FUSED_DETECT_RACES", "0") == "1"))

    args = [xp, layers["ln1"]["scale"][:, None, :],
            layers["ln2"]["scale"][:, None, :]]
    if meta.qk_norm:
        args += [layers["q_norm"]["scale"][:, None, :],
                 layers["k_norm"]["scale"][:, None, :]]
    args += [cos.astype(jnp.float32), sin.astype(jnp.float32), bias,
             ci.reshape(1, B)]
    wkeys = ("wq", "wk", "wv", "wo", "w_up", "w_gate", "w_down")
    if inj:
        # per-row gate flags, token-major like the residual stream rows
        # (row r = b*Kd + j: every draft position of batch row b shares
        # on[b])
        on_rows = jnp.repeat(jnp.asarray(inject["on"], jnp.float32), Kd)
        on = jnp.zeros((Mp, 128), jnp.float32).at[:R, :].set(
            jnp.broadcast_to(on_rows[:, None], (R, 128)))
        g2w = jnp.swapaxes(il["gate2"]["w"], 1, 2).astype(jnp.float32)
        g2b = jnp.broadcast_to(
            il["gate2"]["b"].astype(jnp.float32)[:, :, None], (L, 1, 128))
        args += [
            on,
            il["q"]["b"].astype(jnp.float32)[:, None, :],
            il["o"]["b"].astype(jnp.float32)[:, None, :],
            il["gate1"]["b"].astype(jnp.float32)[:, None, :],
            g2w,                                   # [L, 1, Dg]
            g2b,                                   # [L, 1, 128]
            il["ln"]["scale"].astype(jnp.float32)[:, None, :],
            il["ln"]["bias"].astype(jnp.float32)[:, None, :],
        ]
    if w_int8:
        args += [layers[k]["s"][:, None, :] for k in wkeys]
    if inj:
        args += [il[k]["s"][:, None, :] for k in ("q", "o", "gate1")]
    args += [(layers[k]["q"] if w_int8 else layers[k]) for k in wkeys]
    if inj:
        args += [il[k]["q"] for k in ("q", "o", "gate1")]
        args += [inject["k"].astype(jnp.bfloat16),
                 inject["v"].astype(jnp.bfloat16)]
    args += [cache.k, cache.v]  # packed [L, B, S, Hkv*Dh] — kernel-native

    # cache rows are written IN-KERNEL (aligned W-row RMW, cache aliased
    # input->output) — no XLA dynamic_update_slice, no relayout copies
    h_out, newk, newv = call(*args)
    from ..models.llm import KVCache
    return h_out[:R].reshape(B, Kd, D), KVCache(newk, newv)


def fused_decode_layers(params, cfg, inputs_embeds, attention_mask,
                        positions, cache, cache_index, inject=None):
    """One decode step through all layers.

    inputs_embeds [B, 1, D]; attention_mask [B, >=S]; positions [B, 1];
    cache: packed KVCache [L, B, S, Hkv*Dh]; cache_index: scalar or [B].
    inject: optional in-kernel ORCA deep injection (see :func:`_run_fused`).
    Returns (hidden [B, 1, D] bf16 pre-final-norm, new KVCache).
    """
    assert inputs_embeds.shape[1] == 1
    return _run_fused(params, cfg, inputs_embeds, attention_mask,
                      positions, cache, cache_index, inject=inject)


_INJ_KV_VMEM_BUDGET = 24 * 1024 * 1024  # 4 x [Ta, D] bf16 ring buffers


def fused_inject_supported(inject_params, cfg, ta_padded: int) -> bool:
    """Can the ORCA gated cross-attention run INSIDE the fused decode
    kernel?  Requires int8-quantized q/o/gate1 stacks (with biases), the
    full-precision gate2 + LayerNorm leaves, clean tiling for the two
    D x D and the D x (D/4) streamed stages, and audio K/V ring buffers
    that fit VMEM.  ``ta_padded`` is the (8-aligned) audio-token count."""
    if inject_params is None:
        return False
    from .quant import is_quantized
    layers = inject_params.get("layers", {})
    for k in ("q", "o", "gate1"):
        leaf = layers.get(k)
        if not (is_quantized(leaf) and "b" in leaf):
            return False
    g2, ln = layers.get("gate2"), layers.get("ln")
    if not (isinstance(g2, dict) and "w" in g2 and "b" in g2):
        return False
    if not (isinstance(ln, dict) and "scale" in ln and "bias" in ln):
        return False
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    Dg = layers["gate1"]["q"].shape[2]
    if D % H != 0 or H > 128:
        return False
    if _pick_tile(D, D) is None or _pick_tile(D, Dg) is None:
        return False
    if ta_padded <= 0 or ta_padded % 8 != 0:
        return False
    if 4 * ta_padded * D * 2 > _INJ_KV_VMEM_BUDGET:
        return False
    return True


def pad_audio_kv(kv: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the Ta axis of [L, B, Ta, D] audio K/V to a multiple of 8
    (DMA sublane tiling); padded rows are masked out of the in-kernel
    softmax via ``ta_real``."""
    Ta = kv.shape[2]
    pad = (-Ta) % 8
    if pad:
        kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return kv


def fused_verify_layers(params, cfg, inputs_embeds, attention_mask,
                        positions, cache, cache_index, inject=None):
    """Speculative-verify step: Kd tokens per row in ONE weight stream.

    inputs_embeds [B, Kd, D] = the last accepted token + Kd-1 draft
    tokens; positions [B, Kd] (ci + j); cache_index scalar or [B] = each
    row's first write position.  Token j attends cache keys < ci (gated
    by attention_mask) plus draft tokens 0..j via the kernel's
    in-register causal block; all Kd (k, v) rows land in the cache at
    ci..ci+Kd-1 (rows past the accepted count are dead until
    overwritten — the next step's bias masks them).  Requires
    ci <= S - Kd.  Returns (hidden [B, Kd, D], new KVCache) — logits for
    every draft position from one ~weight-bound pass (the marginal cost
    over a single-token step is just the extra attention math).
    """
    assert inputs_embeds.shape[1] > 1
    return _run_fused(params, cfg, inputs_embeds, attention_mask,
                      positions, cache, cache_index, inject=inject)
