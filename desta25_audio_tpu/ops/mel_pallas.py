"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

One kernel performs, per block of frames: windowed real-DFT as three MXU
matmuls over hop-sized audio rows (no gather, no materialized frame matrix),
power spectrum, mel filterbank matmul, and log10 — writing [block, n_mels]
log-mel directly.  The per-clip dynamic-range clamp (a global max) happens
outside in two cheap elementwise ops.

The GEMM factorization (audio/mel.py): n_fft=400 = 2*hop + hop/2, so
``frames @ W == R[0:F] @ W0 + R[1:F+1] @ W1 + R[2:F+2,:80] @ W2`` where R is
the hop-row reshape of the reflect-padded audio.  W0/W1/W2 carry the Hann
window folded in.

Validated against ``audio.mel.log_mel`` (the jnp oracle) in
tests/test_mel_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    mel_frontend_matrices,
)

# Frames per grid step. 3000 = 5 * 600; 600 is a multiple of 8 (f32 sublane).
FRAME_BLOCK = 600
N_BINS = N_FFT // 2 + 1  # 201
_TAIL = N_FFT - 2 * HOP_LENGTH  # 80


def _mel_kernel(rows_ref, cs_ref, tail_ref, mel_ref, out_ref):
    """One frame-block of the fused frontend.

    rows_ref: [1, n_rows, HOP] — all hop rows of one clip (stays resident in
        VMEM across the inner frame-block grid dimension since its index map
        only depends on the batch index).
    cs_ref:   [2*HOP, 2*N_BINS_PAD] stacked (W0; W1) x (cos | sin), windowed.
    tail_ref: [_TAIL, 2*N_BINS_PAD] W2 x (cos | sin).
    mel_ref:  [N_BINS_PAD, n_mels] filterbank (zero rows beyond N_BINS).
    out_ref:  [1, FRAME_BLOCK, n_mels] log10-mel (pre dynamic-range clamp).
    """
    F = out_ref.shape[1]
    f0 = pl.multiple_of(pl.program_id(1) * F, 8)
    # One aligned load (F is a multiple of 8), then static in-register
    # shifts for the +1 / +2 row offsets — Mosaic requires sublane-aligned
    # dynamic slice starts on refs, but handles static shifts on values.
    blk = rows_ref[0, pl.ds(f0, F + 8), :]
    r0 = blk[0:F]
    r1 = blk[1:F + 1]
    r2 = blk[2:F + 2]  # only the first _TAIL lanes matter; tail_ref rows
    #                     _TAIL..HOP are zero so the rest contributes nothing
    hp = jnp.dot  # alias
    s = hp(r0, cs_ref[0:HOP_LENGTH], preferred_element_type=jnp.float32,
           precision=jax.lax.Precision.HIGHEST)
    s += hp(r1, cs_ref[HOP_LENGTH:2 * HOP_LENGTH],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    s += hp(r2, tail_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    nb = cs_ref.shape[1] // 2
    re = s[:, :nb]
    im = s[:, nb:]
    power = re * re + im * im  # [F, N_BINS_PAD]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.lru_cache(maxsize=4)
def _packed_matrices(num_mel_bins: int):
    cos_m, sin_m, mel_fb = mel_frontend_matrices(num_mel_bins)
    # Pad bins 201 -> 256 (lane multiple) with zeros; the extra power bins
    # multiply zero filterbank rows, so the result is unchanged.
    nbp = 256
    cs = np.zeros((2 * HOP_LENGTH, 2 * nbp), dtype=np.float32)
    cs[:, :N_BINS] = cos_m[:2 * HOP_LENGTH]
    cs[:, nbp:nbp + N_BINS] = sin_m[:2 * HOP_LENGTH]
    # Tail matrix zero-padded to full hop rows so the kernel can use a full
    # [F, HOP] x [HOP, 2*nbp] matmul without lane slicing.
    tail = np.zeros((HOP_LENGTH, 2 * nbp), dtype=np.float32)
    tail[:_TAIL, :N_BINS] = cos_m[2 * HOP_LENGTH:]
    tail[:_TAIL, nbp:nbp + N_BINS] = sin_m[2 * HOP_LENGTH:]
    melp = np.zeros((nbp, mel_fb.shape[1]), dtype=np.float32)
    melp[:N_BINS] = mel_fb
    # NB: return numpy, not jnp — this function is lru_cached and may first
    # run inside a jit trace; caching device arrays would leak tracers.
    return cs, tail, melp


def log_mel_pallas(audio: jnp.ndarray, num_mel_bins: int,
                   layout: str = "btm",
                   interpret: bool = False) -> jnp.ndarray:
    """Fused log-mel frontend. audio: [B, n_frames*160] -> [B, n_frames,
    n_mels] ("btm") or [B, n_mels, n_frames] ("bmt").

    Whisper always uses n_frames == N_FRAMES (3000); shorter multiples of
    FRAME_BLOCK are supported for fast interpret-mode testing.
    """
    B = audio.shape[0]
    n_frames = audio.shape[1] // HOP_LENGTH
    assert audio.shape[1] == n_frames * HOP_LENGTH, audio.shape
    assert n_frames % FRAME_BLOCK == 0, n_frames
    cs, tail, melp = _packed_matrices(num_mel_bins)

    padded = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)),
                     mode="reflect")
    total = padded.shape[1]
    n_rows = n_frames + 8  # slack so the last block's aligned F+8 load fits
    padded = jnp.pad(padded, ((0, 0), (0, n_rows * HOP_LENGTH - total)))
    rows = padded.reshape(B, n_rows, HOP_LENGTH)

    grid = (B, n_frames // FRAME_BLOCK)
    log_spec = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_frames, num_mel_bins),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_rows, HOP_LENGTH),
                         lambda b, f: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HOP_LENGTH, 2 * 256), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HOP_LENGTH, 2 * 256), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, num_mel_bins), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, num_mel_bins),
                               lambda b, f: (b, f, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, cs, tail, melp)

    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    if layout == "bmt":
        return jnp.swapaxes(log_spec, 1, 2)
    return log_spec
