"""Rotary position embeddings.

Covers three uses in the framework:

1. LLM attention RoPE (Llama-3.1 with NTK "llama3" scaling; Qwen3 plain
   theta) — half-split rotation convention matching HF Llama/Qwen.
2. Whisper has no RoPE (sinusoidal absolute), handled elsewhere.
3. ORCA fractional-position RoPE on audio tokens
   (reference ``compute_rope_freqs``/``apply_rotary_pos_emb``,
   modeling_desta25.py:22-97) — positions ``arange(T)/scale``.

All trig in float32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import LLMConfig, RopeScalingConfig


def rope_inv_freq(dim: int, theta: float,
                  scaling: Optional[RopeScalingConfig] = None) -> jnp.ndarray:
    """Inverse frequencies [dim/2], optionally llama3-NTK scaled."""
    half = dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if scaling is not None and scaling.rope_type == "llama3":
        # HF Llama3RotaryEmbedding frequency warping.
        low_freq_wavelen = (scaling.original_max_position_embeddings
                            / scaling.low_freq_factor)
        high_freq_wavelen = (scaling.original_max_position_embeddings
                             / scaling.high_freq_factor)
        wavelen = 2.0 * math.pi / inv_freq
        inv_freq_llama = jnp.where(
            wavelen > low_freq_wavelen, inv_freq / scaling.factor, inv_freq
        )
        smooth = (
            (scaling.original_max_position_embeddings / wavelen
             - scaling.low_freq_factor)
            / (scaling.high_freq_factor - scaling.low_freq_factor)
        )
        smoothed = ((1.0 - smooth) * inv_freq_llama / scaling.factor
                    + smooth * inv_freq_llama)
        is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
        inv_freq = jnp.where(is_medium, smoothed, inv_freq_llama)
    return inv_freq


def rope_cos_sin(positions: jnp.ndarray, dim: int, theta: float,
                 scaling: Optional[RopeScalingConfig] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for half-split rotation.

    positions: [...] float or int array. Returns cos/sin of shape
    [..., dim] where the last dim is [freqs, freqs] concatenated
    (HF convention).
    """
    inv_freq = rope_inv_freq(dim, theta, scaling)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """Apply half-split RoPE.

    x: [B, T, H, D]; cos/sin: [B, T, D] or [T, D] (broadcast over heads).
    """
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)


def llm_rope_cos_sin(cfg: LLMConfig, positions: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                        cfg.rope_scaling)


def fractional_rope_apply(x: jnp.ndarray, scale: float, theta: float
                          ) -> jnp.ndarray:
    """ORCA audio-token RoPE with fractional positions i/scale.

    x: [B, T, D] full hidden vectors (not per-head), matching the reference
    which rotates the whole hidden_size (modeling_desta25.py:423-438).
    """
    B, T, D = x.shape
    positions = jnp.arange(T, dtype=jnp.float32) / scale
    cos, sin = rope_cos_sin(positions, D, theta)
    xf = x.astype(jnp.float32)
    out = xf * cos[None] + rotate_half(xf) * sin[None]
    return out.astype(x.dtype)
