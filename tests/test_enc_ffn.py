"""Parity tests for the fused encoder FFN kernel (ops/enc_ffn.py).

fc1 -> erf-gelu -> fc2 in one Pallas launch, chunked over the hidden dim
so the gelu VPU work overlaps the MXU matmuls.  Interpret mode on reduced
shapes (CPU); full whisper-large-v3 shapes run compiled on TPU.

Reference behavior: HF WhisperEncoderLayer fc1/activation_fn/fc2
(modeling_desta25.py:575-608 encoder loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desta25_audio_tpu.ops.enc_ffn import (
    _xla_ffn,
    _xla_ffn_w8a8,
    encoder_ffn,
    encoder_ffn_w8a8,
    ffn_supported,
    ffn_w8a8_supported,
)
from desta25_audio_tpu.ops.quant import quantize_weight


def _mk(key, B, T, D, F):
    ks = jax.random.split(key, 5)
    bf = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, T, D), jnp.float32).astype(bf)
    w1 = (jax.random.normal(ks[1], (D, F), jnp.float32) * 0.05).astype(bf)
    b1 = (jax.random.normal(ks[2], (F,), jnp.float32) * 0.05).astype(bf)
    w2 = (jax.random.normal(ks[3], (F, D), jnp.float32) * 0.05).astype(bf)
    b2 = (jax.random.normal(ks[4], (D,), jnp.float32) * 0.05).astype(bf)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("B,T,D,F,bm", [
    (2, 160, 256, 1280, 128),   # M=320: several row blocks
    (1, 100, 128, 1280, 64),    # M=100: partial last block
])
def test_fused_matches_xla(B, T, D, F, bm):
    assert ffn_supported(D, F, jnp.bfloat16)
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(0), B, T, D, F)
    got = encoder_ffn(x, w1, b1, w2, b2, bm, True)
    want = _xla_ffn(x, w1, b1, w2, b2)
    # the kernel keeps fc1 output in f32 through the gelu (the XLA path
    # rounds to bf16 first) -> bf16-level tolerance
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_unsupported_falls_back():
    # F not a multiple of 1280 -> XLA path
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(1), 1, 64, 128, 512)
    assert not ffn_supported(128, 512, jnp.bfloat16)
    got = encoder_ffn(x, w1, b1, w2, b2, 64, True)
    want = _xla_ffn(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-6, rtol=1e-6)


def test_vjp_fallback_matches_xla_grads():
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(2), 1, 96, 128, 1280)

    def loss_pallas(x, w1, b1, w2, b2):
        return jnp.sum(encoder_ffn(x, w1, b1, w2, b2, 64, True)
                       .astype(jnp.float32))

    def loss_xla(x, w1, b1, w2, b2):
        return jnp.sum(_xla_ffn(x, w1, b1, w2, b2).astype(jnp.float32))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=5e-2)


def _quant(w1, w2):
    l1, l2 = quantize_weight(w1), quantize_weight(w2)
    return l1["q"], l1["s"], l2["q"], l2["s"]


@pytest.mark.parametrize("B,T,D,F,bm", [
    (2, 160, 256, 1280, 128),
    (1, 100, 128, 1280, 64),
])
def test_w8a8_matches_dequant_xla(B, T, D, F, bm):
    """In-kernel act-quant W8A8 vs the dequantized-weight XLA FFN: the
    residual error is the activation quantization (per-row symmetric
    int8), which on unit-scale gaussians stays within a few percent."""
    assert ffn_w8a8_supported(D, F, jnp.bfloat16)
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(4), B, T, D, F)
    q1, s1, q2, s2 = _quant(w1, w2)
    got = np.asarray(
        encoder_ffn_w8a8(x, q1, s1, b1, q2, s2, b2, bm, True), np.float32)
    want = np.asarray(_xla_ffn_w8a8(x, q1, s1, b1, q2, s2, b2), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.05, \
        np.abs(got - want).max() / scale
    # and close to the unquantized FFN (weight quant error included)
    full = np.asarray(_xla_ffn(x, w1, b1, w2, b2), np.float32)
    assert np.abs(got - full).max() / (np.abs(full).max() + 1e-6) < 0.08


def test_w8a8_vjp_falls_back_to_dequant_grads():
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(5), 1, 96, 128, 1280)
    q1, s1, q2, s2 = _quant(w1, w2)

    def loss_pallas(x):
        return jnp.sum(encoder_ffn_w8a8(x, q1, s1, b1, q2, s2, b2, 64,
                                        True).astype(jnp.float32))

    def loss_xla(x):
        return jnp.sum(_xla_ffn_w8a8(x, q1, s1, b1, q2, s2,
                                     b2).astype(jnp.float32))

    gp = jax.grad(loss_pallas)(x)
    gx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(gp, np.float32),
                               np.asarray(gx, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_enc_ffn_dispatch_routes_quantized_to_w8a8_kernel(monkeypatch):
    """models/whisper._enc_ffn must hand encoder_quant=int8 leaves to the
    fused W8A8 kernel (not the per-op XLA int8 fallback) — pins the
    dispatch condition on CPU so a leaf rename or condition drift can't
    silently drop the 134.7->117.3 ms win until the next TPU bench."""
    from desta25_audio_tpu.models import whisper as jw
    from desta25_audio_tpu.ops import enc_ffn as ef

    monkeypatch.setattr(jw, "_packed_attn_enabled", lambda: True)
    hits = []
    orig = ef.encoder_ffn_w8a8

    def spy(x, q1, s1, b1, q2, s2, b2, block_m=256, interpret=False):
        hits.append(1)
        return orig(x, q1, s1, b1, q2, s2, b2, 64, True)

    monkeypatch.setattr(ef, "encoder_ffn_w8a8", spy)
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(7), 1, 512, 128, 1280)
    q1, s1, q2, s2 = _quant(w1, w2)
    p = {"fc1": {"q": q1, "s": s1, "b": b1},
         "fc2": {"q": q2, "s": s2, "b": b2}}
    got = jw._enc_ffn(p, x)
    assert hits, "quantized FFN leaves must dispatch to the W8A8 kernel"
    want = _xla_ffn_w8a8(x, q1, s1, b1, q2, s2, b2)
    scale = np.abs(np.asarray(want, np.float32)).max() + 1e-6
    assert np.abs(np.asarray(got, np.float32)
                  - np.asarray(want, np.float32)).max() / scale < 0.05


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-shape compiled check needs the TPU")
def test_w8a8_full_shape_on_tpu():
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(6), 2, 1500, 1280, 5120)
    q1, s1, q2, s2 = _quant(w1, w2)
    got = np.asarray(jax.jit(
        lambda *a: encoder_ffn_w8a8(*a))(x, q1, s1, b1, q2, s2, b2),
        np.float32)
    want = np.asarray(_xla_ffn_w8a8(x, q1, s1, b1, q2, s2, b2), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.05


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-shape compiled check needs the TPU")
def test_full_shape_on_tpu():
    x, w1, b1, w2, b2 = _mk(jax.random.PRNGKey(3), 2, 1500, 1280, 5120)
    got = jax.jit(lambda *a: encoder_ffn(*a))(x, w1, b1, w2, b2)
    want = _xla_ffn(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)
