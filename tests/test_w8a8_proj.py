"""Parity tests for the fused-quant attention-projection kernels
(ops/w8a8_proj.py): in-kernel per-row act quant + int8 MXU dots for the
encoder's q/k/v (one shared quant pass, three outputs) and o projections.

Interpret mode on reduced shapes (CPU); full whisper-large-v3 shapes run
compiled on TPU.  Reference behavior: HF WhisperAttention q/k/v/out_proj
(modeling_desta25.py:575-608 encoder loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desta25_audio_tpu.ops.quant import quantize_weight
from desta25_audio_tpu.ops.w8a8_proj import (
    _xla_proj,
    proj_w8a8,
    proj_w8a8_supported,
    qkv_w8a8,
)


def _leaf(key, d, n, bias=True, dtype=jnp.bfloat16):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (d, n), jnp.float32) * 0.05
    leaf = dict(quantize_weight(w))
    if bias:
        leaf["b"] = (jax.random.normal(kb, (n,), jnp.float32)
                     * 0.05).astype(dtype)
    return leaf


@pytest.mark.parametrize("B,T,D,bm", [
    (2, 160, 256, 128),   # several row blocks
    (1, 100, 128, 64),    # partial last block
])
def test_qkv_matches_dequant_xla(B, T, D, bm):
    assert proj_w8a8_supported(D, D, jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (jax.random.normal(ks[0], (B, T, D), jnp.float32)
         ).astype(jnp.bfloat16)
    lq = _leaf(ks[1], D, D, bias=True)
    lk = _leaf(ks[2], D, D, bias=False)   # whisper k_proj has no bias
    lv = _leaf(ks[3], D, D, bias=True)
    got = qkv_w8a8(x, lq, lk, lv, bm, True)
    want = (_xla_proj(x, lq), _xla_proj(x, lk), _xla_proj(x, lv))
    for g, w in zip(got, want):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        scale = np.abs(w).max() + 1e-6
        # residual error = per-row act quant; few % of scale on gaussians
        assert np.abs(g - w).max() / scale < 0.05


def test_single_proj_matches_dequant_xla():
    D = 256
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = (jax.random.normal(ks[0], (2, 100, D), jnp.float32)
         ).astype(jnp.bfloat16)
    leaf = _leaf(ks[1], D, D, bias=True)
    got = np.asarray(proj_w8a8(x, leaf, 64, True), np.float32)
    want = np.asarray(_xla_proj(x, leaf), np.float32)
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-6) < 0.05


def test_unsupported_falls_back_exactly():
    # N not a multiple of 128 -> dequant XLA path, bit-identical
    D, N = 128, 96
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = (jax.random.normal(ks[0], (1, 64, D), jnp.float32)
         ).astype(jnp.bfloat16)
    leaf = _leaf(ks[1], D, N, bias=True)
    assert not proj_w8a8_supported(D, N, jnp.bfloat16)
    got = proj_w8a8(x, leaf, 64, True)
    want = _xla_proj(x, leaf)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_vjp_falls_back_to_dequant_grads():
    D = 128
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = (jax.random.normal(ks[0], (1, 96, D), jnp.float32)
         ).astype(jnp.bfloat16)
    lq = _leaf(ks[1], D, D)
    lk = _leaf(ks[2], D, D, bias=False)
    lv = _leaf(ks[3], D, D)

    def loss_pallas(x):
        q, k, v = qkv_w8a8(x, lq, lk, lv, 64, True)
        return jnp.sum((q + k + v).astype(jnp.float32))

    def loss_xla(x):
        return jnp.sum((_xla_proj(x, lq) + _xla_proj(x, lk)
                        + _xla_proj(x, lv)).astype(jnp.float32))

    gp = jax.grad(loss_pallas)(x)
    gx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(gp, np.float32),
                               np.asarray(gx, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_enc_self_attn_routes_quantized_to_fused_kernels(monkeypatch):
    """models/whisper._enc_self_attn must hand quantized attention leaves
    to the fused-quant kernels (not the per-op XLA int8 fallback) — pins
    the dispatch condition on CPU."""
    from desta25_audio_tpu.models import whisper as jw
    from desta25_audio_tpu.ops import enc_attention as ea
    from desta25_audio_tpu.ops import w8a8_proj as wp

    monkeypatch.setattr(jw, "_packed_attn_enabled", lambda: True)
    hits = {"qkv": 0, "o": 0}
    orig_qkv, orig_one, orig_attn = (wp.qkv_w8a8, wp.proj_w8a8,
                                     ea.packed_encoder_attention)

    def spy_qkv(x, lq, lk, lv, block_m=512, interpret=False):
        hits["qkv"] += 1
        return orig_qkv(x, lq, lk, lv, 64, True)

    def spy_one(x, leaf, block_m=512, interpret=False):
        hits["o"] += 1
        return orig_one(x, leaf, 64, True)

    monkeypatch.setattr(wp, "qkv_w8a8", spy_qkv)
    monkeypatch.setattr(wp, "proj_w8a8", spy_one)
    monkeypatch.setattr(
        ea, "packed_encoder_attention",
        lambda q, k, v, h, block_q=512, interpret=False:
        orig_attn(q, k, v, h, block_q=block_q, interpret=True))

    D, H, T = 128, 2, 512   # packed kernel needs T >= 512
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    x = (jax.random.normal(ks[0], (1, T, D), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    p = {"q": _leaf(ks[1], D, D), "k": _leaf(ks[2], D, D, bias=False),
         "v": _leaf(ks[3], D, D), "o": _leaf(ks[4], D, D)}
    got = jw._enc_self_attn(p, x, H)
    assert hits["qkv"] == 1 and hits["o"] == 1

    # reference: dequant-weight XLA attention on the same leaves
    from desta25_audio_tpu.ops.attention import mha

    def dq(leaf, xx):
        return _xla_proj(xx, leaf)

    q = dq(p["q"], x).reshape(1, T, H, D // H)
    k = dq(p["k"], x).reshape(1, T, H, D // H)
    v = dq(p["v"], x).reshape(1, T, H, D // H)
    want = dq(p["o"], mha(q, k, v).reshape(1, T, D))
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    assert np.abs(g - w).max() / (np.abs(w).max() + 1e-6) < 0.06


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-shape compiled check needs the TPU")
def test_qkv_full_shape_on_tpu():
    D = 1280
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    x = (jax.random.normal(ks[0], (2, 1500, D), jnp.float32)
         ).astype(jnp.bfloat16)
    lq = _leaf(ks[1], D, D)
    lk = _leaf(ks[2], D, D, bias=False)
    lv = _leaf(ks[3], D, D)
    got = jax.jit(lambda *a: qkv_w8a8(*a))(x, lq, lk, lv)
    want = (_xla_proj(x, lq), _xla_proj(x, lk), _xla_proj(x, lv))
    for g, w in zip(got, want):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        assert np.abs(g - w).max() / (np.abs(w).max() + 1e-6) < 0.05
