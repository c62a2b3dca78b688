"""Parity tests for the packed-layout encoder flash attention kernel.

ops/enc_attention.py consumes q/k/v in the projection-output layout
[B, T, H*Dh] (no transposes, no pad-to-flash-length).  These tests run
the Pallas kernel in interpret mode on reduced shapes (CPU) and check it
against a straightforward XLA attention, including the kv-length masking
path (T not a multiple of the 16-row sublane tile) and the VJP fallback.

Reference behavior: HF WhisperAttention encoder self-attention
(modeling_desta25.py:575-608 inner loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desta25_audio_tpu.ops.enc_attention import (
    _xla_attention,
    packed_encoder_attention,
    packed_supported,
)


def _mk(key, B, T, DM):
    ks = jax.random.split(key, 3)
    mk = lambda k: (jax.random.normal(k, (B, T, DM), jnp.float32)
                    .astype(jnp.bfloat16))
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("B,T,H,Dh", [
    (2, 150, 4, 64),   # T=150: kv block pads to 160 -> exercises masking
    (1, 96, 2, 128),   # one head per lane group
    (2, 64, 8, 32),    # four heads per lane group
])
def test_packed_matches_xla(B, T, H, Dh):
    DM = H * Dh
    assert packed_supported(H, DM)
    q, k, v = _mk(jax.random.PRNGKey(0), B, T, DM)
    scale = 1.0 / np.sqrt(Dh)
    got = packed_encoder_attention(q, k, v, H, 64, True)
    want = _xla_attention(q, k, v, H, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_cross_attention_matches_xla():
    # Q-Former cross-attention shape class: few queries, long kv.
    B, Tq, Tkv, H, Dh = 2, 16, 150, 4, 64
    DM = H * Dh
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    bf = lambda k, T: (jax.random.normal(k, (B, T, DM), jnp.float32)
                       .astype(jnp.bfloat16))
    q, k, v = bf(ks[0], Tq), bf(ks[1], Tkv), bf(ks[2], Tkv)
    got = packed_encoder_attention(q, k, v, H, 64, True)
    want = _xla_attention(q, k, v, H, 1.0 / np.sqrt(Dh))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_vmapped_cross_attention():
    # The qformer vmaps the connector over the tap axis; the pallas_call
    # must batch correctly (grid-prepend rule).
    N, B, Tq, Tkv, H, Dh = 3, 2, 16, 96, 2, 64
    DM = H * Dh
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 3)
    bf = lambda k, T: (jax.random.normal(k, (N, B, T, DM), jnp.float32)
                       .astype(jnp.bfloat16))
    q, k, v = bf(ks[0], Tq), bf(ks[1], Tkv), bf(ks[2], Tkv)
    got = jax.vmap(
        lambda a, b, c: packed_encoder_attention(a, b, c, H, 64, True)
    )(q, k, v)
    want = jax.vmap(
        lambda a, b, c: _xla_attention(a, b, c, H, 1.0 / np.sqrt(Dh))
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_unsupported_shape_falls_back():
    # Dh=48 does not divide the 128-lane tile -> must take the XLA path
    # (and still be correct).
    H, Dh = 4, 48
    DM = H * Dh
    assert not packed_supported(H, DM)
    q, k, v = _mk(jax.random.PRNGKey(1), 2, 40, DM)
    got = packed_encoder_attention(q, k, v, H, 64, True)
    want = _xla_attention(q, k, v, H, 1.0 / np.sqrt(Dh))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_vjp_fallback_matches_xla_grads():
    # The encoder is frozen in training, but jax.grad through the kernel
    # must still be correct (custom_vjp recomputes via the XLA path).
    B, T, H, Dh = 1, 64, 2, 64
    DM = H * Dh
    q, k, v = _mk(jax.random.PRNGKey(2), B, T, DM)
    scale = 1.0 / np.sqrt(Dh)

    def loss_pallas(q, k, v):
        return jnp.sum(packed_encoder_attention(
            q, k, v, H, 64, True).astype(jnp.float32))

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, H, scale)
                       .astype(jnp.float32))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=5e-2)
