"""Whole-encoder-stack fused kernel parity vs the per-op path.

Interpret-mode (CPU) comparison of ops/enc_layers_fused.py against the
layer-by-layer composition in models/whisper.py (LN -> packed attention
-> o proj -> residual -> LN -> FFN), on nano shapes that still satisfy
the kernel's tiling (D % 128 == 0, 128 % dh == 0, F % 512 == 0).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.models.whisper import _enc_layer_apply, _init_enc_layer
from desta25_audio_tpu.ops.core import stack_layers, tree_cast
from desta25_audio_tpu.ops.enc_layers_fused import (
    fused_enc_supported,
    fused_encoder_layers,
)


class _Cfg:
    d_model = 256
    encoder_ffn_dim = 512
    encoder_attention_heads = 4   # dh = 64 (the large-v3 head dim)


def _setup(L, B, T, seed=0):
    cfg = _Cfg()
    key = jax.random.PRNGKey(seed)
    layers = []
    for _ in range(L):
        key, k = jax.random.split(key)
        layers.append(_init_enc_layer(k, cfg, jnp.float32))
    stacked = tree_cast(stack_layers(layers), jnp.bfloat16)
    key, kx = jax.random.split(key)
    x = (jax.random.normal(kx, (B, T, cfg.d_model), jnp.float32)
         * 0.5).astype(jnp.bfloat16)
    return cfg, stacked, x


def _ref_path(stacked, x, cfg, taps):
    """Per-op reference: same layer math, XLA attention/FFN."""
    h = x
    tap_list = []
    L = stacked["ln1"]["scale"].shape[0]
    for i in range(L):
        p = jax.tree.map(lambda a: a[i], stacked)
        h = _enc_layer_apply(p, h, cfg.encoder_attention_heads)
        if i in taps:
            tap_list.append(h)
    return h, (jnp.stack(tap_list) if tap_list else None)


@pytest.mark.parametrize("B,T,taps", [
    (2, 64, (0, 2)),     # aligned T, two taps
    (1, 52, (1,)),       # T % 8 != 0 -> row padding + kv mask
    (3, 64, ()),         # no taps
])
def test_fused_encoder_stack_matches_per_op(B, T, taps, monkeypatch):
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    # keep the per-op reference on XLA everywhere (no pallas interpret)
    monkeypatch.setenv("DESTA_FUSED_ENC_FFN", "0")
    L = 3
    cfg, stacked, x = _setup(L, B, T)
    assert fused_enc_supported(B, T, cfg.d_model, cfg.encoder_ffn_dim,
                               cfg.encoder_attention_heads, jnp.bfloat16)

    ref_h, ref_taps = _ref_path(stacked, x, cfg, set(taps))
    got_h, got_taps = fused_encoder_layers(stacked, x, cfg, taps)

    rh = np.asarray(ref_h, np.float32)
    gh = np.asarray(got_h, np.float32)
    scale = np.abs(rh).max() + 1e-6
    assert np.max(np.abs(rh - gh)) / scale < 2e-2, \
        np.max(np.abs(rh - gh)) / scale
    if taps:
        rt = np.asarray(ref_taps, np.float32)
        gt = np.asarray(got_taps, np.float32)
        assert np.max(np.abs(rt - gt)) / (np.abs(rt).max() + 1e-6) < 2e-2


def test_fused_enc_supported_gates(monkeypatch):
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    assert fused_enc_supported(8, 1500, 1280, 5120, 20, jnp.bfloat16)
    assert not fused_enc_supported(8, 1500, 1280, 5120, 20, jnp.float32)
    # hidden stream too big for VMEM residency
    assert not fused_enc_supported(64, 1500, 1280, 5120, 20, jnp.bfloat16)
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "0")
    assert not fused_enc_supported(8, 1500, 1280, 5120, 20, jnp.bfloat16)


def test_whisper_encoder_dispatch_fused_stack(monkeypatch):
    """whisper_encoder_apply routes through the fused stack when enabled
    and matches its own per-op output (taps + final LN)."""
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.config import WhisperConfig
    from desta25_audio_tpu.models.whisper import (
        init_whisper_encoder,
        whisper_encoder_apply,
    )
    # nano presets have d_model < 128; build a minimal tiling-compatible
    # encoder (d=128, dh=64 — the large-v3 head dim — F=512)
    cfg = WhisperConfig(
        model_id="test/fused-stack", num_mel_bins=80, d_model=128,
        encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=512,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=128,
        vocab_size=256, max_source_positions=64, max_target_positions=32,
        decoder_start_token_id=250, eos_token_id=251,
        no_timestamps_token_id=254, transcribe_token_id=253,
        first_language_token_id=252, num_language_tokens=1)
    assert fused_enc_supported(2, cfg.expected_mel_frames // 2,
                               cfg.d_model, cfg.encoder_ffn_dim,
                               cfg.encoder_attention_heads, jnp.bfloat16)
    params = tree_cast(
        init_whisper_encoder(jax.random.PRNGKey(0), cfg, jnp.float32),
        jnp.bfloat16)
    mel = (jax.random.normal(
        jax.random.PRNGKey(1),
        (2, cfg.expected_mel_frames, cfg.num_mel_bins), jnp.float32)
        * 0.3).astype(jnp.bfloat16)
    taps = (0, 1)
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "0")
    ref_f, ref_t = whisper_encoder_apply(params, mel, cfg, taps)
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    got_f, got_t = whisper_encoder_apply(params, mel, cfg, taps)
    for r, g in ((ref_f, got_f), (ref_t, got_t)):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        assert np.max(np.abs(r - g)) / (np.abs(r).max() + 1e-6) < 2e-2


def test_fused_stack_vjp_falls_back_to_xla(monkeypatch):
    """jax.grad through the fused stack recomputes via the XLA path
    (the encoder is frozen in training, but the kernel must stay
    differentiable — the convention of the other fused encoder ops)."""
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    cfg, stacked, x = _setup(2, 1, 16, seed=2)

    def loss(xx):
        h, taps = fused_encoder_layers(stacked, xx, cfg, (0,))
        return (jnp.sum(h.astype(jnp.float32) ** 2)
                + jnp.sum(taps.astype(jnp.float32)))

    g = jax.grad(loss)(x)
    gn = np.asarray(g, np.float32)
    assert np.isfinite(gn).all() and np.abs(gn).max() > 0

    # grad matches the XLA stack's own gradient
    from desta25_audio_tpu.ops.enc_layers_fused import _xla_stack

    def loss_ref(xx):
        h, taps = _xla_stack(stacked, xx, cfg.encoder_attention_heads,
                             (0,))
        return (jnp.sum(h.astype(jnp.float32) ** 2)
                + jnp.sum(taps.astype(jnp.float32)))

    gr = np.asarray(jax.grad(loss_ref)(x), np.float32)
    # the cotangent is built from the FUSED forward's h (bf16
    # accumulation-order differences vs XLA ~1%), so gradients match at
    # the forward tolerance, not bit-exactly
    assert np.max(np.abs(gr - gn)) / (np.abs(gr).max() + 1e-6) < 3e-2


def test_fused_stack_vjp_unsorted_taps(monkeypatch):
    """Backward tap cotangents pair by target_layer_ids ORDER, not by
    ascending layer (the kernel writes slot ti at l == taps[ti])."""
    monkeypatch.setenv("DESTA_FUSED_ENC_LAYERS", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    cfg, stacked, x = _setup(3, 1, 16, seed=4)
    taps = (2, 0)   # deliberately unsorted

    def loss(xx):
        _, tp = fused_encoder_layers(stacked, xx, cfg, taps)
        # weight the two taps very differently so a slot swap changes
        # the gradient
        return (jnp.sum(tp[0].astype(jnp.float32) ** 2) * 100.0
                + jnp.sum(tp[1].astype(jnp.float32) ** 2))

    g = np.asarray(jax.grad(loss)(x), np.float32)

    from desta25_audio_tpu.ops.enc_layers_fused import _xla_stack

    def loss_ref(xx):
        _, tp = _xla_stack(stacked, xx, cfg.encoder_attention_heads, taps)
        return (jnp.sum(tp[0].astype(jnp.float32) ** 2) * 100.0
                + jnp.sum(tp[1].astype(jnp.float32) ** 2))

    gr = np.asarray(jax.grad(loss_ref)(x), np.float32)
    assert np.max(np.abs(gr - g)) / (np.abs(gr).max() + 1e-6) < 3e-2
