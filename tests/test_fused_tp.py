"""Tensor-parallel fused decode (ops/fused_decode_tp.py): parity with the
single-device XLA decode path on a 2-way "model" mesh (interpret-mode
kernels on CPU — VERDICT r2 #3: multi-chip decode must keep a fused fast
path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import LLMConfig
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.ops.core import tree_cast
from desta25_audio_tpu.ops.quant import quantize_llm_params
from desta25_audio_tpu.parallel.mesh import make_mesh, use_mesh
from desta25_audio_tpu.parallel.sharding import (
    apply_sharding,
    llm_partition_specs,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 virtual devices")


def _nano_cfg():
    return LLMConfig(
        model_id="test/fused-nano", vocab_size=512, hidden_size=512,
        intermediate_size=768, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, rope_scaling=None, tie_word_embeddings=False,
        qk_norm=False, bos_token_id=0, eos_token_id=1)


@pytest.fixture(scope="module")
def setup():
    cfg = _nano_cfg()
    params = jllm.init_llm(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    qp = quantize_llm_params(tree_cast(params, jnp.bfloat16))
    return cfg, qp


def _decode_steps(qp, cfg, B, S, n_steps, ci0, rng):
    """Prefill ci0 tokens then n_steps cached decode steps; returns
    (stacked step logits [n, B, V], final cache)."""
    ids = jnp.asarray(rng.integers(2, 500, size=(B, ci0)), jnp.int32)
    cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    lg, cache, _ = jllm.llm_apply(
        qp, cfg, input_ids=ids, attention_mask=mask, cache=cache,
        cache_index=0)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    outs = []
    for t in range(n_steps):
        lg, cache, _ = jllm.llm_apply(
            qp, cfg, input_ids=tok[:, None], attention_mask=mask,
            positions=jnp.full((B, 1), ci0 + t, jnp.int32),
            cache=cache, cache_index=ci0 + t)
        outs.append(np.asarray(lg[:, -1], np.float32))
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    return np.stack(outs), cache


def test_tp_fused_decode_matches_xla(setup, monkeypatch):
    cfg, qp = setup
    B, S, N_STEPS, CI0 = 2, 128, 3, 16

    # reference: single-device XLA path (fused kernel disabled)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref, _ = _decode_steps(qp, cfg, B, S, N_STEPS, CI0,
                           np.random.default_rng(0))

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with use_mesh(mesh):
        from desta25_audio_tpu.ops.fused_decode_tp import fused_tp_supported
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        cache_probe = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
        assert fused_tp_supported(sharded, cfg, cache_probe), \
            "TP fused path must engage on the model mesh"
        got, _ = _decode_steps(sharded, cfg, B, S, N_STEPS, CI0,
                               np.random.default_rng(0))

    scale = np.abs(ref).max() + 1e-6
    err = np.abs(got - ref).max() / scale
    assert err < 5e-2, err
    # greedy trajectory identical
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_perlayer_fused_decode_with_injection_matches_xla(
        setup, monkeypatch):
    """Single-device per-layer fused decode with an extra_layer_fn
    (ORCA's deep-injection shape) must match the XLA decode path running
    the same injection — pins the new fast path for injected decode."""
    cfg, qp = setup
    B, S, N_STEPS, CI0 = 2, 128, 3, 16
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    monkeypatch.setenv("DESTA_FUSED_PERLAYER", "1")  # opt-in path

    def inject(idx, h):
        # layer-dependent nonlinear stand-in for gated cross-attention
        return h + (0.05 * (1.0 + idx.astype(jnp.float32))
                    * jnp.tanh(h.astype(jnp.float32))).astype(h.dtype)

    def decode(fused):
        monkeypatch.setenv("DESTA_FUSED_DECODE", "1" if fused else "0")
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(2, 500, size=(B, CI0)), jnp.int32)
        cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.int32)
        lg, cache, _ = jllm.llm_apply(
            qp, cfg, input_ids=ids, attention_mask=mask, cache=cache,
            cache_index=0, extra_layer_fn=inject)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        outs = []
        for t in range(N_STEPS):
            lg, cache, _ = jllm.llm_apply(
                qp, cfg, input_ids=tok[:, None], attention_mask=mask,
                positions=jnp.full((B, 1), CI0 + t, jnp.int32),
                cache=cache, cache_index=CI0 + t,
                extra_layer_fn=inject)
            outs.append(np.asarray(lg[:, -1], np.float32))
            tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        return np.stack(outs), cache

    from desta25_audio_tpu.ops.fused_decode_tp import (
        fused_perlayer_supported,
    )
    cache_probe = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    assert fused_perlayer_supported(qp, cfg, cache_probe), \
        "per-layer fused path must engage single-device"

    ref, ref_cache = decode(fused=False)
    got, got_cache = decode(fused=True)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-2, \
        np.abs(got - ref).max() / scale
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    # decode-step cache writes agree (layer 0, step CI0)
    np.testing.assert_allclose(
        np.asarray(got_cache.k)[0, :, CI0],
        np.asarray(ref_cache.k)[0, :, CI0], rtol=0.05, atol=0.05)

    # the driver also runs with extra_layer_fn=None (identity injection
    # slot) — must agree with the single-launch-eligible XLA reference
    from desta25_audio_tpu.ops.fused_decode_tp import (
        fused_decode_layers_perlayer,
    )
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)),
                     jnp.bfloat16) * 0.05
    cache1 = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    pos = jnp.full((B, 1), 5, jnp.int32)
    h_pl, _ = fused_decode_layers_perlayer(
        qp, cfg, x1, mask.at[:, 5:].set(0).at[:, :5].set(1), pos,
        cache1, 5)
    assert np.isfinite(np.asarray(h_pl, np.float32)).all()


def test_tp_fused_per_row_cache_indices(setup, rng, monkeypatch):
    """Serving-shaped decode: per-row cache positions through the TP
    kernels match the XLA path's per-row writes."""
    cfg, qp = setup
    B, S = 2, 128
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")

    def one_step(params, ci_rows, fused):
        monkeypatch.setenv("DESTA_FUSED_DECODE", "1" if fused else "0")
        cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
        # distinct warm rows per slot
        warm = jnp.asarray(
            np.random.default_rng(5).integers(2, 500, size=(B, 32)),
            jnp.int32)
        mask = jnp.ones((B, S), jnp.int32)
        _, cache, _ = jllm.llm_apply(params, cfg, input_ids=warm,
                                     attention_mask=mask, cache=cache,
                                     cache_index=0)
        tok = jnp.asarray([7, 11], jnp.int32)
        lg, cache, _ = jllm.llm_apply(
            params, cfg, input_ids=tok[:, None], attention_mask=mask,
            positions=jnp.asarray(ci_rows)[:, None],
            cache=cache, cache_index=jnp.asarray(ci_rows, jnp.int32))
        return np.asarray(lg[:, -1], np.float32), cache

    ci_rows = [33, 57]
    ref, ref_cache = one_step(qp, ci_rows, fused=False)
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        got, got_cache = one_step(sharded, ci_rows, fused=True)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-2
    # the written cache rows must agree (layer 0, each row's own index)
    rk = np.asarray(ref_cache.k)
    gk = np.asarray(got_cache.k)
    for b, ci in enumerate(ci_rows):
        np.testing.assert_allclose(gk[0, b, ci], rk[0, b, ci],
                                   rtol=0.05, atol=0.05)
        assert np.abs(gk[0, b, ci]).max() > 0
