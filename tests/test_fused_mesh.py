"""Single-launch tensor-parallel fused decode (ops/fused_decode_mesh.py):
the all-layer kernel under shard_map with IN-KERNEL remote-DMA all-reduce,
vs the single-device XLA decode path.  Interpret-mode kernels on the
virtual CPU mesh — no multi-chip TPU is reachable here, so correctness is
pinned by parity (plus one run under the interpreter's DMA race detector)
and perf is by construction (VERDICT r2 #3: multi-chip decode must keep
the fused fast path; the per-layer ops/fused_decode_tp.py pair loses the
cross-layer weight prefetch this kernel keeps)."""

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


def _nano_cfg(D=512, H=4, Hkv=2, I=1024):
    # I must stay 256-tileable PER SHARD (fused_decode._pick_tile needs a
    # 256-multiple divisor of the local K dim)
    return LLMConfig(
        model_id="test/fused-mesh-nano", vocab_size=512, hidden_size=D,
        intermediate_size=I, num_hidden_layers=2, num_attention_heads=H,
        num_key_value_heads=Hkv, head_dim=128, rms_norm_eps=1e-5,
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


def _assert_mesh_engages(sharded, cfg, B, S):
    from desta25_audio_tpu.ops.fused_decode_mesh import fused_mesh_supported
    cache_probe = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    assert fused_mesh_supported(sharded, cfg, cache_probe), \
        "single-launch mesh fused path must engage"


@pytest.mark.parametrize("n_data,n_model,B", [
    (1, 2, 2),    # pure TP
    (2, 2, 4),    # dp x tp: batch rows shard over "data"
])
def test_mesh_fused_decode_matches_xla(setup, monkeypatch, n_data, n_model,
                                       B):
    cfg, qp = setup
    n_dev = n_data * n_model
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} virtual devices")
    S, N_STEPS, CI0 = 128, 3, 16

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref, ref_cache = _decode_steps(qp, cfg, B, S, N_STEPS, CI0,
                                   np.random.default_rng(0))

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[:n_dev])
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        _assert_mesh_engages(sharded, cfg, B, S)
        got, got_cache = _decode_steps(sharded, cfg, B, S, N_STEPS, CI0,
                                       np.random.default_rng(0))

    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-2
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    # decode-step cache writes agree (layer 0, first decode slot)
    np.testing.assert_allclose(
        np.asarray(got_cache.k, np.float32)[0, :, CI0],
        np.asarray(ref_cache.k, np.float32)[0, :, CI0],
        rtol=0.05, atol=0.05)


def test_mesh_fused_race_detector(setup, monkeypatch):
    """One decode step under the interpreter's DMA race detector: the
    slot-alternating one-shot all-reduce must be race-free (a send
    landing in a peer's rbuf slot before the previous round's reduction
    read it would flag here)."""
    cfg, qp = setup
    B, S = 2, 128
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    monkeypatch.setenv("DESTA_FUSED_DETECT_RACES", "1")
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    rng = np.random.default_rng(7)
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        _assert_mesh_engages(sharded, cfg, B, S)
        got, _ = _decode_steps(sharded, cfg, B, S, 1, 16, rng)
    assert np.isfinite(got).all()


def test_mesh_fused_verify_matches_xla(setup, monkeypatch):
    """Speculative verify (Kd>1) under the mesh: one fused pass over Kd
    draft tokens per row matches the XLA T=Kd cached forward."""
    cfg, qp = setup
    B, S, Kd, CI0 = 2, 128, 3, 16
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 500, size=(B, CI0)), jnp.int32)
    toks = jnp.asarray(rng.integers(2, 500, size=(B, Kd)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :CI0 + Kd].set(1)
    pos = CI0 + jnp.arange(Kd)[None, :] + jnp.zeros((B, 1), jnp.int32)

    def prefill(p):
        cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
        _, cache, _ = jllm.llm_apply(
            p, cfg, input_ids=ids, attention_mask=mask, cache=cache,
            cache_index=0)
        return cache

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = jllm.llm_apply(
        qp, cfg, input_ids=toks, attention_mask=mask, positions=pos,
        cache=prefill(qp), cache_index=CI0)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.models.llm import _head_logits, rms_norm
    from desta25_audio_tpu.ops.fused_decode_mesh import (
        fused_mesh_supported,
        fused_verify_layers_mesh,
    )
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        cache = prefill(sharded)
        assert fused_mesh_supported(sharded, cfg, cache, kd=Kd)
        embeds = sharded["embed"][toks]
        hidden, got_cache = fused_verify_layers_mesh(
            sharded, cfg, embeds, mask, pos, cache,
            jnp.full((B,), CI0, jnp.int32))
        hidden = rms_norm(sharded["norm"], hidden, cfg.rms_norm_eps)
        got_logits = _head_logits(sharded, cfg, hidden)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6) < 5e-2
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    for rc, gc in ((ref_cache.k, got_cache.k), (ref_cache.v, got_cache.v)):
        assert np.max(np.abs(np.asarray(rc, np.float32)
                             - np.asarray(gc, np.float32))) < 0.05


def test_mesh_fused_injection_matches_xla(monkeypatch):
    """ORCA deep injection under TP: replicated injection weights run
    identically per shard after the all-reduce — must match the XLA
    extra_layer_fn path."""
    from test_fused_inject import _init_xattn, _setup, _xla_inject_fn

    B, T_ctx, S = 2, 8, 128
    cfg = _nano_cfg()
    rng = np.random.default_rng(11)
    qparams, xattn, cache, (inj_k, inj_v) = _setup(cfg, B, S, 16, seed=2)
    on = jnp.asarray([1.0, 0.0], jnp.float32)
    fn = _xla_inject_fn(xattn, inj_k, inj_v, cfg.num_attention_heads, on)

    ids = jnp.asarray(rng.integers(2, 500, size=(B, T_ctx)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T_ctx].set(1)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids, attention_mask=mask,
        cache=cache, cache_index=0, extra_layer_fn=fn)

    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    mask = mask.at[:, T_ctx].set(1)
    pos = jnp.full((B, 1), T_ctx, jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, _, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx, extra_layer_fn=fn)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    spec = dict(params=xattn, k=inj_k, v=inj_v, ta_real=16,
                heads=cfg.num_attention_heads, on=on)
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with use_mesh(mesh):
        sharded = apply_sharding(qparams, llm_partition_specs(qparams))
        from desta25_audio_tpu.ops.fused_decode_mesh import (
            fused_mesh_supported,
        )
        assert fused_mesh_supported(
            sharded, cfg, cache, inject_params=xattn,
            ta_padded=inj_k.shape[2])
        got_logits, _, _ = jllm.llm_apply(
            sharded, cfg, input_ids=tok, attention_mask=mask,
            positions=pos, cache=cache, cache_index=T_ctx,
            extra_layer_fn=fn, fused_injection=spec)

    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2


def test_mesh_fused_per_row_cache_indices(setup, monkeypatch):
    """Serving-shaped decode under TP: per-row cache positions match the
    XLA path's per-row writes (continuous batching on a mesh)."""
    cfg, qp = setup
    B, S = 2, 128
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")

    def one_step(params, ci_rows, fused):
        monkeypatch.setenv("DESTA_FUSED_DECODE", "1" if fused else "0")
        cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
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
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        _assert_mesh_engages(sharded, cfg, B, S)
        got, got_cache = one_step(sharded, ci_rows, fused=True)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-2
    rk = np.asarray(ref_cache.k, np.float32)
    gk = np.asarray(got_cache.k, np.float32)
    for b, ci in enumerate(ci_rows):
        np.testing.assert_allclose(gk[0, b, ci], rk[0, b, ci],
                                   rtol=0.05, atol=0.05)
        assert np.abs(gk[0, b, ci]).max() > 0


def test_mesh_spec_generate_trajectory(setup, monkeypatch):
    """Speculative greedy decode under TP (generate/speculative.py
    routed through pick_verify_fn -> fused_verify_layers_mesh) emits
    EXACTLY the plain single-device greedy trajectory."""
    from desta25_audio_tpu.generate.decode import llm_generate
    from desta25_audio_tpu.generate.speculative import (
        llm_generate_spec,
        spec_generate_supported,
    )

    cfg, qp = setup
    B, T, MAX_NEW, Kd = 2, 12, 8, 3
    rng = np.random.default_rng(21)
    ids = jnp.asarray(rng.integers(2, 500, size=(B, T)), jnp.int32)
    amask = jnp.ones((B, T), jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref, ref_n = llm_generate(
        qp, cfg, qp["embed"][ids], amask, jax.random.PRNGKey(0),
        max_new_tokens=MAX_NEW, do_sample=False, eos_ids=(), pad_id=0)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    with use_mesh(mesh):
        sharded = apply_sharding(qp, llm_partition_specs(qp))
        S = -(-(T + MAX_NEW + Kd) // 128) * 128
        assert spec_generate_supported(sharded, cfg, B, S, Kd)
        got, got_n = llm_generate_spec(
            sharded, cfg, sharded["embed"][ids], amask,
            max_new_tokens=MAX_NEW, eos_ids=(), pad_id=0,
            speculative_k=Kd, prompt_ids=ids,
            prompt_lens=jnp.full((B,), T, jnp.int32))

    assert np.array_equal(np.asarray(ref_n), np.asarray(got_n))
    r, g = np.asarray(ref), np.asarray(got)
    for b in range(B):
        n = int(np.asarray(ref_n)[b])
        assert r[b, :n].tolist() == g[b, :n].tolist(), b


def test_mesh_supported_gates(setup):
    """Predicate must refuse: no mesh, tp=1, non-divisible local dims."""
    cfg, qp = setup
    from desta25_audio_tpu.ops.fused_decode_mesh import fused_mesh_supported
    cache = jllm.init_kv_cache(cfg, 2, 128, dtype=jnp.bfloat16)
    assert not fused_mesh_supported(qp, cfg, cache)  # no mesh active
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    with use_mesh(mesh):
        assert not fused_mesh_supported(qp, cfg, cache)  # model axis = 1
    # Hkv=2 cannot split 4 ways
    if len(jax.devices()) >= 4:
        mesh4 = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
        with use_mesh(mesh4):
            assert not fused_mesh_supported(qp, cfg, cache)
