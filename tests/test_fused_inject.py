"""In-kernel ORCA deep injection parity vs the XLA per-layer path.

The fused decode kernel can run the gated cross-attention
(models/orca.py gated_cross_attention_apply; reference
modeling_desta25.py:359-490) inside the single pallas_call, streaming
the int8 q/o/gate1 weights through the same ring as the tower
projections and the precomputed audio K/V through VMEM ring buffers.
These tests run the kernel through the TPU interpreter on CPU against
``llm_apply`` with an ``extra_layer_fn`` (the XLA injection path),
covering injection head dims != 128 (the Qwen3-4B flagship has
head_dim 80) and padded audio-token counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import LLMConfig
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.models.orca import (
    gated_cross_attention_apply,
    precompute_cross_kv,
)
from desta25_audio_tpu.ops.core import (
    init_layer_norm,
    init_linear,
    stack_layers,
    tree_cast,
)
from desta25_audio_tpu.ops.fused_decode import (
    fused_inject_supported,
    pad_audio_kv,
)
from desta25_audio_tpu.ops.quant import (
    quantize_llm_params,
    quantize_orca_cross_attns,
)


def _nano_cfg(D=512, H=4, Hkv=2):
    return LLMConfig(
        model_id="test/fused-inj-nano", vocab_size=512, hidden_size=D,
        intermediate_size=768, num_hidden_layers=2, num_attention_heads=H,
        num_key_value_heads=Hkv, head_dim=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, rope_scaling=None, tie_word_embeddings=False,
        qk_norm=False, bos_token_id=0, eos_token_id=1)


def _init_xattn(key, cfg, gate_init=0.25):
    """Mirror models/orca.init_orca_cross_attns, with a RANDOM gate2
    weight (the zero init would make the gate path untestable)."""
    d = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_hidden_layers):
        key, kq, kk, kv, ko, kg1, kg2 = jax.random.split(key, 7)
        layers.append({
            "q": init_linear(kq, d, d),
            "k": init_linear(kk, d, d),
            "v": init_linear(kv, d, d),
            "o": init_linear(ko, d, d),
            "gate1": init_linear(kg1, d, d // 4),
            "gate2": {"w": jax.random.normal(kg2, (d // 4, 1),
                                             jnp.float32) * 0.2,
                      "b": jnp.full((1,), gate_init, jnp.float32)},
            "ln": init_layer_norm(d),
        })
    return {"layers": stack_layers(layers)}


def _setup(cfg, B, S, Ta_real, seed=0):
    kp, kx, ka = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = jllm.init_llm(kp, cfg, dtype=jnp.float32)
    qparams = quantize_llm_params(tree_cast(params, jnp.bfloat16))
    xattn = quantize_orca_cross_attns(_init_xattn(ka, cfg))
    cache = jllm.init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    audio = (jax.random.normal(kx, (B, Ta_real, cfg.hidden_size),
                               jnp.float32) * 0.3).astype(jnp.bfloat16)
    inj_k, inj_v = precompute_cross_kv(xattn, audio)
    inj_k = inj_k.astype(jnp.bfloat16)
    inj_v = inj_v.astype(jnp.bfloat16)
    return qparams, xattn, cache, (inj_k, inj_v)


def _xla_inject_fn(xattn, inj_k, inj_v, heads, on):
    def fn(idx, h):
        lp = jax.tree.map(lambda x: x[idx], xattn["layers"])
        out = gated_cross_attention_apply(
            lp, h, None, heads, cached_kv=(inj_k[idx], inj_v[idx]))
        return jnp.where(on[:, None, None] > 0, out, h)
    return fn


@pytest.mark.parametrize("D,H,Hkv,Ta_real", [
    (512, 4, 2, 24),    # inj head dim 128, Ta already 8-aligned
    (512, 8, 4, 20),    # inj head dim 64 (non-lane-aligned) + Ta padding
    (1024, 4, 2, 20),   # inj head dim 256
])
def test_fused_inject_matches_xla(D, H, Hkv, Ta_real, rng, monkeypatch):
    B, T_ctx, S = 2, 8, 128
    cfg = _nano_cfg(D, H, Hkv)
    qparams, xattn, cache, (inj_k, inj_v) = _setup(cfg, B, S, Ta_real)
    on = jnp.asarray([1.0, 0.0], jnp.float32)  # row 1: injection off

    ids = jnp.asarray(rng.integers(2, 500, size=(B, T_ctx)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T_ctx].set(1)
    fn = _xla_inject_fn(xattn, inj_k, inj_v, H, on)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids, attention_mask=mask,
        cache=cache, cache_index=0, extra_layer_fn=fn)

    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    mask = mask.at[:, T_ctx].set(1)
    pos = jnp.full((B, 1), T_ctx, jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx, extra_layer_fn=fn)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    kp = pad_audio_kv(inj_k)
    vp = pad_audio_kv(inj_v)
    assert fused_inject_supported(xattn, cfg, kp.shape[2])
    spec = dict(params=xattn, k=kp, v=vp, ta_real=Ta_real, heads=H,
                on=on)
    got_logits, got_cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx, extra_layer_fn=fn,
        fused_injection=spec)

    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - got)) / scale < 3e-2
    for rc, gc in ((ref_cache.k, got_cache.k), (ref_cache.v, got_cache.v)):
        assert np.max(np.abs(np.asarray(rc, np.float32)
                             - np.asarray(gc, np.float32))) < 0.05


def test_fused_inject_off_rows_match_plain_decode(rng, monkeypatch):
    """Rows with on=0 must decode exactly like the injection-free fused
    kernel (the gate multiply is a no-op, not a perturbation)."""
    B, T_ctx, S, Ta = 2, 6, 128, 16
    cfg = _nano_cfg()
    qparams, xattn, cache, (inj_k, inj_v) = _setup(cfg, B, S, Ta, seed=3)

    ids = jnp.asarray(rng.integers(2, 500, size=(B, T_ctx)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T_ctx].set(1)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids, attention_mask=mask,
        cache=cache, cache_index=0)

    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    mask = mask.at[:, T_ctx].set(1)
    pos = jnp.full((B, 1), T_ctx, jnp.int32)
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")

    plain_logits, _, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx)

    on = jnp.zeros((B,), jnp.float32)
    spec = dict(params=xattn, k=inj_k, v=inj_v, ta_real=Ta, heads=4,
                on=on)
    inj_logits, _, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx,
        extra_layer_fn=lambda i, h: h, fused_injection=spec)

    np.testing.assert_array_equal(np.asarray(plain_logits),
                                  np.asarray(inj_logits))


def test_fused_inject_supported_gates():
    cfg = _nano_cfg()
    xattn = _init_xattn(jax.random.PRNGKey(0), cfg)
    # unquantized stack -> no
    assert not fused_inject_supported(xattn, cfg, 16)
    qx = quantize_orca_cross_attns(xattn)
    assert fused_inject_supported(qx, cfg, 16)
    # unpadded Ta -> no
    assert not fused_inject_supported(qx, cfg, 20)
    # VMEM budget -> no
    assert not fused_inject_supported(qx, cfg, 1 << 16)
    assert not fused_inject_supported(None, cfg, 16)


def test_engine_fused_injection_matches_xla_engine(tmp_path, monkeypatch):
    """Serving: an ORCA engine with int8 tower + int8 cross-attn stack
    routes ticks through the in-kernel injection (interpret mode here)
    and reproduces the pure-XLA engine's trajectories, including a
    text-only slot (on=0)."""
    from desta25_audio_tpu.audio.io import write_wav
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel
    from desta25_audio_tpu.serve.engine import ContinuousBatchingEngine

    t = np.arange(12000) / 16000.0
    wav = str(tmp_path / "w.wav")
    write_wav(wav, (0.5 * np.sin(2 * np.pi * 380 * t)).astype(np.float32))
    msgs_audio = [{"role": "user", "content": "Describe: <|AUDIO|>",
                   "audios": [{"audio": wav, "text": "tone"}]}]
    msgs_text = [{"role": "user", "content": "Say hi."}]

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano128",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="bfloat16")
    m = DeSTA25AudioModel(cfg, seed=1)
    m.params["llm"] = quantize_llm_params(m.params["llm"])
    m.params["orca_cross_attns"] = quantize_orca_cross_attns(
        m.params["orca_cross_attns"])

    def run():
        eng = ContinuousBatchingEngine(m, n_slots=2, max_ctx=128,
                                       max_new_tokens=4, ctx_bucket=128)
        ra = eng.submit(msgs_audio)
        rt = eng.submit(msgs_text)
        res = eng.run_until_done()
        return res[ra], res[rt]

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref = run()
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.ops.fused_decode import fused_inject_supported
    assert fused_inject_supported(m.params["orca_cross_attns"], m.llm_cfg,
                                  16)
    got = run()
    assert got == ref, (got, ref)


def test_fused_verify_with_injection_matches_xla(rng, monkeypatch):
    """Spec-verify (Kd>1) with in-kernel injection: all Kd draft
    positions cross-attend the audio K/V, matching the XLA T=Kd cached
    path with extra_layer_fn."""
    B, T_ctx, S, Kd, Ta = 2, 8, 128, 3, 16
    cfg = _nano_cfg(512, 8, 4)   # inj head dim 64
    qparams, xattn, cache, (inj_k, inj_v) = _setup(cfg, B, S, Ta, seed=5)
    on = jnp.asarray([1.0, 1.0], jnp.float32)

    ids = jnp.asarray(rng.integers(2, 500, size=(B, T_ctx)), jnp.int32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T_ctx].set(1)
    fn = _xla_inject_fn(xattn, inj_k, inj_v, 8, on)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids, attention_mask=mask,
        cache=cache, cache_index=0, extra_layer_fn=fn)

    toks = jnp.asarray(rng.integers(2, 500, size=(B, Kd)), jnp.int32)
    mask = mask.at[:, T_ctx:T_ctx + Kd].set(1)
    pos = T_ctx + jnp.arange(Kd)[None, :] + jnp.zeros((B, 1), jnp.int32)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, ref_cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=toks, attention_mask=mask, positions=pos,
        cache=cache, cache_index=T_ctx, extra_layer_fn=fn)

    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    from desta25_audio_tpu.models.llm import _head_logits, rms_norm
    from desta25_audio_tpu.ops.fused_decode import fused_verify_layers
    spec = dict(params=xattn, k=inj_k, v=inj_v, ta_real=Ta, heads=8,
                on=on)
    embeds = qparams["embed"][toks]
    hidden, got_cache = fused_verify_layers(
        qparams, cfg, embeds, mask, pos, cache, T_ctx, inject=spec)
    hidden = rms_norm(qparams["norm"], hidden, cfg.rms_norm_eps)
    got_logits = _head_logits(qparams, cfg, hidden)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(got_logits, np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2
    for rc, gc in ((ref_cache.k, got_cache.k), (ref_cache.v, got_cache.v)):
        assert np.max(np.abs(np.asarray(rc, np.float32)
                             - np.asarray(gc, np.float32))) < 0.05


def test_engine_orca_speculative_trajectory_invariant(tmp_path,
                                                      monkeypatch):
    """ORCA serving with speculative verify: greedy trajectories equal
    the plain (non-speculative) ORCA engine's."""
    from desta25_audio_tpu.audio.io import write_wav
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel
    from desta25_audio_tpu.serve.engine import ContinuousBatchingEngine

    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    t = np.arange(12000) / 16000.0
    wav = str(tmp_path / "w.wav")
    write_wav(wav, (0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32))
    msgs = [{"role": "user", "content": "Describe: <|AUDIO|>",
             "audios": [{"audio": wav, "text": "tone tone tone"}]}]

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano128",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="bfloat16")
    m = DeSTA25AudioModel(cfg, seed=2)
    m.params["llm"] = quantize_llm_params(m.params["llm"])
    m.params["orca_cross_attns"] = quantize_orca_cross_attns(
        m.params["orca_cross_attns"])

    def run(spec_k):
        eng = ContinuousBatchingEngine(m, n_slots=1, max_ctx=128,
                                       max_new_tokens=4, ctx_bucket=128,
                                       speculative_k=spec_k)
        if spec_k:
            assert eng.speculative_k == spec_k, "ORCA spec must be eligible"
        rid = eng.submit(msgs)
        return eng.run_until_done()[rid]

    assert run(3) == run(0)


def test_generate_orca_speculative_matches_plain(tmp_path, monkeypatch):
    """model.generate(speculative_k) with ORCA: eligible when the
    cross-attn stack is int8, greedy output equals the plain loop."""
    from desta25_audio_tpu.audio.io import write_wav
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel

    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    t = np.arange(12000) / 16000.0
    wav = str(tmp_path / "w.wav")
    write_wav(wav, (0.5 * np.sin(2 * np.pi * 640 * t)).astype(np.float32))
    msgs = [{"role": "user", "content": "Echo echo echo: <|AUDIO|>",
             "audios": [{"audio": wav, "text": "echo echo echo"}]}]

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano128",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="bfloat16")
    m = DeSTA25AudioModel(cfg, seed=4)
    m.params["llm"] = quantize_llm_params(m.params["llm"])
    m.params["orca_cross_attns"] = quantize_orca_cross_attns(
        m.params["orca_cross_attns"])

    plain = m.generate(msgs, max_new_tokens=5, do_sample=False).text[0]
    spec = m.generate(msgs, max_new_tokens=5, do_sample=False,
                      speculative_k=3).text[0]
    assert spec == plain, (spec, plain)


def test_from_pretrained_orca_xattn_quant(tmp_path, monkeypatch):
    """config.orca_xattn_quant="int8": from_pretrained loads the float
    trainable stack then quantizes it for serving (in-kernel injection
    eligible)."""
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models.desta import DeSTA25AudioModel
    from desta25_audio_tpu.ops.quant import is_quantized

    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano128",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_xattn_quant="int8",
        dtype="bfloat16")
    m = DeSTA25AudioModel(cfg, seed=1)
    # direct construction keeps float leaves (training-compatible)
    assert not is_quantized(m.params["orca_cross_attns"]["layers"]["q"])
    ck = str(tmp_path / "ck")
    m.save_pretrained(ck)

    m2 = DeSTA25AudioModel.from_pretrained(ck)
    assert is_quantized(m2.params["orca_cross_attns"]["layers"]["q"])
    from desta25_audio_tpu.ops.fused_decode import fused_inject_supported
    assert fused_inject_supported(m2.params["orca_cross_attns"],
                                  m2.llm_cfg, 16)
    out = m2.generate([{"role": "user", "content": "Hi."}],
                      max_new_tokens=3, do_sample=False).text[0]
    assert isinstance(out, str)


def test_fused_inject_per_row_cache_index(rng, monkeypatch):
    """Injected decode at per-row cache positions (continuous-batching
    shape: every slot sits at its own offset)."""
    B, S, Ta = 3, 128, 16
    cfg = _nano_cfg(512, 4, 2)
    qparams, xattn, cache, (inj_k, inj_v) = _setup(cfg, B, S, Ta, seed=9)
    on = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    ctx = np.array([5, 9, 14], np.int32)
    ids = jnp.asarray(rng.integers(2, 500, size=(B, 16)), jnp.int32)
    fn = _xla_inject_fn(xattn, inj_k, inj_v, 4, on)
    _, cache, _ = jllm.llm_apply(
        qparams, cfg, input_ids=ids,
        attention_mask=jnp.zeros((B, S), jnp.int32).at[:, :16].set(1),
        cache=cache, cache_index=0, extra_layer_fn=fn)
    ci = jnp.asarray(ctx)
    mask_np = np.zeros((B, S), np.int32)
    for b in range(B):
        mask_np[b, :ctx[b] + 1] = 1
    mask = jnp.asarray(mask_np)
    tok = jnp.asarray(rng.integers(2, 500, size=(B, 1)), jnp.int32)
    pos = ci[:, None]

    monkeypatch.setenv("DESTA_FUSED_DECODE", "0")
    ref_logits, _, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=ci, extra_layer_fn=fn)
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    spec = dict(params=xattn, k=inj_k, v=inj_v, ta_real=Ta, heads=4,
                on=on)
    got_logits, _, _ = jllm.llm_apply(
        qparams, cfg, input_ids=tok, attention_mask=mask, positions=pos,
        cache=cache, cache_index=ci, extra_layer_fn=fn,
        fused_injection=spec)
    ref = np.asarray(ref_logits[:, 0], np.float32)
    got = np.asarray(got_logits[:, 0], np.float32)
    assert np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6) < 3e-2
