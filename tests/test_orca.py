"""ORCA hybrid connector + gated cross-attention tests, mirroring the
reference tests/test_modeling.py ORCA coverage (shapes, defaults,
no-audio passthrough, mixed precision) plus torch-MHA parity and an
end-to-end ORCA train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.models import orca

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture()
def orca_cfg():
    return DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="float32",
    )


def test_orca_config_defaults(orca_cfg):
    """Reference config defaults (modeling_desta25.py:645-659)."""
    c = orca_cfg
    assert c.is_orca
    assert c.audio_token_size == c.orca_global_num_tokens == 4
    assert c.orca_gate_init == 0.1
    assert c.orca_ortho_diversity_weight == 0.01
    assert c.orca_align_weight_local == 0.05
    assert c.orca_local_enabled and c.orca_deep_injection_enabled


def test_orca_connector_shapes(orca_cfg, rng):
    params = orca.init_orca_connector(jax.random.PRNGKey(0), orca_cfg)
    n_taps = len(orca_cfg.target_layer_ids)
    T = 40
    taps = jnp.asarray(rng.standard_normal(
        (n_taps, 2, T, orca_cfg.encoder_config.d_model)).astype(np.float32))
    g, l = orca.orca_connector_apply(params, taps, orca_cfg)
    d_llm = orca_cfg.llm_config.hidden_size
    assert g.shape == (2, 4, d_llm)
    assert l.shape == (2, T // 4, d_llm)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(l)).all()


def test_orca_local_disabled(orca_cfg, rng):
    import dataclasses
    cfg = dataclasses.replace(orca_cfg, orca_local_enabled=False)
    params = orca.init_orca_connector(jax.random.PRNGKey(0), cfg)
    assert "local_conv" not in params
    taps = jnp.asarray(rng.standard_normal(
        (4, 1, 20, cfg.encoder_config.d_model)).astype(np.float32))
    g, l = orca.orca_connector_apply(params, taps, cfg)
    assert l is None and g.shape[1] == 4


def test_gated_cross_attention_quant_and_cached_kv(orca_cfg, rng):
    """Inference transforms must stay close to the full-precision math:
    (a) precomputed cross-K/V (decode-loop-constant projections) is
    exact up to dtype; (b) weight-only int8 injection (ops.quant.
    quantize_orca_cross_attns) stays within quant tolerance."""
    from desta25_audio_tpu.ops.quant import quantize_orca_cross_attns
    cfg = orca_cfg
    params = orca.init_orca_cross_attns(jax.random.PRNGKey(3), cfg,
                                        dtype=jnp.float32)
    lp0 = jax.tree.map(lambda x: x[0], params["layers"])
    B, T, Ta = 2, 1, 12
    D = cfg.llm_config.hidden_size
    heads = cfg.llm_config.num_attention_heads
    h = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.2
    audio = jnp.asarray(rng.standard_normal((B, Ta, D)),
                        jnp.float32) * 0.2
    ref = np.asarray(orca.gated_cross_attention_apply(
        lp0, h, audio, heads), np.float32)

    # cached K/V path == recompute path
    ik, iv = orca.precompute_cross_kv(params, audio)
    got = np.asarray(orca.gated_cross_attention_apply(
        lp0, h, None, heads, cached_kv=(ik[0], iv[0])), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # int8 weights stay close (and flow through both paths)
    qparams = quantize_orca_cross_attns(params)
    qlp0 = jax.tree.map(lambda x: x[0], qparams["layers"])
    scale = np.abs(ref).max() + 1e-6
    got_q = np.asarray(orca.gated_cross_attention_apply(
        qlp0, h, audio, heads), np.float32)
    assert np.abs(got_q - ref).max() / scale < 0.05
    qik, qiv = orca.precompute_cross_kv(qparams, audio)
    got_qc = np.asarray(orca.gated_cross_attention_apply(
        qlp0, h, None, heads, cached_kv=(qik[0], qiv[0])), np.float32)
    assert np.abs(got_qc - ref).max() / scale < 0.05


def test_gated_cross_attention_torch_parity(orca_cfg, rng):
    """Our gated cross-attn must match an equivalent torch computation
    (MHA with packed in_proj + gate MLP + LN + fractional RoPE)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    d, H = 64, 4
    torch.manual_seed(0)
    mha = nn.MultiheadAttention(embed_dim=d, num_heads=H, batch_first=True)
    gate1 = nn.Linear(d, d // 4)
    gate2 = nn.Linear(d // 4, 1)
    nn.init.zeros_(gate2.weight)
    nn.init.constant_(gate2.bias, 0.1)
    ln = nn.LayerNorm(d)

    hidden = rng.standard_normal((2, 6, d)).astype(np.float32)
    audio = rng.standard_normal((2, 10, d)).astype(np.float32)

    # torch forward replicating ORCAGatedCrossAttention.forward math
    from desta25_audio_tpu.ops.rope import fractional_rope_apply
    roped = np.asarray(fractional_rope_apply(
        jnp.asarray(audio), 2.5, 10000.0))
    with torch.no_grad():
        th, ta = torch.tensor(hidden), torch.tensor(roped)
        out_t, _ = mha(th, ta, ta, need_weights=False)
        out_t = ln(out_t)
        gate = torch.sigmoid(gate2(F.gelu(gate1(th))))
        ref = (th + gate * out_t).numpy()

    # map torch weights -> our layer params
    ipw = mha.in_proj_weight.detach().numpy()
    ipb = mha.in_proj_bias.detach().numpy()
    p = {
        "q": {"w": jnp.asarray(ipw[:d].T), "b": jnp.asarray(ipb[:d])},
        "k": {"w": jnp.asarray(ipw[d:2 * d].T),
              "b": jnp.asarray(ipb[d:2 * d])},
        "v": {"w": jnp.asarray(ipw[2 * d:].T),
              "b": jnp.asarray(ipb[2 * d:])},
        "o": {"w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
              "b": jnp.asarray(mha.out_proj.bias.detach().numpy())},
        "gate1": {"w": jnp.asarray(gate1.weight.detach().numpy().T),
                  "b": jnp.asarray(gate1.bias.detach().numpy())},
        "gate2": {"w": jnp.asarray(gate2.weight.detach().numpy().T),
                  "b": jnp.asarray(gate2.bias.detach().numpy())},
        "ln": {"scale": jnp.asarray(ln.weight.detach().numpy()),
               "bias": jnp.asarray(ln.bias.detach().numpy())},
    }
    got = np.asarray(orca.gated_cross_attention_apply(
        p, jnp.asarray(hidden), jnp.asarray(roped), H))
    assert np.max(np.abs(got - ref)) < 2e-5


def test_orca_train_step_and_aux_losses(orca_cfg, rng):
    from desta25_audio_tpu import DeSTA25AudioModel
    from desta25_audio_tpu.train.optimizer import (
        OptimizerConfig,
        make_optimizer,
    )
    from desta25_audio_tpu.train.step import make_train_step

    model = DeSTA25AudioModel(orca_cfg, seed=0)
    assert "orca_cross_attns" in model.params
    assert set(model.trainable_keys()) == {"connector", "orca_cross_attns"}

    B, L, K = 2, 48, orca_cfg.orca_global_num_tokens
    ids = rng.integers(0, 500, size=(B, L)).astype(np.int32)
    labels = ids.copy()
    labels[:, :L // 2] = -100
    kind = np.zeros((B, L), np.int32)
    kind[:, 2:2 + K] = 1
    kind[:, 2 + K:2 + K + 3] = 2  # 3 transcription-embedding tokens
    aidx = np.zeros((B, L), np.int32)
    for b in range(B):
        aidx[b, 2:2 + K + 3] = b
    pos = np.zeros((B, L), np.int32)
    pos[:, 2:2 + K] = np.arange(K)
    pos[:, 2 + K:2 + K + 3] = np.arange(3)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "labels": jnp.asarray(labels),
        "audio": jnp.asarray(
            (0.1 * rng.standard_normal((B, 16000))).astype(np.float32)),
        "trans_ids": jnp.asarray(
            rng.integers(10, 200, size=(B, 8)).astype(np.int32)),
        "trans_mask": jnp.ones((B, 8), jnp.int32),
        "kind": jnp.asarray(kind),
        "aidx": jnp.asarray(aidx),
        "pos": jnp.asarray(pos),
    }
    optimizer = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1,
                                               total_steps=10))
    trainable, frozen = model.split_params()
    opt_state = optimizer.init(trainable)
    step = make_train_step(orca_cfg, optimizer)
    new_trainable, opt_state, metrics = step(trainable, frozen, opt_state,
                                             batch)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(m["loss"])
    assert "L_ortho_diversity" in m and m["L_ortho_diversity"] > 0
    assert "L_ortho_qformer_local" in m
    assert "L_align_layerwise" in m and m["L_align_layerwise"] >= 0
    assert m["loss"] >= m["lm_loss"]


def test_orca_generate_with_deep_injection(orca_cfg, tmp_path, rng):
    from desta25_audio_tpu import DeSTA25AudioModel
    from desta25_audio_tpu.audio.io import write_wav
    model = DeSTA25AudioModel(orca_cfg, seed=0)
    t = np.arange(16000) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig)
    out = model.generate(
        [{"role": "user", "content": "hi <|AUDIO|>",
          "audios": [{"audio": p, "text": "hello"}]}],
        max_new_tokens=4, do_sample=False)
    assert len(out.text) == 1
    assert len(out.generated_ids[0]) == 4


def test_orca_checkpoint_roundtrip(orca_cfg, tmp_path):
    from desta25_audio_tpu import DeSTA25AudioModel
    model = DeSTA25AudioModel(orca_cfg, seed=0)
    d = str(tmp_path / "ckpt")
    model.save_pretrained(d)
    loaded = DeSTA25AudioModel.from_pretrained(d)
    for key in ("connector", "orca_cross_attns"):
        a = jax.tree.leaves(model.params[key])
        b = jax.tree.leaves(loaded.params[key])
        for pa, pb in zip(a, b):
            np.testing.assert_allclose(np.asarray(pa, np.float32),
                                       np.asarray(pb, np.float32),
                                       atol=1e-6)


def test_orca_grads_finite_without_transcription_positions(orca_cfg):
    """Regression: rows with NO transcription positions pool to exactly
    zero, and l2-normalizing that zero vector used to NaN every
    connector gradient (jnp.linalg.norm's backward at 0 is 0/0; masking
    the loss value afterwards can't undo NaN * 0).  The prompt-only
    reference layout (modeling_desta25.py:459-476) hits this on every
    batch."""
    from desta25_audio_tpu.models import llm as jllm
    from desta25_audio_tpu.models import whisper as jw
    from desta25_audio_tpu.models.orca import (
        init_orca_connector,
        init_orca_cross_attns,
    )
    from desta25_audio_tpu.train.bench_utils import synth_train_batch
    from desta25_audio_tpu.train.step import _forward

    cfg = orca_cfg
    k = jax.random.PRNGKey(0)
    frozen = {
        "llm": jllm.init_llm(k, cfg.llm_config, dtype=jnp.bfloat16),
        "whisper": {"encoder": jw.init_whisper_encoder(
            k, cfg.encoder_config, dtype=jnp.bfloat16)},
    }
    trainable = {
        "connector": init_orca_connector(k, cfg, dtype=jnp.float32),
        "orca_cross_attns": init_orca_cross_attns(
            k, cfg, dtype=jnp.bfloat16),
    }
    batch = synth_train_batch(cfg, 2, 48)  # kind==2 nowhere
    assert not np.any(np.asarray(batch["kind"]) == 2)

    def lf(t):
        loss, _ = _forward({**frozen, **t}, batch, cfg, remat=True,
                           training=True)
        return loss

    g = jax.grad(lf)(trainable)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
