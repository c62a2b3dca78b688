"""Architecture parity: our JAX Whisper vs a randomly-initialized HF torch
WhisperForConditionalGeneration (hub-free).  Validates the encoder forward
with layer taps and the decoder forward, per SURVEY §7 step 3
(<1e-3 max divergence target; f32-vs-f32 here so we assert much tighter).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from desta25_audio_tpu.config import whisper_config_for
from desta25_audio_tpu.ckpt.hf_convert import (
    convert_from_torch_module,
    convert_whisper_state,
)
from desta25_audio_tpu.models import whisper as jw

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

# Parity tests compare f32-vs-f32: pin full matmul precision so XLA's
# default bf16 passes don't dominate the error budget.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def tiny():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFWhisperConfig(
        vocab_size=256, num_mel_bins=80, d_model=64,
        encoder_layers=4, encoder_attention_heads=2, encoder_ffn_dim=128,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=128,
        max_source_positions=150, max_target_positions=64,
        pad_token_id=0, bos_token_id=0, eos_token_id=251,
        decoder_start_token_id=250, suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = whisper_config_for("test/whisper-nano")
    params = convert_from_torch_module(model, convert_whisper_state, cfg)
    return model, cfg, params


def test_encoder_parity_and_taps(tiny, rng):
    model, cfg, params = tiny
    mel = rng.standard_normal((2, 80, 300)).astype(np.float32) * 0.5

    with torch.no_grad():
        enc = model.model.encoder(
            torch.tensor(mel), output_hidden_states=True)
    ref_final = enc.last_hidden_state.numpy()
    # HF hidden_states[i] is the *input* to layer i (so output of layer
    # i-1); the final entry is post-final-LN.  Our taps are raw layer
    # outputs (what the reference's inline connector consumes,
    # modeling_desta25.py:575-598), so the last tap is compared through the
    # final LayerNorm.
    ref_layers = [h.numpy() for h in enc.hidden_states[1:]]

    mel_nwc = jnp.asarray(np.swapaxes(mel, 1, 2))
    final, taps = jw.whisper_encoder_apply(
        params["encoder"], mel_nwc, cfg, target_layer_ids=(0, 1, 2, 3))
    final = np.asarray(final)

    assert np.max(np.abs(final - ref_final)) < 2e-4
    for j in range(3):
        assert np.max(np.abs(np.asarray(taps[j]) - ref_layers[j])) < 2e-4, \
            f"layer {j}"
    from desta25_audio_tpu.ops.core import layer_norm
    last_ln = np.asarray(layer_norm(params["encoder"]["ln_post"], taps[3]))
    assert np.max(np.abs(last_ln - ref_final)) < 2e-4


def test_encoder_rejects_wrong_length(tiny):
    _, cfg, params = tiny
    with pytest.raises(ValueError, match="mel length"):
        jw.whisper_encoder_apply(params["encoder"],
                                 jnp.zeros((1, 100, 80)), cfg)


def test_decoder_parity(tiny, rng):
    model, cfg, params = tiny
    mel = rng.standard_normal((1, 80, 300)).astype(np.float32) * 0.5
    tok = rng.integers(0, 250, size=(1, 7)).astype(np.int64)

    with torch.no_grad():
        out = model(input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(tok))
    ref_logits = out.logits.numpy()

    mel_nwc = jnp.asarray(np.swapaxes(mel, 1, 2))
    enc_out, _ = jw.whisper_encoder_apply(params["encoder"], mel_nwc, cfg)
    ckv = jw.whisper_cross_kv(params["decoder"], enc_out, cfg)
    logits, _ = jw.whisper_decoder_apply(
        params["decoder"], jnp.asarray(tok.astype(np.int32)), ckv, cfg)
    got = np.asarray(logits)
    assert got.shape == ref_logits.shape
    assert np.max(np.abs(got - ref_logits)) < 5e-4


def test_decoder_cache_matches_full(tiny, rng):
    """KV-cached incremental decode must equal the full forward."""
    model, cfg, params = tiny
    mel = rng.standard_normal((1, 80, 300)).astype(np.float32) * 0.5
    tok = rng.integers(0, 250, size=(1, 6)).astype(np.int32)

    mel_nwc = jnp.asarray(np.swapaxes(mel, 1, 2))
    enc_out, _ = jw.whisper_encoder_apply(params["encoder"], mel_nwc, cfg)
    ckv = jw.whisper_cross_kv(params["decoder"], enc_out, cfg)

    full_logits, _ = jw.whisper_decoder_apply(
        params["decoder"], jnp.asarray(tok), ckv, cfg)

    cache = jw.init_decoder_cache(cfg, 1, 16, dtype=jnp.float32)
    # prefill first 4 tokens, then decode 2 one at a time
    logits_p, cache = jw.whisper_decoder_apply(
        params["decoder"], jnp.asarray(tok[:, :4]), ckv, cfg,
        pos_offset=0, cache=cache, cache_index=0)
    step_logits = [logits_p[:, -1]]
    for t in range(4, 6):
        lg, cache = jw.whisper_decoder_apply(
            params["decoder"], jnp.asarray(tok[:, t:t + 1]), ckv, cfg,
            pos_offset=t, cache=cache, cache_index=t)
        step_logits.append(lg[:, -1])
    inc = np.stack([np.asarray(x) for x in step_logits], axis=1)
    ref = np.asarray(full_logits[:, 3:6])
    assert np.max(np.abs(inc - ref)) < 1e-4


def test_conv1d_bf16_backward():
    """bf16-param conv1d must be differentiable (grad-wrt-mel / unfrozen
    whisper).  lax's conv transpose requires equal operand dtypes, which the
    f32-accumulated forward used to violate — fixed via custom_vjp in
    ops/core.py (reference trains whisper frozen, but ad-hoc grads shouldn't
    crash)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from desta25_audio_tpu.ops import core

    k = jax.random.PRNGKey(0)
    pf = core.init_conv1d(k, 4, 8, 3, dtype=jnp.float32)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), pf)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4), jnp.float32)

    def loss(p, x):
        return core.conv1d(p, x, stride=2, padding=1).astype(jnp.float32).sum()

    gf_x = jax.grad(loss, argnums=1)(pf, x)
    gb_x = jax.grad(loss, argnums=1)(pb, x.astype(jnp.bfloat16))
    assert gb_x.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(gb_x, dtype=np.float32),
        rtol=0, atol=2e-2 * float(np.max(np.abs(gf_x))))

    gb_p = jax.grad(loss, argnums=0)(pb, x.astype(jnp.bfloat16))
    assert gb_p["w"].dtype == jnp.bfloat16 and gb_p["b"].dtype == jnp.bfloat16
