"""Tensor-parallel inference: llm_generate (prefill + while-loop decode with
sharded KV cache) under a (2, 4) mesh must match the unsharded result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from desta25_audio_tpu.config import llm_config_for
from desta25_audio_tpu.generate.decode import llm_generate, whisper_transcribe
from desta25_audio_tpu.models import llm as jllm
from desta25_audio_tpu.parallel.mesh import make_mesh, use_mesh
from desta25_audio_tpu.parallel.sharding import (
    apply_sharding,
    llm_partition_specs,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_tp_generate_matches_unsharded(rng):
    cfg = llm_config_for("test/llama-dryrun")
    params = jllm.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = rng.integers(5, cfg.vocab_size - 5, size=(2, 8)).astype(np.int32)
    embeds = jllm.embed_tokens(params, jnp.asarray(ids))
    ref, _ = llm_generate(params, cfg, embeds, jnp.ones((2, 8), jnp.int32),
                          jax.random.PRNGKey(0), max_new_tokens=6,
                          do_sample=False, eos_ids=(), pad_id=0)
    ref = np.asarray(ref)

    mesh = make_mesh(n_data=2, n_model=4)
    with use_mesh(mesh):
        sharded = apply_sharding(params, llm_partition_specs(params))
        demb = jax.device_put(
            embeds, NamedSharding(mesh, P("data", None, None)))
        got, _ = llm_generate(
            sharded, cfg, demb,
            jax.device_put(jnp.ones((2, 8), jnp.int32),
                           NamedSharding(mesh, P("data", None))),
            jax.random.PRNGKey(0), max_new_tokens=6, do_sample=False,
            eos_ids=(), pad_id=0)
        got = np.asarray(got)
    np.testing.assert_array_equal(got, ref)


def test_asr_suppression():
    """suppress_from blanks the special block; greedy output stays in the
    text vocab (+ eos)."""
    from desta25_audio_tpu.config import whisper_config_for
    from desta25_audio_tpu.models import whisper as jw
    cfg = whisper_config_for("test/whisper-nano")
    params = jw.init_whisper(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 300, 80),
                            jnp.float32)
    ids, _lp = whisper_transcribe(
        params, cfg, mel, max_new_tokens=8,
        suppress_from=cfg.decoder_start_token_id)
    ids = np.asarray(ids)
    ok = (ids < cfg.decoder_start_token_id) | (ids == cfg.eos_token_id)
    assert ok.all(), ids


def test_asr_suppress_id_list_and_begin_suppress():
    """suppress_ids blanks the explicit non-speech list every step;
    begin_suppress_ids (+eos) is blanked for the first sampled token only
    (HF generation_config semantics, inherited by the reference at
    modeling_desta25.py:1586-1594)."""
    from desta25_audio_tpu.config import whisper_config_for
    from desta25_audio_tpu.models import whisper as jw
    cfg = whisper_config_for("test/whisper-nano")
    params = jw.init_whisper(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(4), (2, 300, 80), jnp.float32)

    base, _ = whisper_transcribe(params, cfg, mel, max_new_tokens=8)
    banned = tuple(int(t) for t in np.unique(np.asarray(base))
                   if t != cfg.eos_token_id)[:4]
    assert banned
    ids, _ = whisper_transcribe(params, cfg, mel, max_new_tokens=8,
                                suppress_ids=banned)
    assert not np.isin(np.asarray(ids), np.asarray(banned)).any()

    # begin suppression: ban the tokens that won step 0; they may still
    # appear later, but never first
    first = tuple(int(t) for t in np.unique(np.asarray(base)[:, 0]))
    ids2, _ = whisper_transcribe(params, cfg, mel, max_new_tokens=8,
                                 begin_suppress_ids=first)
    assert not np.isin(np.asarray(ids2)[:, 0], np.asarray(first)).any()

    # out-of-vocab ids (real whisper lists on nano vocabs) must be ignored,
    # not clamp-scattered onto the last real token
    ids3, _ = whisper_transcribe(params, cfg, mel, max_new_tokens=8,
                                 suppress_ids=(10 ** 6,))
    np.testing.assert_array_equal(np.asarray(ids3), np.asarray(base))

    from desta25_audio_tpu.generate.decode import (
        WHISPER_NON_SPEECH_TOKEN_IDS,
    )
    assert len(WHISPER_NON_SPEECH_TOKEN_IDS) > 70
    assert all(i < 50257 for i in WHISPER_NON_SPEECH_TOKEN_IDS)
