"""Audio-feature cache: cached path bit-matches the fused path, hits
skip file decode/VAD/ASR/perception, stat-key invalidation, LRU
eviction, lazy ASR fill, ORCA local tokens."""

import numpy as np
import pytest

import jax.numpy as jnp

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav


def _tone(freq, n=12000):
    t = np.arange(n) / 16000.0
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    return DeSTA25AudioModel(cfg, seed=0)


@pytest.fixture()
def wav(tmp_path):
    p = str(tmp_path / "a.wav")
    write_wav(p, _tone(300))
    return p


def _msgs(path, text="a tone"):
    a = {"audio": path}
    if text is not None:
        a["text"] = text
    return [{"role": "user", "content": "Describe: <|AUDIO|>",
             "audios": [a]}]


def test_cached_path_matches_fused_path(model, wav):
    model.audio_cache = None
    e0, a0, _, p0 = model._prepare_generation_inputs([_msgs(wav)])
    model.enable_audio_cache(8)
    model.audio_cache.clear()
    e1, a1, _, p1 = model._prepare_generation_inputs([_msgs(wav)])  # miss
    e2, _, _, _ = model._prepare_generation_inputs([_msgs(wav)])    # hit
    assert jnp.array_equal(e0, e1)
    assert jnp.array_equal(e1, e2)
    assert np.array_equal(p0, p1)
    assert np.array_equal(np.asarray(a0), np.asarray(a1))
    assert model.audio_cache.misses == 1 and model.audio_cache.hits == 1
    model.audio_cache = None


def test_hit_skips_decode_vad_asr(model, wav, monkeypatch):
    """On a hit the file is never opened and ASR never runs."""
    model.enable_audio_cache(8)
    model.audio_cache.clear()
    model._prepare_generation_inputs([_msgs(wav, text=None)])  # miss + ASR

    from desta25_audio_tpu.audio.io import AudioSegment
    calls = {"decode": 0, "asr": 0}
    orig = AudioSegment.from_file

    def counting_from_file(*a, **k):
        calls["decode"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(AudioSegment, "from_file", counting_from_file)
    monkeypatch.setattr(
        model, "_asr",
        lambda *a, **k: calls.__setitem__("asr", calls["asr"] + 1) or [])
    e, _, _, _ = model._prepare_generation_inputs([_msgs(wav, text=None)])
    assert calls == {"decode": 0, "asr": 0}
    assert e.shape[0] == 1
    model.audio_cache = None


def test_stat_key_invalidation(model, tmp_path):
    """Rewriting the file (new mtime/size) is a miss and refreshes the
    features."""
    p = str(tmp_path / "x.wav")
    write_wav(p, _tone(300))
    model.enable_audio_cache(8)
    model.audio_cache.clear()
    e0, _, _, _ = model._prepare_generation_inputs([_msgs(p)])
    write_wav(p, _tone(900))  # different audio, same path
    e1, _, _, _ = model._prepare_generation_inputs([_msgs(p)])
    assert model.audio_cache.misses == 2
    assert not np.array_equal(np.asarray(e0), np.asarray(e1))
    model.audio_cache = None


def test_lru_eviction(model, tmp_path):
    model.enable_audio_cache(2)
    model.audio_cache.clear()
    paths = []
    for i in range(3):
        p = str(tmp_path / f"e{i}.wav")
        write_wav(p, _tone(200 + 100 * i))
        paths.append(p)
        model._prepare_generation_inputs([_msgs(p)])
    assert len(model.audio_cache) == 2
    # oldest entry evicted -> miss; newest still hits
    h0 = model.audio_cache.hits
    model._prepare_generation_inputs([_msgs(paths[2])])
    assert model.audio_cache.hits == h0 + 1
    m0 = model.audio_cache.misses
    model._prepare_generation_inputs([_msgs(paths[0])])
    assert model.audio_cache.misses == m0 + 1
    model.audio_cache = None


def test_orca_cache_parity(tmp_path):
    """ORCA deep-injection models cache local tokens too: inject kv
    bit-matches the uncached path."""
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="float32")
    m = DeSTA25AudioModel(cfg, seed=1)
    p = str(tmp_path / "o.wav")
    write_wav(p, _tone(440))
    e0, _, i0, _ = m._prepare_generation_inputs([_msgs(p)])
    assert i0 is not None
    m.enable_audio_cache(4)
    e1, _, i1, _ = m._prepare_generation_inputs([_msgs(p)])  # miss
    e2, _, i2, _ = m._prepare_generation_inputs([_msgs(p)])  # hit
    assert jnp.array_equal(e0, e1) and jnp.array_equal(e1, e2)
    assert jnp.array_equal(i0, i1) and jnp.array_equal(i1, i2)


def test_mixed_hit_miss_batch(model, tmp_path):
    """A batch mixing cached and new clips assembles features in the
    right order."""
    pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(pa, _tone(300))
    write_wav(pb, _tone(700))
    model.audio_cache = None
    e_ref, _, _, _ = model._prepare_generation_inputs(
        [_msgs(pa), _msgs(pb)])
    model.enable_audio_cache(8)
    model.audio_cache.clear()
    model._prepare_generation_inputs([_msgs(pa)])  # seed cache with a
    e_mix, _, _, _ = model._prepare_generation_inputs(
        [_msgs(pa), _msgs(pb)])  # a hits, b misses
    assert model.audio_cache.hits == 1 and model.audio_cache.misses == 2
    # perception at clip-batch 2 vs two clip-batch-1 runs: XLA reduction
    # order differs, so ~1e-6 float noise — not bit-exact (per-request
    # engine submits ARE bit-exact; test_cached_path_matches_fused_path)
    assert jnp.allclose(e_ref, e_mix, atol=1e-5)
    model.audio_cache = None
