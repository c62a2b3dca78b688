"""Audio I/O + utility coverage (reference desta/utils/audio.py surface)."""

import os

import numpy as np
import pytest

from desta25_audio_tpu.audio.io import AudioSegment, read_wav, write_wav
from desta25_audio_tpu.audio.vad import energy_vad, has_speech
from desta25_audio_tpu.utils.misc import get_unique_filepath, resolve_filepath


@pytest.fixture()
def tone(tmp_path):
    t = np.arange(16000) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, sig)
    return p, sig


def test_wav_roundtrip(tone):
    p, sig = tone
    x, sr = read_wav(p)
    assert sr == 16000 and x.shape == (16000, 1)
    assert np.max(np.abs(x[:, 0] - sig)) < 1e-3  # 16-bit quantization


def test_stereo_average(tmp_path):
    sig = np.stack([np.ones(100, np.float32) * 0.5,
                    -np.ones(100, np.float32) * 0.5], axis=1)
    p = str(tmp_path / "st.wav")
    write_wav(p, sig)
    seg = AudioSegment.from_file(p, channel_selector="average")
    assert np.max(np.abs(seg.samples)) < 1e-3
    seg0 = AudioSegment.from_file(p, channel_selector=0)
    assert abs(seg0.samples.mean() - 0.5) < 1e-2
    with pytest.raises(ValueError, match="out of range"):
        AudioSegment.from_file(p, channel_selector=7)


def test_resample(tmp_path):
    t = np.arange(44100) / 44100.0
    sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = str(tmp_path / "cd.wav")
    write_wav(p, sig, sr=44100)
    seg = AudioSegment.from_file(p, target_sr=16000)
    assert seg.sample_rate == 16000
    assert abs(seg.num_samples - 16000) <= 2
    # tone frequency preserved: count zero crossings ~ 2*440
    zc = np.sum(np.diff(np.signbit(seg.samples)))
    assert 850 <= zc <= 910


def test_normalize_and_gain(tone):
    p, _ = tone
    seg = AudioSegment.from_file(p).normalize_db(-20.0)
    assert abs(seg.rms_db() - (-20.0)) < 0.1


def test_trim_silence():
    sig = np.concatenate([np.zeros(4000, np.float32),
                          0.5 * np.ones(8000, np.float32),
                          np.zeros(4000, np.float32)])
    seg = AudioSegment(sig, 16000).trim_silence()
    assert 7500 <= seg.num_samples <= 9000


def test_from_file_list_and_segment(tmp_path, tone):
    p, _ = tone
    stacked = AudioSegment.from_file_list([p, p])
    assert stacked.samples.shape == (16000, 2)
    seg = AudioSegment.segment_from_file(p, n_segments=4000,
                                         rng=np.random.default_rng(0))
    assert seg.num_samples == 4000
    short = AudioSegment.segment_from_file(p, n_segments=32000)
    assert short.num_samples == 32000  # zero-padded


def test_vad_speech_vs_silence(rng):
    t = np.arange(16000) / 16000.0
    speechy = (0.5 * np.sin(2 * np.pi * 300 * t)
               * (np.sin(2 * np.pi * 2 * t) > 0)).astype(np.float32)
    silence = (1e-4 * rng.standard_normal(16000)).astype(np.float32)
    assert has_speech(speechy)
    assert not has_speech(silence)
    segs = energy_vad(speechy)
    assert len(segs) >= 1
    assert all(e > s for s, e in segs)


def test_unique_filepath(tmp_path):
    p = str(tmp_path / "r.json")
    assert get_unique_filepath(p) == p
    open(p, "w").write("x")
    assert get_unique_filepath(p) == str(tmp_path / "r-1.json")


def test_resolve_filepath(tmp_path):
    p = str(tmp_path / "f.txt")
    open(p, "w").write("x")
    assert resolve_filepath(p) == p
    with pytest.raises(FileNotFoundError):
        resolve_filepath(str(tmp_path / "missing.txt"))

def test_resolve_filepath_url_localhost(tmp_path, tone):
    """URL manifests/audio download to the cache (lulutils resolve_filepath
    behavior, reference simple_dataset.py:20,365) — exercised against a
    localhost HTTP server, no egress needed."""
    import http.server
    import json
    import threading

    _, sig = tone
    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    write_wav(str(serve_dir / "clip.wav"), sig, 16000)
    (serve_dir / "manifest.jsonl").write_text(
        json.dumps({"audio_filepath": "clip.wav", "text": "hi"}) + "\n")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_dir), **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        cache = str(tmp_path / "cache")
        url = f"http://127.0.0.1:{port}/manifest.jsonl"
        local = resolve_filepath(url, cache_dir=cache)
        assert os.path.exists(local)
        assert json.loads(open(local).read())["text"] == "hi"
        # second resolve hits the cache (no re-download)
        assert resolve_filepath(url, cache_dir=cache) == local

        from desta25_audio_tpu.data.dataset import _resolve_audio_filepath
        wav_url = f"http://127.0.0.1:{port}/clip.wav"
        wav_local = _resolve_audio_filepath(wav_url)
        seg = AudioSegment.from_file(wav_local)
        assert seg.num_samples == len(sig)
    finally:
        httpd.shutdown()
