"""Golden mel fixtures on the reference's real audio clips.

``tests/fixtures/golden_mel.npz`` holds HF-WhisperFeatureExtractor mel
sketches for every clip under ``/root/reference/assets/audios`` (committed;
regenerate with ``scripts/make_mel_fixtures.py``).  This test runs our full
audio frontend — WAV decode, channel handling, resample, pad_or_trim,
log_mel — on the same clips and asserts the committed numbers, catching
drift anywhere in the pipeline on real data (not just synthetic tones)."""

import os

import numpy as np
import pytest

AUDIO_DIR = os.environ.get("DESTA_REFERENCE_AUDIO",
                           "/root/reference/assets/audios")
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_mel.npz")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AUDIO_DIR),
    reason="reference audio assets not present on this machine")


def _sketch(x: np.ndarray, dim: int = 512, seed: int = 0) -> np.ndarray:
    flat = np.asarray(x, np.float32).reshape(-1)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, flat.size, size=(dim, 64))
    sgn = rng.choice([-1.0, 1.0], size=(dim, 64)).astype(np.float32)
    return (flat[idx] * sgn).sum(axis=1)


def test_real_clip_mels_match_committed_fixtures():
    from desta25_audio_tpu.audio.io import AudioSegment
    from desta25_audio_tpu.audio.mel import log_mel_np_precise

    ref = np.load(FIXTURE)
    clips = sorted({k.split("/")[0] for k in ref.files})
    assert len(clips) == 9
    checked = 0
    for key in clips:
        name = key[::-1].replace("_", ".", 1)[::-1]  # last _ -> .
        path = os.path.join(AUDIO_DIR, name)
        if not os.path.exists(path):
            continue
        seg = AudioSegment.from_file(path, target_sr=16000)
        assert seg.num_samples == int(ref[f"{key}/n_samples"]), name
        audio = np.asarray(seg.samples, np.float32)
        n = 30 * 16000
        audio = (audio[:n] if audio.size >= n
                 else np.pad(audio, (0, n - audio.size)))
        mel = log_mel_np_precise(audio[None], 128)[0]  # HF layout [128, 3000]
        got = _sketch(mel)
        want = ref[f"{key}/sketch"]
        scale = float(np.max(np.abs(want))) + 1e-6
        assert np.max(np.abs(got - want)) / scale < 1e-3, name
        assert abs(float(mel.mean()) - float(ref[f"{key}/mean"])) < 1e-4, name
        assert abs(float(mel.std()) - float(ref[f"{key}/std"])) < 1e-4, name
        checked += 1
    assert checked == 9
