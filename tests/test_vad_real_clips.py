"""VAD behavior on the reference's real audio clips (VERDICT r2 #7).

Real silero weights are unreachable in this environment (no network, no
onnxruntime, no cached export), so the default VAD is the energy+spectral
heuristic.  Its failure economics are asymmetric: a false "speech" label
costs one wasted ASR pass (the transcript of a cat clip is junk the LLM
ignores), while a false "non-speech" label silently replaces a real
transcription with " " (reference semantics modeling_desta25.py:1567-1568)
— data corruption.  These tests pin the recall-biased behavior on the
reference repo's 9 real clips: every known-speech clip MUST be detected.
"""

import glob
import os

import numpy as np
import pytest

from desta25_audio_tpu.audio.vad import energy_vad, has_speech

_REF_AUDIO = "/root/reference/assets/audios"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_AUDIO),
    reason="reference audio assets not present")


def _load(path):
    from desta25_audio_tpu.audio.io import AudioSegment
    return AudioSegment.from_file(path, target_sr=16000,
                                  channel_selector="average").samples


# Clips with speech content by provenance: IEMOCAP-style emotion clip and
# the AccentDB accent clip are pure speech; the MMAU uuid clips contain
# speech and/or prominent foreground audio events.
_SPEECH_CLIPS = [
    "1003_IWL_ANG_XX.wav",
    "AccentClassification_AccentdbExtended_0193_british_s01_176.wav",
]


def test_real_speech_clips_detected():
    for name in _SPEECH_CLIPS:
        x = _load(os.path.join(_REF_AUDIO, name))
        assert has_speech(x), f"speech clip {name} labeled non-speech"
        segs = energy_vad(x)
        dur = sum(e - s for s, e in segs) / 16000.0
        assert dur > 0.5, (name, dur)


def test_all_reference_clips_get_asr_not_blank():
    """Recall bias: every real reference clip (including cat/dog sounds)
    routes to ASR rather than the silent ' ' transcription.  A wasted
    ASR pass on an animal clip is benign; a blanked speech transcript is
    not."""
    for p in sorted(glob.glob(os.path.join(_REF_AUDIO, "*.wav"))):
        assert has_speech(_load(p)), p


def test_quiet_speech_still_detected():
    """Speech 30 dB down (far-field recording) must not be blanked."""
    rng = np.random.default_rng(0)
    t = np.arange(3 * 16000) / 16000.0
    # crude voiced-speech proxy: 120 Hz glottal pulse train with formant
    # bands + amplitude modulation at syllable rate
    f0 = 120.0
    sig = np.zeros_like(t)
    for h in range(1, 25):
        sig += np.sin(2 * np.pi * f0 * h * t) / h
    sig *= (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)) ** 2
    sig += 0.001 * rng.standard_normal(len(t))
    sig = sig / np.abs(sig).max()
    assert has_speech((0.03 * sig).astype(np.float32))   # -30 dBFS


def test_silence_and_hum_rejected():
    """Pure silence and constant mains hum stay non-speech (the only
    cases the reference's ' ' fallback is for)."""
    assert not has_speech(np.zeros(3 * 16000, np.float32))
    t = np.arange(3 * 16000) / 16000.0
    hum = (0.05 * np.sin(2 * np.pi * 50 * t)).astype(np.float32)
    assert not has_speech(hum)
