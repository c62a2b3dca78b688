"""Long-audio chunking (an extension beyond the reference).

The reference hard-caps audio at Whisper's 30 s window — longer clips are
silently truncated by the feature extractor (SURVEY §5 "Long context ...
Absent by design").  Since the message format already supports multiple
audios per turn (modeling_desta25.py:1527-1535), long clips can instead be
split into 30 s windows with a short overlap and spliced as consecutive
``<|AUDIO|>`` blocks.  ``DeSTA25AudioModel.generate(...,
auto_chunk_long_audio=True)`` uses this; default off to preserve reference
semantics.
"""

from __future__ import annotations

from typing import List

import numpy as np

WINDOW = 30 * 16000
OVERLAP = 16000  # 1 s


def chunk_audio(samples: np.ndarray, window: int = WINDOW,
                overlap: int = OVERLAP) -> List[np.ndarray]:
    """Split a 16 kHz clip into <=30 s windows with overlap.  Clips at or
    under one window return a single chunk unchanged."""
    n = len(samples)
    if n <= window:
        return [samples]
    chunks = []
    step = window - overlap
    start = 0
    while start < n:
        chunk = samples[start:start + window]
        if len(chunk) >= overlap or not chunks:
            chunks.append(chunk)
        start += step
    return chunks


def expand_message_for_chunks(content: str, audio_locator: str,
                              n_chunks_per_audio: List[int]) -> str:
    """Replace each locator with n consecutive locators (one per chunk)."""
    parts = content.split(audio_locator)
    assert len(parts) == len(n_chunks_per_audio) + 1, (
        content, n_chunks_per_audio)
    out = parts[0]
    for n, part in zip(n_chunks_per_audio, parts[1:]):
        out += " ".join([audio_locator] * n) + part
    return out
