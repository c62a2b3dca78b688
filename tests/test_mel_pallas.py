"""Pallas fused mel kernel vs the jnp oracle.

On CPU the kernel runs in interpret mode on a one-block (600-frame, 6 s)
clip to keep runtime sane; on TPU hardware the full 3000-frame path is
exercised compiled (tests/test_mel_pallas.py + bench.py cover it there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desta25_audio_tpu.audio import mel as melmod
from desta25_audio_tpu.ops import mel_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_matches_jnp(rng, n_mels):
    n_frames = melmod.N_FRAMES if ON_TPU else mel_pallas.FRAME_BLOCK
    n = n_frames * melmod.HOP_LENGTH
    audio = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    t = np.arange(n) / 16000.0
    audio[0] += 0.5 * np.sin(2 * np.pi * 523.0 * t).astype(np.float32)
    x = jnp.asarray(audio)

    # jnp oracle on the same window length (power spec path is length
    # agnostic; re-use its pieces directly).
    power = np.asarray(_power(x, n_frames))
    mel_fb = melmod.mel_filter_bank(n_mels)
    mel = power @ mel_fb
    ref = np.log10(np.maximum(mel, 1e-10))
    mx = ref.max(axis=(1, 2), keepdims=True)
    ref = (np.maximum(ref, mx - 8.0) + 4.0) / 4.0

    got = np.asarray(mel_pallas.log_mel_pallas(x, n_mels,
                                               interpret=not ON_TPU))
    assert got.shape == ref.shape == (2, n_frames, n_mels)
    assert np.max(np.abs(got - ref)) < 1e-4


def _power(audio, n_frames):
    rows = melmod._framed_rows(audio)
    cos_m, sin_m = melmod._dft_window_matrices()
    F = n_frames
    hi = jax.lax.Precision.HIGHEST

    def third(mat):
        mat = jnp.asarray(mat)
        w0, w1, w2 = (mat[:160], mat[160:320], mat[320:])
        return (jnp.einsum("bfh,hk->bfk", rows[:, 0:F], w0, precision=hi)
                + jnp.einsum("bfh,hk->bfk", rows[:, 1:F + 1], w1,
                             precision=hi)
                + jnp.einsum("bfh,hk->bfk", rows[:, 2:F + 2, :80], w2,
                             precision=hi))

    re = third(cos_m)
    im = third(sin_m)
    return re * re + im * im
