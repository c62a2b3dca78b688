"""Native (C++) audio runtime with ctypes bindings.

``python -m desta25_audio_tpu.native.build`` compiles the shared library;
:func:`load` returns the ctypes handle (None when unbuilt — callers fall
back to the pure-Python path).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "libdesta_audio.so")
_lib = None
_lib_failed = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _lib_failed = True
        return None
    lib.wav_decode.restype = ctypes.c_int
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.load_audio_16k.restype = ctypes.c_int64
    lib.load_audio_16k.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# FFmpeg-backed universal codec (libdesta_ffmpeg.so)
# ---------------------------------------------------------------------------

_FF_SO_PATH = os.path.join(os.path.dirname(__file__), "libdesta_ffmpeg.so")
_fflib = None
_fflib_failed = False


def load_ffmpeg() -> Optional[ctypes.CDLL]:
    global _fflib, _fflib_failed
    if _fflib is not None or _fflib_failed:
        return _fflib
    if not os.path.exists(_FF_SO_PATH):
        # build lazily when the toolchain + headers exist
        try:
            from .build import build
            build(verbose=False)
        except Exception:
            pass
    if not os.path.exists(_FF_SO_PATH):
        _fflib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_FF_SO_PATH)
    except OSError:
        _fflib_failed = True
        return None
    lib.ff_decode_mono.restype = ctypes.c_int64
    lib.ff_decode_mono.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.ff_decode_raw.restype = ctypes.c_int64
    lib.ff_decode_raw.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.ff_encode_mono.restype = ctypes.c_int
    lib.ff_encode_mono.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]
    lib.ff_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _fflib = lib
    return _fflib


def ffmpeg_available() -> bool:
    return load_ffmpeg() is not None


def ff_decode_mono(path: str, target_sr: int = 16000) -> np.ndarray:
    """Universal decode (flac/mp3/ogg/...) -> mono float32 @ target_sr."""
    lib = load_ffmpeg()
    if lib is None:
        raise RuntimeError("libdesta_ffmpeg.so unavailable (no FFmpeg "
                           "dev libraries in this environment)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.ff_decode_mono(path.encode(), target_sr, ctypes.byref(out))
    if n < 0:
        raise ValueError(f"ffmpeg decode failed ({n}): {path}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.ff_free(out)
    return arr


def ff_decode_raw(path: str) -> tuple:
    """Universal decode -> (interleaved [frames, ch] float32, sr)."""
    lib = load_ffmpeg()
    if lib is None:
        raise RuntimeError("libdesta_ffmpeg.so unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    n = lib.ff_decode_raw(path.encode(), ctypes.byref(out),
                          ctypes.byref(ch), ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"ffmpeg decode failed ({n}): {path}")
    try:
        arr = np.ctypeslib.as_array(
            out, shape=(n * ch.value,)).copy().reshape(n, ch.value)
    finally:
        lib.ff_free(out)
    return arr, sr.value


def ff_encode(path: str, samples: np.ndarray, sr: int,
              bit_rate: int = 128000) -> None:
    """Encode mono float32 to ``path`` (codec from the extension:
    .flac/.mp3/.wav/.ogg)."""
    lib = load_ffmpeg()
    if lib is None:
        raise RuntimeError("libdesta_ffmpeg.so unavailable")
    x = np.ascontiguousarray(samples, np.float32)
    rc = lib.ff_encode_mono(
        path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), sr, bit_rate)
    if rc != 0:
        raise ValueError(f"ffmpeg encode failed ({rc}): {path}")


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode + mixdown + resample in native code. Raises on failure."""
    lib = load()
    if lib is None:
        raise RuntimeError("native audio library not built; run "
                           "python -m desta25_audio_tpu.native.build")
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.load_audio_16k(path.encode(), target_sr, ctypes.byref(out))
    if n < 0:
        raise ValueError(f"native decode failed ({n}): {path}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.audio_free(out)
    return arr


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native audio library not built")
    x = np.ascontiguousarray(x, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in,
        sr_out, ctypes.byref(out))
    if n < 0:
        raise ValueError(f"native resample failed ({n})")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.audio_free(out)
    return arr
