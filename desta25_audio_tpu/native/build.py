"""Build the native audio libraries: ``python -m desta25_audio_tpu.native.build``.

Two shared objects:
- ``libdesta_audio.so`` — dependency-free WAV decode + polyphase resample.
- ``libdesta_ffmpeg.so`` — universal decode/encode through the system
  FFmpeg libraries (flac/mp3/ogg/m4a/...; reference parity with the
  soundfile/pydub stack, desta/utils/audio.py:245-361).  Built only when
  the libavformat dev headers are present.
"""

import os
import subprocess
import sys


def _have_ffmpeg_headers() -> bool:
    for root in ("/usr/include", "/usr/include/x86_64-linux-gnu"):
        if os.path.exists(os.path.join(root, "libavformat", "avformat.h")):
            return True
    return False


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "libdesta_audio.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out,
           os.path.join(here, "audio_native.cpp")]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)

    if _have_ffmpeg_headers():
        out2 = os.path.join(here, "libdesta_ffmpeg.so")
        cmd2 = ["g++", "-O3", "-shared", "-fPIC", "-o", out2,
                os.path.join(here, "audio_ffmpeg.cpp"),
                "-lavformat", "-lavcodec", "-lavutil", "-lswresample"]
        if verbose:
            print(" ".join(cmd2))
        subprocess.run(cmd2, check=True)
    elif verbose:
        print("libavformat headers not found; skipping libdesta_ffmpeg.so")
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    from desta25_audio_tpu.native import available
    sys.exit(0 if available() else 1)
