"""Build the native audio library: ``python -m desta25_audio_tpu.native.build``."""

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "audio_native.cpp")
    out = os.path.join(here, "libdesta_audio.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    from desta25_audio_tpu.native import available
    sys.exit(0 if available() else 1)
