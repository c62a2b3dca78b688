"""Fetch and verify the real silero-vad models (one command, pinned tag).

The reference gates ASR on silero-vad (modeling_desta25.py:1484-1488); this
environment has no network egress, so staging happens on a connected
machine:

    python scripts/fetch_silero.py --out /weights/silero

Downloads the TorchScript and ONNX exports from the official snakers4/
silero-vad repo at a PINNED tag, functionally verifies each (loads the
model, streams a synthetic tone + silence, checks probabilities are sane
and discriminative), prints sha256 digests, and emits the env exports:

    export DESTA_SILERO_JIT=/weights/silero/silero_vad.jit   # torch-only
    export DESTA_SILERO_ONNX=/weights/silero/silero_vad.onnx # onnxruntime

If you have recorded digests from a previous fetch, pass
``--sha256-jit``/``--sha256-onnx`` to fail on any upstream change.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

PINNED_TAG = "v5.1.2"
BASE = ("https://raw.githubusercontent.com/snakers4/silero-vad/"
        f"{PINNED_TAG}/src/silero_vad/data")
FILES = {
    "silero_vad.jit": f"{BASE}/silero_vad.jit",
    "silero_vad.onnx": f"{BASE}/silero_vad.onnx",
}


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_functional(path: str) -> None:
    """Load the model and check it discriminates tone-speech vs silence."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from desta25_audio_tpu.audio.vad import SileroJitVAD, SileroOnnxVAD

    vad = (SileroJitVAD(path) if path.endswith(".jit")
           else SileroOnnxVAD(path))
    t = np.arange(16000) / 16000.0
    speechy = (0.5 * np.sin(2 * np.pi * 220 * t)
               * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    silence = np.zeros(16000, np.float32)
    ps = vad.speech_probs(speechy)
    pz = vad.speech_probs(silence)
    assert ps.shape == pz.shape == (31,), (ps.shape, pz.shape)
    assert np.all((ps >= 0) & (ps <= 1)), "probs outside [0, 1]"
    assert pz.max() < 0.5, f"silence scored {pz.max():.3f} — model broken?"
    print(f"  functional check OK (speechy max {ps.max():.3f}, "
          f"silence max {pz.max():.3f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/weights/silero")
    ap.add_argument("--sha256-jit", default=None)
    ap.add_argument("--sha256-onnx", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    pinned = {"silero_vad.jit": args.sha256_jit,
              "silero_vad.onnx": args.sha256_onnx}
    for name, url in FILES.items():
        dst = os.path.join(args.out, name)
        if not os.path.exists(dst):
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, dst)  # noqa: S310
        digest = sha256(dst)
        print(f"{name}: sha256 {digest}")
        want = pinned[name]
        if want and digest != want:
            sys.exit(f"FAIL: {name} digest mismatch (want {want})")
        try:
            verify_functional(dst)
        except ModuleNotFoundError as e:
            print(f"  (skipping functional check: {e})")

    print("\nstage done; export:")
    print(f"  export DESTA_SILERO_JIT={args.out}/silero_vad.jit")
    print(f"  export DESTA_SILERO_ONNX={args.out}/silero_vad.onnx")


if __name__ == "__main__":
    main()
