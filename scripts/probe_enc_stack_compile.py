"""Compile-only probe for the whole-encoder-stack kernel on the real TPU.

AOT-lowers fused_encoder_layers at flagship shapes (whisper-large-v3, b8)
with ShapeDtypeStructs — zero data transfer, zero execution; the remote
Mosaic compiler is the oracle.  Iterate kernel fixes against this before
paying for a full A/B run (VERDICT r3 weak #1).

    DESTA_FUSED_ENC_LAYERS=1 python scripts/probe_enc_stack_compile.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["DESTA_FUSED_ENC_LAYERS"] = "1"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
sys.path.insert(0, "/root/repo")

from desta25_audio_tpu.config import whisper_config_for
from desta25_audio_tpu.ops.enc_layers_fused import fused_encoder_layers

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
L, D, F, T = 32, 1280, 5120, int(os.environ.get("PROBE_T", "1500"))
cfg = whisper_config_for("openai/whisper-large-v3")

bf16, f32 = jnp.bfloat16, jnp.float32
sds = jax.ShapeDtypeStruct
layers = {
    "ln1": {"scale": sds((L, D), f32), "bias": sds((L, D), f32)},
    "ln2": {"scale": sds((L, D), f32), "bias": sds((L, D), f32)},
    "attn": {
        "q": {"w": sds((L, D, D), bf16), "b": sds((L, D), f32)},
        "k": {"w": sds((L, D, D), bf16)},
        "v": {"w": sds((L, D, D), bf16), "b": sds((L, D), f32)},
        "o": {"w": sds((L, D, D), bf16), "b": sds((L, D), f32)},
    },
    "fc1": {"w": sds((L, D, F), bf16), "b": sds((L, F), f32)},
    "fc2": {"w": sds((L, F, D), bf16), "b": sds((L, D), f32)},
}
x = sds((B, T, D), bf16)


def fn(layers, x):
    return fused_encoder_layers(layers, x, cfg, (7, 15, 23, 31))


t0 = time.time()
lowered = jax.jit(fn).lower(layers, x)
print(f"lowered in {time.time()-t0:.1f}s; compiling on TPU ...")
t0 = time.time()
lowered.compile()
print(f"COMPILE OK in {time.time()-t0:.1f}s (B={B})")
