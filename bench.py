"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): audio-sec/s/chip through the perception
path (fused Pallas mel frontend -> whisper-large-v3 encoder with layer
taps -> 6-layer Q-Former connector), bf16, batch 8, on one chip.

Timing methodology: this environment's TPU tunnel defers execution past
``block_until_ready`` and has ~27 ms RTT per synchronous fetch, so the
benchmark chains ITERS iterations inside one jit via ``lax.scan`` (inputs
perturbed per iteration so nothing folds), reduces to a scalar, fetches
once, and subtracts the RTT (measured with a trivial program).

``vs_baseline`` is null: the reference publishes no throughput numbers
(SURVEY §6; BASELINE.json "published": {}).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BATCH = 8
ITERS = 10
CLIP_SECONDS = 30


def measure_rtt() -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    n = 5
    for _ in range(n):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / n


def main():
    from desta25_audio_tpu.config import DeSTA25Config
    from desta25_audio_tpu.models import whisper as jw
    from desta25_audio_tpu.models.qformer import (
        init_qformer_connector,
        qformer_connector_apply,
    )
    from desta25_audio_tpu.ops.mel_pallas import log_mel_pallas

    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        prompt_size=64, dtype="bfloat16")
    enc_cfg = cfg.encoder_config

    import sys

    from desta25_audio_tpu.utils.fast_init import random_tree_like

    key = jax.random.PRNGKey(0)
    on_tpu = jax.devices()[0].platform == "tpu"
    # fast init: random magnitudes are all a perf benchmark needs, and the
    # real per-layer init is a huge unrolled program on a remote compiler
    t_init = time.time()
    enc_params = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    conn_params = random_tree_like(
        key, lambda k: init_qformer_connector(k, cfg, dtype=jnp.bfloat16))
    jax.block_until_ready((enc_params, conn_params))
    print(f"init done in {time.time()-t_init:.1f}s", file=sys.stderr)

    n_samples = CLIP_SECONDS * 16000

    def perception(ep, cp, audio):
        mel = log_mel_pallas(audio, enc_cfg.num_mel_bins,
                             interpret=not on_tpu).astype(jnp.bfloat16)
        _, taps = jw.whisper_encoder_apply(ep, mel, enc_cfg,
                                           cfg.target_layer_ids)
        feats = qformer_connector_apply(cp, taps, cfg)
        return jnp.sum(feats.astype(jnp.float32))

    # NB: params are explicit jit ARGUMENTS — closing over them would bake
    # 1.3 GB of weights into the HLO as constants and melt the compiler.
    def many(ep, cp, x0):
        def body(carry, i):
            y = perception(ep, cp, x0 + i.astype(jnp.float32) * 1e-6)
            return carry + y, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    f = jax.jit(many)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, n_samples),
                           jnp.float32) * 0.1
    t_c = time.time()
    float(f(enc_params, conn_params, x0))  # compile + warm
    print(f"compile+first-run {time.time()-t_c:.1f}s", file=sys.stderr)
    rtt = measure_rtt()
    t0 = time.time()
    float(f(enc_params, conn_params, x0))
    total = time.time() - t0
    per_iter = max((total - rtt) / ITERS, 1e-9)
    audio_sec_per_s = BATCH * CLIP_SECONDS / per_iter

    print(json.dumps({
        "metric": "audio-sec/s/chip (pallas-mel + whisper-large-v3 encoder "
                  "+ qformer-6L, bf16, batch 8)",
        "value": round(audio_sec_per_s, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": None,
        "detail": {
            "ms_per_batch": round(per_iter * 1e3, 3),
            "platform": jax.devices()[0].platform,
            "rtt_s": round(rtt, 4),
            "iters": ITERS,
            "batch": BATCH,
        },
    }))


if __name__ == "__main__":
    main()
