"""Decompose perception-path time on the TPU (VERDICT r1 #3).

Times, per batch size: full perception (mel+encoder+taps+qformer), mel
frontend only, conv stem, encoder without taps, encoder with taps, and the
qformer connector alone; reports XLA cost_analysis FLOPs and the implied
fraction of the v5e bf16 roofline (197 TFLOP/s).

Methodology per CLAUDE.md: amortize ITERS iterations inside one jit via
lax.scan (inputs perturbed), scalar fetch, subtract tunnel RTT, 3 forced
warmups before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from desta25_audio_tpu.config import DeSTA25Config
from desta25_audio_tpu.models import whisper as jw
from desta25_audio_tpu.models.qformer import (
    init_qformer_connector,
    qformer_connector_apply,
)
from desta25_audio_tpu.ops.mel_pallas import log_mel_pallas
from desta25_audio_tpu.utils.fast_init import random_tree_like

ITERS = 10
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    t0 = time.time()
    for _ in range(5):
        x = float(f(jnp.float32(x)))
    return (time.time() - t0) / 5


def timed(fn, *args, iters=ITERS, warmups=3):
    """fn must reduce to a scalar; returns (seconds_per_iter, flops)."""

    def many(*a):
        def body(c, i):
            return c + fn(*a, jnp.float32(i) * 1e-6), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    f = jax.jit(many)
    t0 = time.time()
    float(f(*args))
    compile_s = time.time() - t0
    for _ in range(warmups):
        float(f(*args))
    rtt = measure_rtt()
    t0 = time.time()
    float(f(*args))
    per = (time.time() - t0 - rtt) / iters
    try:
        ca = f.lower(*args).compile().cost_analysis()
        flops = float(ca.get("flops", 0.0)) / iters
        bytes_ = (float(ca.get("bytes accessed", 0.0))) / iters
    except Exception:
        flops, bytes_ = 0.0, 0.0
    return per, flops, bytes_, compile_s


def main():
    cfg = DeSTA25Config(
        llm_model_id="DeSTA-ntu/Llama-3.1-8B-Instruct",
        encoder_model_id="openai/whisper-large-v3",
        connector_mode="qformer_1", qformer_num_hidden_layers=6,
        prompt_size=64, dtype="bfloat16")
    enc_cfg = cfg.encoder_config
    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"platform={jax.devices()[0].platform}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    enc_params = random_tree_like(
        key, lambda k: jw.init_whisper_encoder(k, enc_cfg,
                                               dtype=jnp.bfloat16))
    conn_params = random_tree_like(
        key, lambda k: init_qformer_connector(k, cfg, dtype=jnp.bfloat16))
    jax.block_until_ready((enc_params, conn_params))

    n_samples = 30 * 16000

    import os as _os
    _bs = tuple(int(x) for x in _os.environ.get("PROFILE_B", "8,16,32").split(","))
    for B in _bs:
        audio = jax.random.normal(jax.random.PRNGKey(1), (B, n_samples),
                                  jnp.float32) * 0.1
        mel0 = log_mel_pallas(audio, enc_cfg.num_mel_bins,
                              interpret=not on_tpu).astype(jnp.bfloat16)
        mel0 = jax.block_until_ready(mel0)

        def full(ep, cp, audio, eps):
            mel = log_mel_pallas(audio + eps, enc_cfg.num_mel_bins,
                                 interpret=not on_tpu).astype(jnp.bfloat16)
            _, taps = jw.whisper_encoder_apply(ep, mel, enc_cfg,
                                               cfg.target_layer_ids)
            feats = qformer_connector_apply(cp, taps, cfg)
            return jnp.sum(feats.astype(jnp.float32))

        def mel_only(audio, eps):
            mel = log_mel_pallas(audio + eps, enc_cfg.num_mel_bins,
                                 interpret=not on_tpu)
            return jnp.sum(mel.astype(jnp.float32))

        def enc_taps(ep, mel, eps):
            _, taps = jw.whisper_encoder_apply(
                ep, mel + eps.astype(mel.dtype), enc_cfg,
                cfg.target_layer_ids)
            return jnp.sum(taps.astype(jnp.float32))

        def enc_notaps(ep, mel, eps):
            final, _ = jw.whisper_encoder_apply(
                ep, mel + eps.astype(mel.dtype), enc_cfg, ())
            return jnp.sum(final.astype(jnp.float32))

        def qf_only(cp, taps, eps):
            feats = qformer_connector_apply(
                cp, taps + eps.astype(taps.dtype), cfg)
            return jnp.sum(feats.astype(jnp.float32))

        def qf_w8a8(cp, taps, eps):
            feats = qformer_connector_apply(
                cp, taps + eps.astype(taps.dtype), cfg, w8a8=True)
            return jnp.sum(feats.astype(jnp.float32))

        def full_w8a8(ep, cp, audio, eps):
            mel = log_mel_pallas(audio + eps, enc_cfg.num_mel_bins,
                                 interpret=not on_tpu).astype(jnp.bfloat16)
            _, taps = jw.whisper_encoder_apply(ep, mel, enc_cfg,
                                               cfg.target_layer_ids)
            feats = qformer_connector_apply(cp, taps, cfg, w8a8=True)
            return jnp.sum(feats.astype(jnp.float32))

        _, taps0 = jax.jit(lambda ep, m: jw.whisper_encoder_apply(
            ep, m, enc_cfg, cfg.target_layer_ids))(enc_params, mel0)
        taps0 = jax.block_until_ready(taps0)

        rows = {}
        rows["full"] = timed(full, enc_params, conn_params, audio)
        rows["full-w8a8"] = timed(full_w8a8, enc_params, conn_params,
                                  audio)
        rows["mel"] = timed(mel_only, audio)
        rows["enc+taps"] = timed(enc_taps, enc_params, mel0)
        rows["enc-notaps"] = timed(enc_notaps, enc_params, mel0)
        rows["qformer"] = timed(qf_only, conn_params, taps0)
        rows["qformer-w8a8"] = timed(qf_w8a8, conn_params, taps0)

        print(f"\n=== B={B} ===")
        for name, (per, flops, bytes_, cs) in rows.items():
            tflops = flops / per / 1e12 if per > 0 else 0
            gbs = bytes_ / per / 1e9 if per > 0 else 0
            print(f"{name:11s} {per*1e3:8.2f} ms  {flops/1e9:9.1f} GF "
                  f"{tflops:6.1f} TF/s ({100*tflops/V5E_BF16_TFLOPS:4.1f}%)"
                  f"  {gbs:6.0f} GB/s ({100*gbs/V5E_HBM_GBS:4.1f}%)"
                  f"  compile {cs:.0f}s")
        per_full = rows["full"][0]
        print(f"audio-sec/s: {B*30/per_full:.0f}")


if __name__ == "__main__":
    main()
