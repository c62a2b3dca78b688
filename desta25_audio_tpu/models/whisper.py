"""Whisper encoder + decoder in functional JAX.

Reimplements the parts of HF ``WhisperForConditionalGeneration`` the
reference uses:

- the encoder forward with intermediate layer taps
  (``WhisperPerception.forward_whisper``, modeling_desta25.py:544-627):
  conv1 -> gelu -> conv2(stride 2) -> gelu -> +sinusoidal positions ->
  pre-LN transformer layers -> (tapped hidden states), final LayerNorm only
  for the ASR path (the connector consumes pre-final-LN layer outputs);
- the decoder for ASR-in-the-loop greedy transcription
  (modeling_desta25.py:1581-1601): causal self-attn + cross-attn to the
  encoder output, learned positions, tied output embedding.

TPU-first structure: all encoder layers run under one ``lax.scan`` over
stacked layer parameters; target-layer taps are accumulated into a fixed
[n_taps, B, T, D] carry (no L-sized activation stash).  Mel input is NWC
([B, T, n_mels]) so convs hit the MXU without transposes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..ops.core import (
    Params,
    conv1d,
    gelu,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    mha,
    normal_init,
    stack_layers,
)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper sinusoid table (matches openai/HF ``sinusoids``)."""
    log_timescale = math.log(10000.0) / (dim // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_attn(key, d: int, dtype) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": init_linear(kq, d, d, use_bias=True, dtype=dtype),
        "k": init_linear(kk, d, d, use_bias=False, dtype=dtype),
        "v": init_linear(kv, d, d, use_bias=True, dtype=dtype),
        "o": init_linear(ko, d, d, use_bias=True, dtype=dtype),
    }


def _init_enc_layer(key, cfg: WhisperConfig, dtype) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    d = cfg.d_model
    return {
        "ln1": init_layer_norm(d, dtype),
        "attn": _init_attn(ka, d, dtype),
        "ln2": init_layer_norm(d, dtype),
        "fc1": init_linear(k1, d, cfg.encoder_ffn_dim, dtype=dtype),
        "fc2": init_linear(k2, cfg.encoder_ffn_dim, d, dtype=dtype),
    }


def init_whisper_encoder(key, cfg: WhisperConfig,
                         dtype=jnp.float32) -> Params:
    kc1, kc2, *lkeys = jax.random.split(key, 2 + cfg.encoder_layers)
    d = cfg.d_model
    layers = [_init_enc_layer(k, cfg, dtype) for k in lkeys]
    return {
        "conv1": init_conv1d(kc1, cfg.num_mel_bins, d, 3, dtype),
        "conv2": init_conv1d(kc2, d, d, 3, dtype),
        "embed_positions": jnp.asarray(
            sinusoidal_positions(cfg.max_source_positions, d), dtype),
        "layers": stack_layers(layers),
        "ln_post": init_layer_norm(d, dtype),
    }


def _init_dec_layer(key, cfg: WhisperConfig, dtype) -> Params:
    ka, kx, k1, k2 = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "ln1": init_layer_norm(d, dtype),
        "self_attn": _init_attn(ka, d, dtype),
        "ln_x": init_layer_norm(d, dtype),
        "cross_attn": _init_attn(kx, d, dtype),
        "ln2": init_layer_norm(d, dtype),
        "fc1": init_linear(k1, d, cfg.decoder_ffn_dim, dtype=dtype),
        "fc2": init_linear(k2, cfg.decoder_ffn_dim, d, dtype=dtype),
    }


def init_whisper_decoder(key, cfg: WhisperConfig,
                         dtype=jnp.float32) -> Params:
    ke, kp, *lkeys = jax.random.split(key, 2 + cfg.decoder_layers)
    d = cfg.d_model
    layers = [_init_dec_layer(k, cfg, dtype) for k in lkeys]
    return {
        "embed_tokens": normal_init(ke, (cfg.vocab_size, d), 0.02, dtype),
        "embed_positions": normal_init(kp, (cfg.max_target_positions, d),
                                       0.02, dtype),
        "layers": stack_layers(layers),
        "ln": init_layer_norm(d, dtype),
    }


def init_whisper(key, cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_whisper_encoder(k1, cfg, dtype),
        "decoder": init_whisper_decoder(k2, cfg, dtype),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    B, T, D = x.shape
    return x.reshape(B, T, n_heads, D // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, T, H, Dh = x.shape
    return x.reshape(B, T, H * Dh)


def _attn(p: Params, q_in: jnp.ndarray, kv_in: jnp.ndarray, n_heads: int,
          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    from ..ops.attention import mha as dispatch_mha
    q = _split_heads(linear(p["q"], q_in), n_heads)
    k = _split_heads(linear(p["k"], kv_in), n_heads)
    v = _split_heads(linear(p["v"], kv_in), n_heads)
    # mask-free bidirectional encoder attention takes the Pallas flash
    # path on TPU (ops/attention.py); masked decoder paths fall back to XLA
    out = dispatch_mha(q, k, v, mask=mask)
    return linear(p["o"], _merge_heads(out))


def _packed_attn_enabled() -> bool:
    import os
    if os.environ.get("DESTA_PACKED_ATTN", "1") in ("0", "false"):
        return False
    return jax.default_backend() == "tpu"


def _enc_self_attn(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Encoder self-attention on the packed [B, T, H*Dh] layout.

    The packed Pallas kernel (ops/enc_attention.py) consumes the
    projection outputs directly — no [B,H,T,D] transposes and no pad to a
    flash-friendly length, which cost ~1.3 ms/layer of HBM traffic on v5e
    for whisper-large-v3 at batch 8."""
    import os
    from ..ops.enc_attention import packed_encoder_attention, packed_supported
    D = x.shape[-1]
    if not (_packed_attn_enabled() and packed_supported(n_heads, D)
            and x.shape[1] >= 512):
        return _attn(p, x, x, n_heads)
    from ..ops.quant import is_quantized
    # Shape-aware int8-attention dispatch (VERDICT r4 #3): with "dual"
    # leaves (int8 "q"/"s" + bf16 "w", ops/quant.quantize_encoder_params)
    # the W8A8 kernels run only where they win — small batch (B=1 TTFT:
    # 13.8 vs 15.2 ms) — while batched perception keeps the bf16 packed
    # path (b8: 120.6 vs 122.5 ms).  Crossover batch is the trace-time
    # constant DESTA_ENC_ATTN_INT8_MAXB (v5e sweep, dual-tree arms,
    # scripts/sweep_attn_int8_crossover.py 2026-08-21: int8 wins at
    # B=1 [-0.56 ms] and B=2 [-1.35], loses at B=4 [+0.83] and
    # B=8 [+1.80] -> crossover between 2 and 4).
    use_int8_attn = is_quantized(p["q"]) and (
        "w" not in p["q"]  # pure-int8 leaves: no bf16 arm to fall back to
        or x.shape[0] <= int(os.environ.get("DESTA_ENC_ATTN_INT8_MAXB",
                                            "2")))
    if use_int8_attn:
        # encoder_quant="int8" with attention projections quantized: the
        # fused-quant kernels (ops/w8a8_proj.py) do the per-row act quant
        # IN-KERNEL — the per-op XLA int8 path's quant epilogues broke
        # fusion around the attention kernel and measured slower
        # (MEASURED-WORSE r2, 175 vs 166 ms b8)
        from ..ops.w8a8_proj import proj_w8a8, proj_w8a8_supported, qkv_w8a8
        if proj_w8a8_supported(D, p["q"]["q"].shape[1], x.dtype):
            # scripts/sweep_w8a8_proj_b1.py (v5e): B=1 13.57 ms at
            # bpm=768 vs 13.99 at 512; b8 measured with 512 (A/B) —
            # batch-adaptive like block_q below
            default_bpm = 768 if x.shape[0] == 1 else 512
            bpm = int(os.environ.get("DESTA_ENC_PROJ_BM", "0")
                      ) or default_bpm
            q, k, v = qkv_w8a8(x, p["q"], p["k"], p["v"], block_m=bpm)
            default_bq = 768 if x.shape[0] == 1 else 512
            bq = int(os.environ.get("DESTA_ENC_BQ", "0")) or default_bq
            out = packed_encoder_attention(q, k, v, n_heads, block_q=bq)
            return proj_w8a8(out, p["o"], block_m=bpm)
        return _attn(p, x, x, n_heads)  # XLA int8 fallback off-TPU
    q = linear(p["q"], x)
    k = linear(p["k"], x)
    v = linear(p["v"], x)
    # block_q tuned per batch regime (scripts/sweep_enc_b1.py on v5e:
    # B=1 19.58 -> 19.12 ms/fwd at bq=768; B=8 regresses 138 -> 144,
    # so the split is batch-adaptive).  Env override is read at trace
    # time (fresh function object per mode for A/Bs — CLAUDE.md).
    default_bq = 768 if x.shape[0] == 1 else 512
    bq = int(os.environ.get("DESTA_ENC_BQ", "0")) or default_bq
    out = packed_encoder_attention(q, k, v, n_heads, block_q=bq)
    return linear(p["o"], out)


def _enc_layer_apply(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    x = x + _enc_self_attn(p["attn"], layer_norm(p["ln1"], x), n_heads)
    h = layer_norm(p["ln2"], x)
    h = _enc_ffn(p, h)
    return x + h


def _enc_ffn(p: Params, h: jnp.ndarray) -> jnp.ndarray:
    """FFN: the fused fc1->gelu->fc2 Pallas kernel on TPU (the erf-gelu
    between the matmuls is ~0.63 ms/layer of serialized VPU work at b8 —
    the kernel chunks the hidden dim so gelu overlaps the MXU; see
    ops/enc_ffn.py), XLA ops otherwise."""
    import os
    from ..ops.enc_ffn import (
        encoder_ffn,
        encoder_ffn_w8a8,
        ffn_supported,
        ffn_w8a8_supported,
    )
    fc1, fc2 = p["fc1"], p["fc2"]
    fused_on = (os.environ.get("DESTA_FUSED_ENC_FFN", "1")
                not in ("0", "false")
                and _packed_attn_enabled() and h.shape[1] >= 512)
    # block_m: B=1 runs the whole [T, D] slab as one block (sweep_enc_b1:
    # 19.12 -> 18.90 bf16 / 15.35 -> 15.04 ms w8a8); b8 default stays 256.
    default_bm = 1536 if h.shape[0] == 1 else 256
    bm = int(os.environ.get("DESTA_ENC_BM", "0")) or default_bm
    if (fused_on and "w" in fc1 and "b" in fc1 and "w" in fc2
            and "b" in fc2
            and ffn_supported(h.shape[-1], fc1["w"].shape[1], h.dtype)):
        return encoder_ffn(h, fc1["w"], fc1["b"], fc2["w"], fc2["b"],
                           block_m=bm)
    if "q" in fc1 and "q" in fc2 and "b" in fc1 and "b" in fc2:
        # encoder_quant="int8" weights: W8A8 in ONE kernel (in-kernel
        # per-row act quant; the per-op XLA int8 path pays fusion-breaking
        # quant epilogues — see ops/quant.quantize_encoder_params)
        if fused_on and ffn_w8a8_supported(h.shape[-1], fc1["q"].shape[1],
                                           h.dtype):
            return encoder_ffn_w8a8(h, fc1["q"], fc1["s"], fc1["b"],
                                    fc2["q"], fc2["s"], fc2["b"],
                                    block_m=bm)
        # off-TPU / unsupported shapes: XLA W8A8 so quantized encoder
        # params run everywhere (CPU tests, interpret mode)
        from ..ops.enc_ffn import _xla_ffn_w8a8
        return _xla_ffn_w8a8(h, fc1["q"], fc1["s"], fc1["b"],
                             fc2["q"], fc2["s"], fc2["b"])
    return linear(fc2, gelu(linear(fc1, h)))


def whisper_encoder_apply(
    params: Params,
    mel: jnp.ndarray,
    cfg: WhisperConfig,
    target_layer_ids: Tuple[int, ...] = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the encoder.

    mel: [B, 3000, n_mels] (NWC).
    Returns (final_hidden [B, 1500, D] — post final LayerNorm, for the ASR
    cross-attention) and taps [n_taps, B, 1500, D] — the hidden state
    *after* each target layer, pre-final-LN, matching the reference's
    inline connector inputs (modeling_desta25.py:575-598).
    """
    if mel.shape[1] != cfg.expected_mel_frames:
        raise ValueError(
            f"Whisper expects mel length {cfg.expected_mel_frames}, got "
            f"{mel.shape[1]}; pad/truncate the features first."
        )
    x = gelu(conv1d(params["conv1"], mel, stride=1, padding=1))
    x = gelu(conv1d(params["conv2"], x, stride=2, padding=1))
    x = x + params["embed_positions"][None, :x.shape[1]].astype(x.dtype)

    # NOTE: a whole-encoder-stack fused kernel (all 32 layers in one
    # pallas_call, residual stream resident in VMEM) was built and
    # A/B'd on v5e in round 4 and MEASURED WORSE than this per-op path
    # at every batch (b8: 177.3 vs 138.2 ms; B=1: 24.1 vs 19.8 ms) —
    # the tuned per-op kernels (packed attention + fused FFN) win on
    # MXU scheduling over what the layer-boundary fusion saves.  See
    # CLAUDE.md's MEASURED-WORSE ledger; removed at commit history
    # 'Encoder-stack kernel: lane-group axis on the grid'.

    def body(hidden, p):
        return _enc_layer_apply(p, hidden,
                                cfg.encoder_attention_heads), None

    n_taps = len(target_layer_ids)
    if not n_taps:
        x, _ = jax.lax.scan(body, x, params["layers"])
        B, T, D = x.shape
        taps = jnp.zeros((1, B, T, D), x.dtype)
    else:
        # One scan over all layers; EVERY layer writes its hidden state
        # into a [n_taps + 1, B, T, D] carry — tap layers into their
        # slot, the other 28 into a dead scratch slot.  The unconditional
        # dynamic_update_slice keeps the carry donated/in-place (a
        # lax.cond guard or ys-emit+gather both measured slower:
        # 137.5 / 140.1 vs 136.2 ms at b8 under the fused-FFN kernel,
        # scripts/ab_enc_taps.py; identical outputs), and unlike scan
        # segments the weight stream pipelines across every layer
        # boundary (segment split: 148.5 ms, round-3 A/B).
        assert list(target_layer_ids) == sorted(set(target_layer_ids)), \
            target_layer_ids
        tap_arr = jnp.asarray(target_layer_ids)

        def body_tap(carry, p_i):
            hidden, taps = carry
            p, i = p_i
            h = _enc_layer_apply(p, hidden, cfg.encoder_attention_heads)
            hit = tap_arr == i
            slot = jnp.where(jnp.any(hit), jnp.argmax(hit), n_taps)
            taps = jax.lax.dynamic_update_slice(
                taps, h[None], (slot, 0, 0, 0))
            return (h, taps), None

        taps0 = jnp.zeros((n_taps + 1,) + x.shape, x.dtype)
        (x, taps), _ = jax.lax.scan(
            body_tap, (x, taps0),
            (params["layers"], jnp.arange(cfg.encoder_layers)))
        taps = taps[:n_taps]
    final = layer_norm(params["ln_post"], x)
    return final, taps


def _dec_layer_apply(p: Params, x: jnp.ndarray, enc_kv, n_heads: int,
                     self_mask, cache=None, cache_index=None):
    """One decoder layer. enc_kv: precomputed (k, v) from encoder output.

    cache: optional (k, v) for self-attn, each [B, Tmax, H, Dh]; returns
    updated cache.  With a cache, x is the new suffix [B, Ts, D] written at
    ``cache_index``.
    """
    h = layer_norm(p["ln1"], x)
    q = _split_heads(linear(p["self_attn"]["q"], h), n_heads)
    k = _split_heads(linear(p["self_attn"]["k"], h), n_heads)
    v = _split_heads(linear(p["self_attn"]["v"], h), n_heads)
    if cache is not None:
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (0, cache_index, 0, 0))
        k, v = ck, cv
        cache = (ck, cv)
    attn = mha(q, k, v, mask=self_mask)
    x = x + linear(p["self_attn"]["o"], _merge_heads(attn))

    h = layer_norm(p["ln_x"], x)
    qx = _split_heads(linear(p["cross_attn"]["q"], h), n_heads)
    ek, ev = enc_kv
    attn = mha(qx, ek, ev, mask=None)
    x = x + linear(p["cross_attn"]["o"], _merge_heads(attn))

    h = layer_norm(p["ln2"], x)
    x = x + linear(p["fc2"], gelu(linear(p["fc1"], h)))
    return x, cache


def whisper_cross_kv(params: Params, enc_out: jnp.ndarray,
                     cfg: WhisperConfig) -> Params:
    """Precompute per-layer cross-attention K/V from the encoder output.
    Returns stacked (k, v): each [L, B, T_enc, H, Dh]."""
    H = cfg.decoder_attention_heads

    def per_layer(p):
        k = _split_heads(linear(p["cross_attn"]["k"], enc_out), H)
        v = _split_heads(linear(p["cross_attn"]["v"], enc_out), H)
        return k, v

    return jax.vmap(per_layer)(params["layers"])


def whisper_decoder_apply(
    params: Params,
    tokens: jnp.ndarray,
    cross_kv,
    cfg: WhisperConfig,
    pos_offset: int | jnp.ndarray = 0,
    cache=None,
    cache_index=None,
):
    """Decoder forward.

    tokens: [B, T] int32.  cross_kv: from :func:`whisper_cross_kv`.
    Without a cache: full causal self-attention over ``tokens``.
    With cache=(k [L,B,Tmax,H,Dh], v): append-at-``cache_index`` decode.
    Returns (logits [B, T, V], new_cache).
    """
    H = cfg.decoder_attention_heads
    B, T = tokens.shape
    x = params["embed_tokens"][tokens]
    positions = pos_offset + jnp.arange(T)
    x = x + params["embed_positions"][positions][None].astype(x.dtype)

    if cache is None:
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        new_cache = None

        def body(h, inp):
            p, ckv = inp
            h, _ = _dec_layer_apply(p, h, ckv, H, mask)
            return h, None

        x, _ = jax.lax.scan(body, x, (params["layers"], cross_kv))
    else:
        Tmax = cache[0].shape[2]
        key_pos = jnp.arange(Tmax)[None, None, None, :]
        q_pos = (cache_index + jnp.arange(T))[None, None, :, None]
        mask = key_pos <= q_pos  # causal within the appended suffix too

        def body(h, inp):
            p, ckv, ck, cv = inp
            h, (nk, nv) = _dec_layer_apply(p, h, ckv, H, mask, (ck, cv),
                                           cache_index)
            return h, (nk, nv)

        x, new_cache = jax.lax.scan(
            body, x, (params["layers"], cross_kv, cache[0], cache[1]))

    x = layer_norm(params["ln"], x)
    logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                        preferred_element_type=jnp.float32)
    return logits, new_cache


def init_decoder_cache(cfg: WhisperConfig, batch: int, max_len: int,
                       dtype=jnp.bfloat16):
    H = cfg.decoder_attention_heads
    Dh = cfg.d_model // H
    shape = (cfg.decoder_layers, batch, max_len, H, Dh)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
