"""WhisperPerception equivalent: mel -> tapped encoder -> connector.

Reference: ``WhisperPerception`` (modeling_desta25.py:498-627).  Pure
function over the param tree; the encoder runs once and taps the target
layers (the reference runs the Q-Former inline inside its Python layer
loop — mathematically identical, but here the taps come out of one
``lax.scan`` and the Q-Former passes are vmapped over taps).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import DeSTA25Config
from .qformer import qformer_connector_apply
from .whisper import whisper_encoder_apply


def perception_apply(params, mel: jnp.ndarray, config: DeSTA25Config,
                     w8a8: bool = False,
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """mel: [N, 3000, n_mels] (NWC).

    Returns (audio_tokens [N, K, d_llm], local_tokens or None).
    K = prompt_size (qformer) or orca_global_num_tokens (orca).
    w8a8: inference-only dynamic-int8 connector K/V projections
    (models/qformer.py); the training step leaves it False.
    """
    enc_cfg = config.encoder_config
    _, taps = whisper_encoder_apply(
        params["whisper"]["encoder"], mel, enc_cfg,
        target_layer_ids=config.target_layer_ids)
    if config.connector_mode == "qformer_1":
        feats = qformer_connector_apply(params["connector"], taps, config,
                                        w8a8=w8a8)
        return feats, None
    elif config.connector_mode == "orca_hybrid":
        from .orca import orca_connector_apply
        global_tokens, local_tokens = orca_connector_apply(
            params["connector"], taps, config)
        return global_tokens, local_tokens
    raise NotImplementedError(
        f"connector_mode {config.connector_mode!r} not implemented")
