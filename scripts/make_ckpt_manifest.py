"""Generate key/shape manifests of the reference checkpoint format.

The published DeSTA2.5 checkpoints save only trainable params
(reference modeling_desta25.py:1284-1292 ``state_dict``) under torch key
names like ``perception.connector.qformer.layer.0.attention.self.query.weight``
and ``orca_cross_attns.{i}.cross_attn.in_proj_weight``.  This script
instantiates the reference *connector* modules (offline-safe: they never
touch the HF hub) at the published configs and dumps ``{key: shape}``
JSON manifests.  ``tests/test_ckpt_manifest.py`` then asserts that our
``ckpt/desta_io.py`` export produces exactly those keys and shapes — so
converter key-name drift fails in CI long before real-weights day
(VERDICT r3 missing #4).

Run (needs /root/reference present — already done; manifests are
committed under tests/fixtures/):

    python scripts/make_ckpt_manifest.py
"""

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("DESTA_REFERENCE", "/root/reference")
OUT_DIR = os.path.join(REPO, "tests", "fixtures")


def _import_reference_classes():
    """Import the reference connector classes with unavailable deps stubbed
    (soundfile/lulutils are not in this image; the connectors don't use
    them)."""
    sys.path.insert(0, REFERENCE)
    audio_stub = types.ModuleType("desta.utils.audio")
    audio_stub.AudioSegment = object
    # pre-register the stub so `from desta.utils.audio import AudioSegment`
    # inside modeling_desta25 resolves without soundfile
    import importlib

    pkg = types.ModuleType("desta")
    pkg.__path__ = [os.path.join(REFERENCE, "desta")]
    sys.modules.setdefault("desta", pkg)
    utils_pkg = types.ModuleType("desta.utils")
    utils_pkg.__path__ = [os.path.join(REFERENCE, "desta", "utils")]
    sys.modules.setdefault("desta.utils", utils_pkg)
    sys.modules["desta.utils.audio"] = audio_stub
    models_pkg = types.ModuleType("desta.models")
    models_pkg.__path__ = [os.path.join(REFERENCE, "desta", "models")]
    sys.modules.setdefault("desta.models", models_pkg)
    mod = importlib.import_module("desta.models.modeling_desta25")
    return mod


def _duck_config(encoder_model_id: str, llm_hidden: int, llm_heads: int,
                 qformer_layers: int, prompt_size: int,
                 orca: bool) -> types.SimpleNamespace:
    from transformers import LlamaConfig, WhisperConfig

    enc = WhisperConfig(d_model=1280, encoder_attention_heads=20,
                        encoder_layers=32, num_mel_bins=128)
    llm = LlamaConfig(hidden_size=llm_hidden, num_attention_heads=llm_heads,
                      num_hidden_layers=32, rope_theta=500000.0)
    return types.SimpleNamespace(
        encoder_model_id=encoder_model_id,
        connector_mode="orca_hybrid" if orca else "qformer_1",
        qformer_num_hidden_layers=qformer_layers,
        prompt_size=prompt_size,
        encoder_config=enc,
        llm_config=llm,
        orca_use_all_layers=False,
        orca_global_num_tokens=4,
        orca_local_enabled=True,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
    )


def _shapes(module, prefix: str):
    return {f"{prefix}.{name}": list(p.shape)
            for name, p in module.named_parameters()}


def main():
    mod = _import_reference_classes()
    os.makedirs(OUT_DIR, exist_ok=True)

    import torch

    torch.manual_seed(0)

    # published DeSTA2.5-Audio-Llama-3.1-8B: whisper-large-v3 + qformer 6L
    # (examples/train/config/desta25_llama31-8B_Qformer6L.yaml)
    cfg = _duck_config("openai/whisper-large-v3", 4096, 32,
                       qformer_layers=6, prompt_size=64, orca=False)
    conn = mod.QformerConnector(cfg)
    manifest = _shapes(conn, "perception.connector")
    path = os.path.join(OUT_DIR, "ckpt_manifest_qformer6l_llama8b.json")
    json.dump(manifest, open(path, "w"), indent=1, sort_keys=True)
    print(f"{path}: {len(manifest)} keys")

    # ORCAHybrid 6L + deep injection over all 32 LLM layers
    # (examples/train/config/desta25_llama31-8B_ORCAHybrid.yaml; the
    # gated cross-attns save as orca_cross_attns.{i}.*,
    # modeling_desta25.py:1084-1098)
    cfg = _duck_config("openai/whisper-large-v3", 4096, 32,
                       qformer_layers=6, prompt_size=64, orca=True)
    conn = mod.ORCAHybridConnector(cfg)
    manifest = _shapes(conn, "perception.connector")
    for i in range(32):
        xa = mod.ORCAGatedCrossAttention(hidden_size=4096, num_heads=32,
                                         gate_init=0.1, rope_theta=500000.0,
                                         audio_position_scale=2.5)
        manifest.update(_shapes(xa, f"orca_cross_attns.{i}"))
    path = os.path.join(OUT_DIR, "ckpt_manifest_orca6l_llama8b.json")
    json.dump(manifest, open(path, "w"), indent=1, sort_keys=True)
    print(f"{path}: {len(manifest)} keys")


if __name__ == "__main__":
    main()
