"""Orbax train-state checkpointing (trainable params + optimizer + step).

Replaces HF Trainer epoch checkpoints + resume (train_desta.py:145, :231):
- ``checkpoint-<step>/`` orbax dirs hold trainable params, Adafactor state
  and the step counter (frozen towers are never checkpointed — the
  reference's trainable-only economics, modeling_desta25.py:1284-1292);
- ``checkpoint-latest`` symlink supports sbatch-style auto-resume
  (ablation_sbatch/exp0_baseline.sbatch:36-44);
- each checkpoint also exports a reference-compatible
  ``model.safetensors`` + ``config.json`` so eval harnesses and the
  PyTorch reference can consume it directly.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_train_state(exp_dir: str, step: int, trainable: Dict[str, Any],
                     opt_state: Any, config=None, keep: int = 3):
    ocp = _ocp()
    path = os.path.abspath(os.path.join(exp_dir, f"checkpoint-{step}"))
    if os.path.exists(os.path.join(path, "state")):
        logger.info("checkpoint-%d already exists; skipping save", step)
        return path
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"),
                   {"trainable": trainable, "opt_state": opt_state,
                    "step": step})
    if config is not None:
        from .desta_io import save_trainable_safetensors
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config.to_json())
        save_trainable_safetensors(
            trainable, config, os.path.join(path, "model.safetensors"))
    latest = os.path.join(exp_dir, "checkpoint-latest")
    if os.path.islink(latest) or os.path.exists(latest):
        os.unlink(latest)
    os.symlink(path, latest)
    _gc_checkpoints(exp_dir, keep)
    logger.info("saved checkpoint-%d", step)
    return path


def _gc_checkpoints(exp_dir: str, keep: int):
    import re
    import shutil
    ckpts = []
    for name in os.listdir(exp_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    for _, name in sorted(ckpts)[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(exp_dir, name), ignore_errors=True)


def restore_train_state(path: str, trainable_template: Dict[str, Any],
                        opt_state_template: Any
                        ) -> Tuple[Dict[str, Any], Any, int]:
    """path: a checkpoint-* dir or exp_dir (uses checkpoint-latest)."""
    ocp = _ocp()
    if not os.path.basename(path).startswith("checkpoint-"):
        path = os.path.join(path, "checkpoint-latest")
    path = os.path.realpath(path)
    target = {"trainable": trainable_template,
              "opt_state": opt_state_template, "step": 0}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"), target)
    return restored["trainable"], restored["opt_state"], int(restored["step"])
