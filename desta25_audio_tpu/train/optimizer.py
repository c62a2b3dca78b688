"""Optimizer + LR schedule.

Reference training uses HF ``TrainingArguments(optim="adafactor")`` with
lr 1e-4, warmup 5000, gradient clipping 1.0, and HF's default linear decay
(train_desta.py:133-162; desta25_*.yaml optim sections).  Here: optax
adafactor with the same schedule, gradient clipping, and
``optax.MultiSteps`` for gradient accumulation.  Optimizer state only ever
covers the trainable subtree (connector/LoRA/ORCA), so Adafactor's factored
second moments stay tiny next to the frozen 8B tower.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import optax


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    warmup_steps: int = 5000
    total_steps: int = 100_000
    schedule: str = "linear"  # "linear" | "constant" | "cosine"
    gradient_clip_val: float = 1.0
    accumulate_grad_batches: int = 1
    weight_decay: float = 0.0  # HF adafactor path ignores weight decay


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1))
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.schedule == "linear":
        decay = optax.linear_schedule(cfg.lr, 0.0, decay_steps)
    elif cfg.schedule == "cosine":
        decay = optax.cosine_decay_schedule(cfg.lr, decay_steps)
    else:
        decay = optax.constant_schedule(cfg.lr)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adafactor(
            learning_rate=schedule,
            multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
            weight_decay_rate=(cfg.weight_decay or None),
        ),
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx
