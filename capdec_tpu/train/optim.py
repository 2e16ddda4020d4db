"""Optimizer: AdamW + linear warmup, with parameter freezing.

Reference contract (train.py:326-330): transformers.AdamW (eps 1e-6,
weight_decay 0, bias correction) at lr 2e-5 with
get_linear_schedule_with_warmup(5000, epochs * steps_per_epoch).

`only_prefix` (reference ClipCaptionPrefix, train.py:276-284) freezes
GPT-2; here that is an `optax.masked` transform over the pytree so frozen
params receive exactly zero updates inside the jitted step.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def linear_warmup_schedule(lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup: ramp 0→lr over warmup, then
    linear decay to 0 at total_steps (floored at 0)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return lr * jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return schedule


def linear_warmup_lr_py(lr: float, warmup_steps: int, total_steps: int,
                        step: int) -> float:
    """Pure-python twin of `linear_warmup_schedule` for host-side logging
    (calling the jnp schedule eagerly dispatches to the device per step)."""
    if step < warmup_steps:
        frac = step / max(1.0, warmup_steps)
    else:
        frac = (total_steps - step) / max(1.0, total_steps - warmup_steps)
    return lr * min(max(frac, 0.0), 1.0)


def make_optimizer(lr: float, warmup_steps: int, total_steps: int,
                   trainable_mask: Optional[Any] = None,
                   weight_decay: float = 0.0,
                   grad_clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(lr, warmup_steps, total_steps)
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-6,
                             weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        # Frozen leaves get hard-zero updates (optax.masked would pass raw
        # gradients through untouched, which is not freezing).
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
