"""Learning-rate schedules (optax-compatible).

Reference semantics: ``avssl/optim/scheduler.py:10-47`` — ``noam`` and
``linear_warmup_decay`` implemented as LambdaLR multipliers on the base lr.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["noam_schedule", "linear_warmup_decay_schedule", "get_schedule"]


def noam_schedule(base_lr: float, warmup: int = 4000):
    """lr(step) = base_lr * min((step+1)/warmup, sqrt(warmup/(step+1)))."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = (step + 1.0) / warmup
        decay = jnp.sqrt(warmup / (step + 1.0))
        return base_lr * jnp.where(step < warmup, warm, decay)

    return schedule


def linear_warmup_decay_schedule(
    base_lr: float,
    warmup: int = 4000,
    max_step: int = 1_000_000,
    final_lr: float = 1e-8,
):
    """Linear warmup to base_lr over ``warmup`` steps, then linear decay so
    that lr(max_step) == final_lr (reference ``scheduler.py:22-38``).

    Intent-over-quirk (PARITY.md): the reference's LambdaLR extrapolates
    NEGATIVE past max_step (`scheduler.py:33-36`) — harmless there because
    Lightning stops at trainer.max_steps == max_step, but a resumed run
    with extended trainer.max_steps would train with a negative lr and
    diverge (observed on the round-5 synthetic fit). The decay is floored
    at final_lr.
    """
    final_rate = final_lr / base_lr

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = (step + 1.0) / warmup
        decay = 1.0 - (1.0 - final_rate) * (step + 1.0 - warmup) / (max_step - warmup)
        decay = jnp.maximum(decay, final_rate)
        return base_lr * jnp.where(step < warmup, warm, decay)

    return schedule


def get_schedule(name: str, base_lr: float, **kwargs):
    if name == "noam":
        return noam_schedule(base_lr, **kwargs)
    if name == "linear_warmup_decay":
        return linear_warmup_decay_schedule(base_lr, **kwargs)
    raise NotImplementedError(f"Unknown lr scheduler {name}")
