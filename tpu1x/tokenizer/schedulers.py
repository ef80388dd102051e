"""Tokenizer LR schedules (reference: magvit2/modules/scheduler/lr_scheduler.py).

- linear warmup to 1x (Scheduler_LinearWarmup)
- linear warmup then cosine decay to a multiplier floor
  (Scheduler_LinearWarmup_CosineDecay)

Expressed as optax schedules returning LR *multipliers* (compose with a base
learning rate via optax.scale_by_schedule or multiply).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup(warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
    return schedule


def linear_warmup_cosine_decay(warmup_steps: int, max_decay_steps: int,
                               multiplier_min: float = 0.0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps)
                            / jnp.maximum(max_decay_steps - warmup_steps, 1),
                            0.0, 1.0)
        cos_mult = multiplier_min + 0.5 * (1 - multiplier_min) \
            * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos_mult)
    return schedule
