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


def build_tokenizer_optimizer(learning_rate: float,
                              beta1: float = 0.5, beta2: float = 0.9,
                              scheduler_type: str = "none",
                              warmup_steps: int = 0,
                              training_steps: int = 0,
                              min_learning_rate: float = 0.0,
                              grad_accum_steps: int = 1):
    """One tokenizer optimizer matching the reference's configure_optimizers
    semantics (magvit2/models/lfqgan.py:211-243 + the accumulation gate at
    lfqgan.py:161-180): Adam(betas) x an LR-multiplier schedule that advances
    once per *update* (not per micro-batch), wrapped in optax.MultiSteps so
    params change only every `grad_accum_steps` calls (grads averaged across
    the window, matching loss-mean accumulation).

    scheduler_type: "none" | "linear-warmup" | "linear-warmup_cosine-decay"
    (the reference's names, lfqgan.py:227-238).
    """
    import optax

    if scheduler_type in ("none", "None"):
        lr = learning_rate
    elif scheduler_type == "linear-warmup":
        mult = linear_warmup(warmup_steps)
        lr = lambda step: learning_rate * mult(step)  # noqa: E731
    elif scheduler_type == "linear-warmup_cosine-decay":
        mult = linear_warmup_cosine_decay(
            warmup_steps, training_steps,
            multiplier_min=min_learning_rate / learning_rate)
        lr = lambda step: learning_rate * mult(step)  # noqa: E731
    else:
        raise ValueError(f"unknown scheduler_type {scheduler_type!r}")

    tx = optax.adam(lr, b1=beta1, b2=beta2)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
