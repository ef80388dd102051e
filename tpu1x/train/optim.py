"""Optimizer and LR schedule construction.

Behavioral contract matches the reference trainer (train.py:427-441, 468-492):
- AdamW with two parameter groups: weight decay applies to everything except
  biases (and LayerNorm scales — the reference's "layer_norm.weight" name
  filter never actually matches its `norm*` modules, but the *intent* is
  standard no-decay-on-norm; we implement the intent and document the
  difference. With the reference default weight_decay=0.0 this is moot.)
- Schedules: linear / cosine / constant / constant_with_warmup (HF
  `get_scheduler` semantics) and `custom_cosine` = warmup then cosine decay
  to 10% of peak (train.py:468-477).
- muP (MuAdamW): the learning rate of "matrix-like" hidden kernels is divided
  by width_mult = d_model / base_d_model; vector-like params and embeddings
  use the base lr (mup fork, requirements.txt:11).
- Global-norm grad clipping at max_grad_norm (train.py:628-629) and
  optax.MultiSteps for gradient accumulation (train.py:611-621).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import optax

from tpu1x.config import GenieConfig


def build_lr_schedule(name: str, learning_rate: float, num_warmup_steps: int,
                      num_training_steps: int) -> optax.Schedule:
    warmup = max(num_warmup_steps, 0)

    if name == "constant":
        return optax.constant_schedule(learning_rate)

    if name == "constant_with_warmup":
        if warmup == 0:
            return optax.constant_schedule(learning_rate)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup),
             optax.constant_schedule(learning_rate)], [warmup])

    if name == "linear":
        decay = optax.linear_schedule(
            learning_rate, 0.0, max(num_training_steps - warmup, 1))
        if warmup == 0:
            return decay
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup), decay], [warmup])

    if name in ("cosine", "custom_cosine"):
        # custom_cosine decays to 10% of peak (train.py:468-477); HF cosine to 0.
        end_ratio = 0.1 if name == "custom_cosine" else 0.0

        def schedule(step):
            import jax.numpy as jnp
            step = jnp.asarray(step, dtype=jnp.float32)
            warm_frac = (step + 1) / max(warmup, 1)
            remaining = max(num_training_steps - warmup, 1)
            progress = jnp.clip((step - warmup) / remaining, 0.0, 1.0)
            cos_mult = (1 + jnp.cos(jnp.pi * progress)) / 2 * (1 - end_ratio) + end_ratio
            return learning_rate * jnp.where(step < warmup, warm_frac, cos_mult)

        return schedule

    raise NotImplementedError(f"lr_scheduler_type={name}")


def _is_no_decay(path_str: str, shape) -> bool:
    """No weight decay for biases, norm scales, and other vector params."""
    if path_str.endswith("bias"):
        return True
    if "norm" in path_str.lower() and path_str.endswith("scale"):
        return True
    return len(shape) <= 1 and "embed" not in path_str.lower()


def _is_mup_matrix(path_str: str, shape) -> bool:
    """Hidden 'matrix-like' params whose fan-in scales with width.

    Embeddings and the readout are handled at forward time (FixedMuReadout)
    or use base lr; everything that maps d_model->d_model-ish is matrix-like.
    """
    if "embed" in path_str.lower() or "out_x_proj" in path_str:
        return False
    return path_str.endswith("kernel") and len(shape) >= 2


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def build_optimizer(
    config: GenieConfig,
    learning_rate: float,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    lr_scheduler_type: str = "constant",
    num_warmup_steps: int = 0,
    num_training_steps: int = 1,
    gradient_accumulation_steps: int = 1,
    mu_transfer: bool = False,
) -> optax.GradientTransformation:
    schedule = build_lr_schedule(lr_scheduler_type, learning_rate,
                                 num_warmup_steps, num_training_steps)

    def wd_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: not _is_no_decay(_path_str(p), x.shape), params)

    def adamw_with(lr_scale: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=lambda step: schedule(step) * lr_scale,
            b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=wd_mask)

    if mu_transfer and config.width_mult != 1.0:
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, x: "matrix" if _is_mup_matrix(_path_str(p), x.shape)
                else "vector", params)

        tx = optax.multi_transform(
            {"matrix": adamw_with(1.0 / config.width_mult),
             "vector": adamw_with(1.0)},
            labels)
    else:
        tx = adamw_with(1.0)

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    out = optax.chain(*chain)
    if gradient_accumulation_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=gradient_accumulation_steps)
    return out
