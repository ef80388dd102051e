"""Training/eval steps: one jit-compiled SPMD program over the mesh.

The reference's hot loop (train.py:600-727) — dataloader collator, forward,
DDP backward all-reduce, clip, AdamW step, metric reduce — becomes a single
`jax.jit` program: corruption runs on device, the gradient psum over the
"data" axis and any tensor-parallel collectives are inserted by XLA from the
sharding annotations, and metrics come back as replicated scalars
(SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu1x.config import GenieConfig
from tpu1x.data.corruption import maskgit_corrupt
from tpu1x.models.st_maskgit import STMaskGIT
from tpu1x.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from tpu1x.parallel.sharding import param_shardings


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray            # int32 scalar
    params: Any
    opt_state: Any
    rng: jax.Array               # folded per step for corruption/dropout


def create_train_state(model: STMaskGIT, tx: optax.GradientTransformation,
                       rng: jax.Array, config: GenieConfig) -> TrainState:
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    init_rng, state_rng = jax.random.split(rng)
    dummy_actions = (jnp.zeros((1, config.T), dtype=jnp.int32)
                     if config.action_vocab_size > 0 else None)
    variables = model.init(init_rng, dummy, dummy, dummy_actions)
    params = variables["params"]
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=state_rng)


def make_train_step(model: STMaskGIT, tx: optax.GradientTransformation,
                    config: GenieConfig,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (state, tokens_BTHW) -> (state, metrics)."""

    def train_step(state: TrainState, tokens_BTHW: jnp.ndarray,
                   actions_BT: jnp.ndarray = None
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(state.rng, state.step)
        batch = maskgit_corrupt(tokens_BTHW, step_rng, config)

        def loss_fn(params):
            out = model.apply({"params": params}, batch["input_ids"],
                              batch["labels"], actions_BT)
            return out["loss"], out["acc"]

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "acc": acc,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state, rng=state.rng)
        return new_state, metrics

    if donate and jax.default_backend() == "axon":
        # The axon (tunneled single-chip dev) backend deadlocks on the second
        # dispatch of a program with donated inputs; donation is purely a
        # memory optimization, so drop it there. Real TPU backends keep it.
        donate = False
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: STMaskGIT, config: GenieConfig) -> Callable:
    """Teacher-forced eval step: (params, tokens_BTHW, rng) -> metrics.

    Applies the same corruption distribution as training (the reference
    evaluates `model(**batch)` on collator output, train.py:672-689).
    """

    def eval_step(params, tokens_BTHW, rng):
        batch = maskgit_corrupt(tokens_BTHW, rng, config)
        out = model.apply({"params": params}, batch["input_ids"], batch["labels"])
        return {"loss": out["loss"], "acc": out["acc"]}

    return jax.jit(eval_step)


def shard_train_state(state: TrainState, mesh: Mesh, fsdp: bool = False
                      ) -> Tuple[TrainState, Any]:
    """Place a TrainState onto the mesh; returns (state, state_shardings)."""
    p_sh = param_shardings(state.params, mesh, fsdp=fsdp)
    rep = replicated(mesh)

    def opt_sharding(leaf):
        # Adam mu/nu mirror the param tree; anything param-shaped gets the
        # param's sharding, scalars replicate.
        return rep

    # Build opt_state shardings by structural match against params where possible.
    flat_params, treedef_p = jax.tree_util.tree_flatten(state.params)
    param_sh_flat = jax.tree_util.tree_leaves(p_sh)
    shape_to_sh = {}
    for arr, sh in zip(flat_params, param_sh_flat):
        shape_to_sh.setdefault((arr.shape, arr.dtype), sh)

    def match(leaf):
        return shape_to_sh.get((leaf.shape, leaf.dtype), rep)

    opt_sh = jax.tree_util.tree_map(match, state.opt_state)
    state_sh = TrainState(step=rep, params=p_sh, opt_state=opt_sh, rng=rep)
    placed = jax.device_put(state, state_sh)
    return placed, state_sh
