"""Training-step throughput benchmark (examples/s, MFU).

Timing recipe for the tunneled dev chip: N steps inside one jitted
lax.scan, scalar fetch (see .claude/skills/verify/SKILL.md). On real
multi-chip hardware this also reports scaling across the mesh.

Usage: python benchmarks/train_bench.py [--model genie_35m] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="genie_35m")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--remat_policy", type=str, default=None,
                   choices=["none", "dots", "dots_no_batch", "attn_outs"],
                   help="default: the GenieConfig default (attn_outs)")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--gelu_tanh", action="store_true")
    args = p.parse_args()

    try:  # persistent compile cache (shared with bench.py)
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT, count_params
    from tpu1x.parallel.mesh import batch_sharding, make_mesh
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import (TrainState, create_train_state,
                                  make_train_step, shard_train_state)
    from tpu1x.utils.profiling import device_peak_flops, training_flops

    config = MODEL_ZOO[args.model]()
    if args.remat_policy is not None:
        config.remat_policy = args.remat_policy
    config.gelu_approx = args.gelu_tanh
    if args.no_remat:
        config.remat = False
    model = STMaskGIT(config)
    tx = build_optimizer(config, learning_rate=1e-4, num_training_steps=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), config)
    mesh = make_mesh(tp=args.tp)
    if jax.device_count() > 1:
        state, _ = shard_train_state(state, mesh)

    tokens = jax.random.randint(
        jax.random.PRNGKey(1),
        (args.batch, config.T, config.latent_side_len, config.latent_side_len),
        0, config.image_vocab_size, dtype=jnp.int32)
    if jax.device_count() > 1:
        tokens = jax.device_put(tokens, batch_sharding(mesh))

    step = make_train_step(model, tx, config, donate=False)

    # N steps inside one program; scalar fetch
    @jax.jit
    def run_n(state, tokens):
        def body(carry, _):
            st, _ = step(carry, tokens)  # jitted fn inlines under trace
            return st, None
        final, _ = jax.lax.scan(body, state, None, length=args.steps)
        leaf = jax.tree_util.tree_leaves(final.params)[0]
        return final.step, jnp.sum(leaf.astype(jnp.float32))

    s, chk = run_n(state, tokens)
    jax.device_get(chk)  # compile + settle
    t0 = time.perf_counter()
    s, chk = run_n(state, tokens)
    jax.device_get(chk)
    dt = (time.perf_counter() - t0) / args.steps

    n_params = count_params(state.params)
    flops = training_flops(n_params, args.batch * config.T * config.S)
    peak = device_peak_flops() or 0
    from tpu1x.model_zoo import CONFIG_SOURCE
    print(json.dumps({
        "metric": "train_step_time",
        "model": args.model,
        "params": n_params,
        "config_source": CONFIG_SOURCE.get(args.model, "custom"),
        "batch": args.batch,
        "value": round(dt, 4),
        "unit": "s/step",
        "examples_per_s": round(args.batch / dt, 2),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "mfu": round(flops / dt / peak, 3) if peak else None,
    }))


if __name__ == "__main__":
    main()
