"""Settle the flash-attention question with data (VERDICT r1 #6).

Measures train-step time with `attn_impl` = "xla" vs "pallas" at
genie_35m / genie_138m on the real chip, using the tunneled-TPU timing
recipe (N steps inside one jit, scalar fetch). The winner decides what
`resolve_attn_impl("auto")` does.

Usage: python benchmarks/attn_bench.py [--model genie_35m] [--batch 16]
Prints one JSON line per impl.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def bench_impl(model_name: str, impl: str, batch: int, steps: int) -> float:
    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import create_train_state, make_train_step

    config = MODEL_ZOO[model_name]()
    config.attn_impl = impl
    model = STMaskGIT(config)
    tx = build_optimizer(config, learning_rate=1e-4, num_training_steps=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), config)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1),
        (batch, config.T, config.latent_side_len, config.latent_side_len),
        0, config.image_vocab_size, dtype=jnp.int32)
    step = make_train_step(model, tx, config, donate=False)

    @jax.jit
    def run_n(state, tokens):
        def body(carry, _):
            st, _ = step(carry, tokens)
            return st, None
        final, _ = jax.lax.scan(body, state, None, length=steps)
        leaf = jax.tree_util.tree_leaves(final.params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    jax.device_get(run_n(state, tokens))  # compile + settle
    t0 = time.perf_counter()
    jax.device_get(run_n(state, tokens))
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="genie_35m")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    results = {}
    for impl in ("xla", "pallas"):
        dt = bench_impl(args.model, impl, args.batch, args.steps)
        results[impl] = dt
        print(json.dumps({"metric": "train_step_time", "model": args.model,
                          "attn_impl": impl, "batch": args.batch,
                          "value": round(dt, 4), "unit": "s/step"}),
              flush=True)
    winner = min(results, key=results.get)
    print(json.dumps({"metric": "attn_impl_winner", "model": args.model,
                      "winner": winner,
                      "speedup": round(max(results.values())
                                       / min(results.values()), 3)}))


if __name__ == "__main__":
    main()
