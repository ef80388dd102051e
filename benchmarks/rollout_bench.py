"""Batched rollout throughput — the north-star workload (BASELINE.md).

Measures 16-frame MaskGIT rollouts/second at a given batch of candidate
futures (8 prompt -> 8 generated frames, KV-cached decode). The BASELINE
north-star is >=1000 rollouts/s on a v5p-16 pod; this reports single-chip
numbers that multiply across the mesh's data axis (rollouts are
embarrassingly parallel over chips).

Usage: python benchmarks/rollout_bench.py [--model genie_35m] [--batch 64]
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--maskgit_steps", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.sampler import generate_cached
    from tpu1x.models.st_maskgit import STMaskGIT

    config = MODEL_ZOO[args.model]()
    model = STMaskGIT(config)
    num_prompt = config.num_prompt_frames
    num_new = config.T - num_prompt

    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, num_prompt * config.S), 0,
        config.image_vocab_size, dtype=jnp.int32)

    @jax.jit
    def gen(params, prompt, rng):
        def prefill_fn(t):
            return model.apply({"params": params}, t, method=STMaskGIT.prefill)

        def decode_fn(f, t, c):
            return model.apply({"params": params}, f, t, c,
                               method=STMaskGIT.decode_frame)

        out, _ = generate_cached(prefill_fn, decode_fn, prompt, num_new, rng,
                                 config, maskgit_steps=args.maskgit_steps)
        return jnp.sum(out)  # scalar fetch

    chk = gen(params, prompt, jax.random.PRNGKey(2))
    jax.device_get(chk)
    t0 = time.perf_counter()
    for i in range(args.iters):
        chk = gen(params, prompt, jax.random.PRNGKey(3 + i))
    jax.device_get(chk)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "rollout_throughput",
        "model": args.model,
        "batch": args.batch,
        "unit": "rollouts/s",
        "value": round(args.batch / dt, 2),
        "s_per_rollout_batch": round(dt, 4),
        "s_per_frame_per_example": round(dt / (num_new * args.batch), 6),
    }))


if __name__ == "__main__":
    main()
