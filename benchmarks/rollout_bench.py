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
    p.add_argument("--temperature", type=float, default=0.0,
                   help=">0 samples from softmax(logits) per factored "
                        "vocab (st_mask_git.py:183-187 semantics); the "
                        "north-star workload needs DIVERSE futures")
    p.add_argument("--num_futures", type=int, default=1,
                   help="K sampled futures per prompt (requires "
                        "temperature > 0 to differ)")
    p.add_argument("--cache_dtype", default="bf16",
                   choices=["bf16", "int8"],
                   help="serving KV-cache dtype (bf16 default, matching "
                        "bench.py; int8 halves cache bytes but measured "
                        "neutral at these shapes)")
    args = p.parse_args()
    if args.num_futures > 1 and args.temperature == 0.0:
        p.error("--num_futures > 1 with temperature 0 generates K identical "
                "futures — the reported rollouts/s would count duplicate "
                "work. Pass --temperature > 0 for diverse futures.")

    try:  # persistent compile cache (shared with bench.py)
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.parallel.mesh import make_mesh
    from tpu1x.rollout.engine import RolloutEngine

    config = MODEL_ZOO[args.model]()
    model = STMaskGIT(config)
    num_prompt = config.num_prompt_frames
    num_new = config.T - num_prompt

    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    prompt = jax.random.randint(
        jax.random.PRNGKey(1),
        (args.batch, num_prompt, config.latent_side_len,
         config.latent_side_len), 0,
        config.image_vocab_size, dtype=jnp.int32)

    mesh = make_mesh() if jax.device_count() > 1 else None
    engine = RolloutEngine(model, params, config, mesh=mesh,
                           maskgit_steps=args.maskgit_steps,
                           temperature=args.temperature,
                           cache_dtype=args.cache_dtype)

    def gen(rng):
        out = engine.rollout(prompt, num_new, rng,
                             num_futures=args.num_futures)
        return jnp.sum(out)  # scalar fetch

    chk = gen(jax.random.PRNGKey(2))
    jax.device_get(chk)
    t0 = time.perf_counter()
    for i in range(args.iters):
        chk = gen(jax.random.PRNGKey(3 + i))
    jax.device_get(chk)
    dt = (time.perf_counter() - t0) / args.iters

    from tpu1x.model_zoo import CONFIG_SOURCE
    from tpu1x.models.st_maskgit import count_params

    n_rollouts = args.batch * args.num_futures
    result = {
        "metric": "rollout_throughput",
        "model": args.model,
        "params": count_params(params),
        "config_source": CONFIG_SOURCE.get(args.model, "custom"),
        "batch": args.batch,
        "num_futures": args.num_futures,
        "temperature": args.temperature,
        "unit": "rollouts/s",
        "value": round(n_rollouts / dt, 2),
        "s_per_rollout_batch": round(dt, 4),
        "s_per_frame_per_example": round(dt / (num_new * n_rollouts), 6),
    }
    if args.temperature > 0 and args.num_futures > 1:
        # diversity check: distinct futures per prompt must actually differ
        outs = engine.rollout(prompt, num_new,
                              jax.random.PRNGKey(99),
                              num_futures=args.num_futures)
        gen_part = jnp.asarray(outs)[:, :, -num_new:]
        diff = (gen_part[:, :1] != gen_part[:, 1:]).mean()
        result["future_token_diversity"] = round(float(diff), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
