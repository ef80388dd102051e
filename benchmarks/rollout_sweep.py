"""Rollout scaling frontier: rollouts/s vs batch, both models, bf16 + int8
KV cache (VERDICT r4 #7) — the curve behind the v5p-16 north-star
projection (BASELINE.md; PARITY.md "North-star projection").

Each point: 16-frame rollouts (8 prompt -> 8 generated), KV-cached serving
engine, maskgit_steps=2 — the README.md:154 gen-time protocol. The HBM cap
bounds B (134 MB/example cache at 35M, 268 MB at 138M on a 16 GB v5e);
points that OOM at compile time are recorded as "oom".

Usage: python benchmarks/rollout_sweep.py [--out BENCH_ROLLOUT_r05.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure(model_name: str, batch: int, cache_dtype: str, iters: int = 3):
    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.rollout.engine import RolloutEngine

    config = MODEL_ZOO[model_name]()
    model = STMaskGIT(config)
    num_prompt = config.num_prompt_frames
    num_new = config.T - num_prompt
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    prompt = jax.random.randint(
        jax.random.PRNGKey(1),
        (batch, num_prompt, config.latent_side_len, config.latent_side_len),
        0, config.image_vocab_size, dtype=jnp.int32)
    engine = RolloutEngine(model, params, config, maskgit_steps=2,
                           cache_dtype=cache_dtype)

    def gen(rng):
        return jnp.sum(engine.rollout(prompt, num_new, rng))

    jax.device_get(gen(jax.random.PRNGKey(2)))  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        chk = gen(jax.random.PRNGKey(3 + i))
    jax.device_get(chk)
    dt = (time.perf_counter() - t0) / iters
    return {"model": model_name, "batch": batch, "cache_dtype": cache_dtype,
            "rollouts_per_s": round(batch / dt, 2),
            "s_per_frame_per_example": round(dt / (num_new * batch), 6)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--points", type=str, default=None,
                   help="comma list model:batch:dtype to override the grid")
    args = p.parse_args()

    try:
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if args.points:
        grid = []
        for tok in args.points.split(","):
            m, b, d = tok.split(":")
            grid.append((m, int(b), d))
    else:
        grid = ([("genie_35m", b, "bf16") for b in (16, 32, 64, 96)]
                + [("genie_35m", 96, "int8")]
                + [("genie_138m", b, "bf16") for b in (8, 16, 32)]
                + [("genie_138m", 32, "int8")])

    points = []
    for model, batch, dtype in grid:
        try:
            r = measure(model, batch, dtype, iters=args.iters)
        except Exception as e:  # XLA OOMs raise at compile time
            r = {"model": model, "batch": batch, "cache_dtype": dtype,
                 "rollouts_per_s": None,
                 "error": ("oom" if "RESOURCE_EXHAUSTED" in str(e)
                           or "memory" in str(e).lower() else str(e)[:200])}
        print(json.dumps(r), flush=True)
        points.append(r)

    from tpu1x.model_zoo import CONFIG_SOURCE
    out = {"metric": "rollout_scaling_frontier",
           "unit": "rollouts/s",
           "protocol": "8 prompt -> 8 generated frames, maskgit_steps=2, "
                       "KV-cached serving engine (README.md:154)",
           "config_source": {m: CONFIG_SOURCE[m]
                             for m in ("genie_35m", "genie_138m")},
           "points": points}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
