"""Profile one training step and print an op-family time breakdown.

The batch-size sweep (train_bench.py) shows throughput FLAT in batch at
GENIE_138M (7.5 ex/s at B=8 and B=16) — the step is not MXU-FLOP-bound, so
optimization must be driven by a device trace, not the 6ND accounting.
Reuses profile_gen.analyze's perfetto aggregation.

Usage: python benchmarks/profile_train.py [--model genie_138m] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="genie_138m")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat_policy", type=str, default=None,
                   help="default: the GenieConfig default (attn_outs)")
    p.add_argument("--gelu_tanh", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--logdir", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import create_train_state, make_train_step

    config = MODEL_ZOO[args.model]()
    if args.remat_policy is not None:
        config.remat_policy = args.remat_policy
    config.gelu_approx = args.gelu_tanh
    if args.no_remat:
        config.remat = False
    model = STMaskGIT(config)
    tx = build_optimizer(config, learning_rate=1e-4, num_training_steps=1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), config)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1),
        (args.batch, config.T, config.latent_side_len,
         config.latent_side_len), 0, config.image_vocab_size,
        dtype=jnp.int32)
    step = make_train_step(model, tx, config, donate=False)

    state, metrics = step(state, tokens)  # compile + warmup
    jax.device_get(metrics["loss"])

    logdir = args.logdir or tempfile.mkdtemp(prefix="tpu1x_train_prof_")
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    state, metrics = step(state, tokens)
    jax.device_get(metrics["loss"])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"steady-state wall: {wall:.3f} s/step", file=sys.stderr)

    from profile_gen import analyze
    print(f"trace in {logdir}")
    analyze(logdir)


if __name__ == "__main__":
    main()
