"""Challenge-evaluator throughput (examples/s) on synthetic tokens.

Measures `GenieEvaluator.predict_zframe_logits` — all T-1 temporally
teacher-forced frame tasks x maskgit_steps per example (the challenge
protocol, reference evaluate.py:82-122) — through the serving engine on
TPU. The reference's implied rate on a 4090 is ~0.89 ex/s (15 frames x
0.075 s/frame, README.md:154).

Usage: python benchmarks/eval_bench.py [--model genie_138m] [--batch 16]
Prints ONE JSON line (same artifact shape as the other benches).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="genie_138m")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--maskgit_steps", type=int, default=2)
    p.add_argument("--rows_per_chunk", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # persistent compile cache (shared with bench.py)
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.eval.evaluate import GenieEvaluator
    from tpu1x.model_zoo import MODEL_ZOO
    from tpu1x.models.st_maskgit import STMaskGIT

    cfg = MODEL_ZOO[args.model]()
    model = STMaskGIT(cfg)
    dummy = jnp.zeros((1, cfg.T * cfg.S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    ev = GenieEvaluator(model, params, cfg, maskgit_steps=args.maskgit_steps,
                        rows_per_chunk=args.rows_per_chunk)
    B = args.batch
    tokens = np.random.RandomState(0).randint(
        0, cfg.image_vocab_size, (B, cfg.T * cfg.S)).astype(np.int32)

    # Device-side protocol: one jitted scan over all T-1 frame tasks, the
    # (B, V, F, T-1, h, w) step-0 logits consumed ON DEVICE (the serving
    # pattern computes the challenge CE there too). Fetching the ~250 MB
    # logits tensor is PCIe-trivial on a real host but dominates through
    # this dev tunnel's ~25 MB/s relay, so it is reported separately.
    tok_dev = jnp.asarray(tokens.reshape(B, cfg.T, cfg.latent_side_len,
                                         cfg.latent_side_len))

    def device_pass(rng):
        frames, flogits = ev._eval_all_frames_jit(ev.params, tok_dev, rng)
        return jnp.sum(frames), jnp.sum(flogits.astype(jnp.float32))

    chk = device_pass(jax.random.PRNGKey(1))
    jax.device_get(chk)  # warmup
    t0 = time.perf_counter()
    for i in range(args.iters):
        chk = device_pass(jax.random.PRNGKey(2 + i))
    jax.device_get(chk)
    dt_dev = (time.perf_counter() - t0) / args.iters

    # end-to-end CLI path: device-side CE/acc, ~250 KB fetched per batch
    # (the evaluate_dataset default since r5 — VERDICT r4 #3)
    ev.predict_metrics(tokens, jax.random.PRNGKey(8))  # warm
    t0 = time.perf_counter()
    for i in range(args.iters):
        s, loss_B, acc_B = ev.predict_metrics(tokens,
                                              jax.random.PRNGKey(9 + i))
    dt_e2e = (time.perf_counter() - t0) / args.iters

    # legacy full-logits fetch (only taken under --save_outputs_dir now)
    t0 = time.perf_counter()
    s, _ = ev.predict_zframe_logits(tokens, jax.random.PRNGKey(99))
    dt_host = time.perf_counter() - t0

    from tpu1x.model_zoo import CONFIG_SOURCE
    from tpu1x.models.st_maskgit import count_params
    print(json.dumps({
        "metric": "evaluator_throughput",
        "model": args.model,
        "params": count_params(ev.params),
        "config_source": CONFIG_SOURCE.get(args.model, "custom"),
        "batch": B,
        "maskgit_steps": args.maskgit_steps,
        "unit": "examples/s",
        "value": round(B / dt_e2e, 2),
        "examples_per_s_device_only": round(B / dt_dev, 2),
        "s_per_batch_device": round(dt_dev, 3),
        "s_per_batch_end_to_end": round(dt_e2e, 3),
        "examples_per_s_with_logits_fetch": round(B / dt_host, 2),
        "note": "value = end-to-end device-metrics path (the CLI default); "
                "logits-fetch number is relay-bound on the dev tunnel and "
                "only taken under --save_outputs_dir",
    }))


if __name__ == "__main__":
    main()
