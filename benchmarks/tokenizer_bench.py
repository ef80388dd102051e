"""MAGVIT2 tokenizer throughput on TPU: encode / decode images/s + one
GAN train-step time (VERDICT r4 #8).

dec_time is part of the reference's eval protocol
(/root/reference/genie/evaluate.py:184-186: decode_latents inside the
metric loop); encode backs the `tpu1x.tokenizer.tokenize` CLI; the GAN
step is the lfqgan training loop. Timing recipe per
.claude/skills/verify/SKILL.md: N calls inside one device-side loop,
scalar checksum fetch.

Usage: python benchmarks/tokenizer_bench.py [--batches 16 64] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[16, 64])
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--train_batch", type=int, default=8)
    args = p.parse_args()

    try:
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.config import VQConfig
    from tpu1x.tokenizer.vqmodel import VQModel

    cfg = VQConfig(resolution=args.size)
    model = VQModel(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.size, args.size, 3))
    params = model.init(rng, dummy)["params"]
    # serving-style bf16 weights for the conv trunks (fp32 params are the
    # training layout); XLA convs accumulate fp32 on the MXU either way
    params_bf = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)

    results = []
    h = args.size // 16
    for B in args.batches:
        imgs = jax.random.uniform(jax.random.PRNGKey(1),
                                  (B, args.size, args.size, 3),
                                  jnp.bfloat16, -1.0, 1.0)
        ids = jax.random.randint(jax.random.PRNGKey(2), (B, h, h), 0,
                                 cfg.codebook_size, dtype=jnp.int32)

        @jax.jit
        def enc_n(p, x):
            def body(c, _):
                r = model.apply({"params": p}, x + c * 0, method=VQModel.encode)
                return c + 1, jnp.sum(r.indices)
            _, ys = jax.lax.scan(body, jnp.bfloat16(0), None,
                                 length=args.iters)
            return jnp.sum(ys)

        @jax.jit
        def dec_n(p, i):
            def body(c, _):
                f = model.apply({"params": p}, i + c * 0,
                                method=VQModel.decode_tokens)
                return c + 1, jnp.sum(f.astype(jnp.float32))
            _, ys = jax.lax.scan(body, jnp.int32(0), None, length=args.iters)
            return jnp.sum(ys)

        jax.device_get(enc_n(params_bf, imgs))  # compile
        t0 = time.perf_counter()
        jax.device_get(enc_n(params_bf, imgs))
        enc_dt = (time.perf_counter() - t0) / args.iters

        jax.device_get(dec_n(params_bf, ids))
        t0 = time.perf_counter()
        jax.device_get(dec_n(params_bf, ids))
        dec_dt = (time.perf_counter() - t0) / args.iters

        results.append({"batch": B,
                        "encode_images_per_s": round(B / enc_dt, 2),
                        "decode_images_per_s": round(B / dec_dt, 2),
                        "encode_s_per_batch": round(enc_dt, 4),
                        "decode_s_per_batch": round(dec_dt, 4)})
        print(f"B={B}: encode {B / enc_dt:.1f} img/s, "
              f"decode {B / dec_dt:.1f} img/s", flush=True)

    # one full GAN train step (gen + disc updates, random-weight LPIPS off:
    # the perceptual conv cost is dominated by the VGG trunk which needs
    # external weights; L1+GAN+entropy is the measured step)
    from tpu1x.tokenizer.schedulers import build_tokenizer_optimizer
    from tpu1x.tokenizer.train_tokenizer import (create_tokenizer_state,
                                                 make_tokenizer_train_step)
    gen_tx = build_tokenizer_optimizer(learning_rate=1e-4)
    disc_tx = build_tokenizer_optimizer(learning_rate=1e-4)
    state, m2, disc = create_tokenizer_state(cfg, gen_tx, disc_tx,
                                             jax.random.PRNGKey(3),
                                             image_size=args.size)
    step = make_tokenizer_train_step(m2, disc, gen_tx, disc_tx, cfg)
    batch = jax.random.uniform(jax.random.PRNGKey(4),
                               (args.train_batch, args.size, args.size, 3),
                               jnp.float32, -1.0, 1.0)
    state, metrics = step(state, batch)  # compile
    jax.device_get(metrics["loss"] if "loss" in metrics
                   else list(metrics.values())[0])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        state, metrics = step(state, batch)
    jax.device_get(list(metrics.values())[0])
    train_dt = (time.perf_counter() - t0) / n

    out = {"metric": "tokenizer_throughput",
           "unit": "images/s",
           "size": args.size,
           "value": results[0]["decode_images_per_s"],
           "sweep": results,
           "gan_train_step_s": round(train_dt, 4),
           "gan_train_batch": args.train_batch,
           "gan_train_images_per_s": round(args.train_batch / train_dt, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
