"""Headline benchmark: MaskGIT frame-generation latency on GENIE_138M.

Mirrors the reference's leaderboard metric — generation time in seconds per
frame, latents only, excluding token->image decode (README.md:154,165;
measured in evaluate.py:172-175 as elapsed / ((T-1) * batch)). Reference
GENIE_138M: 0.075 s/frame on an RTX 4090 at batch 16, maskgit_steps 2.

Prints ONE JSON line:
  {"metric": "gen_time_s_per_frame", "value": ..., "unit": "s/frame",
   "vs_baseline": baseline / value}
(vs_baseline > 1 means faster than the reference.)
"""

from __future__ import annotations

import functools
import json
import sys
import time

BASELINE_S_PER_FRAME = 0.075  # GENIE_138M on RTX 4090 (README.md:154)


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache makes repeated driver runs fast
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import functools

    from tpu1x.model_zoo import genie_138m
    from tpu1x.models.sampler import generate_cached_fused
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.serving import DecodeEngine, prepare_serving_params

    import os

    config = genie_138m()
    model = STMaskGIT(config)

    batch = 16
    num_prompt = 8
    num_new = config.T - num_prompt
    maskgit_steps = 2

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(rng, dummy, dummy)["params"]
    # Serving path: bf16 weights (cast once), lax.scan layer loop (fast
    # cold compile; the committed .jax_cache makes driver reruns warm),
    # fused Pallas decode-attention kernels (tpu1x/serving.py). The KV
    # cache dtype is selectable (int8 halves the bandwidth-bound stream).
    # bf16 cache default: int8 measured neutral-to-slightly-slower at this
    # shape (6.17 vs 6.04 ms/frame — decode is not cache-bandwidth-bound
    # here); it remains available for larger caches via TPU1X_CACHE_DTYPE.
    sparams = prepare_serving_params(params)
    engine = DecodeEngine(config,
                          cache_dtype=os.environ.get("TPU1X_CACHE_DTYPE",
                                                     "bf16"),
                          layers_mode=os.environ.get("TPU1X_LAYERS_MODE",
                                                     "scan"))

    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (batch, num_prompt * config.S), 0,
        config.image_vocab_size, dtype=jnp.int32)

    # params must be a jit ARGUMENT — closing over them would bake 138M
    # weights into the program as constants and explode compile time.
    @jax.jit
    def gen(sparams, prompt, rng):
        # fused-commit rollout: the cache-commit pass rides along with the
        # next frame's step-0 decode (token-exact vs generate_cached,
        # tests/test_serving.py)
        tokens, _ = generate_cached_fused(
            functools.partial(engine.prefill, sparams),
            functools.partial(engine.decode_frame, sparams),
            functools.partial(engine.decode_frame_pair, sparams),
            prompt, num_new, rng, config, maskgit_steps=maskgit_steps)
        # scalar checksum: the reference's gen-time protocol keeps tokens
        # on-device between frames (evaluate.py:172-175); fetching the 4 MB
        # token tensor through this dev tunnel's ~25 MB/s relay would tax
        # the measurement ~0.2 ms/frame of pure transfer
        return jnp.sum(tokens)

    # warmup / compile. NOTE: timing uses device_get, not block_until_ready —
    # the latter returns early on the tunneled axon backend.
    t0 = time.perf_counter()
    print(f"compiling ({jax.default_backend()})...", file=sys.stderr, flush=True)
    chk = gen(sparams, prompt, jax.random.PRNGKey(2))
    jax.device_get(chk)
    print(f"compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        chk = gen(sparams, prompt, jax.random.PRNGKey(3 + i))
    jax.device_get(chk)
    elapsed = time.perf_counter() - start

    frames = iters * num_new * batch
    s_per_frame = elapsed / frames
    from tpu1x.model_zoo import CONFIG_SOURCE
    from tpu1x.models.st_maskgit import count_params
    print(json.dumps({
        "metric": "gen_time_s_per_frame",
        "value": round(s_per_frame, 6),
        "unit": "s/frame",
        "vs_baseline": round(BASELINE_S_PER_FRAME / s_per_frame, 3),
        "params": count_params(params),
        "config_source": CONFIG_SOURCE["genie_138m"],
    }))


if __name__ == "__main__":
    main()
