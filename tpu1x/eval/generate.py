"""Generation CLI: autoregressive MaskGIT rollout of one (or more) examples.

Behavioral contract matches the reference `genie/generate.py:62-120`:
- Take example(s) from a token dataset, keep `num_prompt_frames` frames,
  generate the remaining frames frame-by-frame with MaskGIT.
- Write the token stream `[prompt | predicted | ground-truth]` to
  `output_dir/video.bin` with a merged `metadata.json` carrying
  `num_prompt_frames` / `window_size` for the visualizer
  (ref: generate.py:97-116).
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu1x.data.token_store import RawTokenDataset, write_token_dataset
from tpu1x.models.sampler import generate, generate_cached
from tpu1x.models.st_maskgit import STMaskGIT


def parse_args():
    p = argparse.ArgumentParser(description="Generate frames with a "
                                            "TPU-native GENIE model.")
    p.add_argument("--val_data_dir", type=str, default="data/val_v1.1")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--num_prompt_frames", type=int, default=8)
    p.add_argument("--window_size", type=int, default=16)
    p.add_argument("--stride", type=int, default=15)
    p.add_argument("--example_ind", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=1,
                   help="Generate this many consecutive examples at once "
                        "(the reference does one; batching is free on TPU).")
    p.add_argument("--maskgit_steps", type=int, default=2)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_kv_cache", action="store_true",
                   help="use the full-forward sampler instead of the "
                        "KV-cached decode path")
    return p.parse_args()


def main():
    args = parse_args()
    from tpu1x.eval.evaluate import load_model_checkpoint

    dataset = RawTokenDataset(args.val_data_dir, window_size=args.window_size,
                              stride=args.stride)
    # tpu1x save_pretrained dir, or a reference torch checkpoint dir
    params, config = load_model_checkpoint(args.checkpoint_dir)
    model = STMaskGIT(config)

    idx = np.arange(args.example_ind, args.example_ind + args.batch_size)
    tokens_BTHW = dataset.get_batch(idx)  # (B, T, H, W)
    B = tokens_BTHW.shape[0]
    S = config.S
    prompt = jnp.asarray(
        tokens_BTHW[:, :args.num_prompt_frames].reshape(B, -1))
    if jax.default_backend() == "tpu" and config.scan_layers:
        # bf16-cast matmul weights ONCE (like bench.py/RolloutEngine) so the
        # decode kernels stream bf16 q/kv blocks instead of re-casting fp32
        # per call
        from tpu1x.serving import prepare_serving_params
        params = prepare_serving_params(params)

    @jax.jit
    def gen_jit(params, prompt, rng):
        n_new = args.window_size - args.num_prompt_frames
        if args.no_kv_cache:
            def logits_fn(tokens_BTHW):
                return model.apply({"params": params}, tokens_BTHW,
                                   method=STMaskGIT.compute_logits)
            return generate(logits_fn, prompt, n_new, rng, config,
                            maskgit_steps=args.maskgit_steps,
                            temperature=args.temperature)

        if jax.default_backend() == "tpu" and config.scan_layers:
            # serving engine: fused-commit rollout with the Pallas decode
            # kernels (the bench.py path; token-exact vs generate_cached)
            import functools

            from tpu1x.models.sampler import generate_cached_fused
            from tpu1x.serving import DecodeEngine
            engine = DecodeEngine(config)
            return generate_cached_fused(
                functools.partial(engine.prefill, params),
                functools.partial(engine.decode_frame, params),
                functools.partial(engine.decode_frame_pair, params),
                prompt, n_new, rng, config,
                maskgit_steps=args.maskgit_steps,
                temperature=args.temperature)

        def prefill_fn(tokens_BPHW):
            return model.apply({"params": params}, tokens_BPHW,
                               method=STMaskGIT.prefill)

        def decode_fn(frame_BS, t_B, cache):
            return model.apply({"params": params}, frame_BS, t_B, cache,
                               method=STMaskGIT.decode_frame)

        return generate_cached(prefill_fn, decode_fn, prompt, n_new, rng,
                               config, maskgit_steps=args.maskgit_steps,
                               temperature=args.temperature)

    start = time.time()
    out_tokens, _ = gen_jit(params, prompt, jax.random.PRNGKey(args.seed))
    out_tokens = np.asarray(out_tokens)
    n_new = args.window_size - args.num_prompt_frames
    print(f"generated {B}x{n_new} frames in {time.time() - start:.2f}s")

    # [prompt | predicted | ground truth] frame stream (generate.py:97-116)
    h = config.latent_side_len
    pred_frames = out_tokens.reshape(B, args.window_size, h, h)
    gt_frames = tokens_BTHW
    stream = np.concatenate([pred_frames, gt_frames[:, args.num_prompt_frames:]],
                            axis=1).reshape(-1, h, h)

    write_token_dataset(
        args.output_dir, stream, hz=dataset.metadata.get("hz", 30) / args.stride,
        vocab_size=config.image_vocab_size,
        token_dtype=dataset.metadata.get("token_dtype", "uint32"),
        extra_metadata={
            "num_prompt_frames": args.num_prompt_frames,
            "window_size": args.window_size,
        })
    print(f"wrote {Path(args.output_dir) / 'video.bin'}")


if __name__ == "__main__":
    main()
