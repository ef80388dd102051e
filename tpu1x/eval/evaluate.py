"""Temporally teacher-forced evaluator — the challenge protocol.

Behavioral contract matches the reference `genie/evaluate.py`:
- For each frame t in [1, T): condition on ground-truth frames < t,
  MaskGIT-decode frame t; collect per-frame samples and *step-0* factored
  logits (ref: 82-122).
- Metrics: challenge CE (`compute_loss`), exact-token accuracy, per-frame
  generation/decode timing, LPIPS on decoded frames (ref: 167-191).

TPU-first redesign (SURVEY.md §7.7): the T-1 frame tasks of an example are
independent given ground truth, so instead of the reference's Python loop
((T-1) x maskgit_steps sequential forwards), each eval example expands into
T-1 batch *rows* with a per-row out_t, and one batched `maskgit_generate`
call decodes every frame of every example in maskgit_steps forwards total.
Rows are chunked to bound activation memory; the whole evaluator is a single
jitted program per chunk and shards rows across the mesh's devices.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu1x.config import GenieConfig
from tpu1x.data.token_store import RawTokenDataset
from tpu1x.eval.metrics import AvgMetric, compute_loss, token_accuracy
from tpu1x.models.sampler import maskgit_generate, maskgit_generate_cached
from tpu1x.models.st_maskgit import STMaskGIT


class GenieEvaluator:
    """Batched teacher-forced evaluator (reference: evaluate.py:69-142).

    Default path is KV-cached: ground truth is prefilled once per batch and
    every frame task decodes only its own S tokens per MaskGIT step —
    ~(1 + (T-1)*steps/T) forward-equivalents per example vs the reference's
    (T-1)*steps full forwards (evaluate.py:107-119). `use_cache=False`
    switches to parallel batch-row full forwards (the parity oracle).
    """

    def __init__(self, model: STMaskGIT, params, config: GenieConfig,
                 maskgit_steps: int = 2, temperature: float = 0.0,
                 rows_per_chunk: int = 64, use_cache: bool = True,
                 use_serving: Optional[bool] = None):
        self.model = model
        self.params = params
        self.config = config
        self.maskgit_steps = maskgit_steps
        self.temperature = temperature
        self.rows_per_chunk = rows_per_chunk
        self.use_cache = use_cache
        # route decode through the serving DecodeEngine (scan layer loop +
        # fused Pallas decode kernels) — the RolloutEngine pattern. Default:
        # on when on TPU with scan-layout params. The flax path remains the
        # parity oracle (tests/test_evaluator.py).
        if use_serving is None:
            use_serving = (jax.default_backend() == "tpu"
                           and config.scan_layers)
        self._serving = None
        if use_cache and use_serving:
            from tpu1x.serving import DecodeEngine, prepare_serving_params
            self._serving = DecodeEngine(config)
            self.params = prepare_serving_params(params)
        else:
            # commit host (numpy) checkpoint leaves to the device ONCE —
            # numpy jit arguments are re-uploaded on every call
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)

        # params enter as jit arguments (closing over them would bake the
        # weights into the compiled program as constants — huge compiles)
        def _gen(params, tokens, out_t, rng):
            def logits_fn(tokens_BTHW):
                return model.apply({"params": params}, tokens_BTHW,
                                   method=STMaskGIT.compute_logits)
            return maskgit_generate(logits_fn, tokens, out_t, rng, config,
                                    maskgit_steps=maskgit_steps,
                                    temperature=temperature)

        self._gen_jit = jax.jit(_gen)

        def _eval_all_frames(params, tokens_BTHW, rng):
            B = tokens_BTHW.shape[0]

            if self._serving is not None:
                def decode_fn(frame_BS, t_B, cache):
                    return self._serving.decode_frame(params, frame_BS, t_B,
                                                      cache)
                cache = self._serving.prefill(params, tokens_BTHW)
            else:
                def decode_fn(frame_BS, t_B, cache):
                    return model.apply({"params": params}, frame_BS, t_B,
                                       cache, method=STMaskGIT.decode_frame)
                cache = model.apply({"params": params}, tokens_BTHW,
                                    method=STMaskGIT.prefill)

            def task(rng, t):
                rng, sub = jax.random.split(rng)
                frame, flogits, _ = maskgit_generate_cached(
                    decode_fn, cache, t, sub, config,
                    maskgit_steps=maskgit_steps, temperature=temperature,
                    batch_size=B)
                return rng, (frame, flogits)

            _, (frames, flogits) = jax.lax.scan(
                task, rng, jnp.arange(1, config.T, dtype=jnp.int32))
            return frames, flogits

        self._eval_all_frames_jit = jax.jit(_eval_all_frames)

        def _eval_metrics(params, tokens_BTHW, rng):
            """Device-side challenge metrics: CE/accuracy are scalar
            reductions, so compute them in the SAME jitted program and
            fetch per-example scalars — the (B, 512, 2, 15, 16, 16) logits
            tensor (~250 MB at B=16) never leaves the device. (VERDICT r4
            weak #3: the host-fetch path realized 0.28 ex/s over a dev
            tunnel and pays a pointless PCIe fetch on any host; reference
            computes CE on-accelerator too, eval_utils.py:44-77.)"""
            from tpu1x.models.factorization import factorize_labels
            cfg = self.config
            frames, flogits = _eval_all_frames(params, tokens_BTHW, rng)
            # frames: (T-1, B, S) int32; flogits: (T-1, B, V, F, h, w)
            labels = tokens_BTHW[:, 1:]                    # (B, T-1, h, w)
            fl = factorize_labels(labels, cfg.num_factored_vocabs,
                                  cfg.factored_vocab_size)  # (B,F,T-1,h,w)
            fl_t = jnp.moveaxis(fl, 2, 0)                   # (T-1,B,F,h,w)
            logp = jax.nn.log_softmax(flogits.astype(jnp.float32), axis=2)
            token_logp = jnp.take_along_axis(
                logp, fl_t[:, :, None], axis=2)[:, :, 0]    # (T-1,B,F,h,w)
            # reference semantics (eval_utils.py:44-77): sum over F, mean
            # over (T-1, h, w) -> per-example CE
            loss_B = -token_logp.sum(axis=2).mean(axis=(0, 2, 3))
            h = cfg.latent_side_len
            samples = jnp.moveaxis(frames, 1, 0).reshape(
                labels.shape[0], cfg.T - 1, h, h)           # (B,T-1,h,w)
            acc_B = (labels == samples).mean(axis=(1, 2, 3))
            return samples, loss_B, acc_B

        self._eval_metrics_jit = jax.jit(_eval_metrics)

    def predict_metrics(self, input_ids: np.ndarray, rng: jax.Array
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Device-side metrics path (KV-cached only): returns
        (samples (B,T-1,h,w) int32, per-example CE (B,), per-example acc
        (B,)) — fetches ~250 KB instead of the ~250 MB logits tensor."""
        assert self.use_cache, "device metrics require the KV-cached path"
        cfg = self.config
        T, h, w = cfg.T, cfg.latent_side_len, cfg.latent_side_len
        B = input_ids.shape[0]
        tokens = np.asarray(input_ids, dtype=np.int32).reshape(B, T, h, w)
        samples, loss_B, acc_B = self._eval_metrics_jit(
            self.params, jnp.asarray(tokens), rng)
        return np.asarray(samples), np.asarray(loss_B), np.asarray(acc_B)

    def predict_zframe_logits(self, input_ids: np.ndarray, rng: jax.Array
                              ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, T*H*W) tokens -> (samples (B,T-1,H,W), logits (B,V,F,T-1,H,W))."""
        cfg = self.config
        T, h, w = cfg.T, cfg.latent_side_len, cfg.latent_side_len
        B = input_ids.shape[0]
        tokens = np.asarray(input_ids, dtype=np.int32).reshape(B, T, h, w)
        if self.use_cache:
            frames, flogits = self._eval_all_frames_jit(
                self.params, jnp.asarray(tokens), rng)
            samples = np.asarray(frames).transpose(1, 0, 2).reshape(
                B, T - 1, h, w)
            # flogits: (T-1, B, V, F, h, w) -> (B, V, F, T-1, h, w)
            logits = np.asarray(flogits).transpose(1, 2, 3, 0, 4, 5)
            return samples, logits
        return self._predict_rows(tokens, rng)

    def _predict_rows(self, tokens: np.ndarray, rng: jax.Array
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Uncached path: all T-1 frame tasks as parallel batch rows."""
        cfg = self.config
        T, h, w = cfg.T, cfg.latent_side_len, cfg.latent_side_len
        B = tokens.shape[0]
        rows = np.repeat(tokens, T - 1, axis=0)  # (B*(T-1), T, h, w)
        out_t = np.tile(np.arange(1, T, dtype=np.int32), B)
        frame_idx = np.arange(T, dtype=np.int32)
        masked = np.where(frame_idx[None, :, None, None] < out_t[:, None, None, None],
                          rows, cfg.mask_token_id).astype(np.int32)

        n_rows = masked.shape[0]
        chunk = self.rows_per_chunk
        samples_rows = []
        logits_rows = []
        for lo in range(0, n_rows, chunk):
            hi = min(lo + chunk, n_rows)
            pad = chunk - (hi - lo)
            chunk_tokens = masked[lo:hi]
            chunk_out_t = out_t[lo:hi]
            if pad:
                chunk_tokens = np.concatenate(
                    [chunk_tokens, np.repeat(chunk_tokens[-1:], pad, axis=0)])
                chunk_out_t = np.concatenate(
                    [chunk_out_t, np.repeat(chunk_out_t[-1:], pad)])
            rng, sub = jax.random.split(rng)
            s, l = self._gen_jit(self.params, jnp.asarray(chunk_tokens),
                                 jnp.asarray(chunk_out_t), sub)
            samples_rows.append(np.asarray(s[:hi - lo]))
            logits_rows.append(np.asarray(l[:hi - lo]))

        samples = np.concatenate(samples_rows).reshape(B, T - 1, h, w)
        logits = np.concatenate(logits_rows)  # (B*(T-1), V, F, h, w)
        V, F = logits.shape[1], logits.shape[2]
        logits = logits.reshape(B, T - 1, V, F, h, w).transpose(0, 2, 3, 1, 4, 5)
        return samples, logits


def evaluate_dataset(
    evaluator: GenieEvaluator,
    dataset: RawTokenDataset,
    batch_size: int = 16,
    max_examples: Optional[int] = None,
    decode_latents: Optional[Callable] = None,
    lpips_fn: Optional[Callable] = None,
    save_outputs_dir: Optional[str] = None,
    seed: int = 42,
    verbose: bool = True,
) -> dict:
    """Evaluate the challenge metrics over a token dataset
    (reference: evaluate.py:145-204)."""
    cfg = evaluator.config
    rng = jax.random.PRNGKey(seed)
    metrics = {k: AvgMetric() for k in ("loss", "acc", "gen_time", "dec_time")}
    outputs = {k: [] for k in ("pred_logits", "gtruth_tokens", "pred_tokens",
                               "pred_frames", "gtruth_frames")}

    n = len(dataset) if max_examples is None else min(len(dataset), max_examples)
    for lo in range(0, n, batch_size):
        # the final partial batch is PADDED to batch_size (one compiled
        # shape) and every metric update is weighted by the real example
        # count — the reference evaluates the tail batch too
        # (evaluate.py:160-166, DataLoader drop_last=False)
        hi = min(lo + batch_size, n)
        real = hi - lo
        idx = np.arange(lo, hi)
        tokens_BTHW = dataset.get_batch(idx)
        if real < batch_size:
            pad = np.repeat(tokens_BTHW[-1:], batch_size - real, axis=0)
            tokens_padded = np.concatenate([tokens_BTHW, pad], axis=0)
        else:
            tokens_padded = tokens_BTHW
        input_ids = tokens_padded.reshape(batch_size, -1)

        # CE/acc are computed ON DEVICE (scalar fetch) unless the caller
        # asked for the raw logits — the (B, V, F, T-1, h, w) tensor is
        # ~250 MB/batch at GENIE shapes and fetching it dominated the
        # end-to-end rate (VERDICT r4 weak #3)
        device_metrics = evaluator.use_cache and save_outputs_dir is None
        rng, sub = jax.random.split(rng)
        start = time.time()
        if device_metrics:
            samples, loss_B, acc_B = evaluator.predict_metrics(input_ids, sub)
            samples = samples[:real]
        else:
            samples, factored_logits = evaluator.predict_zframe_logits(
                input_ids, sub)
            samples = samples[:real]
            factored_logits = factored_logits[:real]
        # normalize by REAL frames (consistent with dec_time below): the
        # padded tail rows' compute lands in the numerator, slightly
        # overstating the tail batch's per-frame time rather than
        # understating it
        metrics["gen_time"].update((time.time() - start) / ((cfg.T - 1) * real),
                                   real)

        if device_metrics:
            metrics["loss"].update_list(loss_B[:real])
            metrics["acc"].update_list(acc_B[:real])
        else:
            loss = compute_loss(input_ids[:real], factored_logits,
                                cfg.num_factored_vocabs,
                                cfg.factored_vocab_size)
            acc = token_accuracy(tokens_BTHW, samples)
            metrics["loss"].update(loss, real)
            metrics["acc"].update(acc, real)

        if decode_latents is not None:
            start = time.time()
            pred_frames = decode_latents(samples.reshape(-1, *samples.shape[2:]))
            pred_frames = pred_frames.reshape(real, cfg.T - 1,
                                              *pred_frames.shape[1:])
            metrics["dec_time"].update(
                (time.time() - start) / ((cfg.T - 1) * real), real)
            gtruth_frames = decode_latents(
                tokens_BTHW[:, 1:].reshape(-1, *samples.shape[2:]))
            gtruth_frames = gtruth_frames.reshape(real, cfg.T - 1,
                                                  *gtruth_frames.shape[1:])
            if lpips_fn is not None:
                metrics.setdefault("pred_lpips", AvgMetric()).update_list(
                    lpips_fn(gtruth_frames, pred_frames))
            if save_outputs_dir is not None:
                outputs["pred_frames"].append(pred_frames)
                outputs["gtruth_frames"].append(gtruth_frames)

        if save_outputs_dir is not None:
            outputs["pred_logits"].append(factored_logits)
            outputs["gtruth_tokens"].append(tokens_BTHW)
            outputs["pred_tokens"].append(samples)

        if verbose:
            print({k: round(v.mean(), 4) for k, v in metrics.items()
                   if v.count > 0})

    if save_outputs_dir is not None:
        from pathlib import Path
        out = Path(save_outputs_dir)
        out.mkdir(parents=True, exist_ok=True)
        for key, vals in outputs.items():
            if vals:
                np.save(out / f"{key}.npy", np.concatenate(vals, axis=0))

    results = {k: v.mean() for k, v in metrics.items() if v.count > 0}
    results["count"] = metrics["loss"].count  # examples actually evaluated
    return results


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate GENIE-style models "
                                            "(TPU-native).")
    p.add_argument("--val_data_dir", type=str, default="data/val_v1.1")
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="tpu1x save_pretrained dir, or a reference torch "
                        "checkpoint dir")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--maskgit_steps", type=int, default=2)
    p.add_argument("--temperature", type=float, default=0)
    p.add_argument("--save_outputs_dir", type=str)
    p.add_argument("--max_examples", type=int)
    p.add_argument("--window_size", type=int, default=16)
    p.add_argument("--stride", type=int, default=15)
    p.add_argument("--rows_per_chunk", type=int, default=64)
    p.add_argument("--no_kv_cache", action="store_true",
                   help="use the full-forward row-expansion path instead of "
                        "the KV-cached evaluator")
    p.add_argument("--tokenizer_ckpt", type=str, default=None,
                   help="Optional MAGVIT2 tokenizer checkpoint for frame "
                        "decode (enables LPIPS).")
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="LPIPS weights (lpips package .pth or msgpack); "
                        "'random' runs with random weights (smoke only).")
    return p.parse_args()


def load_model_checkpoint(checkpoint_dir):
    """Load a tpu1x save_pretrained dir, falling back to a reference torch
    checkpoint dir/file (model.safetensors / pytorch_model.bin + config.json,
    the format `STMaskGIT.from_pretrained` reads — st_mask_git.py:306-313)."""
    from pathlib import Path

    from tpu1x.train.checkpoint import (load_pretrained,
                                        load_torch_checkpoint)

    path = Path(checkpoint_dir)
    if (path / "params.msgpack").exists():
        params, config = load_pretrained(path)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        return params, config
    config = GenieConfig.from_pretrained(path / "config.json")
    return load_torch_checkpoint(path, config), config


def main():
    args = parse_args()

    dataset = RawTokenDataset(args.val_data_dir, window_size=args.window_size,
                              stride=args.stride, filter_overlaps=True)
    params, config = load_model_checkpoint(args.checkpoint_dir)
    model = STMaskGIT(config)

    decode_latents = lpips_fn = None
    if args.tokenizer_ckpt:
        from tpu1x.eval.metrics import make_lpips_fn
        from tpu1x.eval.visualize import decode_latents_wrapper
        decode_latents = decode_latents_wrapper(ckpt_path=args.tokenizer_ckpt)
        if args.lpips_ckpt:
            lpips_fn = make_lpips_fn(args.lpips_ckpt)

    evaluator = GenieEvaluator(model, params, config,
                               maskgit_steps=args.maskgit_steps,
                               temperature=args.temperature,
                               rows_per_chunk=args.rows_per_chunk,
                               use_cache=not args.no_kv_cache)
    results = evaluate_dataset(
        evaluator, dataset, batch_size=args.batch_size,
        max_examples=args.max_examples, decode_latents=decode_latents,
        lpips_fn=lpips_fn, save_outputs_dir=args.save_outputs_dir)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
