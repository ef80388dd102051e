"""Visualization: decode tokens to frames, export GIFs and comic grids.

Behavioral contract matches the reference `visualize.py:27-210`:
- `decode_latents_wrapper`: tokens (N, h, w) -> list/array of uint8 frames
  via the MAGVIT2 decoder in bf16, batched (ref: 95-120) — including the
  bit-order handling (the reference's `get_codebook_entry(...).flip(1)`,
  ref: 115, is our dataset-order `codebook_entry`).
- `export_to_gif` at 2 fps (ref: 62-72).
- Comic PNG grid with Prompt / Generated / Ground-truth captions driven by
  `metadata.json` keys written by generate.py (ref: 149-206).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np


def decode_latents_wrapper(ckpt_path: Optional[str] = None, batch_size: int = 16,
                           config=None) -> Callable:
    """Build a tokens->frames decoder around the flax MAGVIT2 VQModel.

    Args:
        ckpt_path: tokenizer checkpoint (tpu1x format via
            tpu1x.tokenizer.checkpoint, or a converted reference
            magvit2.ckpt). None -> randomly initialized decoder (smoke only).
    Returns fn: (N, h, w) int ids -> (N, H, W, 3) uint8 frames.
    """
    import jax
    import jax.numpy as jnp

    from tpu1x.config import VQConfig
    from tpu1x.tokenizer.vqmodel import VQModel, rescale_magvit_output

    if config is None:
        config = VQConfig()
    model = VQModel(config)

    if ckpt_path is not None:
        from tpu1x.tokenizer.checkpoint import load_tokenizer
        params, config = load_tokenizer(ckpt_path)
        model = VQModel(config)
    else:
        import warnings
        warnings.warn(
            "decode_latents_wrapper: no tokenizer checkpoint given — decoding "
            "with RANDOMLY INITIALIZED weights; frames (and any LPIPS "
            "computed from them) are garbage. Pass ckpt_path for real output.",
            stacklevel=2)
        h = 16
        dummy = jnp.zeros((1, h, h), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), dummy,
                            method=VQModel.decode_tokens)["params"]

    @jax.jit
    def decode(ids):
        return rescale_magvit_output(
            model.apply({"params": params}, ids, method=VQModel.decode_tokens))

    def wrapper(ids_NHW) -> np.ndarray:
        ids_NHW = np.asarray(ids_NHW, dtype=np.int32)
        out = []
        for lo in range(0, len(ids_NHW), batch_size):
            chunk = ids_NHW[lo:lo + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            frames = np.asarray(decode(jnp.asarray(chunk)))
            out.append(frames[:len(ids_NHW[lo:lo + batch_size])])
        return np.concatenate(out)

    return wrapper


def export_to_gif(frames: List[np.ndarray], output_path, fps: int = 2) -> None:
    """(reference: visualize.py:62-72)."""
    from PIL import Image
    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    imgs[0].save(str(output_path), save_all=True, append_images=imgs[1:],
                 duration=1000 // fps, loop=0)


def caption_image(img: np.ndarray, text: str) -> np.ndarray:
    """Add a caption strip above a frame (reference: visualize.py:124-140)."""
    from PIL import Image, ImageDraw
    im = Image.fromarray(img)
    strip = Image.new("RGB", (im.width, 24), (255, 255, 255))
    draw = ImageDraw.Draw(strip)
    draw.text((4, 4), text, fill=(0, 0, 0))
    out = Image.new("RGB", (im.width, im.height + 24))
    out.paste(strip, (0, 0))
    out.paste(im, (0, 24))
    return np.asarray(out)


def caption_for_frame(i: int, num_prompt_frames: int, window_size: int) -> str:
    """Caption of frame i of a generate.py stream
    `[prompt | predicted | ground truth]` (reference: visualize.py:162-176)."""
    if i < num_prompt_frames:
        return "Prompt"
    if i < window_size:
        return "Generated"
    return "Ground truth"


def make_comic(frames: np.ndarray, num_prompt_frames: int, window_size: int
               ) -> np.ndarray:
    """Two-row grid PNG from a generate.py stream
    `[prompt (P) | predicted (W-P) | ground truth (W-P)]` (generate.py:97-103):
    top row = Prompt + Generated, bottom row = Prompt + Ground truth, with
    ground-truth frame i placed at column i - W + P — the reference's comic
    layout (visualize.py:185-199)."""
    P, W = num_prompt_frames, window_size
    n = len(frames)
    top, bot = [], []
    for i in range(min(P, n)):
        top.append(caption_image(frames[i], "Prompt"))
        bot.append(caption_image(frames[i], "Prompt"))
    for i in range(P, min(W, n)):
        # same label set as the GIF path (caption_for_frame)
        top.append(caption_image(frames[i], caption_for_frame(i, P, W)))
    for i in range(W, n):
        bot.append(caption_image(frames[i], "Ground truth"))
    blank = caption_image(np.full_like(frames[0], 255), "")
    while len(bot) < len(top):
        bot.append(blank)
    while len(top) < len(bot):
        top.append(blank)
    return np.concatenate([np.concatenate(top, axis=1),
                           np.concatenate(bot, axis=1)], axis=0)


def main():
    p = argparse.ArgumentParser(description="Visualize generated tokens.")
    p.add_argument("--token_dir", type=str, required=True,
                   help="Directory with video.bin/metadata.json "
                        "(e.g. generate.py output)")
    p.add_argument("--output_prefix", type=str, default=None)
    p.add_argument("--tokenizer_ckpt", type=str, default=None)
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--max_images", type=int, default=None)
    args = p.parse_args()

    from tpu1x.data.token_store import RawTokenDataset
    ds = RawTokenDataset(args.token_dir, window_size=1, filter_interrupts=False)
    ids = np.asarray(ds.data[:args.max_images]).astype(np.int32)

    decode = decode_latents_wrapper(ckpt_path=args.tokenizer_ckpt)
    frames = decode(ids)

    prefix = args.output_prefix or str(Path(args.token_dir) / "vis")
    meta = ds.metadata
    # generate.py populates these keys; ground-truth-only datasets do not
    # (reference: visualize.py:161-177)
    is_generated = ("num_prompt_frames" in meta and "window_size" in meta)
    if is_generated:
        P, W = meta["num_prompt_frames"], meta["window_size"]
        gif_frames = [caption_image(f, caption_for_frame(i, P, W))
                      for i, f in enumerate(frames)]
    else:
        gif_frames = list(frames)  # ground truth stays uncaptioned
    export_to_gif(gif_frames, f"{prefix}.gif", fps=args.fps)
    if is_generated:
        from PIL import Image
        comic = make_comic(frames, meta["num_prompt_frames"],
                           meta["window_size"])
        Image.fromarray(comic).save(f"{prefix}_comic.png")
    print(f"wrote {prefix}.gif")


if __name__ == "__main__":
    main()
