"""Tokenize CLI: raw video frames -> token dataset (video.bin contract).

The missing third leg of the tokenizer workflow (encode): the reference
ships only decode-for-visualization (visualize.py:95-120) and a Lightning
training_step; producing `video.bin` datasets was done offline. Here the
flax MAGVIT2 encoder + LFQ run as one jitted batched program:

    python -m tpu1x.tokenizer.tokenize --frames frames.npy \
        --tokenizer_ckpt ckpt_dir --output_dir data/my_tokens

Input: a .npy file of uint8 frames (N, H, W, 3) (or a directory of such
files, concatenated in sorted order; each file is treated as one segment
for `segment_ids.bin`). Output ids use the dataset bit convention —
`decode_tokens`/visualize round-trips them (tpu1x/tokenizer/lfq.py).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def encode_frames(model, params, frames_u8: np.ndarray, batch_size: int = 16
                  ) -> np.ndarray:
    """uint8 (N, H, W, 3) -> int32 token ids (N, h, w)."""
    import jax
    import jax.numpy as jnp

    from tpu1x.tokenizer.vqmodel import VQModel

    @jax.jit
    def enc(x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        res = model.apply({"params": params}, x, False,
                          method=VQModel.encode)
        return res.indices.astype(jnp.int32)

    out = []
    n = len(frames_u8)
    for lo in range(0, n, batch_size):
        chunk = frames_u8[lo:lo + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        ids = np.asarray(enc(jnp.asarray(chunk)))
        out.append(ids[:n - lo if pad else batch_size])
    return np.concatenate(out)


def load_frames(path) -> list:
    """Returns [(segment_name, uint8 array (N, H, W, 3)), ...]."""
    path = Path(path)
    if path.is_dir():
        files = sorted(p for p in path.iterdir() if p.suffix == ".npy")
        assert files, f"no .npy files under {path}"
        return [(p.stem, np.load(p)) for p in files]
    return [(path.stem, np.load(path))]


def main():
    p = argparse.ArgumentParser(
        description="Tokenize raw video frames into a video.bin dataset.")
    p.add_argument("--frames", type=str, required=True,
                   help=".npy of uint8 (N,H,W,3) frames, or a directory of "
                        "such files (one segment each)")
    p.add_argument("--tokenizer_ckpt", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--hz", type=float, default=30.0)
    args = p.parse_args()

    from tpu1x.data.token_store import write_token_dataset
    from tpu1x.tokenizer.checkpoint import load_tokenizer
    from tpu1x.tokenizer.vqmodel import VQModel

    params, config = load_tokenizer(args.tokenizer_ckpt)
    model = VQModel(config)

    all_ids = []
    segment_ids = []
    for seg, (name, frames) in enumerate(load_frames(args.frames)):
        assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
        ids = encode_frames(model, params, frames.astype(np.uint8),
                            args.batch_size)
        all_ids.append(ids)
        segment_ids.append(np.full(len(ids), seg, dtype=np.int32))
        print(f"segment {seg} ({name}): {len(ids)} frames -> "
              f"{ids.shape[1]}x{ids.shape[2]} tokens")

    tokens = np.concatenate(all_ids)
    write_token_dataset(args.output_dir, tokens, hz=args.hz,
                        vocab_size=config.codebook_size,
                        segment_ids=np.concatenate(segment_ids))
    print(f"wrote {len(tokens)} token frames to {args.output_dir}")


if __name__ == "__main__":
    main()
