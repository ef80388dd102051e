"""Memmap-backed raw token store.

Behavioral contract matches the reference `data.py:17-106` (RawTokenDataset):
- `video.bin` memmapped as (num_images, s, s) with dtype from
  `metadata.json["token_dtype"]` (default uint32); metadata keys
  `num_images, s, vocab_size, hz` (data.py:43-47).
- Sliding-window index of valid start frames with `stride`;
  `filter_interrupts` drops windows whose endpoints have different segment
  ids (`segment_ids.bin`, int32) (data.py:66-71); `filter_overlaps` keeps
  each frame in at most one example (data.py:73-87).
- Optional `actions.bin` (uint16 per frame) for action-conditioned rollouts —
  the reference acknowledges but comments this out (data.py:48); here it is a
  first-class optional field.

TPU-first: instead of per-example __getitem__ + a host collator, the store
serves whole batches as numpy arrays ((B, T, H, W) int32) for direct
device_put onto the mesh's data axis; all corruption/masking happens
on-device (tpu1x/data/corruption.py).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


class RawTokenDataset:
    """Sliding-window view over a memmapped token stream."""

    def __init__(
        self,
        data_dir,
        window_size: int,
        stride: int = 1,
        filter_interrupts: bool = True,
        filter_overlaps: bool = False,
    ):
        data_dir = Path(data_dir)
        with open(data_dir / "metadata.json") as f:
            self.metadata = json.load(f)

        s = self.metadata["s"]
        num_images = self.metadata["num_images"]
        token_dtype = np.dtype(self.metadata.get("token_dtype", "uint32"))
        self.data = np.memmap(data_dir / "video.bin", dtype=token_dtype, mode="r",
                              shape=(num_images, s, s))

        segment_path = data_dir / "segment_ids.bin"
        if segment_path.is_file():
            self.segment_ids = np.memmap(segment_path, dtype=np.int32, mode="r",
                                         shape=(num_images,))
        else:
            self.segment_ids = None
            if filter_interrupts:
                raise NotImplementedError(
                    "Cannot filter interrupted sequences without segment ids.")

        actions_path = data_dir / "actions.bin"
        if actions_path.is_file():
            self.actions = np.memmap(actions_path, dtype=np.uint16, mode="r",
                                     shape=(num_images,))
        else:
            self.actions = None

        self.window_size, self.stride = window_size, stride
        self.video_len = (window_size - 1) * stride

        from tpu1x.data import native
        starts = native.build_window_index(
            np.asarray(self.segment_ids) if (filter_interrupts and
                                             self.segment_ids is not None) else None,
            len(self.data), self.video_len)

        if filter_overlaps:
            starts = native.filter_overlaps(starts, window_size, stride,
                                            len(self.data))

        self.valid_start_inds = starts

    def __len__(self) -> int:
        return len(self.valid_start_inds)

    def __getitem__(self, idx: int) -> dict:
        """Single flattened example, reference-compatible (data.py:92-106)."""
        x = self.get_frames(int(self.valid_start_inds[idx])).reshape(-1)
        return {"input_ids": x, "labels": x.copy(),
                "attention_mask": np.ones_like(x)}

    def get_frames(self, start_ind: int) -> np.ndarray:
        """(T, H, W) int32 window starting at `start_ind`."""
        return np.asarray(
            self.data[start_ind:start_ind + self.video_len + 1:self.stride]
        ).astype(np.int32)

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        """(B, T, H, W) int32 batch of windows by dataset index.

        Uses the native multithreaded gather (native/token_store.cc) when
        available — the C++ replacement for the reference's DataLoader
        worker processes.
        """
        from tpu1x.data import native
        starts = self.valid_start_inds[np.asarray(indices)]
        return native.gather_windows(self.data, starts, self.window_size,
                                     self.stride)

    def get_action_batch(self, indices: np.ndarray) -> Optional[np.ndarray]:
        """(B, T) int32 action ids per frame, or None if no actions.bin."""
        if self.actions is None:
            return None
        out = []
        for i in np.asarray(indices):
            start = int(self.valid_start_inds[i])
            out.append(np.asarray(
                self.actions[start:start + self.video_len + 1:self.stride]
            ).astype(np.int32))
        return np.stack(out)


class ShardedBatchLoader:
    """Per-host sharded batch iterator — the TPU-native DDP-sampler analogue.

    Each host draws the index stream from the same seeded permutation and
    takes its `process_index` slice, so the global batch is partitioned
    across hosts without communication (SURVEY.md §5.8: "per-host sharded
    data loading replacing DDP samplers").
    """

    def __init__(self, dataset: RawTokenDataset, global_batch_size: int,
                 process_index: int = 0, process_count: int = 1,
                 seed: int = 0, shuffle: bool = True, drop_last: bool = True,
                 with_actions: bool = False):
        assert global_batch_size % process_count == 0
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // process_count
        self.process_index = process_index
        self.process_count = process_count
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.with_actions = with_actions

    def __len__(self) -> int:
        return len(self.dataset) // self.global_batch_size

    def epoch(self, epoch: int, start_batch: int = 0) -> Iterator[dict]:
        """Yield local batches; `start_batch` supports fast-forward on resume
        (the reference uses accelerate's skip_first_batches, train.py:604)."""
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(self.seed + epoch).permutation(n)
        else:
            order = np.arange(n)
        num_batches = n // self.global_batch_size if self.drop_last else \
            -(-n // self.global_batch_size)
        for b in range(start_batch, num_batches):
            sl = order[b * self.global_batch_size:(b + 1) * self.global_batch_size]
            local = sl[self.process_index::self.process_count]
            batch = {"tokens": self.dataset.get_batch(local)}
            if self.with_actions:
                actions = self.dataset.get_action_batch(local)
                if actions is not None:
                    batch["actions"] = actions
            yield batch


def write_token_dataset(data_dir, tokens_NHW: np.ndarray, hz: float = 2.0,
                        vocab_size: int = 262144, segment_ids: Optional[np.ndarray] = None,
                        token_dtype: str = "uint32", extra_metadata: Optional[dict] = None):
    """Write a `video.bin` + `metadata.json` (+ `segment_ids.bin`) directory.

    The exact on-disk contract of the reference dataset (data.py:39-47), used
    by generate.py-style outputs and by tests/benchmarks to fabricate data.
    """
    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    tokens_NHW = np.ascontiguousarray(tokens_NHW.astype(np.dtype(token_dtype)))
    tokens_NHW.tofile(data_dir / "video.bin")
    metadata = {
        "num_images": int(tokens_NHW.shape[0]),
        "s": int(tokens_NHW.shape[1]),
        "vocab_size": int(vocab_size),
        "hz": hz,
        "token_dtype": token_dtype,
    }
    if extra_metadata:
        metadata.update(extra_metadata)
    with open(data_dir / "metadata.json", "w") as f:
        json.dump(metadata, f)
    if segment_ids is not None:
        np.ascontiguousarray(segment_ids.astype(np.int32)).tofile(
            data_dir / "segment_ids.bin")
