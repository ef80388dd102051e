"""Background batch prefetch: overlap host-side data loading + device_put
with device compute.

The reference overlaps via DataLoader worker processes (train.py:447,
num_workers=4); the TPU-native equivalent is a single background thread that
stays `depth` batches ahead, performing the memmap gather AND the
host->device transfer (`put_global_batch`) off the critical path. The main
loop then only dequeues ready-on-device arrays, so XLA dispatch can run
ahead and the device never idles on the loader.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax.numpy as jnp

from tpu1x.parallel.mesh import put_global_batch

_END = object()


class DevicePrefetcher:
    """Wrap an iterator of {"tokens": np, ["actions": np]} batches; yields
    (tokens_on_device, actions_on_device_or_None) ahead of consumption."""

    def __init__(self, batches: Iterator[dict], mesh, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._mesh = mesh
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(batches,), daemon=True)
        self._thread.start()

    def _worker(self, batches):
        try:
            for batch in batches:
                tokens = put_global_batch(jnp.asarray(batch["tokens"]),
                                          self._mesh)
                actions = None
                if "actions" in batch:
                    actions = put_global_batch(jnp.asarray(batch["actions"]),
                                               self._mesh)
                self._queue.put((tokens, actions))
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(_END)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is _END:
                if self._error is not None:
                    raise self._error
                return
            yield item
