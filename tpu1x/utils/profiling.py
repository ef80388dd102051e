"""Tracing/profiling utilities (SURVEY.md §5.1).

The reference has manual timing only (per-frame gen/dec time, batch_time,
analytic FLOPs — evaluate.py:172-186, train.py:543-544, 643-656). Here:
- `profile_trace`: context manager wiring `jax.profiler` traces viewable in
  TensorBoard/XProf.
- `Stopwatch`: dispatch-aware timing (block_until_ready) for steady-state
  kernel measurement.
- analytic FLOPs helpers for both training (6*N*D) and MaskGIT generation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, with_perfetto: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Measure steady-state time of a jitted callable."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *args, warmup: int = 1, iters: int = 10, **kw) -> float:
        out = None
        for _ in range(warmup):
            out = self.fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self.fn(*args, **kw)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters


def training_flops(num_params: int, tokens: int) -> int:
    """6*N*D per update step (reference train.py:543-544)."""
    return 6 * num_params * tokens


def generation_flops(num_params: int, batch: int, seq_tokens: int,
                     num_frames: int, maskgit_steps: int) -> int:
    """Forward FLOPs of a MaskGIT rollout: one full forward (2*N per token)
    per frame per maskgit step."""
    return 2 * num_params * batch * seq_tokens * num_frames * maskgit_steps


def device_peak_flops(dtype: str = "bfloat16") -> Optional[float]:
    """Best-effort peak FLOP/s of the attached device (for MFU reporting)."""
    peaks = {
        "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5": 459e12,
        "TPU v5p": 459e12, "TPU v6 lite": 918e12,
    }
    kind = jax.devices()[0].device_kind
    for name, flops in peaks.items():
        if kind.startswith(name):
            return flops
    return None
