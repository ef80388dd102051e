"""ctypes bindings for the native token-store runtime (native/token_store.cc).

Auto-builds `libtoken_store.so` with `make` on first use if the toolchain is
available; all entry points have numpy fallbacks so the package works without
a compiler. `TPU1X_DISABLE_NATIVE=1` forces the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtoken_store.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPU1X_DISABLE_NATIVE") == "1":
        return None
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        return None

    lib.build_window_index.restype = ctypes.c_int64
    lib.build_window_index.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.filter_overlaps.restype = ctypes.c_int64
    lib.filter_overlaps.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p]
    lib.gather_windows.restype = None
    lib.gather_windows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def build_window_index(segment_ids: Optional[np.ndarray], num_frames: int,
                       video_len: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        starts = np.arange(num_frames - video_len, dtype=np.int64)
        if segment_ids is not None:
            seg = np.asarray(segment_ids)
            starts = starts[seg[starts] == seg[starts + video_len]]
        return starts
    out = np.empty(max(num_frames - video_len, 0), dtype=np.int64)
    seg_ptr = None
    seg_arr = None
    if segment_ids is not None:
        seg_arr = np.ascontiguousarray(segment_ids, dtype=np.int32)
        seg_ptr = seg_arr.ctypes.data_as(ctypes.c_void_p)
    n = lib.build_window_index(seg_ptr, num_frames, video_len,
                               out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].copy()


def filter_overlaps(starts: np.ndarray, window_size: int, stride: int,
                    num_frames: int) -> np.ndarray:
    lib = _load()
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    if lib is None:
        kept: list[int] = []
        kept_set: set[int] = set()
        for s in starts.tolist():
            if kept_set.isdisjoint(s - i * stride for i in range(1, window_size)):
                kept.append(s)
                kept_set.add(s)
        return np.asarray(kept, dtype=np.int64)
    out = np.empty_like(starts)
    n = lib.filter_overlaps(starts.ctypes.data_as(ctypes.c_void_p),
                            len(starts), window_size, stride, num_frames,
                            out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].copy()


def gather_windows(data: np.ndarray, starts: np.ndarray, T: int, stride: int,
                   num_threads: int = 8) -> np.ndarray:
    """data: memmap (num_frames, H, W); starts: (B,) -> (B, T, H, W) int32."""
    lib = _load()
    H, W = data.shape[1], data.shape[2]
    if lib is None:
        return np.stack([
            np.asarray(data[s:s + (T - 1) * stride + 1:stride]).astype(np.int32)
            for s in starts])
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    B = len(starts)
    out = np.empty((B, T, H, W), dtype=np.int32)
    itemsize = data.dtype.itemsize
    assert itemsize in (2, 4), data.dtype
    base = np.ascontiguousarray(data) if not isinstance(data, np.memmap) else data
    lib.gather_windows(
        ctypes.c_void_p(base.ctypes.data), H * W, stride, T,
        starts.ctypes.data_as(ctypes.c_void_p), B, itemsize, num_threads,
        out.ctypes.data_as(ctypes.c_void_p))
    return out
