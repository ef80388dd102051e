"""Native C++ token-store runtime vs numpy fallback parity."""

import numpy as np
import pytest

from tpu1x.data import native


@pytest.mark.skipif(not native.have_native(), reason="native lib unavailable")
class TestNativeParity:
    def test_build_window_index(self):
        seg = np.repeat(np.arange(5), 20).astype(np.int32)
        got = native.build_window_index(seg, 100, 7)
        starts = np.arange(93)
        want = starts[seg[starts] == seg[starts + 7]]
        np.testing.assert_array_equal(got, want)

    def test_build_window_index_no_segments(self):
        got = native.build_window_index(None, 50, 7)
        np.testing.assert_array_equal(got, np.arange(43))

    def test_filter_overlaps_matches_python(self):
        rng = np.random.RandomState(0)
        starts = np.sort(rng.choice(1000, 300, replace=False)).astype(np.int64)
        window, stride = 8, 3
        got = native.filter_overlaps(starts, window, stride, 1000)
        # python greedy reference (data.py:73-87 semantics)
        kept, kept_set = [], set()
        for s in starts.tolist():
            if kept_set.isdisjoint(s - i * stride for i in range(1, window)):
                kept.append(s)
                kept_set.add(s)
        np.testing.assert_array_equal(got, np.asarray(kept))

    @pytest.mark.parametrize("dtype", [np.uint16, np.uint32])
    def test_gather_windows(self, dtype):
        rng = np.random.RandomState(1)
        data = rng.randint(0, 60000, (64, 4, 4)).astype(dtype)
        starts = np.array([0, 5, 10, 31], dtype=np.int64)
        got = native.gather_windows(data, starts, T=8, stride=3)
        want = np.stack([data[s:s + 22:3].astype(np.int32) for s in starts])
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, want)
