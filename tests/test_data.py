"""Token store + corruption tests (reference contracts: data.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu1x.config import GenieConfig
from tpu1x.data.corruption import maskgit_corrupt
from tpu1x.data.token_store import (RawTokenDataset, ShardedBatchLoader,
                                    write_token_dataset)


@pytest.fixture()
def dataset_dir(tmp_path):
    rng = np.random.RandomState(0)
    n, s = 100, 4
    tokens = rng.randint(0, 64, (n, s, s)).astype(np.uint32)
    segment_ids = np.zeros(n, dtype=np.int32)
    segment_ids[40:] = 1  # one interrupt at frame 40
    write_token_dataset(tmp_path / "ds", tokens, vocab_size=64,
                        segment_ids=segment_ids)
    return tmp_path / "ds", tokens, segment_ids


class TestRawTokenDataset:
    def test_windows_and_getitem(self, dataset_dir):
        path, tokens, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        # video_len = 6; valid windows exclude those crossing frame 40
        ex = ds[0]
        start = int(ds.valid_start_inds[0])
        expected = tokens[start:start + 7:2].astype(np.int64).reshape(-1)
        np.testing.assert_array_equal(ex["input_ids"], expected)
        assert ex["labels"].shape == (4 * 4 * 4,)

    def test_filter_interrupts(self, dataset_dir):
        path, tokens, seg = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        for start in ds.valid_start_inds:
            assert seg[start] == seg[start + ds.video_len]
        # without filtering there are more windows
        ds_all = RawTokenDataset(path, window_size=4, stride=2,
                                 filter_interrupts=False)
        assert len(ds_all) > len(ds)

    def test_filter_overlaps(self, dataset_dir):
        path, _, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=1, filter_overlaps=True)
        # no two kept windows share a frame
        frames = set()
        for start in ds.valid_start_inds:
            window = {start + i for i in range(4)}
            assert frames.isdisjoint(window)
            frames |= window

    def test_get_batch(self, dataset_dir):
        path, _, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        batch = ds.get_batch(np.array([0, 1, 2]))
        assert batch.shape == (3, 4, 4, 4)
        assert batch.dtype == np.int32


class TestShardedBatchLoader:
    def test_sharding_partitions_batch(self, dataset_dir):
        path, _, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        loaders = [ShardedBatchLoader(ds, global_batch_size=8, process_index=i,
                                      process_count=2, seed=1) for i in range(2)]
        b0 = next(loaders[0].epoch(0))["tokens"]
        b1 = next(loaders[1].epoch(0))["tokens"]
        assert b0.shape == (4, 4, 4, 4) and b1.shape == (4, 4, 4, 4)
        assert not np.array_equal(b0, b1)

    def test_deterministic_epochs(self, dataset_dir):
        path, _, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        loader = ShardedBatchLoader(ds, global_batch_size=8, seed=1)
        a = [b["tokens"] for b in loader.epoch(0)]
        b = [b["tokens"] for b in loader.epoch(0)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        # different epoch reshuffles
        c = next(loader.epoch(1))["tokens"]
        assert not np.array_equal(a[0], c)

    def test_resume_fast_forward(self, dataset_dir):
        path, _, _ = dataset_dir
        ds = RawTokenDataset(path, window_size=4, stride=2)
        loader = ShardedBatchLoader(ds, global_batch_size=8, seed=1)
        full = [b["tokens"] for b in loader.epoch(0)]
        resumed = [b["tokens"] for b in loader.epoch(0, start_batch=1)]
        assert len(resumed) == len(full) - 1
        np.testing.assert_array_equal(full[1], resumed[0])


class TestMaskgitCorrupt:
    @pytest.fixture()
    def cfg(self):
        return GenieConfig(num_layers=1, num_heads=1, d_model=8, T=16, S=16,
                           image_vocab_size=262144, num_factored_vocabs=2,
                           num_prompt_frames=8)

    def test_contract(self, cfg):
        rng = jax.random.PRNGKey(0)
        tokens = jax.random.randint(rng, (4, cfg.T, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        for seed in range(5):
            out = maskgit_corrupt(tokens, jax.random.PRNGKey(seed), cfg)
            ids = np.asarray(out["input_ids"]).reshape(4, cfg.T, 16)
            labels = np.asarray(out["labels"])
            # labels are the clean tokens
            np.testing.assert_array_equal(labels,
                                          np.asarray(tokens).reshape(4, -1))
            # at least one mask token; frame 0 never masked
            assert (ids == cfg.mask_token_id).sum() > 0
            assert (ids[:, 0] != cfg.mask_token_id).all()
            # all ids valid (token or mask)
            assert ((ids <= cfg.mask_token_id) & (ids >= 0)).all()

    def test_deterministic_given_rng(self, cfg):
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.T, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        a = maskgit_corrupt(tokens, jax.random.PRNGKey(7), cfg)
        b = maskgit_corrupt(tokens, jax.random.PRNGKey(7), cfg)
        np.testing.assert_array_equal(np.asarray(a["input_ids"]),
                                      np.asarray(b["input_ids"]))

    def test_masking_rates_sane(self, cfg):
        """Across seeds, the mean masked fraction of frames 1.. should be
        substantial (cosine schedule has mean 2/pi over all seeds ~0.36+)."""
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, cfg.T, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        fracs = []
        for seed in range(20):
            out = maskgit_corrupt(tokens, jax.random.PRNGKey(seed), cfg)
            ids = np.asarray(out["input_ids"]).reshape(4, cfg.T, 16)
            fracs.append((ids[:, 1:] == cfg.mask_token_id).mean())
        mean_frac = np.mean(fracs)
        assert 0.1 < mean_frac < 0.9, mean_frac

    def test_corruption_changes_tokens(self, cfg):
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, cfg.T, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        out = maskgit_corrupt(tokens, jax.random.PRNGKey(11), cfg)
        ids = np.asarray(out["input_ids"])
        labels = np.asarray(out["labels"])
        non_mask = ids != cfg.mask_token_id
        # some unmasked tokens should have been corrupted in expectation over
        # seeds; just check the op runs and at least sometimes corrupts
        changed = (ids != labels) & non_mask
        # (may be 0 for some seeds if u01 tiny; use several seeds)
        total = 0
        for seed in range(5):
            o = maskgit_corrupt(tokens, jax.random.PRNGKey(seed), cfg)
            i = np.asarray(o["input_ids"])
            total += ((i != labels) & (i != cfg.mask_token_id)).sum()
        assert total > 0
