"""KV-cached decode parity: cached single-frame logits and full rollouts must
match the uncached full-forward sampler exactly (temporal causality)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.model_zoo import genie_tiny
from tpu1x.models.sampler import (generate, generate_cached, maskgit_generate,
                                  maskgit_generate_cached)
from tpu1x.models.st_maskgit import STMaskGIT, update_cache


@pytest.fixture(scope="module",
                params=[True,
                        pytest.param(False, marks=pytest.mark.slow)],
                ids=["scan", "unrolled"])
def setup(request):
    # the unrolled variant re-traces every layer: heavy compiles, so it is
    # marked slow (run with `-m ""` or by default; deselect with `-m "not
    # slow"` for quick iterations)
    cfg = genie_tiny(T=4, scan_layers=request.param)
    model = STMaskGIT(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.T * cfg.S), dtype=jnp.int32)
    params = model.init(rng, dummy, dummy)["params"]

    def logits_fn(tokens_BTHW):
        return model.apply({"params": params}, tokens_BTHW,
                           method=STMaskGIT.compute_logits)

    def prefill_fn(tokens_BPHW):
        return model.apply({"params": params}, tokens_BPHW,
                           method=STMaskGIT.prefill)

    def decode_fn(frame_BS, t_B, cache):
        return model.apply({"params": params}, frame_BS, t_B, cache,
                           method=STMaskGIT.decode_frame)

    B = 2
    tokens = jax.random.randint(jax.random.PRNGKey(1),
                                (B, cfg.T, cfg.latent_side_len,
                                 cfg.latent_side_len),
                                0, cfg.image_vocab_size, dtype=jnp.int32)
    return cfg, logits_fn, prefill_fn, decode_fn, tokens


class TestCachedLogitsParity:
    def test_decode_frame_matches_full_forward(self, setup):
        """Cached logits for frame t == full forward logits at frame t, for
        every t, with frames >= t masked."""
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        cache = prefill_fn(tokens)  # all frames committed
        for t in range(1, cfg.T):
            masked = jnp.where(
                (jnp.arange(cfg.T) < t)[None, :, None, None], tokens,
                cfg.mask_token_id)
            full = logits_fn(masked)[:, t]  # (B, S, V, F)
            frame = jnp.full((B, cfg.S), cfg.mask_token_id, dtype=jnp.int32)
            got, _ = decode_fn(frame, jnp.full((B,), t, jnp.int32), cache)
            np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                       atol=1e-4, rtol=1e-3)

    def test_partially_unmasked_frame(self, setup):
        """Parity also with some current-frame tokens already committed."""
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        t = 2
        cache = prefill_fn(tokens[:, :t])
        frame = jnp.where(jnp.arange(cfg.S)[None, :] < 5,
                          tokens[:, t].reshape(B, cfg.S), cfg.mask_token_id)
        masked = jnp.where((jnp.arange(cfg.T) < t)[None, :, None, None],
                           tokens, cfg.mask_token_id)
        masked = masked.at[:, t].set(
            frame.reshape(B, cfg.latent_side_len, cfg.latent_side_len))
        full = logits_fn(masked)[:, t]
        got, _ = decode_fn(frame, jnp.full((B,), t, jnp.int32), cache)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   atol=1e-4, rtol=1e-3)

    def test_per_row_t(self, setup):
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        cache = prefill_fn(tokens)
        t_B = jnp.asarray([1, 3], dtype=jnp.int32)
        frame = jnp.full((B, cfg.S), cfg.mask_token_id, dtype=jnp.int32)
        got, _ = decode_fn(frame, t_B, cache)
        for b, t in enumerate([1, 3]):
            masked = jnp.where((jnp.arange(cfg.T) < t)[None, :, None, None],
                               tokens[b:b + 1], cfg.mask_token_id)
            full = logits_fn(masked)[0, t]
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(full),
                                       atol=1e-4, rtol=1e-3)


class TestCachedSamplerParity:
    @pytest.mark.parametrize("temperature,unmask_mode", [
        (0.0, "random"), (0.0, "greedy"), (1.0, "random")])
    def test_maskgit_generate_cached_matches(self, setup, temperature,
                                             unmask_mode):
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        t = 2
        rng = jax.random.PRNGKey(5)
        masked = jnp.where((jnp.arange(cfg.T) < t)[None, :, None, None],
                           tokens, cfg.mask_token_id)
        want, want_logits = maskgit_generate(
            logits_fn, masked, t, rng, cfg, maskgit_steps=3,
            temperature=temperature, unmask_mode=unmask_mode)
        cache = prefill_fn(tokens[:, :t])
        got, got_logits, _ = maskgit_generate_cached(
            decode_fn, cache, t, rng, cfg, maskgit_steps=3,
            temperature=temperature, unmask_mode=unmask_mode, batch_size=B)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(B, -1),
            np.asarray(want).reshape(B, -1))
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits), atol=1e-4,
                                   rtol=1e-3)

    @pytest.mark.parametrize("temperature", [0.0, 1.0])
    def test_generate_cached_matches(self, setup, temperature):
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        n_prompt = 2
        prompt = tokens[:, :n_prompt].reshape(B, -1)
        rng = jax.random.PRNGKey(9)
        want, want_logits = generate(logits_fn, prompt, cfg.T - n_prompt, rng,
                                     cfg, maskgit_steps=2,
                                     temperature=temperature)
        got, got_logits = generate_cached(prefill_fn, decode_fn, prompt,
                                          cfg.T - n_prompt, rng, cfg,
                                          maskgit_steps=2,
                                          temperature=temperature)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits), atol=1e-4,
                                   rtol=1e-3)

    def test_update_cache(self, setup):
        cfg, logits_fn, prefill_fn, decode_fn, tokens = setup
        B = tokens.shape[0]
        t = 2
        cache_partial = prefill_fn(tokens[:, :t])
        frame = tokens[:, t].reshape(B, cfg.S)
        _, kv_cur = decode_fn(frame, jnp.full((B,), t, jnp.int32),
                              cache_partial)
        committed = update_cache(cache_partial, kv_cur, t)
        cache_full = prefill_fn(tokens[:, :t + 1])
        # T-major cache (T, L, B, S, C): compare the committed slots
        np.testing.assert_allclose(
            np.asarray(committed["k"][:t + 1]),
            np.asarray(cache_full["k"][:t + 1]), atol=1e-4, rtol=1e-3)
