"""MaskGIT sampler tests: greedy semantics, masking invariants, batched out_t."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.config import GenieConfig
from tpu1x.models.sampler import generate, maskgit_generate
from tpu1x.models.st_maskgit import STMaskGIT


@pytest.fixture(scope="module")
def setup():
    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=16, T=4, S=16,
                      image_vocab_size=64, num_factored_vocabs=2, qk_norm=False,
                      use_mup=False, dtype="float32")
    model = STMaskGIT(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.T * cfg.S), dtype=jnp.int32)
    params = model.init(rng, dummy, dummy)

    def logits_fn(tokens_BTHW):
        return model.apply(params, tokens_BTHW, method=STMaskGIT.compute_logits)

    B = 2
    tokens = jax.random.randint(jax.random.PRNGKey(1),
                                (B, cfg.T, cfg.latent_side_len, cfg.latent_side_len),
                                0, cfg.image_vocab_size, dtype=jnp.int32)
    return cfg, logits_fn, tokens


def masked_from(tokens, t, mask_id):
    """Mask frames >= t (the evaluator's per-frame prompt construction)."""
    T = tokens.shape[1]
    keep = (jnp.arange(T) < t)[None, :, None, None]
    return jnp.where(keep, tokens, mask_id)


class TestMaskgitGenerate:
    def test_single_step_greedy_is_argmax(self, setup):
        cfg, logits_fn, tokens = setup
        prompt = masked_from(tokens, 1, cfg.mask_token_id)
        sample, flogits = maskgit_generate(logits_fn, prompt, 1,
                                           jax.random.PRNGKey(0), cfg,
                                           maskgit_steps=1, temperature=0.0)
        # With 1 step + greedy, the sample is the combined per-factor argmax.
        full = logits_fn(prompt)[:, 1]  # (B, S, V, F)
        digits = jnp.argmax(full, axis=-2)  # (B, S, F)
        expected = (digits[..., 0] + digits[..., 1] * cfg.factored_vocab_size)
        np.testing.assert_array_equal(
            np.asarray(sample).reshape(sample.shape[0], -1), np.asarray(expected))
        # Returned logits are the step-0 logits in (B, V, F, H, W) layout.
        assert flogits.shape == (2, cfg.factored_vocab_size, 2,
                                 cfg.latent_side_len, cfg.latent_side_len)
        np.testing.assert_allclose(
            np.asarray(flogits[0, :, :, 0, 1]), np.asarray(full[0, 1]), rtol=1e-6)

    def test_multi_step_invariants(self, setup):
        cfg, logits_fn, tokens = setup
        prompt = masked_from(tokens, 2, cfg.mask_token_id)
        sample, _ = maskgit_generate(logits_fn, prompt, 2, jax.random.PRNGKey(3),
                                     cfg, maskgit_steps=4, temperature=0.0)
        assert sample.shape == (2, cfg.latent_side_len, cfg.latent_side_len)
        # no mask tokens remain, all ids valid
        assert (np.asarray(sample) < cfg.image_vocab_size).all()
        assert (np.asarray(sample) >= 0).all()

    def test_step0_logits_stable_across_steps(self, setup):
        """The returned logits must be the step-0 logits regardless of steps."""
        cfg, logits_fn, tokens = setup
        prompt = masked_from(tokens, 1, cfg.mask_token_id)
        _, l1 = maskgit_generate(logits_fn, prompt, 1, jax.random.PRNGKey(0), cfg,
                                 maskgit_steps=1)
        _, l3 = maskgit_generate(logits_fn, prompt, 1, jax.random.PRNGKey(0), cfg,
                                 maskgit_steps=3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l3), rtol=1e-5)

    def test_batched_out_t_matches_scalar(self, setup):
        """Per-row out_t (the evaluator's parallel trick) == separate calls."""
        cfg, logits_fn, tokens = setup
        rows = []
        for t in (1, 2):
            prompt = masked_from(tokens[:1], t, cfg.mask_token_id)
            s, _ = maskgit_generate(logits_fn, prompt, t, jax.random.PRNGKey(7),
                                    cfg, maskgit_steps=1, temperature=0.0)
            rows.append(s)
        # batched: both tasks as rows of one batch
        batch_prompt = jnp.concatenate([
            masked_from(tokens[:1], 1, cfg.mask_token_id),
            masked_from(tokens[:1], 2, cfg.mask_token_id)], axis=0)
        s_b, _ = maskgit_generate(logits_fn, batch_prompt, jnp.array([1, 2]),
                                  jax.random.PRNGKey(7), cfg, maskgit_steps=1,
                                  temperature=0.0)
        np.testing.assert_array_equal(np.asarray(s_b[0]), np.asarray(rows[0][0]))
        np.testing.assert_array_equal(np.asarray(s_b[1]), np.asarray(rows[1][0]))

    def test_sampling_temperature_runs(self, setup):
        cfg, logits_fn, tokens = setup
        prompt = masked_from(tokens, 1, cfg.mask_token_id)
        s, _ = maskgit_generate(logits_fn, prompt, 1, jax.random.PRNGKey(0), cfg,
                                maskgit_steps=2, temperature=1.0)
        assert (np.asarray(s) < cfg.image_vocab_size).all()


class TestGenerate:
    def test_ar_rollout(self, setup):
        cfg, logits_fn, tokens = setup
        B = tokens.shape[0]
        n_prompt = 2
        prompt_flat = tokens[:, :n_prompt].reshape(B, -1)
        out, flogits = generate(logits_fn, prompt_flat, cfg.T - n_prompt,
                                jax.random.PRNGKey(0), cfg, maskgit_steps=2)
        assert out.shape == (B, cfg.T * cfg.S)
        assert flogits.shape == (B, cfg.factored_vocab_size, 2, cfg.T - n_prompt,
                                 cfg.latent_side_len, cfg.latent_side_len)
        # prompt frames preserved verbatim
        np.testing.assert_array_equal(
            np.asarray(out[:, :n_prompt * cfg.S]), np.asarray(prompt_flat))
        # generated tokens valid
        gen = np.asarray(out[:, n_prompt * cfg.S:])
        assert (gen >= 0).all() and (gen < cfg.image_vocab_size).all()

    def test_jit_compiles_once(self, setup):
        cfg, logits_fn, tokens = setup
        B = tokens.shape[0]
        prompt_flat = tokens[:, :2].reshape(B, -1)

        import functools
        gen_jit = jax.jit(functools.partial(
            generate, logits_fn, num_new_frames=cfg.T - 2, config=cfg,
            maskgit_steps=2))
        o1, _ = gen_jit(prompt_flat, rng=jax.random.PRNGKey(0))
        o2, _ = gen_jit(prompt_flat, rng=jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
