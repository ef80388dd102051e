"""Rollout engine + action conditioning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.model_zoo import genie_tiny
from tpu1x.models.st_maskgit import STMaskGIT
from tpu1x.parallel.mesh import make_mesh
from tpu1x.rollout.engine import RolloutEngine


@pytest.fixture(scope="module")
def setup():
    cfg = genie_tiny(T=4, action_vocab_size=8, num_prompt_frames=1)
    model = STMaskGIT(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, cfg.T * cfg.S), dtype=jnp.int32)
    actions = jnp.zeros((1, cfg.T), dtype=jnp.int32)
    params = model.init(rng, ids, ids, actions)["params"]
    return cfg, model, params


class TestActionConditioning:
    def test_actions_change_logits(self, setup):
        cfg, model, params = setup
        tokens = jnp.zeros((1, cfg.T, 4, 4), dtype=jnp.int32)
        a0 = jnp.zeros((1, cfg.T), dtype=jnp.int32)
        a1 = jnp.ones((1, cfg.T), dtype=jnp.int32)
        l0 = model.apply({"params": params}, tokens, a0,
                         method=STMaskGIT.compute_logits)
        l1 = model.apply({"params": params}, tokens, a1,
                         method=STMaskGIT.compute_logits)
        assert not np.allclose(np.asarray(l0), np.asarray(l1))

    def test_no_actions_still_works(self, setup):
        cfg, model, params = setup
        tokens = jnp.zeros((1, cfg.T, 4, 4), dtype=jnp.int32)
        out = model.apply({"params": params}, tokens,
                          method=STMaskGIT.compute_logits)
        assert out.shape == (1, cfg.T, cfg.S, cfg.factored_vocab_size, 2)


class TestRolloutEngine:
    def test_rollout_shapes_and_diversity(self, setup):
        cfg, model, params = setup
        engine = RolloutEngine(model, params, cfg, temperature=1.0)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 1, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        out = engine.rollout(prompt, cfg.T - 1, jax.random.PRNGKey(2),
                             num_futures=3)
        assert out.shape == (2, 3, cfg.T, 4, 4)
        # prompts preserved in every future
        np.testing.assert_array_equal(
            np.asarray(out[:, :, 0]), np.asarray(jnp.repeat(prompt, 3, 1)))
        # sampled futures differ across K (temperature 1)
        assert not np.array_equal(np.asarray(out[0, 0, 1:]),
                                  np.asarray(out[0, 1, 1:]))

    def test_rollout_with_actions(self, setup):
        cfg, model, params = setup
        engine = RolloutEngine(model, params, cfg, temperature=0.0)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        outs = []
        for a in (0, 3):
            actions = jnp.full((1, cfg.T), a, dtype=jnp.int32)
            outs.append(np.asarray(engine.rollout(
                prompt, cfg.T - 1, jax.random.PRNGKey(0), actions=actions)))
        # different action sequences give different greedy futures
        assert not np.array_equal(outs[0], outs[1])

    def test_score_and_rank_policies(self, setup):
        cfg, model, params = setup
        engine = RolloutEngine(model, params, cfg)
        rng = jax.random.PRNGKey(3)
        ctx = jax.random.randint(rng, (4, cfg.T, 4, 4), 0,
                                 cfg.image_vocab_size, dtype=jnp.int32)
        scores = engine.score_policies(ctx, ctx)
        assert scores.shape == (4,)
        assert np.isfinite(np.asarray(scores)).all()
        order = engine.rank_policies(ctx, ctx)
        assert sorted(order.tolist()) == [0, 1, 2, 3]
        np.testing.assert_array_equal(
            np.asarray(scores)[order], np.sort(np.asarray(scores)))

    def test_cached_matches_full_decode(self, setup):
        """The KV-cached engine path is token-exact vs the uncached oracle."""
        cfg, model, params = setup
        prompt = jax.random.randint(jax.random.PRNGKey(7), (2, 1, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        outs = {}
        for decode in ("cached", "full"):
            engine = RolloutEngine(model, params, cfg, temperature=1.0,
                                   decode=decode)
            outs[decode] = np.asarray(engine.rollout(
                prompt, cfg.T - 1, jax.random.PRNGKey(9), num_futures=2))
        np.testing.assert_array_equal(outs["cached"], outs["full"])

    def test_cached_matches_full_decode_with_actions(self, setup):
        cfg, model, params = setup
        prompt = jax.random.randint(jax.random.PRNGKey(7), (2, 1, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        actions = jax.random.randint(jax.random.PRNGKey(8), (2, cfg.T), 0,
                                     cfg.action_vocab_size, dtype=jnp.int32)
        outs = {}
        for decode in ("cached", "full"):
            engine = RolloutEngine(model, params, cfg, temperature=0.0,
                                   decode=decode)
            outs[decode] = np.asarray(engine.rollout(
                prompt, cfg.T - 1, jax.random.PRNGKey(9), actions=actions))
        np.testing.assert_array_equal(outs["cached"], outs["full"])
        # and actions actually steer the cached rollout
        other = np.asarray(RolloutEngine(model, params, cfg).rollout(
            prompt, cfg.T - 1, jax.random.PRNGKey(9),
            actions=(actions + 1) % cfg.action_vocab_size))
        assert not np.array_equal(outs["cached"], other)

    def test_rollout_sharded_over_mesh(self, setup):
        cfg, model, params = setup
        mesh = make_mesh(dp=4, tp=2)
        engine = RolloutEngine(model, params, cfg, mesh=mesh, temperature=1.0)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (8, 1, 4, 4), 0,
                                    cfg.image_vocab_size, dtype=jnp.int32)
        out = engine.rollout(prompt, cfg.T - 1, jax.random.PRNGKey(2),
                             num_futures=2)
        assert out.shape == (8, 2, cfg.T, 4, 4)
