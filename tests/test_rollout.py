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
        T_ctx = 2
        ctx = jax.random.randint(rng, (T_ctx, 4, 4), 0,
                                 cfg.image_vocab_size, dtype=jnp.int32)
        conts = jax.random.randint(jax.random.PRNGKey(4),
                                   (4, cfg.T - T_ctx, 4, 4), 0,
                                   cfg.image_vocab_size, dtype=jnp.int32)
        scores, frame_ce = engine.score_policies(ctx, conts, per_frame=True)
        assert scores.shape == (4,)
        assert frame_ce.shape == (4, cfg.T - T_ctx)
        assert np.isfinite(np.asarray(scores)).all()
        # the mean score is exactly the mean of the per-frame breakdown
        np.testing.assert_allclose(np.asarray(frame_ce).mean(axis=1),
                                   np.asarray(scores), rtol=1e-6)
        order = engine.rank_policies(ctx, conts)
        assert sorted(order.tolist()) == [0, 1, 2, 3]
        np.testing.assert_array_equal(
            np.asarray(scores)[order], np.sort(np.asarray(scores)))

    def test_policy_ranking_signal(self):
        """A world-model-consistent continuation must outrank corrupted ones
        on a trained model (VERDICT r1 #10) — and the P axis shards over the
        mesh."""
        from tpu1x.train.optim import build_optimizer
        from tpu1x.train.step import create_train_state, make_train_step

        cfg = genie_tiny(T=4)
        model = STMaskGIT(cfg)
        tx = build_optimizer(cfg, learning_rate=1e-2, num_training_steps=1000,
                             lr_scheduler_type="constant")
        state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
        step = make_train_step(model, tx, cfg, donate=False)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (2, cfg.T, 4, 4),
                                    0, cfg.image_vocab_size, dtype=jnp.int32)
        for _ in range(100):
            state, metrics = step(state, tokens)
        assert float(metrics["loss"]) < 4.0, float(metrics["loss"])

        T_ctx = 2
        ctx = tokens[0, :T_ctx]
        true_cont = tokens[0, T_ctx:]
        rng = np.random.RandomState(0)
        conts = [np.asarray(true_cont)]
        for seed in range(7):  # spatially scrambled = world-inconsistent
            flat = np.asarray(true_cont).reshape(-1)
            conts.append(rng.permutation(flat).reshape(true_cont.shape))
        conts = jnp.asarray(np.stack(conts))

        mesh = make_mesh(dp=4, tp=2)
        engine = RolloutEngine(model, state.params, cfg, mesh=mesh)
        scores = np.asarray(engine.score_policies(ctx, conts))
        assert scores.shape == (8,)
        assert np.argmin(scores) == 0, scores  # the true future wins
        assert engine.rank_policies(ctx, conts)[0] == 0

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
