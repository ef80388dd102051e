"""Tokenizer GAN training step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu1x.config import VQConfig
from tpu1x.tokenizer.train_tokenizer import (create_tokenizer_state,
                                             make_tokenizer_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = VQConfig(resolution=16, base_channels=32, ch_mult=(1, 2),
                   z_channels=6, codebook_size=64, num_res_blocks=1,
                   dtype="float32", disc_num_layers=1, disc_start=0)
    gen_tx = optax.adam(1e-3)
    disc_tx = optax.adam(1e-3)
    state, model, disc = create_tokenizer_state(cfg, gen_tx, disc_tx,
                                                jax.random.PRNGKey(0),
                                                image_size=16)
    step = make_tokenizer_train_step(model, disc, gen_tx, disc_tx, cfg)
    return cfg, state, step


def test_dual_step_runs_and_improves_recon(setup):
    cfg, state, step = setup
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                                minval=-1, maxval=1)
    first_rec = None
    for i in range(15):
        state, metrics = step(state, images)
        if first_rec is None:
            first_rec = float(metrics["rec_loss"])
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert float(metrics["rec_loss"]) < first_rec  # overfits 2 images
    assert int(state.step) == 15
    # EMA params exist and track
    assert state.ema_params is not None


def test_adaptive_weight_positive(setup):
    cfg, state, step = setup
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3),
                                minval=-1, maxval=1)
    _, metrics = step(state, images)
    assert float(metrics["d_weight"]) >= 0


def test_disc_start_gates_disc(setup):
    cfg0, _, _ = setup
    cfg = VQConfig(resolution=16, base_channels=32, ch_mult=(1, 2),
                   z_channels=6, codebook_size=64, num_res_blocks=1,
                   dtype="float32", disc_num_layers=1, disc_start=100)
    gen_tx, disc_tx = optax.adam(1e-3), optax.adam(1e-3)
    state, model, disc = create_tokenizer_state(cfg, gen_tx, disc_tx,
                                                jax.random.PRNGKey(0),
                                                image_size=16)
    step = make_tokenizer_train_step(model, disc, gen_tx, disc_tx, cfg)
    images = jnp.zeros((2, 16, 16, 3))
    _, metrics = step(state, images)
    assert float(metrics["disc_loss"]) == 0.0  # gated by adopt_weight
