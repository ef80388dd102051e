"""muP (maximal update parameterization) transfer checks + model-zoo size
assertions.

The reference's muP path (genie/st_mask_git.py:298-323) = attention scale
8/head_dim + FixedMuReadout (activations / width_mult before the output
projection) + MuAdamW per-group LR. The coordinate check below is the
canonical muP validation (Yang et al., "Tensor Programs V"): under muP,
logit/activation scales stay O(1) as width grows, both at init and after
optimizer steps; under standard parameterization with Adam they grow with
width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.model_zoo import genie_35m, genie_138m, genie_tiny
from tpu1x.models.st_maskgit import STMaskGIT, count_params
from tpu1x.train.optim import build_optimizer
from tpu1x.train.step import create_train_state, make_train_step

WIDTHS = (16, 64, 256)
BASE = 16


def logit_rms_after_steps(d_model: int, use_mup: bool, steps: int = 8):
    cfg = genie_tiny(num_heads=d_model // 8, d_model=d_model, T=4, S=16,
                     use_mup=use_mup, mup_base_d_model=BASE,
                     mup_base_num_heads=BASE // 8)
    model = STMaskGIT(cfg)
    tx = build_optimizer(cfg, learning_rate=1e-2, num_training_steps=100,
                         lr_scheduler_type="constant", mu_transfer=use_mup)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, cfg.T, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    rms0 = _logit_rms(model, state.params, tokens)
    for _ in range(steps):
        state, _ = step(state, tokens)
    return rms0, _logit_rms(model, state.params, tokens)


def _logit_rms(model, params, tokens):
    logits = model.apply({"params": params}, tokens,
                         method=STMaskGIT.compute_logits)
    return float(jnp.sqrt(jnp.mean(logits.astype(jnp.float32) ** 2)))


@pytest.mark.slow
def test_mup_coordinate_check():
    """Logit scale must be stable across widths under muP — and the muP
    stabilization must beat standard parameterization at the widest point."""
    mup_trained = []
    sp_trained = []
    for d in WIDTHS:
        _, r_mup = logit_rms_after_steps(d, use_mup=True)
        _, r_sp = logit_rms_after_steps(d, use_mup=False)
        mup_trained.append(r_mup)
        sp_trained.append(r_sp)

    # muP: trained logit RMS roughly flat over a 16x width range
    spread_mup = max(mup_trained) / min(mup_trained)
    assert spread_mup < 3.0, (mup_trained, spread_mup)
    # and flatter than SP's growth over the same range
    growth_mup = mup_trained[-1] / mup_trained[0]
    growth_sp = sp_trained[-1] / sp_trained[0]
    assert growth_mup < growth_sp, (mup_trained, sp_trained)


def test_mup_width_mult_matches_reference_base():
    """width_mult follows the reference's hardcoded base (8 heads, d=256,
    st_mask_git.py:298-304)."""
    cfg = genie_138m(use_mup=True)
    assert cfg.mup_base_d_model == 256
    np.testing.assert_allclose(cfg.width_mult, 2.0)


def _param_count(cfg) -> int:
    model = STMaskGIT(cfg)
    ids = jnp.zeros((1, cfg.T * cfg.S), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, ids))["params"]
    return sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))


def test_model_zoo_param_counts():
    """The 138M config is not shipped by the reference (model_zoo.py guesses
    d_model=512/16 heads); pin the arithmetic so the guess is checkable."""
    n35 = _param_count(genie_35m())
    assert 34e6 < n35 < 36e6, n35
    n138 = _param_count(genie_138m())
    assert 135e6 < n138 < 141e6, n138
