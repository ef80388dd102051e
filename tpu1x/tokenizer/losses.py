"""Tokenizer GAN/perceptual losses.

Behavioral contract matches the reference
`magvit2/modules/losses/vqperceptual.py`:
- generator loss: L1 recon + LPIPS perceptual (weight 1.0) + non-saturating
  GAN g-loss with *adaptive weight* ||grad(nll)|| / ||grad(g)|| measured at
  the decoder's last layer (ref: 139-150) + entropy aux (0.1) + commit (0.25).
- discriminator: hinge (default) or vanilla or non-saturating loss on
  detached recon, plus LeCam regularization (weight 0.005) with EMAs of
  real/fake logits (ref: 82-96, 245-252).
- `adopt_weight` warm-up gate: disc terms are zeroed before
  `disc_start` steps (ref: 19-22).

JAX expression: the adaptive weight uses jax.grad of the two scalar losses
w.r.t. the last decoder kernel (two small extra backward passes through the
decoder); LeCam EMAs are carried as explicit state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """Zero `weight` until `global_step >= threshold` (ref: 19-22)."""
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn_relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn_relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def non_saturate_discriminator_loss(logits_real, logits_fake):
    """BCE-style D loss on per-sample patch-mean logits (ref: 63-79).

    The reference reduces the (B, 1, H, W) patch map to a per-sample mean
    logit BEFORE the sigmoid cross-entropy; we preserve that structure.
    Known reference bug not reproduced: vqperceptual.py:65 assigns
    `logits_real = logits_fake.reshape(...)`, silently scoring the real term
    on fake logits. We use the real logits as intended (the shipped config
    uses "hinge", so the buggy branch never runs in practice).
    """
    real_mean = logits_real.reshape(logits_real.shape[0], -1).mean(axis=-1)
    fake_mean = logits_fake.reshape(logits_fake.shape[0], -1).mean(axis=-1)
    real_loss = jax.nn.softplus(-real_mean)  # -log sigmoid(real)
    fake_loss = jax.nn.softplus(fake_mean)   # -log(1 - sigmoid(fake))
    return jnp.mean(real_loss) + jnp.mean(fake_loss)


def non_saturate_gen_loss(logits_fake):
    """-log sigmoid(per-sample patch-mean fake logit) (ref: 50-60)."""
    fake_mean = logits_fake.reshape(logits_fake.shape[0], -1).mean(axis=-1)
    return jnp.mean(jax.nn.softplus(-fake_mean))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


class LeCamState(NamedTuple):
    """EMA of real/fake logit means (reference LeCAM_EMA, ref: 82-90)."""
    logits_real_ema: jnp.ndarray
    logits_fake_ema: jnp.ndarray

    @classmethod
    def init(cls) -> "LeCamState":
        return cls(jnp.zeros(()), jnp.zeros(()))


def lecam_update(state: LeCamState, logits_real, logits_fake,
                 decay: float = 0.999) -> LeCamState:
    return LeCamState(
        state.logits_real_ema * decay + jnp.mean(logits_real) * (1 - decay),
        state.logits_fake_ema * decay + jnp.mean(logits_fake) * (1 - decay),
    )


def lecam_reg(logits_real, logits_fake, state: LeCamState):
    """(ref: 92-96)."""
    return (jnp.mean(nn_relu(logits_real - state.logits_fake_ema) ** 2)
            + jnp.mean(nn_relu(state.logits_real_ema - logits_fake) ** 2))


def adaptive_gen_weight(nll_grad_norm, g_grad_norm, disc_weight: float,
                        eps: float = 1e-4, clip: float = 1e4):
    """||grad nll|| / ||grad g|| clamped, times disc_weight (ref: 139-150)."""
    w = nll_grad_norm / (g_grad_norm + eps)
    return jnp.clip(w, 0.0, clip) * disc_weight


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


D_LOSSES = {
    "hinge": hinge_d_loss,
    "vanilla": vanilla_d_loss,
    "non_saturate": non_saturate_discriminator_loss,
}
