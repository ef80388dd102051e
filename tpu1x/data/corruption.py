"""MaskGIT training corruption as a pure on-device function.

Behavioral contract matches the reference collator `data.py:109-169`
(`get_maskgit_collator`), re-expressed as a jit-able pure function of
`(tokens, rng)` that runs *on device inside the training step* — the
reference runs this per-batch in CPU dataloader workers; on TPU it fuses
into the compiled step (no host RNG, no transfer of a second tensor).

Semantics preserved:
1. Uniform random corruption of factored digits at rate U(0, max_corrupt_rate)
   (Copilot4D-style; data.py:124-130). Each factored digit corrupts
   independently.
2. With prob `non_mlm_ratio`: frames [0, first_masked_frame) stay clean with
   first_masked_frame ~ U{num_prompt_frames..T-1}, and later frames are
   corrupted with a compounding rate: correct_rate starts U(0.25, 1) and is
   multiplied by U(0.9, 1) per subsequent frame (data.py:132-144). Otherwise
   standard MLM from frame 1 (data.py:145-146).
3. Per-example-per-frame masking probability cos(U(0,1) * pi/2)
   (data.py:150-155); masked positions are set to mask_token_id after
   unfactorization (data.py:161-162).

Deviation (documented): the reference retries drawing the mask while zero
tokens were masked (data.py:148-159) — data-dependent looping that cannot
live under jit. Here, if the draw masks nothing (probability ~0 for any real
batch), the single position closest to its masking threshold is masked, so
the loss denominator is always >= 1.

Branch handling: the non-MLM path is computed branchlessly (both corruption
patterns are evaluated and selected with `where`) — cheaper than lax.cond on
TPU at these sizes and keeps one fused program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpu1x.config import GenieConfig
from tpu1x.models.factorization import factorize_token_ids, unfactorize_token_ids
from tpu1x.models.st_maskgit import cosine_schedule


def maskgit_corrupt(tokens_BTHW: jnp.ndarray, rng: jax.Array, config: GenieConfig
                    ) -> Dict[str, jnp.ndarray]:
    """Corrupt+mask a clean token batch into (input_ids, labels).

    Args:
        tokens_BTHW: (B, T, H, W) int32 clean tokens.
        rng: PRNG key.

    Returns dict with "input_ids" and "labels", both (B, T*H*W) int32.
    """
    B, T, H, W = tokens_BTHW.shape
    F, V = config.num_factored_vocabs, config.factored_vocab_size
    keys = jax.random.split(rng, 10)

    x_BTHWF = factorize_token_ids(tokens_BTHW, F, V)
    labels = tokens_BTHW

    # (1) uniform corruption at rate U(0, max_corrupt_rate), per factored digit
    u01 = jax.random.uniform(keys[0])
    r = jax.random.uniform(keys[1], x_BTHWF.shape)
    random_values = jax.random.randint(keys[2], x_BTHWF.shape, 0, V, dtype=jnp.int32)
    x_BTHWF = jnp.where(r < config.max_corrupt_rate * u01, random_values, x_BTHWF)

    # (2) non-MLM branch: keep a prompt prefix clean, corrupt later frames harder
    is_non_mlm = jax.random.uniform(keys[3]) < config.non_mlm_ratio
    fmf_non_mlm = jax.random.randint(keys[4], (), config.num_prompt_frames, T,
                                     dtype=jnp.int32)
    first_masked_frame = jnp.where(is_non_mlm, fmf_non_mlm, 1)

    frame_idx = jnp.arange(T, dtype=jnp.int32)
    after_fmf = frame_idx >= first_masked_frame  # (T,)

    # compounding correct rate: frame at offset j from fmf uses
    # c0 * prod_{i<=j} m_i with m_i ~ U(0.9, 1) (data.py:139-141)
    c0 = jax.random.uniform(keys[5], (), minval=0.25, maxval=1.0)
    m = jax.random.uniform(keys[6], (T,), minval=0.9, maxval=1.0)
    mcum = jnp.cumprod(m)
    offset = jnp.clip(frame_idx - first_masked_frame, 0, T - 1)
    correct_rate_T = c0 * mcum[offset]  # (T,)

    r2 = jax.random.uniform(keys[7], x_BTHWF.shape)
    non_mlm_corrupt = (r2 > correct_rate_T[None, :, None, None, None]) \
        & after_fmf[None, :, None, None, None] & is_non_mlm
    x_BTHWF = jnp.where(non_mlm_corrupt, random_values, x_BTHWF)

    # (3) per-example-per-frame cosine-schedule masking (data.py:150-155)
    mask_prob_BT = cosine_schedule(jax.random.uniform(keys[8], (B, T)))
    r3 = jax.random.uniform(keys[9], (B, T, H, W))
    valid = after_fmf[None, :, None, None]
    mask = (r3 < mask_prob_BT[:, :, None, None]) & valid

    # guarantee >= 1 masked token (replaces the reference's retry loop)
    margin = jnp.where(valid, mask_prob_BT[:, :, None, None] - r3, -jnp.inf)
    fallback = jnp.zeros(B * T * H * W, dtype=bool).at[jnp.argmax(margin)].set(True)
    mask = jnp.where(mask.any(), mask, fallback.reshape(B, T, H, W))

    x_BTHW = unfactorize_token_ids(x_BTHWF, F, V)
    x_BTHW = jnp.where(mask, config.mask_token_id, x_BTHW)

    return {
        "input_ids": x_BTHW.reshape(B, T * H * W),
        "labels": labels.reshape(B, T * H * W),
    }
