"""Factorized-vocabulary utilities and embedding.

The 2**18 Open-MAGVIT2 vocabulary is factorized into `num_factored_vocabs`
independent vocabularies of size `factored_vocab_size` (2 x 512 by default):
p(x) = p(x_lo) * p(x_hi), where x = x_hi * 512 + x_lo.

Behavioral contract matches the reference `genie/factorization_utils.py`:
- factorize_token_ids / unfactorize_token_ids (ref: 55-84)
- factorize_labels permutes to (B, num_vocabs, T, H, W) (ref: 87-100)
- FactorizedEmbedding sums per-vocab embeddings and substitutes a learned
  mask-token embedding where input == mask_token_id (ref: 6-52)

TPU-first notes: everything is dense — the mask substitution is a `where`
over a dense embedding sum (no boolean gather, no dynamic shapes), so the
whole embedding lowers to two small table takes + a select, which XLA fuses.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def factorize_token_ids(token_ids, num_factored_vocabs: int = 2, factored_vocab_size: int = 512):
    """Decompose token ids into per-vocab digits, base `factored_vocab_size`.

    Any-shape integer array in [0, factored_vocab_size**num_factored_vocabs)
    -> shape `token_ids.shape + (num_factored_vocabs,)` with digit k at
    position k (least-significant first), matching the reference
    (genie/factorization_utils.py:55-68).
    """
    powers = factored_vocab_size ** jnp.arange(num_factored_vocabs, dtype=token_ids.dtype)
    return (token_ids[..., None] // powers) % factored_vocab_size


def unfactorize_token_ids(factored_token_ids, num_factored_vocabs: int = 2,
                          factored_vocab_size: int = 512):
    """Inverse of `factorize_token_ids` over the last axis (ref: 71-84)."""
    powers = factored_vocab_size ** jnp.arange(num_factored_vocabs, dtype=factored_token_ids.dtype)
    return (factored_token_ids * powers).sum(axis=-1)


def factorize_labels(labels_THW, num_factored_vocabs: int = 2, factored_vocab_size: int = 512):
    """(B, T, H, W) ids -> (B, num_vocabs, T, H, W) factored digits (ref: 87-100)."""
    factored = factorize_token_ids(labels_THW, num_factored_vocabs, factored_vocab_size)
    return jnp.moveaxis(factored, -1, 1)


class FactorizedEmbedding(nn.Module):
    """Token embedding as the sum of per-factored-vocab embeddings.

    Equivalent to a plain embedding when num_factored_vocabs == 1.
    A separate learned `mask_token_embed` replaces the embedding wherever
    `input_ids == mask_token_id` (ref: genie/factorization_utils.py:26-52).
    """

    factored_vocab_size: int
    num_factored_vocabs: int
    d_model: int
    mask_token_id: int
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: int32 (..., ) -> embeddings (..., d_model) in `dtype`."""
        is_mask = input_ids == self.mask_token_id
        # Clamp masked ids to 0 so the table lookups stay in range.
        safe_ids = jnp.where(is_mask, 0, input_ids)
        factored = factorize_token_ids(safe_ids, self.num_factored_vocabs,
                                       self.factored_vocab_size)

        embeds = None
        for k in range(self.num_factored_vocabs):
            table = nn.Embed(
                num_embeddings=self.factored_vocab_size,
                features=self.d_model,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                embedding_init=nn.initializers.normal(stddev=0.02),
                name=f"factored_embeds_{k}",
            )(factored[..., k])
            embeds = table if embeds is None else embeds + table

        mask_embed = self.param(
            "mask_token_embed", nn.initializers.zeros, (self.d_model,), self.param_dtype
        )
        return jnp.where(is_mask[..., None], mask_embed.astype(self.dtype), embeds)
