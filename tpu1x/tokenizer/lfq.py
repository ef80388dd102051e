"""Lookup-Free Quantization (Open-MAGVIT2 / "Language Model Beats Diffusion").

Behavioral contract matches the reference
`magvit2/modules/vqvae/lookup_free_quantize.py:121-321`:
- Quantize: per-channel sign of the 18-dim latent -> ±1; straight-through
  estimator (ref: 247-248, 297).
- Token ids: 18 bits packed into [0, 2^18). Bit-order conventions in the
  reference are inconsistent between encode (descending, ref: 152, 257) and
  the published dataset/visualizer (ascending: `get_codebook_entry` descending
  + `.flip(1)` in visualize.py:115 nets out to ascending). We standardize on
  the *dataset* convention — decoder channel k carries bit (id >> k) & 1 —
  and expose `bit_order` for the raw reference encode convention.
- Entropy aux loss (ref: 82-118, 262-268): softmax at temperature 0.01 over
  the full 2^18 codebook; per-sample entropy minimized, batch (codebook)
  entropy maximized.
- Commit loss: MSE(z, sg(quantized)) (ref: 287-292).
- `token_factorization`: split 18 bits into 2 x 9-bit indices (ref: 251-255).

TPU-first redesign of the entropy loss: logits over all 2^18 codes factor as
sum of independent per-bit terms (codes are all ±1 combinations), so
- the *per-sample* entropy is computed exactly as the sum of 18 Bernoulli
  entropies — no (N, 262144) matrix at all;
- the *codebook* entropy (entropy of the batch-mean distribution, which does
  not factorize) is computed with a chunked bf16 matmul over the codebook
  axis, accumulating avg_probs in fp32 — MXU-friendly and bounded memory.
Equivalence with the reference's full-matrix math is covered by a test.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu1x.config import VQConfig


class LFQResult(NamedTuple):
    quantized: jnp.ndarray      # same shape as input, ±1 with STE gradients
    indices: jnp.ndarray        # (...,) int32 token ids
    entropy_loss: jnp.ndarray   # scalar
    commit_loss: jnp.ndarray    # scalar
    per_sample_entropy: jnp.ndarray
    codebook_entropy: jnp.ndarray


def bits_to_indices(bits, bit_order: str = "dataset"):
    """bool (..., D) -> int32 ids. "dataset": channel k has weight 2^k."""
    D = bits.shape[-1]
    if bit_order == "dataset":
        weights = 2 ** jnp.arange(D, dtype=jnp.int32)
    else:  # "reference": channel 0 is the most significant bit (ref: 152)
        weights = 2 ** jnp.arange(D - 1, -1, -1, dtype=jnp.int32)
    return (bits.astype(jnp.int32) * weights).sum(axis=-1)


def indices_to_bits(ids, num_bits: int, bit_order: str = "dataset"):
    """int (...,) -> bool (..., num_bits); inverse of `bits_to_indices`."""
    if bit_order == "dataset":
        weights = 2 ** jnp.arange(num_bits, dtype=jnp.int32)
    else:
        weights = 2 ** jnp.arange(num_bits - 1, -1, -1, dtype=jnp.int32)
    return (ids[..., None] & weights) != 0


def codebook_entry(ids, num_bits: int = 18):
    """Token ids -> ±1 latent vectors (..., num_bits), dataset bit order.

    Equals the reference's `get_codebook_entry(...).flip(1)` composition used
    on the decode path (visualize.py:115, lookup_free_quantize.py:181-194).
    """
    bits = indices_to_bits(ids, num_bits, bit_order="dataset")
    return bits.astype(jnp.float32) * 2.0 - 1.0


def _bernoulli_entropy_sum(z, temperature: float, eps: float = 1e-5):
    """Exact per-sample entropy of the full-codebook softmax.

    With codebook = all ±1 combinations, softmax(2 z·c / T) factorizes into
    independent per-bit Bernoullis with logit 4 z_k / T; entropy is the sum of
    the 18 binary entropies. Mirrors entropy_loss's sample term (ref: 108-112)
    without the (N, 2^18) matrix.
    """
    a = 2.0 * z / temperature  # per-bit logit gap is 2a
    # H = log(e^a + e^-a) - a tanh(a), computed stably
    absa = jnp.abs(a)
    log_z = absa + jnp.log1p(jnp.exp(-2 * absa))  # log(e^a + e^-a)
    h = log_z - a * jnp.tanh(a)
    return h.sum(axis=-1)  # (...,) nats


def _codebook_entropy_chunked(z_flat, temperature: float, num_bits: int,
                              chunk: int = 1 << 14, eps: float = 1e-5):
    """Entropy of the batch-averaged code distribution (ref: 102-106).

    avg_probs over all 2^num_bits codes via chunked matmuls; fp32 accumulate.
    z_flat: (N, D).
    """
    N, D = z_flat.shape
    num_codes = 1 << num_bits
    # A chunk larger than the codebook would generate out-of-range ids whose
    # high bits are silently dropped by indices_to_bits, multiply-counting
    # every code (caught by test_golden_tokenizer vs the reference at 2^6).
    chunk = min(chunk, num_codes)
    # per-bit log-probs: logp1[k] = log sigmoid(4 z_k / T)
    a = 2.0 * z_flat.astype(jnp.float32) / temperature
    logp1 = jax.nn.log_sigmoid(2 * a)   # bit = 1
    logp0 = jax.nn.log_sigmoid(-2 * a)  # bit = 0

    def chunk_probs(start):
        ids = start + jnp.arange(chunk, dtype=jnp.int32)
        bits = indices_to_bits(ids, num_bits)  # (chunk, D) — convention-free here
        # log p(code) = sum_k bits ? logp1 : logp0  => matmul form
        lp = logp1 @ bits.T.astype(jnp.float32) + logp0 @ (~bits).T.astype(jnp.float32)
        return jnp.exp(lp).mean(axis=0)  # (chunk,) mean over batch

    starts = jnp.arange(0, num_codes, chunk, dtype=jnp.int32)
    avg_probs = jax.lax.map(chunk_probs, starts).reshape(-1)  # (num_codes,)
    return -jnp.sum(avg_probs * jnp.log(avg_probs + eps))


class LFQ:
    """Functional LFQ quantizer (no learned parameters)."""

    def __init__(self, config: VQConfig, entropy_chunk: int = 1 << 14):
        self.num_bits = config.z_channels
        self.codebook_size = config.codebook_size
        self.temperature = config.entropy_temperature
        self.token_factorization = config.token_factorization
        self.entropy_chunk = entropy_chunk

    def __call__(self, z, training: bool = True,
                 compute_codebook_entropy: bool = True) -> LFQResult:
        """z: (..., D) pre-quantization latents (channel-last)."""
        quantized_hard = jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)
        # straight-through estimator (ref: 297)
        quantized = z + jax.lax.stop_gradient(quantized_hard - z)
        bits = z > 0
        indices = bits_to_indices(bits, bit_order="dataset")

        zero = jnp.zeros((), jnp.float32)
        if training:
            zf = z.astype(jnp.float32)
            sample_entropy = _bernoulli_entropy_sum(zf, self.temperature).mean()
            if compute_codebook_entropy:
                codebook_entropy = _codebook_entropy_chunked(
                    zf.reshape(-1, self.num_bits), self.temperature,
                    self.num_bits, self.entropy_chunk)
            else:
                codebook_entropy = zero
            entropy_loss = sample_entropy - codebook_entropy
            commit_loss = jnp.mean(
                (zf - jax.lax.stop_gradient(quantized_hard.astype(jnp.float32)))
                ** 2)
        else:
            sample_entropy = codebook_entropy = entropy_loss = commit_loss = zero

        return LFQResult(quantized=quantized, indices=indices,
                         entropy_loss=entropy_loss, commit_loss=commit_loss,
                         per_sample_entropy=sample_entropy,
                         codebook_entropy=codebook_entropy)

    def factorized_indices(self, indices) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Split ids into (pre, post) 9-bit halves (ref: 251-255)."""
        k = self.num_bits // 2
        return indices % (1 << k), indices // (1 << k)
