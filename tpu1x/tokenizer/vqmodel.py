"""VQModel: the Open-MAGVIT2 LFQ-GAN tokenizer (encode/decode + training).

Behavioral contract matches the reference `magvit2/models/lfqgan.py:21-268`:
- encode: Encoder -> LFQ -> (quantized, aux losses, indices) (ref: 121-126).
- decode: ±1 codes -> Decoder -> image in [-1, 1] (ref: 128-130).
- decode_tokens: ids -> codebook entries -> decode; the ids use the dataset
  bit convention (reference get_codebook_entry + .flip(1), visualize.py:115).
- EMA of generator params (LitEma, decay 0.999 with warmup: ref
  magvit2/modules/ema.py:11-86) as a pure param-pytree average.

Training (generator/discriminator losses, LeCam, adaptive weight) lives in
tpu1x/tokenizer/losses.py and tpu1x/tokenizer/train_tokenizer.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu1x.config import VQConfig
from tpu1x.tokenizer.cnn import Decoder, Encoder
from tpu1x.tokenizer.lfq import LFQ, LFQResult, codebook_entry


class VQModel(nn.Module):
    """Flax module holding encoder + decoder; LFQ is parameter-free."""

    config: VQConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quantizer = LFQ(self.config)

    def encode(self, x, training: bool = False) -> LFQResult:
        """x: (B, H, W, 3) in [-1, 1] -> LFQResult with
        quantized (B, h, w, D) and indices (B, h, w)."""
        z = self.encoder(x)
        return self.quantizer(z, training=training)

    def decode(self, quant) -> jnp.ndarray:
        """quant: (B, h, w, D) ±1 codes -> (B, H, W, 3) in [-1, 1]."""
        return self.decoder(quant)

    def decode_tokens(self, ids) -> jnp.ndarray:
        """ids: (B, h, w) int -> images (B, H, W, 3) in [-1, 1]."""
        quant = codebook_entry(ids, self.config.z_channels)
        return self.decode(quant)

    def __call__(self, x, training: bool = False):
        """Full autoencode: returns (recon, LFQResult)."""
        result = self.encode(x, training=training)
        recon = self.decode(result.quantized)
        return recon, result


def rescale_magvit_output(x) -> jnp.ndarray:
    """[-1, 1] float -> [0, 255] uint8 (reference: visualize.py:84-92)."""
    return jnp.clip((x + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# EMA as a pure param-pytree average (reference: LitEma, ema.py:11-86)
# ---------------------------------------------------------------------------

def ema_init(params: Any) -> Any:
    return jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999,
               num_updates: Optional[jnp.ndarray] = None) -> Any:
    """One EMA step; with `num_updates`, uses the reference's warmup
    decay = min(decay, (1+n)/(10+n)) (ema.py:29-35)."""
    if num_updates is not None:
        decay = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay),
        ema_params, params)
