"""PatchGAN discriminator (pix2pix NLayerDiscriminator).

Behavioral contract matches the reference
`magvit2/modules/discriminator/model.py:17-67`: 4x4 convs, stride 2 for the
first `n_layers`, LeakyReLU(0.2), BatchNorm on intermediate layers (no norm
on the first), final 1-channel patch map. NHWC layout for TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C) -> (B, H', W', 1) patch logits."""
        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv_0",
                    **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, name=f"conv_{n}", **kw)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name=f"bn_{n}")(x)
            x = nn.leaky_relu(x.astype(self.dtype), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}", **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name=f"bn_{self.n_layers}")(x)
        x = nn.leaky_relu(x.astype(self.dtype), 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=1, name="conv_out",
                    **kw)(x)
        return x.astype(jnp.float32)
