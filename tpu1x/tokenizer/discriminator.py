"""PatchGAN discriminator (pix2pix NLayerDiscriminator).

Behavioral contract matches the reference
`magvit2/modules/discriminator/model.py:17-67`: 4x4 convs, stride 2 for the
first `n_layers`, LeakyReLU(0.2), BatchNorm (or ActNorm with
`use_actnorm=True` — intermediate convs then carry a bias, model.py:33-38)
on intermediate layers (no norm on the first), final 1-channel patch map.
NHWC layout for TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ActNorm(nn.Module):
    """Per-channel affine norm with data-dependent initialization
    (reference: magvit2/modules/util.py:10-92).

    h = scale * (x + loc), with loc = -mean and scale = 1/(std + 1e-6)
    computed per channel over (batch, H, W) of the *initialization batch*.
    The torch version initializes lazily on its first training batch; in
    this functional design initialization happens at `.init()` time, so
    pass a representative data batch to `Module.init` (zeros give
    loc=0, scale=1/eps-free std of zeros -> scale from std 0 is huge;
    always init with real data when use_actnorm=True).
    """
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)

        def loc_init(rng):
            return (-jnp.mean(xf, axis=tuple(range(xf.ndim - 1)))
                    ).astype(self.param_dtype)

        def scale_init(rng):
            # torch.std default is Bessel-corrected (util.py:31-36)
            std = jnp.std(xf.reshape(-1, xf.shape[-1]), axis=0, ddof=1)
            return (1.0 / (std + self.eps)).astype(self.param_dtype)

        loc = self.param("loc", loc_init)
        scale = self.param("scale", scale_init)
        return (scale * (xf + loc)).astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _norm(self, x, train: bool, name: str):
        if self.use_actnorm:
            return ActNorm(param_dtype=self.param_dtype, name=f"an_{name}")(x)
        return nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                            param_dtype=self.param_dtype,
                            name=f"bn_{name}")(x)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C) -> (B, H', W', 1) patch logits."""
        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # BatchNorm subsumes the conv bias; ActNorm does not (model.py:33-38)
        use_bias = self.use_actnorm
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv_0",
                    **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=use_bias, name=f"conv_{n}", **kw)(x)
            x = self._norm(x, train, str(n))
            x = nn.leaky_relu(x.astype(self.dtype), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=use_bias, name=f"conv_{self.n_layers}", **kw)(x)
        x = self._norm(x, train, str(self.n_layers))
        x = nn.leaky_relu(x.astype(self.dtype), 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=1, name="conv_out",
                    **kw)(x)
        return x.astype(jnp.float32)
