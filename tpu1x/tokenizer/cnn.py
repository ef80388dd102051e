"""MAGVIT2 CNN encoder/decoder in flax (XLA-native convolutions).

Behavioral contract matches the reference
`magvit2/modules/diffusionmodules/improved_model.py`:
- ResBlock: GN(32, eps 1e-6) -> swish -> 3x3 conv (no bias) -> GN -> swish ->
  3x3 conv (no bias), 1x1 nin shortcut when channels change (ref: 12-51).
- Encoder: 3x3 conv_in (no bias) -> len(ch_mult) levels of num_res_blocks
  ResBlocks with stride-2 3x3 conv downsample between levels -> 2 mid
  ResBlocks -> GN + swish -> 1x1 conv to z_channels (ref: 54-121). With
  ch_mult (1,1,2,2,4): 256 -> 16 spatial, 18 channels.
- Decoder mirrors it; upsampling is `Upsampler` = 3x3 conv to 4x channels +
  depth_to_space(2) (DCR order) (ref: 124-237).

TPU-first: channel-last NHWC layout throughout (TPU conv native layout);
flax Conv is NHWC by default. depth_to_space is a reshape+transpose pair
that XLA fuses into the preceding conv's output layout.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu1x.config import VQConfig


def swish(x):
    return x * nn.sigmoid(x)


def depth_to_space(x, block_size: int):
    """NHWC depth-to-space, DCR (depth-column-row) order matching the
    reference's channels-first implementation (improved_model.py:185-217).

    Reference (CHW): channel c of output pixel (h*bs+i, w*bs+j) comes from
    input channel index laid out as (i, j, c) — i.e. the *leading* factor of
    the channel dim is the spatial block.
    """
    B, H, W, C = x.shape
    s = block_size ** 2
    assert C % s == 0, (C, block_size)
    x = x.reshape(B, H, W, block_size, block_size, C // s)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H, i, W, j, c
    return x.reshape(B, H * block_size, W * block_size, C // s)


class ResBlock(nn.Module):
    out_filters: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_filters = x.shape[-1]
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm1")(x)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_filters, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm2")(h)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_filters, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_filters != self.out_filters:
            residual = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="nin_shortcut")(x)
        return h + residual


class Encoder(nn.Module):
    config: VQConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> (B, H/16, W/16, z_channels)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        x = x.astype(dtype)
        x = nn.Conv(cfg.base_channels, (3, 3), use_bias=False, dtype=dtype,
                    param_dtype=pdtype, name="conv_in")(x)
        num_levels = len(cfg.ch_mult)
        for i_level in range(num_levels):
            block_out = cfg.base_channels * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                x = ResBlock(block_out, dtype=dtype, param_dtype=pdtype,
                             name=f"down_{i_level}_block_{i_block}")(x)
            if i_level < num_levels - 1:
                # explicit (1,1) padding: torch Conv2d(k=3, s=2, p=1) floor
                # semantics, NOT XLA 'SAME' (which pads (0,1) here)
                x = nn.Conv(block_out, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=dtype,
                            param_dtype=pdtype,
                            name=f"down_{i_level}_downsample")(x)
        for i in range(cfg.num_res_blocks):
            x = ResBlock(x.shape[-1], dtype=dtype, param_dtype=pdtype,
                         name=f"mid_block_{i}")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=pdtype, name="norm_out")(x)
        x = swish(x).astype(dtype)
        x = nn.Conv(cfg.z_channels, (1, 1), dtype=dtype, param_dtype=pdtype,
                    name="conv_out")(x)
        return x.astype(jnp.float32)


class Decoder(nn.Module):
    config: VQConfig

    @nn.compact
    def __call__(self, z):
        """z: (B, h, w, z_channels) ±1 codes -> (B, 16h, 16w, 3) in [-1, 1]."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        num_levels = len(cfg.ch_mult)
        block_in = cfg.base_channels * cfg.ch_mult[-1]
        z = z.astype(dtype)
        x = nn.Conv(block_in, (3, 3), use_bias=True, dtype=dtype,
                    param_dtype=pdtype, name="conv_in")(z)
        for i in range(cfg.num_res_blocks):
            x = ResBlock(block_in, dtype=dtype, param_dtype=pdtype,
                         name=f"mid_block_{i}")(x)
        for i_level in reversed(range(num_levels)):
            block_out = cfg.base_channels * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                x = ResBlock(block_out, dtype=dtype, param_dtype=pdtype,
                             name=f"up_{i_level}_block_{i_block}")(x)
            if i_level > 0:
                x = nn.Conv(x.shape[-1] * 4, (3, 3), dtype=dtype,
                            param_dtype=pdtype,
                            name=f"up_{i_level}_upsample_conv")(x)
                x = depth_to_space(x, 2)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=pdtype, name="norm_out")(x)
        x = swish(x).astype(dtype)
        x = nn.Conv(cfg.out_channels, (3, 3), dtype=dtype, param_dtype=pdtype,
                    name="conv_out")(x)
        return x.astype(jnp.float32)
