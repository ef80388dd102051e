"""Spatio-temporal factored transformer (GENIE Fig. 4).

Behavioral contract matches the reference `genie/st_transformer.py`:
- STBlock: (1) bidirectional *spatial* attention over the S=H*W tokens of each
  frame, (2) causal *temporal* attention over the T frames at each spatial
  position, (3) GELU MLP; residual around each (ref: st_transformer.py:70-83).
- Quirks preserved: `norm1`/`norm2` are identity when `qk_norm=True` and
  LayerNorm(eps=1e-5) otherwise (ref: 44,67); the temporal attention has *no*
  pre-norm (ref: 78); GELU is exact (erf), not tanh-approximate.
- The decoder is a plain stack of `num_layers` STBlocks with no final norm
  (ref: 86-120).

TPU-first design:
- Activations stay (B, T, S, C); the spatial/temporal axis swap is a single
  transpose that XLA lays out once per block (the torch code reshapes through
  (B*T, S, C) / (B*S, T, C) — same math).
- The layer stack is a `lax.scan` over stacked parameters (one traced block,
  32x faster compiles), with optional `jax.checkpoint` per block for
  rematerialization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu1x.ops.attention import SelfAttention


class Mlp(nn.Module):
    """GELU MLP (reference: st_transformer.py:7-25)."""

    d_model: int
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        hidden_dim = int(self.d_model * self.mlp_ratio)
        x = nn.Dense(hidden_dim, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(stddev=0.02), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.mlp_drop > 0.0 and not self.deterministic:
            x = nn.Dropout(rate=self.mlp_drop)(x, deterministic=False)
        x = nn.Dense(self.d_model, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(stddev=0.02), name="fc2")(x)
        if self.mlp_drop > 0.0 and not self.deterministic:
            x = nn.Dropout(rate=self.mlp_drop)(x, deterministic=False)
        return x


class STBlock(nn.Module):
    """One spatial-attn -> temporal-attn -> MLP block (ref: st_transformer.py:28-83)."""

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    deterministic: bool = True

    def _maybe_norm(self, name: str):
        if self.qk_norm:
            return lambda x: x  # nn.Identity in the reference (ref: 44,67)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name=name)

    @nn.compact
    def __call__(self, x_BTSC):
        attn_kwargs = dict(
            num_heads=self.num_heads, d_model=self.d_model,
            qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
            qk_norm=self.qk_norm, use_mup=self.use_mup,
            attn_drop=self.attn_drop, dtype=self.dtype,
            param_dtype=self.param_dtype, impl=self.attn_impl,
        )

        # Spatial attention: (B, T) are batch dims, sequence axis is S. Bidirectional.
        h = self._maybe_norm("norm1")(x_BTSC).astype(self.dtype)
        x = x_BTSC + SelfAttention(**attn_kwargs, name="spatial_attn")(
            h, causal=False, deterministic=self.deterministic)

        # Temporal attention: (B, S) are batch dims, sequence axis is T. Causal.
        # NOTE: no pre-norm here, matching the reference (st_transformer.py:78).
        x_BSTC = jnp.swapaxes(x, 1, 2)
        x_BSTC = x_BSTC + SelfAttention(**attn_kwargs, name="temporal_attn")(
            x_BSTC, causal=True, deterministic=self.deterministic)

        # MLP (computed in the (B, S, T, C) layout like the reference; same math).
        h = self._maybe_norm("norm2")(x_BSTC).astype(self.dtype)
        x_BSTC = x_BSTC + Mlp(
            d_model=self.d_model, mlp_ratio=self.mlp_ratio, mlp_bias=self.mlp_bias,
            mlp_drop=self.mlp_drop, dtype=self.dtype, param_dtype=self.param_dtype,
            deterministic=self.deterministic, name="mlp")(h)

        return jnp.swapaxes(x_BSTC, 1, 2)


class _STBlockScanBody(STBlock):
    """STBlock with a scan-compatible (carry, _) -> (carry, None) signature."""

    def __call__(self, x, _unused=None):  # type: ignore[override]
        return super().__call__(x), None


class STTransformerDecoder(nn.Module):
    """Stack of STBlocks (reference: st_transformer.py:86-120)."""

    num_layers: int
    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    scan_layers: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x_BTSC):
        block_kwargs = dict(
            num_heads=self.num_heads, d_model=self.d_model,
            qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
            qk_norm=self.qk_norm, use_mup=self.use_mup, attn_drop=self.attn_drop,
            mlp_ratio=self.mlp_ratio, mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, deterministic=self.deterministic,
        )
        if self.scan_layers:
            body = _STBlockScanBody
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            ScanStack = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )
            x_BTSC, _ = ScanStack(**block_kwargs, name="layers")(x_BTSC, None)
            return x_BTSC

        for i in range(self.num_layers):
            block = STBlock
            if self.remat:
                block = nn.remat(block, prevent_cse=False)
            x_BTSC = block(**block_kwargs, name=f"layers_{i}")(x_BTSC)
        return x_BTSC
