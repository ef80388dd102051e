"""Self-attention for the ST transformer.

Two interchangeable implementations, mirroring the reference's
Basic/MemoryEfficient split (genie/attention.py:9-88) but TPU-native:

- "xla": plain jnp einsum attention with fp32 softmax. XLA fuses this well at
  ST sizes (S=256, T=16); it is also the parity reference for the kernel.
- "pallas": fused flash-style Pallas TPU kernel (tpu1x/ops/pallas_attention.py).

Selection via `GenieConfig.attn_impl` or the `TPU1X_ATTN_IMPL` env var
(the reference's `XFORMERS_DISABLED` pattern, genie/attention.py:7,85-88).

Numerics: QK^T accumulates in fp32 on the MXU (`preferred_element_type`),
softmax in fp32, PV back in the compute dtype — the TPU analogue of the
reference's fp32-qk-LayerNorm-inside-bf16-autocast policy
(genie/attention.py:42-47).
"""

from __future__ import annotations

import os
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


def _env_attn_impl() -> str | None:
    return os.environ.get("TPU1X_ATTN_IMPL") or None


def resolve_attn_impl(attn_impl: str = "auto") -> str:
    """"auto" resolves to "pallas" on TPU, "xla" elsewhere.

    Measured at GENIE_138M B=8 on v5e (benchmarks/profile_train.py,
    train_bench.py): the XLA path materializes fp32 (B, H, S, S) spatial
    logits and head-split (16, 32)-tiled temporal layouts in HBM — 1.07
    s/step; the Pallas path (flash spatial fwd+bwd kernels + the
    spatial-major fused temporal kernel) runs the same step at 0.70 s
    (12.8% -> 19.7% MFU). Off-TPU the kernels would run in interpret mode,
    so "xla" stays the default there."""
    impl = _env_attn_impl() or attn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert impl in ("xla", "pallas"), impl
    return impl


def mha_reference(q, k, v, *, scale: float, causal: bool = False):
    """Multi-head attention over the second-to-last-but-one axis.

    Args:
        q, k, v: (..., N, num_heads, head_dim)
        scale: q scaling (8/head_dim when muP, else head_dim**-0.5 —
            reference genie/attention.py:26).
        causal: lower-triangular mask over the N axis.

    Returns: (..., N, num_heads, head_dim) in v.dtype.
    """
    out_dtype = v.dtype
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        n = q.shape[-3]
        mask = jnp.tril(jnp.ones((n, n), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...hqk,...khd->...qhd", probs.astype(out_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def mha(q, k, v, *, scale: float, causal: bool = False, impl: str = "xla"):
    impl = resolve_attn_impl(impl)
    # tiny-N attention (the temporal axis, T=16) stays on XLA even under
    # "pallas": its logits are small and a per-(batch, head) kernel grid
    # would be launch-bound at (B*S, H) programs of trivial work
    if impl == "pallas" and q.shape[-3] >= 64:
        from tpu1x.ops.pallas_attention import flash_mha
        return flash_mha(q, k, v, scale=scale, causal=causal)
    return mha_reference(q, k, v, scale=scale, causal=causal)


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention (reference: genie/attention.py:9-61).

    Matches the reference's parameterization exactly:
    - single qkv projection (optionally biased), output projection (biased),
    - optional qk-LayerNorm with a single LN whose params are shared between
      q and k, computed in fp32 (genie/attention.py:31-34,42-47),
    - scale = 8/head_dim if use_mup else head_dim**-0.5 (genie/attention.py:26).

    `compute_qkv` / `project` are exposed separately so the KV-cached decode
    path (tpu1x/models/st_maskgit.py) can reuse the same parameters.
    """

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    def setup(self):
        self.head_dim = self.d_model // self.num_heads
        self.scale = 8.0 / self.head_dim if self.use_mup \
            else self.head_dim ** -0.5
        self.qkv = nn.Dense(
            self.d_model * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(stddev=0.02))
        self.proj = nn.Dense(
            self.d_model, use_bias=self.proj_bias, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(stddev=0.02))
        if self.qk_norm:
            self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                     param_dtype=self.param_dtype)

    def compute_qkv(self, x):
        """x: (..., N, C) -> q, k, v each (..., N, H, D), qk-norm applied."""
        qkv = self.qkv(x)
        qkv = qkv.reshape(x.shape[:-1] + (3, self.num_heads, self.head_dim))
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if self.qk_norm:
            # fp32 LN shared between q and k (genie/attention.py:42-47)
            q = self.norm(q.astype(jnp.float32)).astype(v.dtype)
            k = self.norm(k.astype(jnp.float32)).astype(v.dtype)
        return q, k, v

    def project(self, out):
        """out: (..., N, H, D) attention output -> (..., N, C)."""
        return self.proj(out.reshape(out.shape[:-2] + (self.d_model,)))

    def __call__(self, x, causal: bool = False, deterministic: bool = True):
        """x: (..., N, d_model) -> (..., N, d_model)."""
        from jax.ad_checkpoint import checkpoint_name
        q, k, v = self.compute_qkv(x)
        out = mha(q, k, v, scale=self.scale, causal=causal, impl=self.impl)
        # saveable under the "attn_outs" remat policy: keeping the kernel's
        # primal output resident stops the backward pass from re-running the
        # attention forward just to reach downstream activations
        out = checkpoint_name(out, "attn_out")
        if self.attn_drop > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.attn_drop)(out, deterministic=False)
        return self.project(out)
