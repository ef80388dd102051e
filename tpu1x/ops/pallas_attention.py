"""Fused attention Pallas TPU kernel for ST-transformer shapes.

The reference's hot kernel is xformers/FlashAttention-2 CUDA
(genie/attention.py:65, SURVEY.md §2b); this is its TPU-native replacement.

Design for the actual ST workload (S=256 spatial / T=16 temporal, head_dim
32, huge flattened batch):
- A full (N, N) attention matrix at N<=256 is ~256 KB fp32 — it fits VMEM
  outright, so no online-softmax tiling is needed. The win over XLA is
  *fusion*: QK^T -> softmax -> PV in one kernel, so the (batch, heads, N, N)
  probability tensor (268 MB per layer at B=16 for spatial attention) never
  round-trips HBM.
- Grid is (batch, heads); each program computes one head's attention with
  two MXU dots and a VPU softmax.
- Causal masking via 2D broadcasted_iota compare (no materialized tril).

The pure-jnp `mha_reference` in tpu1x/ops/attention.py is the parity oracle
(the reference's Basic-vs-MemoryEfficient test pattern, test_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                 num_heads: int):
    """All heads of one batch row per program, H as a LEADING block dim
    (sliceable, unlike the middle dim of an (N, H, D) block which fails
    Mosaic's layout inference): 16x fewer grid launches than a per-(b, h)
    grid and one DMA per operand row."""
    n = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    for h in range(num_heads):
        q = q_ref[0, h].astype(jnp.float32)  # (N, D)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N)
        if causal:
            logits = jnp.where(row >= col, logits, _NEG_INF)

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        probs = p / jnp.sum(p, axis=-1, keepdims=True)

        out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def _flash_mha_bhnd(q, k, v, *, scale: float, causal: bool,
                    interpret: bool = False):
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    B, H, N, D = q.shape
    spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bytes_per = N * D * (q.dtype.itemsize + k.dtype.itemsize + 2 * v.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal,
                          num_heads=H),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * N * N * D,
            bytes_accessed=B * H * bytes_per,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, causal: bool, num_heads: int):
    """Fused attention backward, all heads of one batch row per program
    (H as a leading, sliceable block dim): recompute the (N, N)
    probabilities in VMEM (flash-style — the forward saves nothing), then
    the standard attention VJP with 4 MXU dots per head. Nothing
    (N, N)-shaped ever touches HBM; without this, XLA materializes three
    fp32 (B, H, N, N) tensors per layer per backward (the dominant cost of
    the measured 12.8%-MFU train step, benchmarks/profile_train.py)."""
    n = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    for h in range(num_heads):
        q = q_ref[0, h].astype(jnp.float32)  # (N, D)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N)
        if causal:
            logits = jnp.where(row >= col, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (N, N)

        # dv = p^T do ; dp = do v^T ; ds = p * (dp - rowsum(dp*p)) ;
        # dq = ds k * scale ; dk = ds^T q * scale
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def _flash_mha_bwd_bhnd(q, k, v, dout, *, scale: float, causal: bool,
                        interpret: bool = False):
    """q, k, v, dout: (B, H, N, D) -> (dq, dk, dv) same layout."""
    B, H, N, D = q.shape
    spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    sd = jax.ShapeDtypeStruct((B, H, N, D), q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, causal=causal,
                          num_heads=H),
        out_shape=(sd, sd, sd),
        grid=(B,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * N * N * D,
            bytes_accessed=7 * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(q, k, v, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_mha_diff(scale, causal, interpret, q, k, v):
    return _flash_mha_bhnd(q, k, v, scale=scale, causal=causal,
                           interpret=interpret)


def _recompute_probs(scale, causal, q, k):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        n = logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        logits = jnp.where(row >= row.T, logits, _NEG_INF)
    return jax.nn.softmax(logits, axis=-1)  # fp32 (B, H, N, N)


def _flash_mha_fwd(scale, causal, interpret, q, k, v):
    return _flash_mha_diff(scale, causal, interpret, q, k, v), (q, k, v)


def _flash_mha_bwd(scale, causal, interpret, res, dout):
    q, k, v = res
    dq, dk, dv = _flash_mha_bwd_bhnd(q, k, v, dout, scale=scale,
                                     causal=causal, interpret=interpret)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_mha_bwd_jnp(scale, causal, res, dout):
    """jnp oracle for the backward kernel (kept for parity tests)."""
    q, k, v = res
    p = _recompute_probs(scale, causal, q, k)  # (B, H, N, N) fp32
    doutf = dout.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, doutf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", doutf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_mha_diff.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def flash_mha(q, k, v, *, scale: float, causal: bool = False,
              interpret: bool = None):
    """Fused MHA matching `mha_reference`'s contract; differentiable
    (custom VJP with a fused backward kernel, flash-style).

    Args:
        q, k, v: (..., N, num_heads, head_dim); arbitrary leading batch dims.
        interpret: None auto-selects interpret mode off-TPU.
    Returns: (..., N, num_heads, head_dim) in v.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *batch, N, H, D = q.shape
    bsz = 1
    for b in batch:
        bsz *= b

    def to_bhnd(x):
        return x.reshape(bsz, N, H, D).transpose(0, 2, 1, 3)

    out = _flash_mha_diff(scale, causal, interpret, to_bhnd(q), to_bhnd(k),
                          to_bhnd(v))
    return out.transpose(0, 2, 1, 3).reshape(*batch, N, H, D)
