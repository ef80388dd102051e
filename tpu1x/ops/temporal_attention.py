"""Fused temporal (causal, T=16) attention for TRAINING, spatial-major.

Why this exists (measured, benchmarks/profile_train.py at GENIE_138M):
the straightforward temporal-attention path transposes activations to
(B, S, T, C), splits heads to (B, S, T, H, D=32), and lets XLA materialize
fp32 (B, S, H, T, T) logits — every op in that world runs on (16, 32)-shaped
minor tiles, wasting ~90% of each native (8, 128) TPU tile, and the layout
churn (copies + padded fusions) dominated the train step (~0.4 s of a 1.1 s
step at B=8). This kernel keeps the tensor in its NATIVE (B, T, S, C) layout
with heads flattened into C (C = H*D = 512 -> perfect lane tiling) and does
the whole per-(batch, spatial-tile) temporal attention in VMEM:

- per query frame t (static loop, causality = loop bounds, no mask tensor),
  per-head logits against key frames via the 0/1 head-assignment matrix E
  (C, H) as tiny MXU dots (the tpu1x/ops/decode_attention.py trick);
- fp32 softmax over the key-frame axis in registers;
- PV accumulation back in (S_tile, C) tiles.

Nothing (T, T)- or head-split-shaped ever touches HBM, and the
(B, T, S, C) <-> (B, S, T, C) transposes disappear from the block entirely.
The backward kernel recomputes probabilities in-kernel (flash-style) and
accumulates dk/dv in fp32 VMEM scratch.

Replaces: the reference's temporal `SelfAttention` call
(st_transformer.py:70-83, xformers CUDA); `mha_reference` over the
transposed layout remains the parity oracle (tests/test_temporal_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _head_matrix(C: int, H: int, dtype):
    D = C // H
    return (jax.lax.broadcasted_iota(jnp.int32, (C, H), 0) // D
            == jax.lax.broadcasted_iota(jnp.int32, (C, H), 1)).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                num_heads: int):
    q = q_ref[0]                       # (T, TS, C) bf16
    k = k_ref[0]
    v = v_ref[0]
    T, TS, C = q.shape
    H = num_heads
    cd = q.dtype
    E = _head_matrix(C, H, cd)

    for t in range(T):                 # static; causality = loop bound
        kmax = t + 1 if causal else T
        prod = k[:kmax] * q[t][None]   # (kmax, TS, C)
        logits = jnp.dot(prod.reshape(kmax * TS, C), E,
                         preferred_element_type=jnp.float32)
        logits = logits.reshape(kmax, TS, H) * scale
        m = jnp.max(logits, axis=0)    # (TS, H)
        e = jnp.exp(logits - m[None])
        p = e / e.sum(axis=0)[None]    # (kmax, TS, H)
        p_exp = jnp.dot(p.astype(cd).reshape(kmax * TS, H), E.T,
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(kmax, TS, C)
        out_t = (p_exp * v[:kmax]).astype(jnp.float32).sum(axis=0)
        o_ref[0, t] = out_t.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float, causal: bool,
                num_heads: int):
    q = q_ref[0]                       # (T, TS, C) bf16
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    T, TS, C = q.shape
    H = num_heads
    cd = q.dtype
    E = _head_matrix(C, H, cd)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for t in range(T):
        kmax = t + 1 if causal else T
        # recompute probabilities for query t (flash-style)
        prod = k[:kmax] * q[t][None]
        logits = jnp.dot(prod.reshape(kmax * TS, C), E,
                         preferred_element_type=jnp.float32)
        logits = logits.reshape(kmax, TS, H) * scale
        m = jnp.max(logits, axis=0)
        e = jnp.exp(logits - m[None])
        p = e / e.sum(axis=0)[None]    # (kmax, TS, H) fp32

        # dp[t'] = sum_d do[t] * v[t'] per head
        dp = jnp.dot((do[t][None] * v[:kmax]).reshape(kmax * TS, C)
                     .astype(cd), E,
                     preferred_element_type=jnp.float32
                     ).reshape(kmax, TS, H)
        ds = p * (dp - (dp * p).sum(axis=0)[None])  # (kmax, TS, H)

        p_exp = jnp.dot(p.astype(cd).reshape(kmax * TS, H), E.T,
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(kmax, TS, C)
        ds_exp = jnp.dot(ds.astype(cd).reshape(kmax * TS, H), E.T,
                         preferred_element_type=jnp.float32
                         ).astype(cd).reshape(kmax, TS, C)

        dq_t = (ds_exp * k[:kmax]).astype(jnp.float32).sum(axis=0) * scale
        dq_ref[0, t] = dq_t.astype(dq_ref.dtype)
        dk_acc[:kmax] += (ds_exp * q[t][None]).astype(jnp.float32) * scale
        dv_acc[:kmax] += (p_exp * do[t][None]).astype(jnp.float32)

    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pick_tile(S: int, tile_s: int) -> int:
    while S % tile_s:
        tile_s //= 2
    return tile_s


@functools.partial(jax.jit, static_argnames=("scale", "causal", "num_heads",
                                             "tile_s", "interpret"))
def _temporal_fwd(q, k, v, *, scale, causal, num_heads, tile_s=64,
                  interpret=False):
    B, T, S, C = q.shape
    tile_s = _pick_tile(S, tile_s)
    spec = pl.BlockSpec((1, T, tile_s, C), lambda b, st: (b, 0, st, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, S, C), v.dtype),
        grid=(B, S // tile_s),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * T * T * C,
            bytes_accessed=4 * B * T * S * C * q.dtype.itemsize,
            transcendentals=B * S * T * T * num_heads,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "num_heads",
                                             "tile_s", "interpret"))
def _temporal_bwd(q, k, v, do, *, scale, causal, num_heads, tile_s=32,
                  interpret=False):
    # tile 32 (not 64): 4 input + 3 output double-buffered blocks + two
    # (T, tile, C) fp32 scratch accumulators must fit the 16 MB VMEM
    # (measured: tile 64 needs 22.5 MB)
    B, T, S, C = q.shape
    tile_s = _pick_tile(S, tile_s)
    spec = pl.BlockSpec((1, T, tile_s, C), lambda b, st: (b, 0, st, 0),
                        memory_space=pltpu.VMEM)
    sd = jax.ShapeDtypeStruct((B, T, S, C), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal,
                          num_heads=num_heads),
        out_shape=(sd, sd, sd),
        grid=(B, S // tile_s),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((T, tile_s, C), jnp.float32),
                        pltpu.VMEM((T, tile_s, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S * T * T * C,
            bytes_accessed=7 * B * T * S * C * q.dtype.itemsize,
            transcendentals=B * S * T * T * num_heads,
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _temporal_diff(scale, causal, num_heads, interpret, q, k, v):
    return _temporal_fwd(q, k, v, scale=scale, causal=causal,
                         num_heads=num_heads, interpret=interpret)


def _temporal_diff_fwd(scale, causal, num_heads, interpret, q, k, v):
    return _temporal_diff(scale, causal, num_heads, interpret, q, k, v), \
        (q, k, v)


def _temporal_diff_bwd(scale, causal, num_heads, interpret, res, dout):
    q, k, v = res
    dq, dk, dv = _temporal_bwd(q, k, v, dout, scale=scale, causal=causal,
                               num_heads=num_heads, interpret=interpret)
    return dq, dk, dv


_temporal_diff.defvjp(_temporal_diff_fwd, _temporal_diff_bwd)


def temporal_attention(q, k, v, *, scale: float, num_heads: int,
                       causal: bool = True, interpret: bool = None):
    """Causal temporal attention over axis 1 of (B, T, S, C), heads-flat.

    Mathematically identical to transposing to (B, S, T, C), splitting heads,
    and running `mha_reference(..., causal=True)` over T — but computed
    in-place in the spatial-major layout (see module docstring).
    Differentiable (custom VJP with a fused backward kernel).
    interpret=None auto-selects interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _temporal_diff(scale, causal, num_heads, interpret, q, k, v)


def temporal_attention_reference(q, k, v, *, scale: float, num_heads: int,
                                 causal: bool = True):
    """jnp oracle: the transposed-layout reference computation."""
    from tpu1x.ops.attention import mha_reference
    B, T, S, C = q.shape
    H = num_heads
    D = C // H

    def to_ref(x):  # (B, T, S, C) -> (B, S, T, H, D)
        return jnp.swapaxes(x, 1, 2).reshape(B, S, T, H, D)

    out = mha_reference(to_ref(q), to_ref(k), to_ref(v), scale=scale,
                        causal=causal)
    return jnp.swapaxes(out.reshape(B, S, T, C), 1, 2)
