"""Fused temporal sub-layer TRAINING kernel pair (fwd + bwd, custom VJP).

The r5 spatial train block (tpu1x/ops/spatial_train_block.py) left the
temporal half of the STBlock as XLA ops: qkv/proj matmuls materialize
q, k, v and their grads in HBM (6 x 67 MB per layer at GENIE_138M B=8) and
their weight grads run as stacked fusions in the scan backward. This module
fuses the whole temporal sub-layer

    out = x + proj(temporal_attention(qkv(x)))       # NO pre-LN: the
                                                     # reference quirk
                                                     # (st_transformer.py:78)

into one Pallas program per (batch row, spatial tile) in the native
(B, T, S, C) spatial-major heads-flat layout:

- qkv is computed in-kernel on the (T*TS, C) tile — q/k/v never touch HBM;
- the causal T-loop attention reuses the E-matrix head trick of
  tpu1x/ops/temporal_attention.py (per-head logits via tiny (C, H) MXU
  dots, causality by static loop bounds, fp32 softmax over key frames);
- the backward recomputes probabilities flash-style, accumulates dk/dv in
  fp32 VMEM scratch across the T loop, and produces dWqkv/dWproj/biases in
  fp32 accumulator outputs resident across the sequential grid;
- dk/dv-side projection grads use the direct lane-lane-contraction dot
  form (the "direct" variant that measured fastest for the spatial bwd).

Replaces: the reference's temporal SelfAttention + autograd
(genie/st_transformer.py:78, genie/attention.py:65). Oracle:
`temporal_train_block_reference` (jnp, differentiable) — values AND all
gradients (tests/test_temporal_train_block.py); on-chip compiled parity in
benchmarks/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu1x.ops.temporal_attention import (_head_matrix, _pick_tile,
                                          temporal_attention_reference)


def _fwd_kernel(x_ref, wqkv_ref, wproj_ref, *rest, num_heads: int,
                scale: float, qkv_bias: bool, proj_bias: bool):
    it = iter(rest)
    bqkv_ref = next(it) if qkv_bias else None
    bproj_ref = next(it) if proj_bias else None
    o_ref = next(it)
    ao_ref = next(it)                   # (T*TS, C) scratch
    x = x_ref[0]                        # (T, TS, C)
    T, TS, C = x.shape
    H = num_heads
    cd = x.dtype
    E = _head_matrix(C, H, cd)

    x2 = x.reshape(T * TS, C)
    qkv = jax.lax.dot_general(
        x2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (T*TS, 3C)
    if qkv_bias:
        qkv = qkv + bqkv_ref[...].astype(jnp.float32)
    qkv3 = qkv.astype(cd).reshape(T, TS, 3 * C)
    q = qkv3[:, :, :C]
    k = qkv3[:, :, C:2 * C]
    v = qkv3[:, :, 2 * C:]

    for t in range(T):                  # causality = static loop bound
        kmax = t + 1
        prod = k[:kmax] * q[t][None]    # (kmax, TS, C)
        logits = jnp.dot(prod.reshape(kmax * TS, C), E,
                         preferred_element_type=jnp.float32)
        logits = logits.reshape(kmax, TS, H) * scale
        m = jnp.max(logits, axis=0)
        e = jnp.exp(logits - m[None])
        p = e / e.sum(axis=0)[None]
        p_exp = jnp.dot(p.astype(cd).reshape(kmax * TS, H), E.T,
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(kmax, TS, C)
        ao_ref[t * TS:(t + 1) * TS, :] = ((p_exp * v[:kmax])
                                          .astype(jnp.float32)
                                          .sum(axis=0).astype(cd))

    y = jax.lax.dot_general(
        ao_ref[...], wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if proj_bias:
        y = y + bproj_ref[...].astype(jnp.float32)
    o_ref[0] = x + y.astype(cd).reshape(T, TS, C)


def _bwd_kernel(x_ref, do_ref, wqkv_ref, wproj_ref, *rest, num_heads: int,
                scale: float, qkv_bias: bool, proj_bias: bool):
    it = iter(rest)
    bqkv_ref = next(it) if qkv_bias else None
    dx_ref = next(it)
    dwqkv_ref = next(it)    # (C, 3C) fp32 accumulator
    dwproj_ref = next(it)   # (C, C) fp32 accumulator
    dbqkv_ref = next(it) if qkv_bias else None    # (1, 3C)
    dbproj_ref = next(it) if proj_bias else None  # (1, C)
    dqkv_ref = next(it)     # (T*TS, 3C) scratch, compute dtype
    ao_ref = next(it)       # (T*TS, C) scratch, compute dtype
    dk_acc = next(it)       # (T, TS, C) fp32 scratch
    dv_acc = next(it)

    # 2-D grid: zero the accumulators only on the FIRST program overall
    # (program_id(0) == 0 alone would re-zero on every s-tile of b=0)
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        if qkv_bias:
            dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        if proj_bias:
            dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    x = x_ref[0]                        # (T, TS, C)
    do = do_ref[0]
    T, TS, C = x.shape
    H = num_heads
    cd = x.dtype
    E = _head_matrix(C, H, cd)

    # ---- forward recompute ----
    x2 = x.reshape(T * TS, C)
    qkv = jax.lax.dot_general(
        x2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if qkv_bias:
        qkv = qkv + bqkv_ref[...].astype(jnp.float32)
    qkv3 = qkv.astype(cd).reshape(T, TS, 3 * C)
    q = qkv3[:, :, :C]
    k = qkv3[:, :, C:2 * C]
    v = qkv3[:, :, 2 * C:]

    do2 = do.reshape(T * TS, C)
    # d_ao = do wproj^T via the direct lane-lane contraction
    d_ao = jax.lax.dot_general(
        do2, wproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd).reshape(T, TS, C)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for t in range(T):
        kmax = t + 1
        prod = k[:kmax] * q[t][None]
        logits = jnp.dot(prod.reshape(kmax * TS, C), E,
                         preferred_element_type=jnp.float32)
        logits = logits.reshape(kmax, TS, H) * scale
        m = jnp.max(logits, axis=0)
        e = jnp.exp(logits - m[None])
        p = e / e.sum(axis=0)[None]     # (kmax, TS, H) fp32

        p_exp = jnp.dot(p.astype(cd).reshape(kmax * TS, H), E.T,
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(kmax, TS, C)
        # attention output for dWproj (the forward's PV accumulation)
        ao_ref[t * TS:(t + 1) * TS, :] = ((p_exp * v[:kmax])
                                          .astype(jnp.float32)
                                          .sum(axis=0).astype(cd))

        do_t = d_ao[t]                  # (TS, C)
        dp = jnp.dot((do_t[None] * v[:kmax]).reshape(kmax * TS, C)
                     .astype(cd), E,
                     preferred_element_type=jnp.float32
                     ).reshape(kmax, TS, H)
        ds = p * (dp - (dp * p).sum(axis=0)[None])
        ds_exp = jnp.dot(ds.astype(cd).reshape(kmax * TS, H), E.T,
                         preferred_element_type=jnp.float32
                         ).astype(cd).reshape(kmax, TS, C)

        dqkv_ref[t * TS:(t + 1) * TS, :C] = (
            (ds_exp * k[:kmax]).astype(jnp.float32)
            .sum(axis=0) * scale).astype(cd)
        dk_acc[:kmax] += (ds_exp * q[t][None]).astype(jnp.float32) * scale
        dv_acc[:kmax] += (p_exp * do_t[None]).astype(jnp.float32)

    # dWproj += ao^T do (A^T B over the T*TS sublanes)
    dwproj_ref[...] += jax.lax.dot_general(
        ao_ref[...], do2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if proj_bias:
        dbproj_ref[...] += jnp.sum(do2.astype(jnp.float32), axis=0,
                                   keepdims=True)

    dqkv_ref[:, C:2 * C] = dk_acc[...].astype(cd).reshape(T * TS, C)
    dqkv_ref[:, 2 * C:] = dv_acc[...].astype(cd).reshape(T * TS, C)
    dqkv = dqkv_ref[...]

    # dWqkv += x^T dqkv (A^T B)
    dwqkv_ref[...] += jax.lax.dot_general(
        x2, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if qkv_bias:
        dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                  keepdims=True)

    # dx = dqkv wqkv^T (direct form) + residual
    dx = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = (dx.reshape(T, TS, C)
                 + do.astype(jnp.float32)).astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "qkv_bias", "proj_bias",
                     "tile_s", "interpret"))
def _ttb_fwd(x, wqkv, wproj, bqkv, bproj, *, num_heads, scale, qkv_bias,
             proj_bias, tile_s=16, interpret=False):
    B, T, S, C = x.shape
    cd = x.dtype
    tile_s = _pick_tile(S, tile_s)
    cast = lambda t: (t if t is None or t.dtype == cd  # noqa: E731
                      else t.astype(cd))
    wqkv_c, wproj_c, bqkv_c, bproj_c = map(cast, (wqkv, wproj, bqkv, bproj))
    spec = pl.BlockSpec((1, T, tile_s, C), lambda b, st: (b, 0, st, 0),
                        memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, st: (0,) * len(shp), memory_space=pltpu.VMEM)
    in_specs = [spec, full((C, 3 * C)), full((C, C))]
    operands = [x, wqkv_c, wproj_c]
    if qkv_bias:
        in_specs.append(full((1, 3 * C)))
        operands.append(bqkv_c.reshape(1, 3 * C))
    if proj_bias:
        in_specs.append(full((1, C)))
        operands.append(bproj_c.reshape(1, C))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          qkv_bias=qkv_bias, proj_bias=proj_bias),
        out_shape=jax.ShapeDtypeStruct((B, T, S, C), cd),
        grid=(B, S // tile_s),
        in_specs=in_specs,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((T * tile_s, C), cd)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * S * C * (4 * C) + 4 * B * S * T * T * C,
            bytes_accessed=(2 * B * T * S * C + 4 * C * C) * x.dtype.itemsize,
            transcendentals=B * S * T * T * num_heads,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "qkv_bias", "proj_bias",
                     "tile_s", "interpret"))
def _ttb_bwd(x, dout, wqkv, wproj, bqkv, *, num_heads, scale, qkv_bias,
             proj_bias, tile_s=16, interpret=False):
    B, T, S, C = x.shape
    cd = x.dtype
    tile_s = _pick_tile(S, tile_s)
    cast = lambda t: (t if t is None or t.dtype == cd  # noqa: E731
                      else t.astype(cd))
    wqkv_c, bqkv_c = cast(wqkv), cast(bqkv)
    wproj_c = cast(wproj)
    spec = pl.BlockSpec((1, T, tile_s, C), lambda b, st: (b, 0, st, 0),
                        memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, st: (0,) * len(shp), memory_space=pltpu.VMEM)

    in_specs = [spec, spec, full((C, 3 * C)), full((C, C))]
    operands = [x, dout, wqkv_c, wproj_c]
    if qkv_bias:
        in_specs.append(full((1, 3 * C)))
        operands.append(bqkv_c.reshape(1, 3 * C))

    out_shapes = [jax.ShapeDtypeStruct((B, T, S, C), cd),
                  jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                  jax.ShapeDtypeStruct((C, C), jnp.float32)]
    out_specs = [spec, full((C, 3 * C)), full((C, C))]
    if qkv_bias:
        out_shapes.append(jax.ShapeDtypeStruct((1, 3 * C), jnp.float32))
        out_specs.append(full((1, 3 * C)))
    if proj_bias:
        out_shapes.append(jax.ShapeDtypeStruct((1, C), jnp.float32))
        out_specs.append(full((1, C)))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          qkv_bias=qkv_bias, proj_bias=proj_bias),
        out_shape=tuple(out_shapes),
        grid=(B, S // tile_s),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((T * tile_s, 3 * C), cd),
                        pltpu.VMEM((T * tile_s, C), cd),
                        pltpu.VMEM((T, tile_s, C), jnp.float32),
                        pltpu.VMEM((T, tile_s, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * S * C * (8 * C) + 10 * B * S * T * T * C,
            bytes_accessed=(3 * B * T * S * C + 8 * C * C) * x.dtype.itemsize,
            transcendentals=B * S * T * T * num_heads,
        ),
        interpret=interpret,
    )(*operands)

    it = iter(outs)
    dx = next(it)
    dwqkv = next(it)
    dwproj = next(it)
    dbqkv = next(it).reshape(3 * C) if qkv_bias else None
    dbproj = next(it).reshape(C) if proj_bias else None
    return dx, dwqkv, dwproj, dbqkv, dbproj


def _tile_s() -> int:
    """S-tile per program. Measured on v5e (full train step): tile 32 beats
    16 at both scales (138M B=8: 0.3293 vs 0.3411 s/step; 35M B=16: 0.2508
    vs 0.2558) and tile 64 OOMs VMEM at C=512 (35M-only gain is noise:
    0.2502). TPU1X_TTB_TILE overrides for tuning."""
    import os
    return int(os.environ.get("TPU1X_TTB_TILE", "32"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ttb_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv, bproj):
    return _ttb_fwd(x, wqkv, wproj, bqkv, bproj, num_heads=num_heads,
                    scale=scale, qkv_bias=bqkv is not None,
                    proj_bias=bproj is not None, tile_s=_tile_s(),
                    interpret=interpret)


def _ttb_diff_fwd(num_heads, scale, interpret, x, wqkv, wproj, bqkv, bproj):
    out = _ttb_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv, bproj)
    return out, (x, wqkv, wproj, bqkv, bproj)


def _ttb_diff_bwd(num_heads, scale, interpret, res, dout):
    x, wqkv, wproj, bqkv, bproj = res
    dx, dwqkv, dwproj, dbqkv, dbproj = _ttb_bwd(
        x, dout, wqkv, wproj, bqkv, num_heads=num_heads, scale=scale,
        qkv_bias=bqkv is not None, proj_bias=bproj is not None,
        tile_s=_tile_s(), interpret=interpret)

    def like(g, p):
        return None if p is None else g.astype(p.dtype)

    return (dx.astype(x.dtype), like(dwqkv, wqkv), like(dwproj, wproj),
            like(dbqkv, bqkv), like(dbproj, bproj))


_ttb_diff.defvjp(_ttb_diff_fwd, _ttb_diff_bwd)


def temporal_train_block(x, wqkv, wproj, *, num_heads: int, scale: float,
                         bqkv=None, bproj=None, interpret: bool = None):
    """Differentiable fused temporal sub-layer over (B, T, S, C):
    x + proj(causal_temporal_mha(qkv(x))), heads flattened into C.

    NO pre-norm (the reference's temporal-attention quirk,
    st_transformer.py:78). Weight grads are returned in the param dtype
    (fp32 accumulation in-kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ttb_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv,
                     bproj)


def temporal_train_block_reference(x, wqkv, wproj, *, num_heads: int,
                                   scale: float, bqkv=None, bproj=None):
    """jnp oracle with the XLA train path's mixed-precision semantics."""
    cd = x.dtype
    qkv = jnp.dot(x, wqkv.astype(cd))
    if bqkv is not None:
        qkv = qkv + bqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = temporal_attention_reference(q, k, v, scale=scale,
                                       num_heads=num_heads, causal=True)
    y = jnp.dot(out, wproj.astype(cd))
    if bproj is not None:
        y = y + bproj.astype(cd)
    return x + y
