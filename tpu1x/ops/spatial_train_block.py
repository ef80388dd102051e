"""Fused spatial-block TRAINING kernel pair (fwd + bwd, custom VJP).

Round-4 profiling (PARITY.md "Round-4 training") left two named costs in the
GENIE train step: ~70 ms/step of (B, N, H, D) <-> (B, H, N, D) layout copies
around the head-split `flash_mha` kernels, and ~60 ms/step of stacked
weight-grad fusions. This module removes both for the spatial half of the
STBlock by running the ENTIRE spatial sub-layer

    out = x + proj(mha(qkv(ln(x))))

as one Pallas program per batch row in the heads-flat (N, S, C) layout —
the training-path analogue of the decode-path `tpu1x/ops/spatial_block.py`
(whose kernel is reused verbatim as the forward) — with a fused BACKWARD
kernel that recomputes the forward flash-style in VMEM and produces dx AND
all weight/bias/LN-parameter gradients in a single pass:

- no head-split (B, H, S, D) tensor or transpose ever exists (per-head
  q/k/v are *sublane* slices of the transposed qkv (3C, S), computed
  directly as W^T (ln x)^T — the Mosaic layout strategy documented in
  spatial_block.py);
- nothing (S, S)-shaped touches HBM in either direction;
- weight grads (dWqkv, dWproj, biases, LN params) accumulate in fp32 VMEM
  across the sequential grid (the revisited-output-block pattern), so XLA's
  stacked weight-grad fusions for this sub-layer disappear.

Per-head backward needs ds (softmax-grad) in BOTH orientations (ds for dk,
ds^T for dq). Three strategies, selectable via `TPU1X_SPATIAL_BWD`:
- "direct" (default): single softmax, dk/dv as direct lane-lane-contraction
  dots (5 (S, S, D) dots/head total; the non-native form costs far less
  than either workaround below at D=32).
- "transpose": single softmax, transposing p and ds via identity-matmul on
  the MXU (2 extra (S, S, S) dots/head — at D=32 those S^3 transposes are
  ~3x ALL the useful per-head FLOPs).
- "softmax2": recompute logits/softmax in both orientations — 7 native
  (S, S, D) MXU dots/head, 2x the softmax VPU work.
Measured on v5e, full train step, exact GELU: GENIE_138M B=8
direct 0.4415 / transpose 0.4667 / softmax2 0.4851 s/step; GENIE_35M B=16
direct 0.3886 / transpose 0.4284 / softmax2 0.4344 s/step.

Replaces: the training-path xformers attention + autograd of the reference
(genie/attention.py:65, genie/st_transformer.py:70-76). Oracle:
`spatial_train_block_reference` (jnp) — values AND gradients, including all
weight grads (tests/test_spatial_train_block.py); on-chip compiled parity in
benchmarks/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu1x.ops.spatial_block import spatial_block, spatial_block_reference


def _bwd_variant() -> str:
    v = os.environ.get("TPU1X_SPATIAL_BWD", "direct")
    assert v in ("softmax2", "transpose", "direct"), v
    return v


def _bwd_kernel(x_ref, do_ref, wqkv_ref, wproj_ref, *rest,
                num_heads: int, scale: float, pre_ln: bool, qkv_bias: bool,
                proj_bias: bool, variant: str):
    """One batch row per program. Outputs: dx (per-row block) and fp32
    accumulator blocks (constant index_map -> resident in VMEM across the
    sequential TPU grid; zeroed at program 0, accumulated every step)."""
    it = iter(rest)
    bqkv_ref = next(it) if qkv_bias else None
    ln_s_ref = next(it) if pre_ln else None
    ln_b_ref = next(it) if pre_ln else None
    dx_ref = next(it)
    dwqkvt_ref = next(it)   # (3C, C) fp32 accumulator (transposed dWqkv)
    dwproj_ref = next(it)   # (C, C) fp32 accumulator
    dbqkv_ref = next(it) if qkv_bias else None    # (3C, 1)
    dbproj_ref = next(it) if proj_bias else None  # (1, C)
    dln_s_ref = next(it) if pre_ln else None      # (1, C)
    dln_b_ref = next(it) if pre_ln else None      # (1, C)
    qkvt_ref = next(it)     # (3C, S) scratch, compute dtype
    dqkvt_ref = next(it)    # (3C, S) scratch, compute dtype
    ot_ref = next(it)       # (C, S) scratch, compute dtype

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwqkvt_ref[...] = jnp.zeros_like(dwqkvt_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        if qkv_bias:
            dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        if proj_bias:
            dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        if pre_ln:
            dln_s_ref[...] = jnp.zeros_like(dln_s_ref)
            dln_b_ref[...] = jnp.zeros_like(dln_b_ref)

    xb = x_ref[0]            # (S, C) compute dtype (bf16)
    do = do_ref[0]           # (S, C)
    S, C = xb.shape
    H = num_heads
    D = C // H
    cd = xb.dtype

    # ---- forward recompute (identical math to spatial_block._one_row) ----
    if pre_ln:
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
        rstd = jax.lax.rsqrt(var + 1e-5)
        xhat = (xf - mu) * rstd                           # (S, C) fp32
        g = ln_s_ref[...].astype(jnp.float32)             # (1, C)
        xn = (xhat * g + ln_b_ref[...].astype(jnp.float32)).astype(cd)
    else:
        xn = xb

    qkvt = jax.lax.dot_general(
        wqkv_ref[...], xn, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (3C, S)
    if qkv_bias:
        qkvt = qkvt + bqkv_ref[...].astype(jnp.float32)
    qkvt_ref[...] = qkvt.astype(cd)

    # d_ot (C, S): grad of the transposed attention output through proj.
    # y = ot^T wproj  =>  d_ot = wproj dy^T (lhs-lane x rhs-lane contraction
    # — same dot form as the forward qkvt matmul, measured fast in-kernel).
    d_ot = jax.lax.dot_general(
        wproj_ref[...], do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)    # (C, S)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh = qkvt_ref[sl, :]                 # (D, S) compute dtype
        kh = qkvt_ref[C + h * D:C + (h + 1) * D, :]
        vh = qkvt_ref[2 * C + h * D:2 * C + (h + 1) * D, :]
        d_oh = d_ot[sl, :]                   # (D, Sq)

        # t-space: logits^T (Sk, Sq) = k_h^T q_h (native A^T B)
        logits_t = jax.lax.dot_general(
            kh, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits_t, axis=0, keepdims=True)
        e = jnp.exp(logits_t - m)
        pt = e * (1.0 / jnp.sum(e, axis=0, keepdims=True))  # (Sk, Sq) fp32

        # d_pt[sk,sq] = sum_d vh[d,sk] d_oh[d,sq] (native A^T B)
        d_pt = jax.lax.dot_general(
            vh, d_oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_t = (pt * (d_pt - jnp.sum(d_pt * pt, axis=0, keepdims=True))
                * scale).astype(cd)          # (Sk, Sq)

        # dq_h (D, Sq) = k_h ds_t (native A B)
        dqkvt_ref[sl, :] = jax.lax.dot_general(
            kh, ds_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)

        if variant == "direct":
            # single softmax, dk/dv as direct lane-lane contractions (no
            # transposes, no second softmax) — relies on Mosaic's handling
            # of the non-native dot form
            dqkvt_ref[C + h * D:C + (h + 1) * D, :] = jax.lax.dot_general(
                qh, ds_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd)
            dqkvt_ref[2 * C + h * D:2 * C + (h + 1) * D, :] = \
                jax.lax.dot_general(
                    d_oh, pt.astype(cd), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cd)
            ot_ref[sl, :] = jax.lax.dot_general(
                vh, pt.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd)
            continue
        if variant == "softmax2":
            # nt-space: recompute softmax in the transposed orientation so
            # dk/dv are native A B dots.
            logits_nt = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (Sq, Sk)
            m2 = jnp.max(logits_nt, axis=-1, keepdims=True)
            e2 = jnp.exp(logits_nt - m2)
            p_nt = e2 * (1.0 / jnp.sum(e2, axis=-1, keepdims=True))
            d_p = jax.lax.dot_general(
                d_oh, vh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (Sq, Sk)
            ds_nt = (p_nt * (d_p - jnp.sum(d_p * p_nt, axis=-1,
                                           keepdims=True))
                     * scale).astype(cd)
            p_ntc = p_nt.astype(cd)
        else:
            # transpose pt and ds_t via identity matmul on the MXU
            ident = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                     == jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                     ).astype(cd)
            ds_nt = jax.lax.dot_general(
                ds_t, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd)  # (Sq, Sk)
            p_ntc = jax.lax.dot_general(
                pt.astype(cd), ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd)

        # dk_h (D, Sk) = q_h ds_nt ; dv_h (D, Sk) = d_oh p_nt (native A B)
        dqkvt_ref[C + h * D:C + (h + 1) * D, :] = jax.lax.dot_general(
            qh, ds_nt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)
        dqkvt_ref[2 * C + h * D:2 * C + (h + 1) * D, :] = jax.lax.dot_general(
            d_oh, p_ntc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)

        # recompute ot for dWproj (same PV dot as the forward)
        ot_ref[sl, :] = jax.lax.dot_general(
            vh, pt.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)

    # ---- weight/bias grads (fp32 accumulation across the grid) ----
    # dWproj[c,c'] += sum_s ot[c,s] do[s,c'] (native A B)
    dwproj_ref[...] += jax.lax.dot_general(
        ot_ref[...], do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if proj_bias:
        dbproj_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0,
                                   keepdims=True)

    dqkvt = dqkvt_ref[...]
    # dWqkv^T[j,c] += sum_s dqkvt[j,s] xn[s,c] (native A B)
    dwqkvt_ref[...] += jax.lax.dot_general(
        dqkvt, xn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if qkv_bias:
        dbqkv_ref[...] += jnp.sum(dqkvt.astype(jnp.float32), axis=1,
                                  keepdims=True)

    # d_xn (S, C) = dqkvt^T Wqkv^T — the fwd-qkvt dot form
    d_xn = jax.lax.dot_general(
        dqkvt, wqkv_ref[...], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (S, C) fp32

    if pre_ln:
        dln_s_ref[...] += jnp.sum(d_xn * xhat, axis=0, keepdims=True)
        dln_b_ref[...] += jnp.sum(d_xn, axis=0, keepdims=True)
        d_xhat = d_xn * g
        dx_ln = rstd * (d_xhat
                        - jnp.mean(d_xhat, axis=-1, keepdims=True)
                        - xhat * jnp.mean(d_xhat * xhat, axis=-1,
                                          keepdims=True))
        dx = dx_ln
    else:
        dx = d_xn
    dx_ref[0] = (dx + do.astype(jnp.float32)).astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "qkv_bias", "proj_bias", "pre_ln",
                     "variant", "interpret"))
def _spatial_bwd(x, dout, wqkv, wproj, bqkv, ln_scale, ln_bias, *,
                 num_heads: int, scale: float, qkv_bias: bool,
                 proj_bias: bool, pre_ln: bool, variant: str,
                 interpret: bool):
    N, S, C = x.shape
    cd = x.dtype
    cast = lambda t: (t if t is None or t.dtype == cd  # noqa: E731
                      else t.astype(cd))
    wqkv_c, wproj_c, bqkv_c = map(cast, (wqkv, wproj, bqkv))

    row = pl.BlockSpec((1, S, C), lambda n: (n, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda n: (0,) * len(shp), memory_space=pltpu.VMEM)

    in_specs = [row, row, full((C, 3 * C)), full((C, C))]
    operands = [x, dout, wqkv_c, wproj_c]
    if qkv_bias:
        in_specs.append(full((3 * C, 1)))
        operands.append(bqkv_c.reshape(3 * C, 1))
    if pre_ln:
        in_specs += [full((1, C)), full((1, C))]
        operands += [ln_scale.reshape(1, C), ln_bias.reshape(1, C)]

    out_shapes = [jax.ShapeDtypeStruct((N, S, C), cd),          # dx
                  jax.ShapeDtypeStruct((3 * C, C), jnp.float32),  # dWqkv^T
                  jax.ShapeDtypeStruct((C, C), jnp.float32)]      # dWproj
    out_specs = [row, full((3 * C, C)), full((C, C))]
    if qkv_bias:
        out_shapes.append(jax.ShapeDtypeStruct((3 * C, 1), jnp.float32))
        out_specs.append(full((3 * C, 1)))
    if proj_bias:
        out_shapes.append(jax.ShapeDtypeStruct((1, C), jnp.float32))
        out_specs.append(full((1, C)))
    if pre_ln:
        out_shapes += [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        out_specs += [full((1, C))] * 2

    kern = functools.partial(
        _bwd_kernel, num_heads=num_heads, scale=scale, pre_ln=pre_ln,
        qkv_bias=qkv_bias, proj_bias=proj_bias, variant=variant)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid=(N,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((3 * C, S), cd),
                        pltpu.VMEM((3 * C, S), cd),
                        pltpu.VMEM((C, S), cd)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * C * (8 * C + 7 * S),
            bytes_accessed=(3 * N * S * C + 8 * C * C) * x.dtype.itemsize,
            transcendentals=2 * N * num_heads * S * S,
        ),
        interpret=interpret,
    )(*operands)

    it = iter(outs)
    dx = next(it)
    dwqkv = jnp.swapaxes(next(it), 0, 1)  # (C, 3C), one tiny XLA transpose
    dwproj = next(it)
    dbqkv = next(it).reshape(3 * C) if qkv_bias else None
    dbproj = next(it).reshape(C) if proj_bias else None
    dln_s = next(it).reshape(C) if pre_ln else None
    dln_b = next(it).reshape(C) if pre_ln else None
    return dx, dwqkv, dwproj, dbqkv, dbproj, dln_s, dln_b


# custom_vjp over (x, wqkv, wproj, bqkv, bproj, ln_scale, ln_bias);
# optional operands are passed as None and get None grads.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _block_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv, bproj,
                ln_scale, ln_bias):
    import os
    rows = int(os.environ.get("TPU1X_SPATIAL_ROWS", "1"))
    return spatial_block(x, wqkv, wproj, num_heads=num_heads, scale=scale,
                         bqkv=bqkv, bproj=bproj, ln_scale=ln_scale,
                         ln_bias=ln_bias, rows=rows, interpret=interpret)


def _block_fwd(num_heads, scale, interpret, x, wqkv, wproj, bqkv, bproj,
               ln_scale, ln_bias):
    out = _block_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv,
                      bproj, ln_scale, ln_bias)
    return out, (x, wqkv, wproj, bqkv, bproj, ln_scale, ln_bias)


def _block_bwd(num_heads, scale, interpret, res, dout):
    x, wqkv, wproj, bqkv, bproj, ln_scale, ln_bias = res
    dx, dwqkv, dwproj, dbqkv, dbproj, dln_s, dln_b = _spatial_bwd(
        x, dout, wqkv, wproj, bqkv, ln_scale, ln_bias,
        num_heads=num_heads, scale=scale, qkv_bias=bqkv is not None,
        proj_bias=bproj is not None, pre_ln=ln_scale is not None,
        variant=_bwd_variant(), interpret=interpret)

    def like(g, p):
        return None if p is None else g.astype(p.dtype)

    return (dx.astype(x.dtype), like(dwqkv, wqkv), like(dwproj, wproj),
            like(dbqkv, bqkv), like(dbproj, bproj), like(dln_s, ln_scale),
            like(dln_b, ln_bias))


_block_diff.defvjp(_block_fwd, _block_bwd)


def spatial_train_block(x, wqkv, wproj, *, num_heads: int, scale: float,
                        bqkv=None, bproj=None, ln_scale=None, ln_bias=None,
                        interpret: bool = None):
    """Differentiable fused spatial sub-layer: x + proj(mha(qkv(ln(x)))).

    Args:
        x: (N, S, C) residual stream (N = B*T rows), compute dtype.
        wqkv: (C, 3C); wproj: (C, C) — any float dtype; grads are returned
            in the PARAM dtype (fp32 accumulation in-kernel).
        bqkv/bproj: optional (3C,)/(C,) biases.
        ln_scale/ln_bias: optional (C,) pre-LN params (None for the
            qk_norm configs where norm1 is Identity).
        scale: logit scale (8/head_dim if muP else head_dim**-0.5).

    qk_norm is NOT supported here (the caller falls back to the unfused
    path — the shipped reference configs train with qk_norm=false).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert (ln_scale is None) == (ln_bias is None)
    return _block_diff(num_heads, scale, interpret, x, wqkv, wproj, bqkv,
                       bproj, ln_scale, ln_bias)


def spatial_train_block_reference(x, wqkv, wproj, *, num_heads: int,
                                  scale: float, bqkv=None, bproj=None,
                                  ln_scale=None, ln_bias=None):
    """jnp oracle (differentiable end to end) — the same mixed-precision
    composition as the kernel, built from spatial_block_reference."""
    return spatial_block_reference(
        x, wqkv, wproj, num_heads=num_heads, scale=scale, bqkv=bqkv,
        bproj=bproj, ln_scale=ln_scale, ln_bias=ln_bias)
