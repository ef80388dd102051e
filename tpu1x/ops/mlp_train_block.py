"""Fused MLP sub-layer TRAINING kernel pair (fwd + bwd, custom VJP).

The last XLA-resident chunk of the STBlock train step after the r5
spatial/temporal fused kernels: LN2 + fc1 + GELU + fc2 + residual, whose
hidden activations (B, T, S, 4C), their grads, and the fc weight-grad
stacked fusions dominate the remaining per-layer "fusion" time in the
profile (benchmarks/profile_train.py r5). One Pallas program per batch row:

    out = x + fc2(gelu(fc1(ln2(x))))

with a fused backward producing dx and dWfc1/dWfc2/biases/LN grads in fp32
VMEM accumulators across the sequential grid. The (S, 4C) hidden never
touches HBM in either direction.

Exact-erf GELU (the reference's torch nn.GELU, st_transformer.py:7-25)
inside a Mosaic kernel: erf/erfc do not lower on TPU, so the kernel uses
the Abramowitz-Stegun 7.1.26 rational approximation in fp32 — max abs
error 5.0e-7 (measured vs lax.erf over [-6, 6]), three decimal orders
below bf16 resolution, i.e. bit-identical in the compute dtype. The
backward uses gelu'(x) = Phi(x) + x phi(x) with the same Phi. The tanh
variant (`gelu_approx=True` configs) lowers natively.

Oracle: `mlp_train_block_reference` (jnp, exact erf) — values AND all
gradients (tests/test_mlp_train_block.py); on-chip parity in
benchmarks/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 (max abs err 5.0e-7), fp32."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return s * y


def _gelu_f32(h, approx: bool):
    if approx:
        return jax.nn.gelu(h, approximate=True)
    return 0.5 * h * (1.0 + _erf_poly(h * _INV_SQRT2))


def _dgelu_f32(h, approx: bool):
    if approx:
        # d/dh of the tanh approximation
        c = 0.7978845608028654  # sqrt(2/pi)
        u = c * (h + 0.044715 * h ** 3)
        th = jnp.tanh(u)
        du = c * (1.0 + 3 * 0.044715 * h ** 2)
        return 0.5 * (1.0 + th) + 0.5 * h * (1.0 - th ** 2) * du
    phi = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf_poly(h * _INV_SQRT2)) + h * phi


def _ln_fwd(xb, ln_s_ref, ln_b_ref):
    xf = xb.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mu) * rstd
    g = ln_s_ref[...].astype(jnp.float32)
    xn = xhat * g + ln_b_ref[...].astype(jnp.float32)
    return xn, xhat, rstd, g


def _fwd_kernel(x_ref, wfc1_ref, wfc2_ref, *rest, pre_ln: bool, bias: bool,
                approx: bool):
    it = iter(rest)
    bfc1_ref = next(it) if bias else None
    bfc2_ref = next(it) if bias else None
    ln_s_ref = next(it) if pre_ln else None
    ln_b_ref = next(it) if pre_ln else None
    o_ref = next(it)

    xb = x_ref[0]                       # (S, C)
    cd = xb.dtype
    if pre_ln:
        xn, _, _, _ = _ln_fwd(xb, ln_s_ref, ln_b_ref)
        xn = xn.astype(cd)
    else:
        xn = xb

    h = jax.lax.dot_general(
        xn, wfc1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (S, 4C) fp32
    if bias:
        h = h + bfc1_ref[...].astype(jnp.float32)
    g = _gelu_f32(h, approx).astype(cd)
    y = jax.lax.dot_general(
        g, wfc2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias:
        y = y + bfc2_ref[...].astype(jnp.float32)
    o_ref[0] = xb + y.astype(cd)


def _bwd_kernel(x_ref, do_ref, wfc1_ref, wfc2_ref, *rest, pre_ln: bool,
                bias: bool, approx: bool):
    it = iter(rest)
    bfc1_ref = next(it) if bias else None
    ln_s_ref = next(it) if pre_ln else None
    ln_b_ref = next(it) if pre_ln else None
    dx_ref = next(it)
    dwfc1_ref = next(it)    # (C, 4C) fp32 accumulator
    dwfc2_ref = next(it)    # (4C, C) fp32 accumulator
    dbfc1_ref = next(it) if bias else None   # (1, 4C)
    dbfc2_ref = next(it) if bias else None   # (1, C)
    dln_s_ref = next(it) if pre_ln else None
    dln_b_ref = next(it) if pre_ln else None

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwfc1_ref[...] = jnp.zeros_like(dwfc1_ref)
        dwfc2_ref[...] = jnp.zeros_like(dwfc2_ref)
        if bias:
            dbfc1_ref[...] = jnp.zeros_like(dbfc1_ref)
            dbfc2_ref[...] = jnp.zeros_like(dbfc2_ref)
        if pre_ln:
            dln_s_ref[...] = jnp.zeros_like(dln_s_ref)
            dln_b_ref[...] = jnp.zeros_like(dln_b_ref)

    xb = x_ref[0]
    do = do_ref[0]                      # (S, C)
    cd = xb.dtype

    # ---- forward recompute ----
    if pre_ln:
        xn_f, xhat, rstd, g_ln = _ln_fwd(xb, ln_s_ref, ln_b_ref)
        xn = xn_f.astype(cd)
    else:
        xn = xb
    h = jax.lax.dot_general(
        xn, wfc1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (S, 4C) fp32
    if bias:
        h = h + bfc1_ref[...].astype(jnp.float32)
    g = _gelu_f32(h, approx).astype(cd)

    # ---- backward ----
    # dWfc2 += g^T do (A^T B over the S sublanes)
    dwfc2_ref[...] += jax.lax.dot_general(
        g, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias:
        dbfc2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0,
                                  keepdims=True)
    # d_g = do wfc2^T (direct lane-lane contraction)
    d_g = jax.lax.dot_general(
        do, wfc2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (S, 4C) fp32
    d_h = (d_g * _dgelu_f32(h, approx)).astype(cd)

    dwfc1_ref[...] += jax.lax.dot_general(
        xn, d_h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias:
        dbfc1_ref[...] += jnp.sum(d_h.astype(jnp.float32), axis=0,
                                  keepdims=True)
    # d_xn = d_h wfc1^T (direct)
    d_xn = jax.lax.dot_general(
        d_h, wfc1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (S, C) fp32

    if pre_ln:
        dln_s_ref[...] += jnp.sum(d_xn * xhat, axis=0, keepdims=True)
        dln_b_ref[...] += jnp.sum(d_xn, axis=0, keepdims=True)
        d_xhat = d_xn * g_ln
        dx = rstd * (d_xhat
                     - jnp.mean(d_xhat, axis=-1, keepdims=True)
                     - xhat * jnp.mean(d_xhat * xhat, axis=-1,
                                       keepdims=True))
    else:
        dx = d_xn
    dx_ref[0] = (dx + do.astype(jnp.float32)).astype(dx_ref.dtype)


def _rows_per_program(N, S, Hd, *, bwd: bool) -> int:
    """Rows of the (N, S, C) input grouped into one kernel program.

    The sub-layer is purely row-wise (LN over the last dim, matmuls over
    rows), so R rows can legally fuse into one (R*S, C) block, widening the
    matmul M dimension. Measured on v5e at GENIE_35M B=16 (full train
    step): NEUTRAL — fwd/bwd 1/1 = 0.2505 s/step, 4/2 = 0.2489, 8/4 =
    0.2519 — Mosaic's double-buffered sequential grid already keeps the
    MXU fed at one S=256 row per program, so the default stays 1.
    TPU1X_MLP_ROWS / TPU1X_MLP_ROWS_BWD override for (re-)tuning on other
    shapes or hardware; R must divide N = B*T.
    """
    import os
    env = os.environ.get("TPU1X_MLP_ROWS_BWD" if bwd else "TPU1X_MLP_ROWS")
    r = int(env) if env else 1
    return r if N % r == 0 else 1


def _group_rows(t, r):
    n, s, c = t.shape
    return t.reshape(n // r, r * s, c)


@functools.partial(jax.jit, static_argnames=("pre_ln", "bias", "approx",
                                             "interpret"))
def _mlp_fwd(x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b, *, pre_ln, bias, approx,
             interpret):
    Hd = wfc1.shape[1]
    r = _rows_per_program(x.shape[0], x.shape[1], Hd, bwd=False)
    true_shape, x = x.shape, _group_rows(x, r)
    N, S, C = x.shape
    cd = x.dtype
    cast = lambda t: (t if t is None or t.dtype == cd  # noqa: E731
                      else t.astype(cd))
    w1, w2, b1, b2 = map(cast, (wfc1, wfc2, bfc1, bfc2))
    row = pl.BlockSpec((1, S, C), lambda n: (n, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda n: (0,) * len(shp), memory_space=pltpu.VMEM)
    in_specs = [row, full((C, Hd)), full((Hd, C))]
    operands = [x, w1, w2]
    if bias:
        in_specs += [full((1, Hd)), full((1, C))]
        operands += [b1.reshape(1, Hd), b2.reshape(1, C)]
    if pre_ln:
        in_specs += [full((1, C)), full((1, C))]
        operands += [ln_s.reshape(1, C), ln_b.reshape(1, C)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, pre_ln=pre_ln, bias=bias,
                          approx=approx),
        out_shape=jax.ShapeDtypeStruct((N, S, C), cd),
        grid=(N,),
        in_specs=in_specs,
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * S * C * Hd,
            bytes_accessed=(2 * N * S * C + 2 * C * Hd) * x.dtype.itemsize,
            transcendentals=N * S * Hd,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(true_shape)


@functools.partial(jax.jit, static_argnames=("pre_ln", "bias", "approx",
                                             "interpret"))
def _mlp_bwd(x, dout, wfc1, wfc2, bfc1, ln_s, ln_b, *, pre_ln, bias, approx,
             interpret):
    Hd = wfc1.shape[1]
    r = _rows_per_program(x.shape[0], x.shape[1], Hd, bwd=True)
    true_shape = x.shape
    x, dout = _group_rows(x, r), _group_rows(dout, r)
    N, S, C = x.shape
    cd = x.dtype
    cast = lambda t: (t if t is None or t.dtype == cd  # noqa: E731
                      else t.astype(cd))
    w1, w2, b1 = map(cast, (wfc1, wfc2, bfc1))
    row = pl.BlockSpec((1, S, C), lambda n: (n, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda n: (0,) * len(shp), memory_space=pltpu.VMEM)
    in_specs = [row, row, full((C, Hd)), full((Hd, C))]
    operands = [x, dout, w1, w2]
    if bias:
        in_specs.append(full((1, Hd)))
        operands.append(b1.reshape(1, Hd))
    if pre_ln:
        in_specs += [full((1, C)), full((1, C))]
        operands += [ln_s.reshape(1, C), ln_b.reshape(1, C)]

    out_shapes = [jax.ShapeDtypeStruct((N, S, C), cd),
                  jax.ShapeDtypeStruct((C, Hd), jnp.float32),
                  jax.ShapeDtypeStruct((Hd, C), jnp.float32)]
    out_specs = [row, full((C, Hd)), full((Hd, C))]
    if bias:
        out_shapes += [jax.ShapeDtypeStruct((1, Hd), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)]
        out_specs += [full((1, Hd)), full((1, C))]
    if pre_ln:
        out_shapes += [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        out_specs += [full((1, C))] * 2

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, pre_ln=pre_ln, bias=bias,
                          approx=approx),
        out_shape=tuple(out_shapes),
        grid=(N,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=12 * N * S * C * Hd,
            bytes_accessed=(3 * N * S * C + 4 * C * Hd) * x.dtype.itemsize,
            transcendentals=2 * N * S * Hd,
        ),
        interpret=interpret,
    )(*operands)

    it = iter(outs)
    dx = next(it).reshape(true_shape)
    dwfc1 = next(it)
    dwfc2 = next(it)
    dbfc1 = next(it).reshape(Hd) if bias else None
    dbfc2 = next(it).reshape(C) if bias else None
    dln_s = next(it).reshape(C) if pre_ln else None
    dln_b = next(it).reshape(C) if pre_ln else None
    return dx, dwfc1, dwfc2, dbfc1, dbfc2, dln_s, dln_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mlp_diff(approx, interpret, x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b):
    return _mlp_fwd(x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b,
                    pre_ln=ln_s is not None, bias=bfc1 is not None,
                    approx=approx, interpret=interpret)


def _mlp_diff_fwd(approx, interpret, x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b):
    out = _mlp_diff(approx, interpret, x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b)
    return out, (x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b)


def _mlp_diff_bwd(approx, interpret, res, dout):
    x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b = res
    dx, dwfc1, dwfc2, dbfc1, dbfc2, dln_s, dln_b = _mlp_bwd(
        x, dout, wfc1, wfc2, bfc1, ln_s, ln_b, pre_ln=ln_s is not None,
        bias=bfc1 is not None, approx=approx, interpret=interpret)

    def like(g, p):
        return None if p is None else g.astype(p.dtype)

    return (dx.astype(x.dtype), like(dwfc1, wfc1), like(dwfc2, wfc2),
            like(dbfc1, bfc1), like(dbfc2, bfc2), like(dln_s, ln_s),
            like(dln_b, ln_b))


_mlp_diff.defvjp(_mlp_diff_fwd, _mlp_diff_bwd)


def mlp_train_block(x, wfc1, wfc2, *, bfc1=None, bfc2=None, ln_scale=None,
                    ln_bias=None, gelu_approx: bool = False,
                    interpret: bool = None):
    """Differentiable fused MLP sub-layer: x + fc2(gelu(fc1(ln2(x)))).

    Args:
        x: (N, S, C) residual stream.
        wfc1: (C, hidden); wfc2: (hidden, C).
        bfc1/bfc2: optional biases (both or neither — the reference's
            mlp_bias flag sets both, st_transformer.py:13-20).
        ln_scale/ln_bias: optional (C,) norm2 params (None for the qk_norm
            configs where norm2 is Identity).
        gelu_approx: tanh approximation (GenieConfig.gelu_approx); the
            default exact path uses the in-kernel rational erf (see module
            docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert (bfc1 is None) == (bfc2 is None)
    assert (ln_scale is None) == (ln_bias is None)
    return _mlp_diff(gelu_approx, interpret, x, wfc1, wfc2, bfc1, bfc2,
                     ln_scale, ln_bias)


def mlp_train_block_reference(x, wfc1, wfc2, *, bfc1=None, bfc2=None,
                              ln_scale=None, ln_bias=None,
                              gelu_approx: bool = False):
    """jnp oracle (exact lax.erf GELU, the XLA train path's semantics)."""
    cd = x.dtype
    if ln_scale is not None:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
            - jnp.square(mu)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
              * ln_scale.astype(jnp.float32)
              + ln_bias.astype(jnp.float32)).astype(cd)
    else:
        xn = x
    h = jnp.dot(xn, wfc1.astype(cd), preferred_element_type=jnp.float32)
    if bfc1 is not None:
        h = h + bfc1.astype(jnp.float32)
    g = jax.nn.gelu(h, approximate=gelu_approx).astype(cd)
    y = jnp.dot(g, wfc2.astype(cd), preferred_element_type=jnp.float32)
    if bfc2 is not None:
        y = y + bfc2.astype(jnp.float32)
    return x + y.astype(cd)
