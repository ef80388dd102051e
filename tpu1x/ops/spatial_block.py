"""Fused spatial attention block Pallas TPU kernel (serving/decode path).

One program per batch row fuses the ENTIRE spatial half of an STBlock:
pre-LayerNorm -> qkv projection -> bidirectional multi-head attention over
S tokens -> output projection -> residual add. This is the monolithic
decode-step building block: at decode shapes the XLA lowering of spatial
attention materializes fp32 (rows, H, S, S) logits in HBM (134 MB/layer at
GENIE_138M B=16 — measured 330-590 us/layer/call, ~25% of rollout wall,
benchmarks/profile_gen.py), while this kernel keeps every intermediate —
qkv, per-head logits, probabilities, attention output — in VMEM. HBM
traffic is one read of x and the weights and one write of the output.

Layout strategy (Mosaic): C stays the lane dimension for all HBM tensors;
reshapes splitting the minor dim (C -> (H, D)) are unsupported on TPU, and
transposing to (rows, H, S, D) around a kernel is what makes the flash
kernel lose at decode shapes (PARITY.md r3). Instead the qkv matmul is
computed TRANSPOSED — qkv^T (3C, S) = W^T (ln x)^T via a single
dot_general — so each head's q/k/v is a *sublane* slice [h*D:(h+1)*D, :]
(D=32-aligned sublane slicing is free; lane slicing at 32 is not). Per-head
attention then runs as two dot_generals in Mosaic-native forms (lhs
transpose is free on the MXU; no operand ever needs a real relayout):
    logits^T (S_k, S_q) = k_h^T q_h   (contract the D sublanes, A^T B)
    out^T    (D, S_q)   = v_h p^T     (contract the S_k lanes/sublanes, A B)
with fp32 accumulation on the MXU and fp32 softmax over the *sublane* axis
of the transposed logits (computing logits^T instead of logits makes the PV
matmul native — no relayout per head). Measured in-situ on v5e at
GENIE_138M shapes (chained-call delta, this file's microbench history):
(32, 256, 512): 314 us fused vs 520 us XLA; (128, 256, 512): 1297 vs 2282;
(16, 256, 512): 156 vs 114 — XLA keeps the single-frame decode call, the
kernel takes the pair and prefill calls (tpu1x/serving.py picks by rows).

The optional per-head fp32 qk-LayerNorm (reference genie/attention.py:42-47:
one LN over head_dim, params shared between q and k and across heads) is
applied in-kernel over the D sublanes, closing the qk_norm fast-path gap
(VERDICT r3 weak #6).

Replaces: xformers memory_efficient_attention + the surrounding
LN/qkv/proj ops of the reference's spatial attention
(genie/attention.py:65-83, genie/st_transformer.py:70-76) on the decode
path. `spatial_block_reference` is the jnp parity oracle (the
test_attention.py pattern); parity: tests/test_spatial_block.py and on-chip
benchmarks/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x_f32, scale_1C, bias_1C, eps=1e-5):
    """fp32 LayerNorm over the lane (last) axis of (S, C)."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32), axis=-1, keepdims=True) - jnp.square(mu)
    return (x_f32 - mu) * jax.lax.rsqrt(var + eps) * scale_1C + bias_1C


def _kernel(x_ref, wqkv_ref, wproj_ref, *rest, num_heads: int, scale: float,
            pre_ln: bool, qkv_bias: bool, proj_bias: bool, qk_norm: bool,
            rows: int):
    it = iter(rest)
    bqkv_ref = next(it) if qkv_bias else None
    bproj_ref = next(it) if proj_bias else None
    ln_s_ref = next(it) if pre_ln else None
    ln_b_ref = next(it) if pre_ln else None
    qk_s_ref = next(it) if qk_norm else None
    qk_b_ref = next(it) if qk_norm else None
    o_ref = next(it)
    ot_ref = next(it)  # (C, S) scratch: transposed attention output
    for r in range(rows):
        _one_row(x_ref, wqkv_ref, wproj_ref, bqkv_ref, bproj_ref, ln_s_ref,
                 ln_b_ref, qk_s_ref, qk_b_ref, o_ref, ot_ref, r,
                 num_heads=num_heads, scale=scale, pre_ln=pre_ln,
                 qkv_bias=qkv_bias, proj_bias=proj_bias, qk_norm=qk_norm)


def _one_row(x_ref, wqkv_ref, wproj_ref, bqkv_ref, bproj_ref, ln_s_ref,
             ln_b_ref, qk_s_ref, qk_b_ref, o_ref, ot_ref, r, *,
             num_heads: int, scale: float, pre_ln: bool, qkv_bias: bool,
             proj_bias: bool, qk_norm: bool):
    xb = x_ref[r]                       # (S, C) bf16
    S, C = xb.shape
    H = num_heads
    D = C // H
    cd = xb.dtype

    if pre_ln:
        xn = _ln_rows(xb.astype(jnp.float32), ln_s_ref[0].astype(jnp.float32),
                      ln_b_ref[0].astype(jnp.float32)).astype(cd)
    else:
        xn = xb

    # qkv, transposed: (3C, S) = W (C, 3C) ^T contracted with xn (S, C) lanes
    qkvt = jax.lax.dot_general(
        wqkv_ref[...], xn, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if qkv_bias:
        qkvt = qkvt + bqkv_ref[...].astype(jnp.float32)  # (3C, 1) broadcast
    qkvt = qkvt.astype(cd)

    for h in range(H):
        qh = qkvt[h * D:(h + 1) * D, :]            # (D, S)
        kh = qkvt[C + h * D:C + (h + 1) * D, :]
        vh = qkvt[2 * C + h * D:2 * C + (h + 1) * D, :]
        if qk_norm:
            # shared fp32 LN over head_dim (the D sublanes), params shared
            # between q and k and across heads (genie/attention.py:31-47)
            qs = qk_s_ref[...].astype(jnp.float32)   # (D, 1)
            qb = qk_b_ref[...].astype(jnp.float32)

            def hln(t):
                tf = t.astype(jnp.float32)
                mu = jnp.mean(tf, axis=0, keepdims=True)
                var = (jnp.mean(jnp.square(tf), axis=0, keepdims=True)
                       - jnp.square(mu))
                return ((tf - mu) * jax.lax.rsqrt(var + 1e-5) * qs
                        + qb).astype(cd)
            qh, kh = hln(qh), hln(kh)
        # logits^T (S_k, S_q) = k_h^T q_h, fp32 on the MXU (native A^T B)
        logits_t = jax.lax.dot_general(
            kh, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits_t, axis=0, keepdims=True)
        e = jnp.exp(logits_t - m)
        # reciprocal-multiply: a (1, S) reciprocal + (S, S) mul instead of
        # (S, S) fp32 divides (divides are multi-cycle on the VPU)
        pt = (e * (1.0 / jnp.sum(e, axis=0, keepdims=True))).astype(cd)
        # out^T (D, S_q) = v_h @ p^T — native (D, S_k) x (S_k, S_q)
        oh = jax.lax.dot_general(
            vh, pt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ot_ref[h * D:(h + 1) * D, :] = oh.astype(cd)

    # proj: (S, C) = ot^T (C-sublanes contracted) @ wproj, then residual
    y = jax.lax.dot_general(
        ot_ref[...], wproj_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)
    if proj_bias:
        y = y + bproj_ref[...].astype(cd)
    o_ref[r] = xb + y


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "rows", "interpret"))
def spatial_block(x, wqkv, wproj, *, num_heads: int, scale: float,
                  bqkv=None, bproj=None, ln_scale=None, ln_bias=None,
                  qk_ln_scale=None, qk_ln_bias=None, rows: int = 1,
                  interpret=None):
    """x (N, S, C) -> x + proj(mha(qkv(ln(x)))), one fused kernel.

    Args:
        x: (N, S, C) residual stream, compute dtype (bf16).
        wqkv: (C, 3C); wproj: (C, C). Pass bf16 (prepare_serving_params).
        bqkv/bproj: optional (3C,)/(C,) biases.
        ln_scale/ln_bias: optional (C,) pre-LN params (fp32 stats). Omit for
            the qk_norm configs where norm1 is Identity
            (st_transformer.py:44,67).
        qk_ln_scale/qk_ln_bias: optional (D,) shared per-head qk-LN params.
        scale: logit scale (8/head_dim if muP else head_dim**-0.5).

    Returns (N, S, C) in x.dtype.
    """
    if interpret is None:  # kernels compile only on TPU
        interpret = jax.default_backend() != "tpu"
    N, S, C = x.shape
    pre_ln = ln_scale is not None
    qk_norm = qk_ln_scale is not None
    qkv_bias = bqkv is not None
    proj_bias = bproj is not None
    D = C // num_heads
    while N % rows:
        rows //= 2
    cast = lambda t: (t if t is None or t.dtype == x.dtype  # noqa: E731
                      else t.astype(x.dtype))
    wqkv, wproj, bqkv, bproj = map(cast, (wqkv, wproj, bqkv, bproj))

    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda n: (0,) * len(shp), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rows, S, C), lambda n: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        full((C, 3 * C)),
        full((C, C)),
    ]
    operands = [x, wqkv, wproj]
    if qkv_bias:
        in_specs.append(full((3 * C, 1)))
        operands.append(bqkv.reshape(3 * C, 1))
    if proj_bias:
        in_specs.append(full((1, C)))
        operands.append(bproj.reshape(1, C))
    if pre_ln:
        in_specs += [full((1, C)), full((1, C))]
        operands += [ln_scale.reshape(1, C), ln_bias.reshape(1, C)]
    if qk_norm:
        in_specs += [full((D, 1)), full((D, 1))]
        operands += [qk_ln_scale.reshape(D, 1), qk_ln_bias.reshape(D, 1)]

    kern = functools.partial(
        _kernel, num_heads=num_heads, scale=scale, pre_ln=pre_ln,
        qkv_bias=qkv_bias, proj_bias=proj_bias, qk_norm=qk_norm, rows=rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, S, C), x.dtype),
        grid=(N // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, S, C), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, S), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * C * (4 * C + 2 * S),
            bytes_accessed=(2 * N * S * C + 4 * C * C) * x.dtype.itemsize,
            transcendentals=N * num_heads * S * S,
        ),
        interpret=interpret,
    )(*operands)


def spatial_block_reference(x, wqkv, wproj, *, num_heads: int, scale: float,
                            bqkv=None, bproj=None, ln_scale=None,
                            ln_bias=None, qk_ln_scale=None, qk_ln_bias=None):
    """jnp oracle with the serving path's exact mixed-precision semantics
    (tpu1x/serving.py _pre_norm/_qkv/_spatial_attn)."""
    from tpu1x.ops.attention import mha_reference
    N, S, C = x.shape
    H = num_heads
    D = C // H
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
    qkv = jnp.dot(xn, wqkv.astype(cd))
    if bqkv is not None:
        qkv = qkv + bqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if qk_ln_scale is not None:
        def hln(t):
            th = t.reshape(N, S, H, D).astype(jnp.float32)
            mu = jnp.mean(th, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(th), axis=-1, keepdims=True) \
                - jnp.square(mu)
            tn = ((th - mu) * jax.lax.rsqrt(var + 1e-5)
                  * qk_ln_scale.astype(jnp.float32)
                  + qk_ln_bias.astype(jnp.float32))
            return tn.reshape(N, S, C).astype(cd)
        q, k = hln(q), hln(k)
    heads = lambda t: t.reshape(N, S, H, D)  # noqa: E731
    out = mha_reference(heads(q), heads(k), heads(v), scale=scale,
                        causal=False)
    y = jnp.dot(out.reshape(N, S, C), wproj.astype(cd))
    if bproj is not None:
        y = y + bproj.astype(cd)
    return x + y
