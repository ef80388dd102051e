"""Fused temporal-attention + MLP block Pallas TPU kernels (decode path).

The second half of the monolithic decode step (VERDICT r3 #1): everything
in an STBlock after the spatial half — temporal qkv projection,
cache-streaming decode attention, output projection, residual, pre-MLP
LayerNorm, MLP (gelu), residual — as ONE Pallas program per
(batch row, spatial tile). Together with tpu1x/ops/spatial_block.py the
whole decode-step layer body is two kernels; no (B, S, C) intermediate
ever round-trips HBM between them.

Attention math is identical to tpu1x/ops/decode_attention.py (the
E-matrix head-reduction trick in the heads-flat layout; runtime `layer`
into the stacked (T, L, B, S, C) cache via scalar prefetch). The pair
variant serves BOTH the prev-frame commit pass and the next frame's
step-0 decode from one cache stream; its input/output use the interleaved
(B, 2, S, C) layout so each program's two frames are one contiguous
block.

Replaces (reference): the temporal attention + MLP of an STBlock on the
sampling path (genie/st_transformer.py:77-83, genie/attention.py:65).
Oracles: `temporal_mlp_block_reference` / `..._pair_reference` (the
test_attention.py pattern); parity: tests/test_temporal_mlp_block.py and
on-chip benchmarks/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _head_matrix(C, H, dtype):
    D = C // H
    return (jax.lax.broadcasted_iota(jnp.int32, (C, H), 0) // D
            == jax.lax.broadcasted_iota(jnp.int32, (C, H), 1)).astype(dtype)


def _ln_rows(x, scale_1C, bias_1C, out_dtype, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale_1C.astype(jnp.float32)
            + bias_1C.astype(jnp.float32)).astype(out_dtype)


def _mlp_tail(x1, ln_s, ln_b, wfc1, bfc1, wfc2, bfc2, gelu_tanh: bool):
    """x1 + fc2(gelu(fc1(ln2(x1)))) in the engine's dtype semantics."""
    cd = x1.dtype
    h = _ln_rows(x1, ln_s, ln_b, cd)
    h = jax.lax.dot_general(h, wfc1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cd)
    if bfc1 is not None:
        h = h + bfc1.astype(cd)
    h = jax.nn.gelu(h, approximate=gelu_tanh)
    y = jax.lax.dot_general(h, wfc2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cd)
    if bfc2 is not None:
        y = y + bfc2.astype(cd)
    return x1 + y


def _attn_core(q, k, v, tb, extras, E, scale):
    """Joint softmax over cache slots < tb plus `extras` [(k_e, v_e), ...].

    q: (TS, C); k/v: (T, TS, C) cache; returns fp32 (TS, C).
    Same math as decode_attention._kernel/_kernel2.
    """
    T, TS, C = k.shape
    H = E.shape[1]
    cd = q.dtype
    prod = k.astype(cd) * q[None, :, :]
    logits = jnp.dot(prod.reshape(T * TS, C), E,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(T, TS, H) * scale
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, TS, H), 0)
    logits = jnp.where(t_iota < tb, logits, _NEG_INF)

    ex_logits = [jnp.dot(q * ke, E,
                         preferred_element_type=jnp.float32) * scale
                 for ke, _ in extras]  # each (TS, H)
    m = jnp.max(logits, axis=0)
    for lg in ex_logits:
        m = jnp.maximum(m, lg)
    e_c = jnp.exp(logits - m[None, :, :])
    denom = e_c.sum(axis=0)
    e_x = []
    for lg in ex_logits:
        e = jnp.exp(lg - m)
        e_x.append(e)
        denom = denom + e
    inv = 1.0 / denom
    p = (e_c * inv[None, :, :]).astype(cd)
    p_exp = jnp.dot(p.reshape(T * TS, H), E.T,
                    preferred_element_type=jnp.float32
                    ).astype(cd).reshape(T, TS, C)
    acc = (p_exp * v.astype(cd)).astype(jnp.float32).sum(axis=0)
    for e, (_, ve) in zip(e_x, extras):
        pe = jnp.dot((e * inv).astype(cd), E.T,
                     preferred_element_type=jnp.float32)
        acc = acc + pe * ve.astype(jnp.float32)
    return acc


def _qkv_split(xb, wqkv, bqkv, C):
    cd = xb.dtype
    qkv = jax.lax.dot_general(xb, wqkv, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32).astype(cd)
    if bqkv is not None:
        qkv = qkv + bqkv.astype(cd)
    return qkv[:, :C], qkv[:, C:2 * C], qkv[:, 2 * C:]


def _proj_residual(x, out_f32, wproj, bproj):
    cd = x.dtype
    y = jax.lax.dot_general(out_f32.astype(cd), wproj,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cd)
    if bproj is not None:
        y = y + bproj.astype(cd)
    return x + y


def _kernel_single(s_ref, x_ref, kc_ref, vc_ref, wqkv_ref, wproj_ref,
                   ln_s_ref, ln_b_ref, wfc1_ref, wfc2_ref, *rest,
                   scale: float, num_heads: int, gelu_tanh: bool,
                   qkv_bias: bool, proj_bias: bool, mlp_bias: bool):
    it = iter(rest)
    bqkv = it.__next__()[...] if qkv_bias else None
    bproj = it.__next__()[...] if proj_bias else None
    bfc1 = it.__next__()[...] if mlp_bias else None
    bfc2 = it.__next__()[...] if mlp_bias else None
    o_ref = next(it)
    kcur_ref = next(it)
    vcur_ref = next(it)

    b = pl.program_id(0)
    tb = s_ref[1 + b]
    xb = x_ref[0]                      # (TS, C)
    k = kc_ref[:, 0, 0]                # (T, TS, C)
    v = vc_ref[:, 0, 0]
    TS, C = xb.shape
    E = _head_matrix(C, num_heads, xb.dtype)

    q, kcur, vcur = _qkv_split(xb, wqkv_ref[...], bqkv, C)
    kcur_ref[0] = kcur
    vcur_ref[0] = vcur
    out = _attn_core(q, k, v, tb, [(kcur, vcur)], E, scale)
    x1 = _proj_residual(xb, out, wproj_ref[...], bproj)
    o_ref[0] = _mlp_tail(x1, ln_s_ref[...], ln_b_ref[...], wfc1_ref[...],
                         bfc1, wfc2_ref[...], bfc2, gelu_tanh)


def _kernel_pair(s_ref, x_ref, kc_ref, vc_ref, wqkv_ref, wproj_ref,
                 ln_s_ref, ln_b_ref, wfc1_ref, wfc2_ref, *rest,
                 scale: float, num_heads: int, gelu_tanh: bool,
                 qkv_bias: bool, proj_bias: bool, mlp_bias: bool):
    it = iter(rest)
    bqkv = it.__next__()[...] if qkv_bias else None
    bproj = it.__next__()[...] if proj_bias else None
    bfc1 = it.__next__()[...] if mlp_bias else None
    bfc2 = it.__next__()[...] if mlp_bias else None
    o_ref = next(it)
    kp_ref = next(it)
    vp_ref = next(it)

    b = pl.program_id(0)
    tb = s_ref[1 + b]                  # t_prev
    xb2 = x_ref[0]                     # (2, TS, C): [prev, cur]
    k = kc_ref[:, 0, 0]
    v = vc_ref[:, 0, 0]
    _, TS, C = xb2.shape
    E = _head_matrix(C, num_heads, xb2.dtype)
    wqkv = wqkv_ref[...]

    xp, xc = xb2[0], xb2[1]
    qp, kp, vp = _qkv_split(xp, wqkv, bqkv, C)
    qc, kcur, vcur = _qkv_split(xc, wqkv, bqkv, C)
    kp_ref[0] = kp
    vp_ref[0] = vp
    # prev: cache < t_prev, self = prev
    out_p = _attn_core(qp, k, v, tb, [(kp, vp)], E, scale)
    # cur: cache < t_prev, prev's in-pass K/V, self = cur
    out_c = _attn_core(qc, k, v, tb, [(kp, vp), (kcur, vcur)], E, scale)
    wproj = wproj_ref[...]
    x1p = _proj_residual(xp, out_p, wproj, bproj)
    x1c = _proj_residual(xc, out_c, wproj, bproj)
    ln_s, ln_b = ln_s_ref[...], ln_b_ref[...]
    wfc1, wfc2 = wfc1_ref[...], wfc2_ref[...]
    o_ref[0, 0] = _mlp_tail(x1p, ln_s, ln_b, wfc1, bfc1, wfc2, bfc2,
                            gelu_tanh)
    o_ref[0, 1] = _mlp_tail(x1c, ln_s, ln_b, wfc1, bfc1, wfc2, bfc2,
                            gelu_tanh)


def _common_call(kernel, x, k_cache, v_cache, t_B, layer, weights, flags,
                 scale, num_heads, gelu_tanh, tile_s, interpret, pair):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (wqkv, bqkv, wproj, bproj, ln_s, ln_b, wfc1, bfc1, wfc2, bfc2) = weights
    qkv_bias, proj_bias, mlp_bias = flags
    if pair:
        B, two, S, C = x.shape
        assert two == 2
    else:
        B, S, C = x.shape
    T, L = k_cache.shape[:2]
    F4 = wfc1.shape[1]
    while S % tile_s:
        tile_s //= 2
    cd = x.dtype
    cast = lambda t: (None if t is None else  # noqa: E731
                      (t if t.dtype == cd else t.astype(cd)))
    wqkv, bqkv, wproj, bproj = map(cast, (wqkv, bqkv, wproj, bproj))
    wfc1, bfc1, wfc2, bfc2 = map(cast, (wfc1, bfc1, wfc2, bfc2))

    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        t_B.reshape(B).astype(jnp.int32)])
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, st, s: (0,) * len(shp), memory_space=pltpu.VMEM)
    if pair:
        x_spec = pl.BlockSpec((1, 2, tile_s, C), lambda b, st, s: (b, 0, st, 0),
                              memory_space=pltpu.VMEM)
        out_sd = jax.ShapeDtypeStruct((B, 2, S, C), cd)
    else:
        x_spec = pl.BlockSpec((1, tile_s, C), lambda b, st, s: (b, st, 0),
                              memory_space=pltpu.VMEM)
        out_sd = jax.ShapeDtypeStruct((B, S, C), cd)
    kv_spec = pl.BlockSpec((1, tile_s, C), lambda b, st, s: (b, st, 0),
                           memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (T, 1, 1, tile_s, C), lambda b, st, s: (0, s[0], b, st, 0),
        memory_space=pltpu.VMEM)

    in_specs = [x_spec, cache_spec, cache_spec,
                full((C, 3 * C)), full((C, C)), full((1, C)), full((1, C)),
                full((C, F4)), full((F4, C))]
    operands = [x, k_cache, v_cache, wqkv, wproj,
                ln_s.reshape(1, C), ln_b.reshape(1, C), wfc1, wfc2]
    if qkv_bias:
        in_specs.append(full((1, 3 * C)))
        operands.append(bqkv.reshape(1, 3 * C))
    if proj_bias:
        in_specs.append(full((1, C)))
        operands.append(bproj.reshape(1, C))
    if mlp_bias:
        in_specs += [full((1, F4)), full((1, C))]
        operands += [bfc1.reshape(1, F4), bfc2.reshape(1, C)]

    kv_sd = jax.ShapeDtypeStruct((B, S, C), cd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, S // tile_s),
        in_specs=in_specs,
        out_specs=(x_spec if pair else kv_spec, kv_spec, kv_spec),
    )
    kern = functools.partial(
        kernel, scale=scale, num_heads=num_heads, gelu_tanh=gelu_tanh,
        qkv_bias=qkv_bias, proj_bias=proj_bias, mlp_bias=mlp_bias)
    rows = 2 if pair else 1
    return pl.pallas_call(
        kern,
        out_shape=(out_sd, kv_sd, kv_sd),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * B * S * C * (12 * C + 2 * (T + 2)),
            bytes_accessed=(B * (S // tile_s) * 2 * T * tile_s * C
                            * k_cache.dtype.itemsize),
            transcendentals=rows * B * S * (T + 2) * num_heads,
        ),
        interpret=interpret,
    )(scalars, *operands)


@functools.partial(jax.jit, static_argnames=(
    "scale", "num_heads", "gelu_tanh", "tile_s", "interpret"))
def temporal_mlp_block(x, k_cache, v_cache, t_B, *, layer, scale: float,
                       num_heads: int, wqkv, wproj, ln_scale, ln_bias,
                       wfc1, wfc2, bqkv=None, bproj=None, bfc1=None,
                       bfc2=None, gelu_tanh: bool = True, tile_s: int = 64,
                       interpret=None):
    """Single-frame fused temporal+MLP decode step.

    Args:
        x: (B, S, C) residual stream after the spatial half.
        k_cache/v_cache: (T, L, B, S, C) stacked bf16 caches.
        t_B: (B,) int32 frame index; cache slots >= t are masked.
        layer: int or traced scalar (scalar-prefetched cache index).

    Returns (x_out (B, S, C), k_cur (B, S, C), v_cur (B, S, C)):
    x_out = x1 + mlp(ln2(x1)) where x1 = x + proj(attn(...)); k_cur/v_cur
    are the frame's temporal K/V for the cache commit.
    """
    weights = (wqkv, bqkv, wproj, bproj, ln_scale, ln_bias, wfc1, bfc1,
               wfc2, bfc2)
    flags = (bqkv is not None, bproj is not None, bfc1 is not None)
    return _common_call(_kernel_single, x, k_cache, v_cache, t_B, layer,
                        weights, flags, scale, num_heads, gelu_tanh, tile_s,
                        interpret, pair=False)


@functools.partial(jax.jit, static_argnames=(
    "scale", "num_heads", "gelu_tanh", "tile_s", "interpret"))
def temporal_mlp_block_pair(z, k_cache, v_cache, t_prev_B, *, layer,
                            scale: float, num_heads: int, wqkv, wproj,
                            ln_scale, ln_bias, wfc1, wfc2, bqkv=None,
                            bproj=None, bfc1=None, bfc2=None,
                            gelu_tanh: bool = True, tile_s: int = 64,
                            interpret=None):
    """Pair (prev-commit + next-frame step-0) fused temporal+MLP step.

    z: (B, 2, S, C) interleaved [prev, cur] residual stream after the
    spatial half. Returns (z_out (B, 2, S, C), k_prev, v_prev (B, S, C)) —
    the caller commits k_prev/v_prev at slot t_prev. One cache stream
    serves both frames (decode_attention._kernel2 semantics).
    """
    weights = (wqkv, bqkv, wproj, bproj, ln_scale, ln_bias, wfc1, bfc1,
               wfc2, bfc2)
    flags = (bqkv is not None, bproj is not None, bfc1 is not None)
    return _common_call(_kernel_pair, z, k_cache, v_cache, t_prev_B, layer,
                        weights, flags, scale, num_heads, gelu_tanh, tile_s,
                        interpret, pair=True)


def temporal_mlp_block_reference(x, k_cache_l, v_cache_l, t_B, *,
                                 scale: float, num_heads: int, wqkv, wproj,
                                 ln_scale, ln_bias, wfc1, wfc2, bqkv=None,
                                 bproj=None, bfc1=None, bfc2=None,
                                 gelu_tanh: bool = True):
    """jnp oracle (one layer's (T, B, S, C) cache slices), serving-path
    mixed-precision semantics."""
    from tpu1x.ops.decode_attention import (
        temporal_decode_attention_reference)
    cd = x.dtype
    dense = lambda t, w, b: (  # noqa: E731
        jnp.dot(t, w.astype(cd)) + (0 if b is None else b.astype(cd)))
    qkv = dense(x, wqkv, bqkv)
    C = x.shape[-1]
    q, k_cur, v_cur = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    out = temporal_decode_attention_reference(
        q, k_cache_l, v_cache_l, k_cur, v_cur, t_B, scale=scale,
        num_heads=num_heads)
    x1 = x + dense(out, wproj, bproj)
    xf = x1.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(cd)
    h = jax.nn.gelu(dense(h, wfc1, bfc1), approximate=gelu_tanh)
    return x1 + dense(h, wfc2, bfc2), k_cur, v_cur


def temporal_mlp_block_pair_reference(z, k_cache_l, v_cache_l, t_prev_B, *,
                                      scale: float, num_heads: int, wqkv,
                                      wproj, ln_scale, ln_bias, wfc1, wfc2,
                                      bqkv=None, bproj=None, bfc1=None,
                                      bfc2=None, gelu_tanh: bool = True):
    """jnp oracle for the pair variant; z (B, 2, S, C) interleaved."""
    from tpu1x.ops.decode_attention import (
        temporal_decode2_attention_reference)
    cd = z.dtype
    dense = lambda t, w, b: (  # noqa: E731
        jnp.dot(t, w.astype(cd)) + (0 if b is None else b.astype(cd)))
    xp, xc = z[:, 0], z[:, 1]
    C = z.shape[-1]
    qkv_p = dense(xp, wqkv, bqkv)
    qkv_c = dense(xc, wqkv, bqkv)
    qp, kp, vp = qkv_p[..., :C], qkv_p[..., C:2 * C], qkv_p[..., 2 * C:]
    qc, kc, vc = qkv_c[..., :C], qkv_c[..., C:2 * C], qkv_c[..., 2 * C:]
    out_p, out_c = temporal_decode2_attention_reference(
        qp, qc, k_cache_l, v_cache_l, kp, vp, kc, vc, t_prev_B,
        scale=scale, num_heads=num_heads)

    def tail(x, out):
        x1 = x + dense(out, wproj, bproj)
        xf = x1.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
            - jnp.square(mu)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
             * ln_scale.astype(jnp.float32)
             + ln_bias.astype(jnp.float32)).astype(cd)
        h = jax.nn.gelu(dense(h, wfc1, bfc1), approximate=gelu_tanh)
        return x1 + dense(h, wfc2, bfc2)

    return jnp.stack([tail(xp, out_p), tail(xc, out_c)], axis=1), kp, vp
