"""Fused temporal decode-attention Pallas TPU kernel.

The KV-cached MaskGIT decode step attends one query frame against the
temporal cache at every spatial position. This is the bandwidth-critical op
of generation: at GENIE_138M / batch 16 the per-layer cache slice is
2 x 67 MB, and the whole stacked cache (~4.3 GB) must stream from HBM once
per decode call. XLA cannot express "read the bf16 cache exactly once":
lowering the per-head contraction as multiply+reduce materializes an fp32
copy of the cache (4x write traffic, measured in benchmarks/profile_gen.py),
and a batched-matmul form needs a materialized transpose. This kernel reads
the bf16 cache block directly into VMEM, converts in-registers, and fuses
logits -> mask -> joint softmax (cache slots + current token) -> PV into one
pass — HBM traffic is exactly one read of K and V.

The kernel indexes the *stacked* (T, L, B, S, C) cache (T-major so the
sampler's per-frame commit is a contiguous slab write) with the `layer`
index fed through scalar prefetch into the BlockSpec index_map, so the
serving loop (tpu1x/serving.py) never slices the cache at the XLA level at
all. Because the layer index is a *runtime* scalar, the serving engine can
run its layer loop as a single `lax.scan` body (one traced copy of the
layer program instead of num_layers unrolled clones — ~32x smaller XLA
program and compile time at GENIE_138M) while the kernel still streams
exactly one layer's cache blocks from HBM per call.

Replaces: the reference's xformers memory-efficient attention on the
sampling path (genie/attention.py:65, used by st_mask_git.py:163-169).
`temporal_decode_attention_reference` is the jnp parity oracle (the
test_attention.py pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def quantize_kv(x, axis: int = -1):
    """Symmetric per-token int8 quantization of a K/V tensor over `axis`
    (the channel dim): returns (q int8, scale float32 with `axis` removed).

    Decode is HBM-bandwidth-bound on the cache stream (PARITY.md); an int8
    cache halves the bytes per decode call. Dequantization happens
    in-registers inside the kernel (scales fold into the per-token logits /
    probabilities, so no (T,S,C) dequant materializes).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def dequantize_kv(q, scale, axis: int = -1):
    """Inverse of `quantize_kv` (float32 result)."""
    return q.astype(jnp.float32) * jnp.expand_dims(scale, axis)


def temporal_decode_attention_reference(q, k_cache_l, v_cache_l, k_cur, v_cur,
                                        t_B, *, scale: float, num_heads: int):
    """jnp oracle. Args:
        q, k_cur, v_cur: (B, S, C) — current frame's projections, heads flat.
        k_cache_l, v_cache_l: (T, B, S, C) — one layer's cache (T-major).
        t_B: (B,) int32; cache slots >= t are masked out.
    Returns: (B, S, C) attention output in q.dtype.
    """
    B, S, C = q.shape
    T = k_cache_l.shape[0]
    H = num_heads
    D = C // H
    qf = q.astype(jnp.float32).reshape(1, B, S, H, D)
    kf = k_cache_l.astype(jnp.float32).reshape(T, B, S, H, D)
    logits = jnp.moveaxis((qf * kf).sum(-1), 0, 2) * scale  # (B, S, T, H)
    logit_s = (q.astype(jnp.float32) * k_cur.astype(jnp.float32)) \
        .reshape(B, S, H, D).sum(-1) * scale  # (B, S, H)
    t_iota = jnp.arange(T, dtype=jnp.int32)
    valid = t_iota[None, :] < t_B[:, None]  # (B, T)
    logits = jnp.where(valid[:, None, :, None], logits, _NEG_INF)
    m = jnp.maximum(jnp.max(logits, axis=2), logit_s)  # (B, S, H)
    e_c = jnp.exp(logits - m[:, :, None, :])
    e_s = jnp.exp(logit_s - m)
    denom = e_c.sum(axis=2) + e_s  # (B, S, H)
    p = e_c / denom[:, :, None, :]  # (B, S, T, H)
    vf = v_cache_l.astype(jnp.float32).reshape(T, B, S, H, D)
    out = (jnp.moveaxis(p, 2, 0)[..., None] * vf).sum(axis=0)  # (B, S, H, D)
    out = out + ((e_s / denom)[..., None]
                 * v_cur.astype(jnp.float32).reshape(B, S, H, D))
    return out.reshape(B, S, C).astype(q.dtype)


def _kernel(s_ref, q_ref, kc_ref, vc_ref, *rest, scale: float,
            num_heads: int, quantized: bool = False):
    # Mosaic note: C stays the lane dimension throughout — reshapes that
    # split the minor dim (C -> (H, D)) are unsupported on TPU. Per-head
    # reductions and broadcasts go through a constant 0/1 head-assignment
    # matrix E (C, H) as tiny MXU dots instead.
    # s_ref: scalar-prefetch int32 (1 + B,) = [layer, t_0, ..., t_{B-1}];
    # layer is consumed by the cache BlockSpec index_map.
    # quantized: cache blocks are int8 with per-token fp32 scales; the
    # scales fold into the (T, TS, H) logits / probabilities, so no
    # (T, TS, C) dequantized copy ever materializes. Scale refs are the
    # layer's full (1, B, T, S) slab (Mosaic requires the last two block
    # dims full/aligned; the slab is tiny and DMA'd once per layer).
    if quantized:
        ksc_ref, vsc_ref, kcur_ref, vcur_ref, o_ref = rest
    else:
        kcur_ref, vcur_ref, o_ref = rest
    b = pl.program_id(0)
    st = pl.program_id(1)
    tb = s_ref[1 + b]
    q = q_ref[0]                              # (TS, C) bf16
    kcur = kcur_ref[0]
    vcur = vcur_ref[0]
    k = kc_ref[:, 0, 0]                       # (T, TS, C) (T-major)
    v = vc_ref[:, 0, 0]
    T, TS, C = k.shape
    H = num_heads
    D = C // H
    cd = q.dtype                              # compute dtype (bf16)
    E = (jax.lax.broadcasted_iota(jnp.int32, (C, H), 0) // D
         == jax.lax.broadcasted_iota(jnp.int32, (C, H), 1)).astype(cd)

    # Per-head q.k reductions as MXU dots against the head-assignment
    # matrix: products stay bf16 (VPU) and accumulate fp32 on the MXU.
    prod = k.astype(cd) * q[None, :, :]       # (T, TS, C)
    logits = jnp.dot(prod.reshape(T * TS, C), E,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(T, TS, H) * scale
    if quantized:
        ksc = ksc_ref[0, b, :, pl.ds(st * TS, TS)]  # (T, TS) k scales
        logits = logits * ksc[:, :, None]
    logit_s = jnp.dot(q * kcur, E,
                      preferred_element_type=jnp.float32) * scale  # (TS, H)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, TS, H), 0)
    logits = jnp.where(t_iota < tb, logits, _NEG_INF)  # (T, TS, H)

    m = jnp.maximum(jnp.max(logits, axis=0), logit_s)  # (TS, H)
    e_c = jnp.exp(logits - m[None, :, :])
    e_s = jnp.exp(logit_s - m)
    denom = e_c.sum(axis=0) + e_s  # (TS, H)
    p = e_c / denom[None, :, :]  # (T, TS, H)
    if quantized:
        vsc = vsc_ref[0, b, :, pl.ds(st * TS, TS)]  # (T, TS) v scales
        p = p * vsc[:, :, None]  # fold v scales into probs
    p = p.astype(cd)
    p_exp = jnp.dot(p.reshape(T * TS, H), E.T,
                    preferred_element_type=jnp.float32
                    ).astype(cd).reshape(T, TS, C)
    acc = (p_exp * v.astype(cd)).astype(jnp.float32).sum(axis=0)  # (TS, C)
    ps_exp = jnp.dot((e_s / denom).astype(cd), E.T,
                     preferred_element_type=jnp.float32)
    out = acc + ps_exp * vcur.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def temporal_decode2_attention_reference(q_prev, q_cur, k_cache_l, v_cache_l,
                                         k_prev, v_prev, k_cur, v_cur,
                                         t_prev_B, *, scale: float,
                                         num_heads: int):
    """jnp oracle for the fused prev-commit + next-frame decode attention.

    One pass serves TWO query frames against the same cache read:
    - `prev` (frame t_prev, finalized tokens): attends cache slots < t_prev
      plus itself — the standard decode; its K/V (k_prev/v_prev) are what
      the caller commits to the cache.
    - `cur` (frame t_prev+1, masked tokens): attends cache slots < t_prev,
      plus prev's in-pass K/V (slot t_prev), plus itself.

    All of q_*, k_*, v_*: (B, S, C); caches (T, B, S, C). Returns
    (out_prev, out_cur) each (B, S, C).
    """
    out_prev = temporal_decode_attention_reference(
        q_prev, k_cache_l, v_cache_l, k_prev, v_prev, t_prev_B, scale=scale,
        num_heads=num_heads)
    # cur: treat prev as one extra unmasked slot by substituting it into the
    # cache at position t_prev, then mask < t_prev + 1
    cache_k2 = _with_slot(k_cache_l, k_prev, t_prev_B)
    cache_v2 = _with_slot(v_cache_l, v_prev, t_prev_B)
    out_cur = temporal_decode_attention_reference(
        q_cur, cache_k2, cache_v2, k_cur, v_cur, t_prev_B + 1, scale=scale,
        num_heads=num_heads)
    return out_prev, out_cur


def _with_slot(cache_l, x_BSC, t_B):
    """Write x into per-row slot t of a (T, B, S, C) per-layer cache."""
    T = cache_l.shape[0]
    t_iota = jnp.arange(T, dtype=jnp.int32)
    sel = (t_iota[:, None] == t_B[None, :])[:, :, None, None]
    return jnp.where(sel, x_BSC[None], cache_l)


def _kernel2(s_ref, qp_ref, qc_ref, kc_ref, vc_ref, *rest, scale: float,
             num_heads: int, quantized: bool = False):
    """Fused two-frame decode attention: one cache read serves both the
    prev-frame commit pass and the next frame's step-0 decode."""
    if quantized:
        (ksc_ref, vsc_ref, kp_ref, vp_ref, kcur_ref, vcur_ref,
         op_ref, oc_ref) = rest
    else:
        kp_ref, vp_ref, kcur_ref, vcur_ref, op_ref, oc_ref = rest
    b = pl.program_id(0)
    st = pl.program_id(1)
    tb = s_ref[1 + b]  # t_prev
    qp = qp_ref[0]                            # (TS, C) bf16
    qc = qc_ref[0]
    kp = kp_ref[0]
    vp = vp_ref[0]
    kcur = kcur_ref[0]
    vcur = vcur_ref[0]
    k = kc_ref[:, 0, 0]                       # (T, TS, C) (T-major)
    v = vc_ref[:, 0, 0]
    T, TS, C = k.shape
    H = num_heads
    D = C // H
    cd = qp.dtype
    E = (jax.lax.broadcasted_iota(jnp.int32, (C, H), 0) // D
         == jax.lax.broadcasted_iota(jnp.int32, (C, H), 1)).astype(cd)

    def head_logits(q):  # cache logits (T, TS, H) fp32
        prod = k.astype(cd) * q[None, :, :]
        out = jnp.dot(prod.reshape(T * TS, C), E,
                      preferred_element_type=jnp.float32)
        out = out.reshape(T, TS, H) * scale
        if quantized:
            ksc = ksc_ref[0, b, :, pl.ds(st * TS, TS)]  # (T, TS)
            out = out * ksc[:, :, None]
        return out

    def extra_logit(q, key):  # (TS, H)
        return jnp.dot(q * key, E,
                       preferred_element_type=jnp.float32) * scale

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, TS, H), 0)

    def softmax_pv(logits_c, extras):
        """Joint softmax over cache slots + extra (key, value) pairs."""
        m = jnp.max(logits_c, axis=0)  # (TS, H)
        e_x = []
        for lg, _ in extras:
            m = jnp.maximum(m, lg)
        e_c = jnp.exp(logits_c - m[None, :, :])
        denom = e_c.sum(axis=0)
        for lg, _ in extras:
            e = jnp.exp(lg - m)
            e_x.append(e)
            denom = denom + e
        p = e_c / denom[None, :, :]  # (T, TS, H)
        if quantized:
            vsc = vsc_ref[0, b, :, pl.ds(st * TS, TS)]  # (T, TS)
            p = p * vsc[:, :, None]  # fold v scales into probs
        p = p.astype(cd)
        p_exp = jnp.dot(p.reshape(T * TS, H), E.T,
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(T, TS, C)
        acc = (p_exp * v.astype(cd)).astype(jnp.float32).sum(axis=0)  # (TS, C)
        for e, (_, val) in zip(e_x, extras):
            pe = jnp.dot((e / denom).astype(cd), E.T,
                         preferred_element_type=jnp.float32)
            acc = acc + pe * val.astype(jnp.float32)
        return acc

    # prev: cache < t_prev, self = prev
    lp = jnp.where(t_iota < tb, head_logits(qp), _NEG_INF)
    op_ref[0] = softmax_pv(
        lp, [(extra_logit(qp, kp), vp)]).astype(op_ref.dtype)
    # cur: cache < t_prev, prev's in-pass K/V, self = cur
    lc = jnp.where(t_iota < tb, head_logits(qc), _NEG_INF)
    oc_ref[0] = softmax_pv(
        lc, [(extra_logit(qc, kp), vp),
             (extra_logit(qc, kcur), vcur)]).astype(oc_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "num_heads", "tile_s", "interpret"))
def temporal_decode2_attention(q_prev, q_cur, k_cache, v_cache, k_prev,
                               v_prev, k_cur, v_cur, t_prev_B, *, layer,
                               scale: float, num_heads: int, tile_s: int = 64,
                               interpret: bool = False,
                               k_scale=None, v_scale=None):
    """Fused prev-commit + next-frame decode attention against layer `layer`.

    Same cache contract as `temporal_decode_attention` ((T, L, B, S, C),
    runtime `layer` via scalar prefetch, optional int8 cache with per-token
    scales) but serves two query frames per cache read — the sampler's
    commit pass rides along with the next frame's step-0 decode (1 cache
    stream instead of 2).

    Returns (out_prev, out_cur) each (B, S, C) in q dtype.
    """
    B, S, C = q_prev.shape
    T, L = k_cache.shape[:2]
    quantized = k_scale is not None
    if quantized and tile_s < 128:
        tile_s = 128  # scale-slice lane alignment (see decode kernel)
    while S % tile_s:
        tile_s //= 2
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        t_prev_B.reshape(B).astype(jnp.int32)])

    bsc = pl.BlockSpec((1, tile_s, C), lambda b, st, s: (b, st, 0),
                       memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (T, 1, 1, tile_s, C), lambda b, st, s: (0, s[0], b, st, 0),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, B, T, S), lambda b, st, s: (s[0], 0, 0, 0),
        memory_space=pltpu.VMEM)
    grid = (B, S // tile_s)
    bytes_cache = 2 * tile_s * T * C * k_cache.dtype.itemsize
    out_sd = jax.ShapeDtypeStruct((B, S, C), q_prev.dtype)
    in_specs = [bsc, bsc, cache_spec, cache_spec]
    operands = [q_prev, q_cur, k_cache, v_cache]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
    in_specs += [bsc, bsc, bsc, bsc]
    operands += [k_prev, v_prev, k_cur, v_cur]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bsc, bsc),
    )
    return pl.pallas_call(
        functools.partial(_kernel2, scale=scale, num_heads=num_heads,
                          quantized=quantized),
        out_shape=(out_sd, out_sd),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * (2 * T + 3) * C,
            bytes_accessed=B * (S // tile_s) * bytes_cache,
            transcendentals=2 * B * S * (T + 2) * num_heads,
        ),
        interpret=interpret,
    )(scalars, *operands)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "num_heads", "tile_s", "interpret"))
def temporal_decode_attention(q, k_cache, v_cache, k_cur, v_cur, t_B, *,
                              layer, scale: float, num_heads: int,
                              tile_s: int = 64, interpret: bool = False,
                              k_scale=None, v_scale=None):
    """Fused decode attention against layer `layer` of the stacked cache.

    Args:
        q, k_cur, v_cur: (B, S, C).
        k_cache, v_cache: (T, L, B, S, C) — the FULL stacked T-major cache;
            only the blocks of `layer` are streamed from HBM. May be int8
            (with `k_scale`/`v_scale` (L, B, T, S) float32 per-token scales
            — layer-major so one layer's scale slab is a contiguous,
            Mosaic-aligned (1, B, T, S) block) — halves the HBM bytes of
            the bandwidth-bound cache stream.
        t_B: (B,) int32 per-row frame index.
        layer: int or traced int32 scalar (scalar-prefetched into the cache
            index_map — usable inside a lax.scan over layers).
    Returns: (B, S, C) in q.dtype.
    """
    B, S, C = q.shape
    T, L = k_cache.shape[:2]
    quantized = k_scale is not None
    if quantized and tile_s < 128:
        # the in-kernel scale slice offset st*tile_s must be provably
        # 128-aligned on the lane dim (Mosaic), so tiles are >=128 (or == S)
        tile_s = 128
    while S % tile_s:
        tile_s //= 2
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        t_B.reshape(B).astype(jnp.int32)])

    bsc = pl.BlockSpec((1, tile_s, C), lambda b, st, s: (b, st, 0),
                       memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (T, 1, 1, tile_s, C), lambda b, st, s: (0, s[0], b, st, 0),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, B, T, S), lambda b, st, s: (s[0], 0, 0, 0),
        memory_space=pltpu.VMEM)
    grid = (B, S // tile_s)
    bytes_cache = 2 * tile_s * T * C * k_cache.dtype.itemsize
    in_specs = [bsc, cache_spec, cache_spec]
    operands = [q, k_cache, v_cache]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
    in_specs += [bsc, bsc]
    operands += [k_cur, v_cur]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=bsc,
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, num_heads=num_heads,
                          quantized=quantized),
        out_shape=jax.ShapeDtypeStruct((B, S, C), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * (T + 1) * C,
            bytes_accessed=B * (S // tile_s) * bytes_cache,
            transcendentals=B * S * (T + 1) * num_heads,
        ),
        interpret=interpret,
    )(scalars, *operands)
