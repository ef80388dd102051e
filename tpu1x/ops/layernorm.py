"""Fused LayerNorm Pallas TPU kernel (fp32 statistics, bf16 in/out).

Why: the decode/serving path is pre-LN (qk_norm=False shipped configs,
genie/configs/magvit_n32_h8_d256.json) — 2 LayerNorms per STBlock per decode
step. XLA lowers the fp32 LN on a bf16 stream as convert + two reduce
fusions + normalize, measured at ~12% of HBM bandwidth and ~23% of decode
wall time at GENIE_138M (benchmarks/profile_gen.py). This kernel does one
read / one write per row block: load bf16, compute mean/var/normalize in
fp32 registers, emit bf16.

Parity oracle: `layer_norm_reference` (flax nn.LayerNorm semantics,
epsilon 1e-5 like torch nn.LayerNorm in the reference, st_transformer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm_reference(x, scale, bias, eps: float = 1e-5):
    """fp32 LayerNorm over the last axis; returns fp32 (cast at call site)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (rows, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows",
                                             "out_dtype", "interpret"))
def layer_norm(x, scale, bias, *, eps: float = 1e-5, block_rows: int = 256,
               out_dtype=None, interpret: bool = False):
    """LayerNorm over the last axis of `x` (any leading shape).

    Args:
        x: (..., C); C must be a multiple of 128 for the TPU lane dim
            (fall back to the reference otherwise).
        scale, bias: (C,) parameters (any float dtype; math is fp32).
        out_dtype: output dtype; default x.dtype.
    """
    C = x.shape[-1]
    out_dtype = out_dtype or x.dtype
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if (C % 128 or rows % 8
            or (not interpret and jax.default_backend() != "tpu")):
        return layer_norm_reference(x, scale, bias, eps).astype(out_dtype)
    x2 = x.reshape(rows, C)
    while rows % block_rows:
        block_rows //= 2
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, C), out_dtype),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda r: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(x.shape)
