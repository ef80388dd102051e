"""Parity tests for the fused spatial-block kernel (tpu1x/ops/spatial_block.py).

The kernel-vs-oracle pattern of the reference's test_attention.py: the jnp
oracle `spatial_block_reference` reproduces the serving path's exact
mixed-precision semantics; the Pallas kernel (interpret mode off-TPU) must
match it closely in bf16 and tightly in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.ops.spatial_block import spatial_block, spatial_block_reference

INTERPRET = jax.default_backend() != "tpu"


def make_inputs(key, N, S, C, H, dtype, qkv_bias, proj_bias, pre_ln, qk_norm):
    ks = jax.random.split(key, 9)
    D = C // H
    kw = dict(
        x=(jax.random.normal(ks[0], (N, S, C)) * 0.5).astype(dtype),
        wqkv=(jax.random.normal(ks[1], (C, 3 * C)) * 0.05).astype(dtype),
        wproj=(jax.random.normal(ks[2], (C, C)) * 0.05).astype(dtype),
    )
    if qkv_bias:
        kw["bqkv"] = (jax.random.normal(ks[3], (3 * C,)) * 0.1).astype(dtype)
    if proj_bias:
        kw["bproj"] = (jax.random.normal(ks[4], (C,)) * 0.1).astype(dtype)
    if pre_ln:
        kw["ln_scale"] = 1.0 + 0.1 * jax.random.normal(ks[5], (C,))
        kw["ln_bias"] = 0.1 * jax.random.normal(ks[6], (C,))
    if qk_norm:
        kw["qk_ln_scale"] = 1.0 + 0.1 * jax.random.normal(ks[7], (D,))
        kw["qk_ln_bias"] = 0.1 * jax.random.normal(ks[8], (D,))
    return kw


@pytest.mark.parametrize("qkv_bias,proj_bias", [(False, True), (True, False)])
@pytest.mark.parametrize("pre_ln,qk_norm", [(True, False), (False, True),
                                            (False, False)])
def test_parity_small(qkv_bias, proj_bias, pre_ln, qk_norm):
    N, S, C, H = 3, 32, 64, 4
    kw = make_inputs(jax.random.PRNGKey(0), N, S, C, H, jnp.float32,
                     qkv_bias, proj_bias, pre_ln, qk_norm)
    scale = (C // H) ** -0.5
    got = spatial_block(num_heads=H, scale=scale, interpret=INTERPRET, **kw)
    want = spatial_block_reference(num_heads=H, scale=scale, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_parity_bf16_bench_heads():
    """GENIE-like head geometry (D=32) in bf16, scaled-down S."""
    N, S, C, H = 2, 64, 256, 8
    kw = make_inputs(jax.random.PRNGKey(1), N, S, C, H, jnp.bfloat16,
                     False, True, True, False)
    scale = (C // H) ** -0.5
    got = spatial_block(num_heads=H, scale=scale, interpret=INTERPRET, **kw)
    want = spatial_block_reference(num_heads=H, scale=scale, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_matches_serving_layer_math():
    """Kernel == the DecodeEngine's n1 + spatial attention + residual."""
    from tpu1x.model_zoo import genie_tiny
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.serving import DecodeEngine

    config = genie_tiny(dtype="float32")
    model = STMaskGIT(config)
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    lp = jax.tree_util.tree_map(lambda a: a[0],
                                params["decoder"]["layers"])
    engine = DecodeEngine(config, attn_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (3, config.S, config.d_model), jnp.float32)

    sp = lp["spatial_attn"]
    want = x + engine._spatial_attn(sp, engine._pre_norm(lp["norm1"], x))
    got = spatial_block(
        x, sp["qkv"]["kernel"], sp["proj"]["kernel"],
        bproj=sp["proj"].get("bias"),
        ln_scale=lp["norm1"]["scale"], ln_bias=lp["norm1"]["bias"],
        num_heads=config.num_heads, scale=engine.scale, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
