"""Parity for the fused temporal TRAINING block (fwd + custom-VJP bwd):
values and ALL gradients (x, Wqkv, Wproj, biases) vs the jnp oracle,
across the bias grid, in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu1x.ops.temporal_train_block import (temporal_train_block,
                                            temporal_train_block_reference)

B, T, S, C, H = 2, 8, 32, 32, 4


def make_inputs(seed=0, qkv_bias=False, proj_bias=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (B, T, S, C), jnp.float32)
    wqkv = jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05
    wproj = jax.random.normal(ks[2], (C, C), jnp.float32) * 0.05
    bqkv = (jax.random.normal(ks[3], (3 * C,), jnp.float32) * 0.02
            if qkv_bias else None)
    bproj = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.02
             if proj_bias else None)
    return x, wqkv, wproj, bqkv, bproj


@pytest.mark.parametrize("qkv_bias,proj_bias", [
    (False, True),   # the shipped GENIE config shape
    (True, True),
    (False, False),
])
def test_forward_parity(qkv_bias, proj_bias):
    x, wqkv, wproj, bqkv, bproj = make_inputs(qkv_bias=qkv_bias,
                                              proj_bias=proj_bias)
    kw = dict(num_heads=H, scale=(C // H) ** -0.5, bqkv=bqkv, bproj=bproj)
    got = temporal_train_block(x, wqkv, wproj, **kw)
    want = temporal_train_block_reference(x, wqkv, wproj, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("qkv_bias,proj_bias", [
    (False, True),
    (True, True),
    (False, False),
])
def test_gradient_parity(qkv_bias, proj_bias):
    x, wqkv, wproj, bqkv, bproj = make_inputs(seed=1, qkv_bias=qkv_bias,
                                              proj_bias=proj_bias)
    scale = 8.0 / (C // H)  # muP-style scale exercises the scale path

    names = ["x", "wqkv", "wproj"]
    args = [x, wqkv, wproj]
    extra = {}
    for nm, val in (("bqkv", bqkv), ("bproj", bproj)):
        if val is not None:
            names.append(nm)
            args.append(val)
        else:
            extra[nm] = None

    def loss_of(fn):
        def f(*a):
            kw = dict(zip(names, a))
            kw.update(extra)
            out = fn(kw.pop("x"), kw.pop("wqkv"), kw.pop("wproj"),
                     num_heads=H, scale=scale, **kw)
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * jnp.cos(w * 0.01))
        return f

    got = jax.grad(loss_of(temporal_train_block),
                   argnums=tuple(range(len(args))))(*args)
    want = jax.grad(loss_of(temporal_train_block_reference),
                    argnums=tuple(range(len(args))))(*args)
    for nm, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {nm}")


def test_grads_under_scan_and_remat():
    x, wqkv, wproj, _, bproj = make_inputs(seed=3)

    def layer(carry, _):
        def body(h):
            return temporal_train_block(h, wqkv, wproj, num_heads=H,
                                        scale=(C // H) ** -0.5, bproj=bproj)
        return jax.checkpoint(body)(carry), None

    def loss(x_):
        out, _ = jax.lax.scan(layer, x_, None, length=2)
        return jnp.sum(out ** 2)

    def loss_ref(x_):
        h = x_
        for _ in range(2):
            h = temporal_train_block_reference(
                h, wqkv, wproj, num_heads=H, scale=(C // H) ** -0.5,
                bproj=bproj)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)
