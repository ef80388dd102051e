"""Parity for the fused MLP TRAINING block: values and ALL gradients vs the
jnp oracle (exact lax.erf GELU — the kernel's rational-erf approximation
must be indistinguishable at test tolerance), across the bias/pre-LN/
gelu-variant grid, in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu1x.ops.mlp_train_block import (mlp_train_block,
                                       mlp_train_block_reference)

N, S, C = 4, 32, 32


def make_inputs(seed=0, bias=True, pre_ln=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (N, S, C), jnp.float32)
    wfc1 = jax.random.normal(ks[1], (C, 4 * C), jnp.float32) * 0.05
    wfc2 = jax.random.normal(ks[2], (4 * C, C), jnp.float32) * 0.05
    bfc1 = (jax.random.normal(ks[3], (4 * C,), jnp.float32) * 0.02
            if bias else None)
    bfc2 = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.02
            if bias else None)
    ln_s = (1.0 + 0.1 * jax.random.normal(ks[5], (C,), jnp.float32)
            if pre_ln else None)
    ln_b = (0.1 * jax.random.normal(ks[6], (C,), jnp.float32)
            if pre_ln else None)
    return x, wfc1, wfc2, bfc1, bfc2, ln_s, ln_b


@pytest.mark.parametrize("gelu_approx", [False, True])
@pytest.mark.parametrize("bias,pre_ln", [(True, True), (False, False),
                                         (True, False)])
def test_forward_parity(gelu_approx, bias, pre_ln):
    x, w1, w2, b1, b2, ls, lb = make_inputs(bias=bias, pre_ln=pre_ln)
    kw = dict(bfc1=b1, bfc2=b2, ln_scale=ls, ln_bias=lb,
              gelu_approx=gelu_approx)
    got = mlp_train_block(x, w1, w2, **kw)
    want = mlp_train_block_reference(x, w1, w2, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("gelu_approx", [False, True])
@pytest.mark.parametrize("bias,pre_ln", [(True, True), (False, False)])
def test_gradient_parity(gelu_approx, bias, pre_ln):
    x, w1, w2, b1, b2, ls, lb = make_inputs(seed=1, bias=bias, pre_ln=pre_ln)

    names = ["x", "wfc1", "wfc2"]
    args = [x, w1, w2]
    extra = {}
    for nm, val in (("bfc1", b1), ("bfc2", b2), ("ln_scale", ls),
                    ("ln_bias", lb)):
        if val is not None:
            names.append(nm)
            args.append(val)
        else:
            extra[nm] = None

    def loss_of(fn):
        def f(*a):
            kw = dict(zip(names, a))
            kw.update(extra)
            out = fn(kw.pop("x"), kw.pop("wfc1"), kw.pop("wfc2"),
                     gelu_approx=gelu_approx, **kw)
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * jnp.sin(w * 0.02))
        return f

    got = jax.grad(loss_of(mlp_train_block),
                   argnums=tuple(range(len(args))))(*args)
    want = jax.grad(loss_of(mlp_train_block_reference),
                    argnums=tuple(range(len(args))))(*args)
    for nm, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {nm} (approx={gelu_approx})")


def test_erf_poly_accuracy():
    """The in-kernel rational erf: max abs err <= 6e-7 vs lax.erf."""
    from tpu1x.ops.mlp_train_block import _erf_poly
    x = jnp.linspace(-6, 6, 100001, dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(_erf_poly(x) - jax.lax.erf(x))))
    assert err <= 6e-7, err


def test_grads_under_scan_and_remat():
    x, w1, w2, b1, b2, ls, lb = make_inputs(seed=3)

    def layer(carry, _):
        def body(h):
            return mlp_train_block(h, w1, w2, bfc1=b1, bfc2=b2,
                                   ln_scale=ls, ln_bias=lb)
        return jax.checkpoint(body)(carry), None

    def loss(x_):
        out, _ = jax.lax.scan(layer, x_, None, length=2)
        return jnp.sum(out ** 2)

    def loss_ref(x_):
        h = x_
        for _ in range(2):
            h = mlp_train_block_reference(h, w1, w2, bfc1=b1, bfc2=b2,
                                          ln_scale=ls, ln_bias=lb)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)
