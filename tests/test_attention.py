"""Attention kernel parity: Pallas fused kernel vs pure-jnp reference math.

The reference repo's only test is exactly this pattern for its CUDA kernel
(test_attention.py:1-24: Basic vs MemoryEfficient over a (d_model, qk_norm)
grid with causal masking). On CPU the Pallas kernel runs in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.ops.attention import SelfAttention, mha_reference
from tpu1x.ops.pallas_attention import flash_mha

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n,heads,d", [(256, 8, 32), (16, 8, 32), (64, 4, 64)])
def test_flash_vs_reference(causal, n, heads, d):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (3, n, heads, d)
    q = jax.random.normal(kq, shape, dtype=jnp.float32)
    k = jax.random.normal(kk, shape, dtype=jnp.float32)
    v = jax.random.normal(kv, shape, dtype=jnp.float32)
    scale = d ** -0.5
    want = mha_reference(q, k, v, scale=scale, causal=causal)
    got = flash_mha(q, k, v, scale=scale, causal=causal, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_vs_reference(causal):
    """The custom VJP (probability-recompute backward) must match the
    autodiff gradients of the jnp oracle — makes attn_impl=pallas trainable
    (found by benchmarks/attn_bench.py: the kernel had no VJP)."""
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, 32, 4, 16)
    q = jax.random.normal(kq, shape, dtype=jnp.float32)
    k = jax.random.normal(kk, shape, dtype=jnp.float32)
    v = jax.random.normal(kv, shape, dtype=jnp.float32)
    scale = 0.25

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_reference(q, k, v, scale=scale,
                                             causal=causal)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_mha(q, k, v, scale=scale, causal=causal,
                                         interpret=INTERPRET)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)


def test_flash_bf16(causal=True):
    rng = jax.random.PRNGKey(1)
    shape = (2, 5, 32, 2, 16)  # extra leading batch dims
    q = jax.random.normal(rng, shape, dtype=jnp.bfloat16)
    want = mha_reference(q, q, q, scale=0.25, causal=causal)
    got = flash_mha(q, q, q, scale=0.25, causal=causal, interpret=INTERPRET)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("qk_norm,use_mup", [(False, False), (True, True)])
def test_selfattention_module_grid(qk_norm, use_mup):
    """Module-level parity across config grid (reference test_attention.py:5-20)."""
    for d_model in (32, 64):
        attn_x = SelfAttention(num_heads=4, d_model=d_model, qk_norm=qk_norm,
                               use_mup=use_mup, dtype=jnp.float32, impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, d_model))
        params = attn_x.init(jax.random.PRNGKey(1), x, causal=True)
        out_x = attn_x.apply(params, x, causal=True)
        assert out_x.shape == x.shape
        # causal: output at position i must not depend on positions > i
        x2 = x.at[:, -1].add(10.0)
        out_x2 = attn_x.apply(params, x2, causal=True)
        np.testing.assert_allclose(np.asarray(out_x[:, :-1]),
                                   np.asarray(out_x2[:, :-1]), atol=1e-5)
        # non-causal: it must
        out_nc = attn_x.apply(params, x, causal=False)
        out_nc2 = attn_x.apply(params, x2, causal=False)
        assert not np.allclose(np.asarray(out_nc[:, 0]), np.asarray(out_nc2[:, 0]))
