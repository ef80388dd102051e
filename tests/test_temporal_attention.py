"""Fused spatial-major temporal-attention kernel vs the transposed-layout
jnp oracle (values + custom-VJP gradients), interpret mode on CPU —
the test_attention.py pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.ops.temporal_attention import (temporal_attention,
                                          temporal_attention_reference)

INTERPRET = True


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("B,T,S,H,D", [(2, 4, 32, 2, 16), (1, 5, 64, 4, 8)])
def test_forward_parity(causal, B, T, S, H, D):
    C = H * D
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, S, C), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, S, C), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, S, C), jnp.float32)
    scale = D ** -0.5
    want = temporal_attention_reference(q, k, v, scale=scale, num_heads=H,
                                        causal=causal)
    got = temporal_attention(q, k, v, scale=scale, num_heads=H,
                             causal=causal, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_forward_parity_bf16():
    B, T, S, H, D = 2, 4, 32, 4, 16
    C = H * D
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, T, S, C), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, S, C), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, S, C), jnp.bfloat16)
    scale = D ** -0.5
    want = temporal_attention_reference(q, k, v, scale=scale, num_heads=H)
    got = temporal_attention(q, k, v, scale=scale, num_heads=H,
                             interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("causal", [True, False])
def test_gradients_vs_reference(causal):
    """Custom-VJP (fused backward kernel) == autodiff of the oracle."""
    B, T, S, H, D = 2, 4, 32, 2, 16
    C = H * D
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, T, S, C), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, S, C), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, S, C), jnp.float32)
    scale = D ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(temporal_attention_reference(
            q, k, v, scale=scale, num_heads=H, causal=causal)))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(temporal_attention(
            q, k, v, scale=scale, num_heads=H, causal=causal,
            interpret=INTERPRET)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)
