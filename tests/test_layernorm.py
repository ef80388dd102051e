"""Pallas LayerNorm kernel vs jnp oracle (the test_attention.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.ops.layernorm import layer_norm, layer_norm_reference


@pytest.mark.parametrize("shape", [(8, 128), (16, 256, 512), (3, 5, 128)])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_kernel_parity_interpret(shape, dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], shape, dtype) * 3 + 1
    scale = jax.random.normal(ks[1], shape[-1:], jnp.float32)
    bias = jax.random.normal(ks[2], shape[-1:], jnp.float32)
    ref = layer_norm_reference(x, scale, bias).astype(dtype)
    got = layer_norm(x, scale, bias, interpret=True, out_dtype=dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fallback_shapes():
    # C not a lane multiple and odd row counts fall back to the oracle
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 96), jnp.float32)
    scale = jnp.ones((96,))
    bias = jnp.zeros((96,))
    got = layer_norm(x, scale, bias)
    ref = layer_norm_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert np.allclose(np.asarray(got).mean(-1), 0, atol=1e-4)
