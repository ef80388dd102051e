"""Parity for the fused spatial TRAINING block (fwd + custom-VJP bwd):
values and ALL gradients (x, Wqkv, Wproj, biases, LN params) vs the jnp
oracle, both bwd variants, across the bias/pre-LN grid. Runs in Pallas
interpret mode on CPU (the reference kernel-vs-oracle pattern,
/root/reference/test_attention.py:5-25, extended to VJPs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu1x.ops.spatial_train_block import (spatial_train_block,
                                           spatial_train_block_reference)

N, S, C, H = 4, 64, 32, 4


def make_inputs(seed=0, pre_ln=True, qkv_bias=False, proj_bias=True,
                dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (N, S, C), dtype)
    wqkv = (jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05)
    wproj = (jax.random.normal(ks[2], (C, C), jnp.float32) * 0.05)
    bqkv = (jax.random.normal(ks[3], (3 * C,), jnp.float32) * 0.02
            if qkv_bias else None)
    bproj = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.02
             if proj_bias else None)
    ln_s = (1.0 + 0.1 * jax.random.normal(ks[5], (C,), jnp.float32)
            if pre_ln else None)
    ln_b = (0.1 * jax.random.normal(ks[6], (C,), jnp.float32)
            if pre_ln else None)
    return x, wqkv, wproj, bqkv, bproj, ln_s, ln_b


@pytest.mark.parametrize("pre_ln", [True, False])
@pytest.mark.parametrize("qkv_bias", [False, True])
def test_forward_parity(pre_ln, qkv_bias):
    x, wqkv, wproj, bqkv, bproj, ln_s, ln_b = make_inputs(
        pre_ln=pre_ln, qkv_bias=qkv_bias)
    kw = dict(num_heads=H, scale=(C // H) ** -0.5, bqkv=bqkv, bproj=bproj,
              ln_scale=ln_s, ln_bias=ln_b)
    got = spatial_train_block(x, wqkv, wproj, **kw)
    want = spatial_train_block_reference(x, wqkv, wproj, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("variant", ["softmax2", "transpose", "direct"])
@pytest.mark.parametrize("pre_ln,qkv_bias,proj_bias", [
    (True, False, True),    # the shipped GENIE config shape
    (True, True, True),
    (False, False, False),  # qk_norm-style: no pre-LN, no biases
])
def test_gradient_parity(variant, pre_ln, qkv_bias, proj_bias, monkeypatch):
    monkeypatch.setenv("TPU1X_SPATIAL_BWD", variant)
    x, wqkv, wproj, bqkv, bproj, ln_s, ln_b = make_inputs(
        seed=1, pre_ln=pre_ln, qkv_bias=qkv_bias, proj_bias=proj_bias)
    scale = 8.0 / (C // H)  # muP-style scale exercises the scale path

    diff_argnames = ["x", "wqkv", "wproj"]
    diff_args = [x, wqkv, wproj]
    extra = {}
    for name, val in (("bqkv", bqkv), ("bproj", bproj),
                      ("ln_scale", ln_s), ("ln_bias", ln_b)):
        if val is not None:
            diff_argnames.append(name)
            diff_args.append(val)
        else:
            extra[name] = None

    def loss_of(fn):
        def f(*args):
            kw = dict(zip(diff_argnames, args))
            kw.update(extra)
            x_ = kw.pop("x")
            wq = kw.pop("wqkv")
            wp = kw.pop("wproj")
            out = fn(x_, wq, wp, num_heads=H, scale=scale, **kw)
            # non-uniform cotangent
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * jnp.sin(w * 0.01))
        return f

    got = jax.grad(loss_of(spatial_train_block),
                   argnums=tuple(range(len(diff_args))))(*diff_args)
    want = jax.grad(loss_of(spatial_train_block_reference),
                    argnums=tuple(range(len(diff_args))))(*diff_args)
    for name, g, w in zip(diff_argnames, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name} (variant={variant})")


def test_bf16_forward_close_to_fp32_oracle():
    x, wqkv, wproj, bqkv, bproj, ln_s, ln_b = make_inputs(
        seed=2, dtype=jnp.bfloat16)
    kw = dict(num_heads=H, scale=(C // H) ** -0.5, bqkv=None, bproj=bproj,
              ln_scale=ln_s, ln_bias=ln_b)
    got = spatial_train_block(x, wqkv, wproj, **kw).astype(jnp.float32)
    want = spatial_train_block_reference(
        x.astype(jnp.float32), wqkv, wproj, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_grads_flow_under_scan_and_remat():
    """The integration shape: called inside lax.scan with jax.checkpoint
    (the layer-stack structure of STTransformerDecoder)."""
    x, wqkv, wproj, _, bproj, ln_s, ln_b = make_inputs(seed=3)

    def layer(carry, _):
        def body(h):
            return spatial_train_block(
                h, wqkv, wproj, num_heads=H, scale=(C // H) ** -0.5,
                bproj=bproj, ln_scale=ln_s, ln_bias=ln_b)
        return jax.checkpoint(body)(carry), None

    def loss(x_):
        out, _ = jax.lax.scan(layer, x_, None, length=2)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # matches the oracle composition
    def loss_ref(x_):
        h = x_
        for _ in range(2):
            h = spatial_train_block_reference(
                h, wqkv, wproj, num_heads=H, scale=(C // H) ** -0.5,
                bproj=bproj, ln_scale=ln_s, ln_bias=ln_b)
        return jnp.sum(h ** 2)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)


def test_model_level_train_parity_pallas_vs_xla():
    """STMaskGIT loss + param grads with attn_impl='pallas' (fused spatial
    train block + fused temporal kernel, interpret mode on CPU) match the
    'xla' oracle path at fp32 — the whole-model integration check."""
    from tpu1x.model_zoo import genie_tiny
    from tpu1x.models.st_maskgit import STMaskGIT

    def run(impl):
        cfg = genie_tiny(qk_norm=False, use_mup=False, dtype="float32",
                         attn_impl=impl, T=4, S=16)
        model = STMaskGIT(cfg)
        rng = jax.random.PRNGKey(0)
        tokens = jax.random.randint(
            jax.random.PRNGKey(1), (2, cfg.T, 4, 4), 0,
            cfg.image_vocab_size, dtype=jnp.int32)
        dummy = tokens.reshape(2, -1)
        params = model.init(rng, dummy, dummy)["params"]

        def loss_fn(p):
            logits = model.apply({"params": p}, tokens,
                                 method=model.compute_logits)
            return jnp.mean(logits ** 2) + jnp.mean(jnp.abs(logits))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), grads

    l_x, g_x = run("xla")
    l_p, g_p = run("pallas")
    np.testing.assert_allclose(l_p, l_x, rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for (path, gx), gp in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=2e-4, rtol=2e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
