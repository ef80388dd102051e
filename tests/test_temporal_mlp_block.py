"""Parity tests for the fused temporal+MLP block kernels
(tpu1x/ops/temporal_mlp_block.py) vs their jnp oracles — interpret mode
off-TPU (the test_attention.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.ops.temporal_mlp_block import (
    temporal_mlp_block, temporal_mlp_block_pair,
    temporal_mlp_block_pair_reference, temporal_mlp_block_reference)


def make_weights(key, C, F4, dtype, qkv_bias, mlp_bias):
    ks = jax.random.split(key, 8)
    w = dict(
        wqkv=(jax.random.normal(ks[0], (C, 3 * C)) * 0.05).astype(dtype),
        wproj=(jax.random.normal(ks[1], (C, C)) * 0.05).astype(dtype),
        wfc1=(jax.random.normal(ks[2], (C, F4)) * 0.05).astype(dtype),
        wfc2=(jax.random.normal(ks[3], (F4, C)) * 0.05).astype(dtype),
        ln_scale=1.0 + 0.1 * jax.random.normal(ks[4], (C,)),
        ln_bias=0.1 * jax.random.normal(ks[5], (C,)),
        bproj=(jax.random.normal(ks[6], (C,)) * 0.1).astype(dtype),
    )
    if qkv_bias:
        w["bqkv"] = (jax.random.normal(ks[7], (3 * C,)) * 0.1).astype(dtype)
    if mlp_bias:
        w["bfc1"] = (jax.random.normal(ks[7], (F4,)) * 0.1).astype(dtype)
        w["bfc2"] = (jax.random.normal(ks[6], (C,)) * 0.1).astype(dtype)
    return w


@pytest.mark.parametrize("qkv_bias,mlp_bias", [(False, True), (True, False)])
@pytest.mark.parametrize("gelu_tanh", [True, False])
def test_single_parity(qkv_bias, mlp_bias, gelu_tanh):
    B, S, C, H, T, L = 2, 32, 64, 4, 8, 3
    layer = 1
    key = jax.random.PRNGKey(0)
    w = make_weights(key, C, 4 * C, jnp.float32, qkv_bias, mlp_bias)
    x = (jax.random.normal(key, (B, S, C)) * 0.5).astype(jnp.float32)
    kc = (jax.random.normal(jax.random.PRNGKey(1), (T, L, B, S, C))
          * 0.5).astype(jnp.float32)
    vc = (jax.random.normal(jax.random.PRNGKey(2), (T, L, B, S, C))
          * 0.5).astype(jnp.float32)
    t_B = jnp.array([3, 5], jnp.int32)
    scale = (C // H) ** -0.5

    got, kcur, vcur = temporal_mlp_block(
        x, kc, vc, t_B, layer=layer, scale=scale, num_heads=H,
        gelu_tanh=gelu_tanh, tile_s=16, **w)
    want, kref, vref = temporal_mlp_block_reference(
        x, kc[:, layer], vc[:, layer], t_B, scale=scale, num_heads=H,
        gelu_tanh=gelu_tanh, **w)
    np.testing.assert_allclose(np.asarray(kcur), np.asarray(kref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vcur), np.asarray(vref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("qkv_bias,mlp_bias", [(False, True)])
def test_pair_parity(qkv_bias, mlp_bias):
    B, S, C, H, T, L = 2, 32, 64, 4, 8, 3
    layer = 2
    key = jax.random.PRNGKey(3)
    w = make_weights(key, C, 4 * C, jnp.float32, qkv_bias, mlp_bias)
    z = (jax.random.normal(key, (B, 2, S, C)) * 0.5).astype(jnp.float32)
    kc = (jax.random.normal(jax.random.PRNGKey(4), (T, L, B, S, C))
          * 0.5).astype(jnp.float32)
    vc = (jax.random.normal(jax.random.PRNGKey(5), (T, L, B, S, C))
          * 0.5).astype(jnp.float32)
    t_prev = jnp.array([2, 6], jnp.int32)
    scale = (C // H) ** -0.5

    got, kp, vp = temporal_mlp_block_pair(
        z, kc, vc, t_prev, layer=layer, scale=scale, num_heads=H,
        tile_s=16, **w)
    want, kpr, vpr = temporal_mlp_block_pair_reference(
        z, kc[:, layer], vc[:, layer], t_prev, scale=scale, num_heads=H,
        **w)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kpr),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vpr),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_single_matches_engine_layer_tail():
    """Kernel == DecodeEngine's temporal-attn + proj + n2 + MLP tail."""
    from tpu1x.model_zoo import genie_tiny
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.serving import DecodeEngine

    config = genie_tiny(dtype="float32")
    model = STMaskGIT(config)
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    layers = params["decoder"]["layers"]
    layer = 1
    lp = jax.tree_util.tree_map(lambda a: a[layer], layers)
    engine = DecodeEngine(config, attn_impl="xla")
    B = 2
    L = config.num_layers
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (B, config.S, config.d_model), jnp.float32)
    kc = jax.random.normal(jax.random.PRNGKey(3),
                           (config.T, L, B, config.S, config.d_model))
    vc = jax.random.normal(jax.random.PRNGKey(4), kc.shape)
    cache = {"k": kc, "v": vc}
    t_B = jnp.array([1, 2], jnp.int32)

    t_out, k_cur, v_cur = engine._temporal_attn(
        lp["temporal_attn"], x, cache, layer, t_B)
    x1 = x + t_out
    want = x1 + engine._mlp(lp["mlp"], engine._pre_norm(lp["norm2"], x1))

    tp, mp = lp["temporal_attn"], lp["mlp"]
    got, kg, vg = temporal_mlp_block(
        x, kc.astype(jnp.float32), vc.astype(jnp.float32), t_B, layer=layer,
        scale=engine.scale, num_heads=config.num_heads,
        wqkv=tp["qkv"]["kernel"], bqkv=tp["qkv"].get("bias"),
        wproj=tp["proj"]["kernel"], bproj=tp["proj"].get("bias"),
        ln_scale=lp["norm2"]["scale"], ln_bias=lp["norm2"]["bias"],
        wfc1=mp["fc1"]["kernel"], bfc1=mp["fc1"].get("bias"),
        wfc2=mp["fc2"]["kernel"], bfc2=mp["fc2"].get("bias"),
        gelu_tanh=False, tile_s=16)
    np.testing.assert_allclose(np.asarray(kg), np.asarray(k_cur),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_engine_block_fusion_decode_parity():
    """DecodeEngine with layer_fusion="block" (attn_impl="pallas",
    interpret off-TPU) == the flax oracle for decode_frame AND
    decode_frame_pair."""
    from tpu1x.model_zoo import genie_tiny
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.serving import DecodeEngine, prepare_serving_params

    cfg = genie_tiny(dtype="float32")
    model = STMaskGIT(cfg)
    dummy = jnp.zeros((1, cfg.T * cfg.S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    B = 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 2, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    cache = model.apply({"params": params}, prompt, method=STMaskGIT.prefill)
    frame = jax.random.randint(jax.random.PRNGKey(2), (B, cfg.S), 0,
                               cfg.image_vocab_size, dtype=jnp.int32)
    frame = frame.at[:, :5].set(cfg.mask_token_id)
    masked = jnp.full((B, cfg.S), cfg.mask_token_id, jnp.int32)
    t_B = jnp.array([2, 2, 2], jnp.int32)

    engine = DecodeEngine(cfg, attn_impl="pallas")
    assert engine._block_ok
    sparams = prepare_serving_params(params)

    ref_logits, (rk, rv) = model.apply(
        {"params": params}, frame, t_B, cache, method=STMaskGIT.decode_frame)
    logits, (k_cur, v_cur) = engine.decode_frame(sparams, frame, t_B, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(k_cur, np.float32),
                               np.asarray(rk, np.float32), atol=2e-2,
                               rtol=2e-2)

    # pair vs xla-engine pair (itself oracle-tested in test_serving.py)
    oracle = DecodeEngine(cfg, attn_impl="xla")
    want_logits, (wk, wv) = oracle.decode_frame_pair(
        sparams, frame, masked, t_B, cache)
    got_logits, (gk, gv) = engine.decode_frame_pair(
        sparams, frame, masked, t_B, cache)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(wk, np.float32), atol=2e-2,
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gv, np.float32),
                               np.asarray(wv, np.float32), atol=2e-2,
                               rtol=2e-2)
