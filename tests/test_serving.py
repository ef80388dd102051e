"""Serving decode engine parity vs the flax model (the decode oracle).

Pattern: the reference keeps a slow obvious implementation as the oracle for
its fast kernel (test_attention.py); here flax STMaskGIT.decode_frame is the
oracle for tpu1x/serving.py's unrolled pure-JAX engine and the Pallas decode
attention kernel (interpret mode on CPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.model_zoo import genie_tiny
from tpu1x.models.sampler import generate_cached
from tpu1x.models.st_maskgit import STMaskGIT
from tpu1x.serving import DecodeEngine, prepare_serving_params


def setup_model(qk_norm=False, use_mup=False, action_vocab_size=0):
    cfg = genie_tiny(T=4, num_prompt_frames=2, num_heads=2, d_model=32)
    cfg.qk_norm = qk_norm
    cfg.use_mup = use_mup
    cfg.action_vocab_size = action_vocab_size
    cfg.__post_init__()
    model = STMaskGIT(cfg)
    dummy = jnp.zeros((1, cfg.T * cfg.S), jnp.int32)
    dummy_act = (jnp.zeros((1, cfg.T), jnp.int32)
                 if action_vocab_size > 0 else None)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy,
                        dummy_act)["params"]
    return cfg, model, params


@pytest.mark.parametrize("layers_mode", ["scan", "unroll"])
@pytest.mark.parametrize("qk_norm,use_mup", [(False, False), (True, True)])
def test_engine_decode_matches_flax(qk_norm, use_mup, layers_mode):
    cfg, model, params = setup_model(qk_norm=qk_norm, use_mup=use_mup)
    B = 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 2, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    cache = model.apply({"params": params}, prompt, method=STMaskGIT.prefill)
    frame = jax.random.randint(jax.random.PRNGKey(2), (B, cfg.S), 0,
                               cfg.image_vocab_size, dtype=jnp.int32)
    frame = frame.at[:, :5].set(cfg.mask_token_id)
    t_B = jnp.array([2, 2, 2], jnp.int32)

    ref_logits, (ref_k, ref_v) = model.apply(
        {"params": params}, frame, t_B, cache, method=STMaskGIT.decode_frame)
    engine = DecodeEngine(cfg, attn_impl="xla", layers_mode=layers_mode)
    sparams = prepare_serving_params(params)
    logits, (k_cur, v_cur) = engine.decode_frame(sparams, frame, t_B, cache)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(k_cur, np.float32),
                               np.asarray(ref_k, np.float32), atol=2e-2,
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(v_cur, np.float32),
                               np.asarray(ref_v, np.float32), atol=2e-2,
                               rtol=2e-2)


def test_engine_action_conditioning():
    cfg, model, params = setup_model(action_vocab_size=7)
    B = 2
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 2, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    cache = model.apply({"params": params}, prompt, method=STMaskGIT.prefill)
    frame = jnp.full((B, cfg.S), cfg.mask_token_id, jnp.int32)
    t_B = jnp.array([2, 2], jnp.int32)
    action = jnp.array([1, 4], jnp.int32)

    ref_logits, _ = model.apply(
        {"params": params}, frame, t_B, cache, action,
        method=STMaskGIT.decode_frame)
    engine = DecodeEngine(cfg, attn_impl="xla")
    sparams = prepare_serving_params(params)
    logits, _ = engine.decode_frame(sparams, frame, t_B, cache, action)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-2, rtol=2e-2)
    # actions must actually change the logits
    logits0, _ = engine.decode_frame(sparams, frame, t_B, cache, jnp.zeros((B,), jnp.int32))
    assert not np.allclose(np.asarray(logits), np.asarray(logits0))


@pytest.mark.parametrize("layers_mode", ["scan", "unroll"])
@pytest.mark.parametrize("qk_norm,use_mup,actions",
                         [(False, False, False), (True, True, False),
                          (False, False, True)])
def test_engine_prefill_matches_flax(qk_norm, use_mup, actions, layers_mode):
    cfg, model, params = setup_model(qk_norm=qk_norm, use_mup=use_mup,
                                     action_vocab_size=7 if actions else 0)
    B = 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 2, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    acts = (jax.random.randint(jax.random.PRNGKey(4), (B, 2), 0, 7,
                               dtype=jnp.int32) if actions else None)
    ref = model.apply({"params": params}, prompt, acts,
                      method=STMaskGIT.prefill)
    engine = DecodeEngine(cfg, attn_impl="xla", layers_mode=layers_mode)
    sparams = prepare_serving_params(params)
    got = engine.prefill(sparams, prompt, acts)
    for key in ("k", "v"):
        assert got[key].shape == ref[key].shape
        np.testing.assert_allclose(np.asarray(got[key], np.float32),
                                   np.asarray(ref[key], np.float32),
                                   atol=2e-2, rtol=2e-2)
    # padded slots stay zero (T-major cache: frame axis leads)
    assert not np.asarray(got["k"])[2:].any()

    # decode against the engine-built cache == decode against the flax cache
    frame = jnp.full((B, cfg.S), cfg.mask_token_id, jnp.int32)
    t_B = jnp.full((B,), 2, jnp.int32)
    a_B = acts[:, 0] if actions else None
    l_ref, _ = engine.decode_frame(sparams, frame, t_B, ref, a_B)
    l_got, _ = engine.decode_frame(sparams, frame, t_B, got, a_B)
    np.testing.assert_allclose(np.asarray(l_got), np.asarray(l_ref),
                               atol=2e-2, rtol=2e-2)


def test_engine_full_rollout_matches_flax():
    """generate_cached driven by the engine == driven by the flax model."""
    cfg, model, params = setup_model()
    B = 2
    prompt = jax.random.randint(jax.random.PRNGKey(3), (B, 2 * cfg.S), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)

    engine = DecodeEngine(cfg, attn_impl="xla")
    sparams = prepare_serving_params(params)

    def prefill_fn(t):
        return model.apply({"params": sparams}, t, method=STMaskGIT.prefill)

    def flax_decode(f, t, c):
        return model.apply({"params": sparams}, f, t, c,
                           method=STMaskGIT.decode_frame)

    gen = functools.partial(generate_cached, prefill_fn,
                            input_ids_BN=prompt, num_new_frames=cfg.T - 2,
                            rng=jax.random.PRNGKey(7), config=cfg,
                            maskgit_steps=2)
    tokens_ref, logits_ref = gen(flax_decode)
    tokens_eng, logits_eng = gen(functools.partial(engine.decode_frame,
                                                   sparams))
    # Prompt region must round-trip exactly.
    np.testing.assert_array_equal(np.asarray(tokens_eng)[:, :2 * cfg.S],
                                  np.asarray(tokens_ref)[:, :2 * cfg.S])
    # Random-init logits are near-uniform, so fp reassociation can flip
    # argmax ties on a few tokens; require overwhelming agreement plus
    # close step-0 logits on the first generated frame (before any token
    # divergence can feed back).
    agree = (np.asarray(tokens_eng) == np.asarray(tokens_ref)).mean()
    assert agree >= 0.9, agree
    np.testing.assert_allclose(np.asarray(logits_eng)[:, :, :, 0],
                               np.asarray(logits_ref)[:, :, :, 0],
                               atol=2e-2, rtol=2e-2)


def test_engine_rollout_exact_tokens_trained():
    """With *trained* (sharpened, non-near-uniform) logits, the engine rollout
    must be TOKEN-EXACT vs the flax path — the 0.9-agreement tolerance above
    exists only for random-init bf16 argmax ties (VERDICT r1 #7)."""
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import create_train_state, make_train_step

    cfg, model, params = setup_model()
    tx = build_optimizer(cfg, learning_rate=1e-2, num_training_steps=1000,
                         lr_scheduler_type="constant")
    state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, cfg.T, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    for _ in range(100):
        state, metrics = step(state, tokens)
    # far from the ~12.5 uniform loss: logits are sharp, argmax is stable
    assert float(metrics["loss"]) < 4.0, float(metrics["loss"])

    sparams = prepare_serving_params(state.params)
    engine = DecodeEngine(cfg, attn_impl="xla")
    prompt = tokens[:, :2].reshape(2, -1)

    def prefill_fn(t):
        return model.apply({"params": sparams}, t, method=STMaskGIT.prefill)

    def flax_decode(f, t, c):
        return model.apply({"params": sparams}, f, t, c,
                           method=STMaskGIT.decode_frame)

    gen = functools.partial(generate_cached, prefill_fn,
                            input_ids_BN=prompt, num_new_frames=cfg.T - 2,
                            rng=jax.random.PRNGKey(7), config=cfg,
                            maskgit_steps=2)
    tokens_ref, _ = gen(flax_decode)
    tokens_eng, _ = gen(functools.partial(engine.decode_frame, sparams))
    np.testing.assert_array_equal(np.asarray(tokens_eng),
                                  np.asarray(tokens_ref))


@pytest.mark.parametrize("layers_mode", ["scan", "unroll"])
def test_fused_commit_rollout_token_exact(layers_mode):
    """generate_cached_fused (commit pass fused into the next frame's step-0
    decode) must produce token-identical greedy rollouts vs generate_cached,
    including the step-0 logits (trained weights so argmax is stable)."""
    from tpu1x.models.sampler import generate_cached_fused
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import create_train_state, make_train_step

    cfg, model, params = setup_model()
    tx = build_optimizer(cfg, learning_rate=1e-2, num_training_steps=1000,
                         lr_scheduler_type="constant")
    state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, cfg.T, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    for _ in range(100):
        state, metrics = step(state, tokens)
    assert float(metrics["loss"]) < 4.0

    sparams = prepare_serving_params(state.params)
    engine = DecodeEngine(cfg, attn_impl="xla", layers_mode=layers_mode)
    prompt = tokens[:, :2].reshape(2, -1)
    kwargs = dict(input_ids_BN=prompt, num_new_frames=cfg.T - 2,
                  rng=jax.random.PRNGKey(7), config=cfg, maskgit_steps=2,
                  temperature=0.0, unmask_mode="greedy")

    tokens_std, logits_std = generate_cached(
        functools.partial(engine.prefill, sparams),
        functools.partial(engine.decode_frame, sparams), **kwargs)
    tokens_fused, logits_fused = generate_cached_fused(
        functools.partial(engine.prefill, sparams),
        functools.partial(engine.decode_frame, sparams),
        functools.partial(engine.decode_frame_pair, sparams), **kwargs)

    np.testing.assert_array_equal(np.asarray(tokens_fused),
                                  np.asarray(tokens_std))
    np.testing.assert_allclose(np.asarray(logits_fused),
                               np.asarray(logits_std), atol=2e-2, rtol=2e-2)


def test_fused_commit_rollout_with_actions():
    """Fused path parity with action conditioning."""
    from tpu1x.models.sampler import generate_cached_fused

    cfg, model, params = setup_model(action_vocab_size=7)
    sparams = prepare_serving_params(params)
    engine = DecodeEngine(cfg, attn_impl="xla")
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 2 * cfg.S), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    actions = jax.random.randint(jax.random.PRNGKey(4), (2, cfg.T), 0, 7,
                                 dtype=jnp.int32)
    kwargs = dict(input_ids_BN=prompt, num_new_frames=cfg.T - 2,
                  rng=jax.random.PRNGKey(7), config=cfg, maskgit_steps=2,
                  temperature=0.0, unmask_mode="greedy", actions_BT=actions)

    tokens_std, logits_std = generate_cached(
        functools.partial(engine.prefill, sparams),
        functools.partial(engine.decode_frame, sparams), **kwargs)
    tokens_fused, logits_fused = generate_cached_fused(
        functools.partial(engine.prefill, sparams),
        functools.partial(engine.decode_frame, sparams),
        functools.partial(engine.decode_frame_pair, sparams), **kwargs)
    # random-init logits: allow close logits; token agreement must be high
    np.testing.assert_allclose(np.asarray(logits_fused),
                               np.asarray(logits_std), atol=2e-2, rtol=2e-2)
    agree = (np.asarray(tokens_fused) == np.asarray(tokens_std)).mean()
    assert agree >= 0.9, agree


def test_pallas_decode2_kernel_parity_interpret():
    """Fused prev-commit + next-frame decode kernel vs its jnp oracle."""
    from tpu1x.ops.decode_attention import (
        temporal_decode2_attention, temporal_decode2_attention_reference)
    L, B, S, T, C, H = 3, 4, 32, 5, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape, jnp.bfloat16)
    qp, qc = mk(0, B, S, C), mk(1, B, S, C)
    kc, vc = mk(2, T, L, B, S, C), mk(3, T, L, B, S, C)
    kp, vp = mk(4, B, S, C), mk(5, B, S, C)
    kcur, vcur = mk(6, B, S, C), mk(7, B, S, C)
    tB = jnp.array([1, 2, 3, 4], jnp.int32)  # t_prev per row
    for layer in (0, 2):
        want_p, want_c = temporal_decode2_attention_reference(
            qp, qc, kc[:, layer], vc[:, layer], kp, vp, kcur, vcur, tB,
            scale=0.25, num_heads=H)
        got_p, got_c = temporal_decode2_attention(
            qp, qc, kc, vc, kp, vp, kcur, vcur, tB, layer=layer, scale=0.25,
            num_heads=H, tile_s=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got_p, np.float32),
                                   np.asarray(want_p, np.float32),
                                   atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(got_c, np.float32),
                                   np.asarray(want_c, np.float32),
                                   atol=2e-2, rtol=2e-2)


def test_pallas_decode_kernel_parity_interpret():
    """Pallas kernel vs jnp oracle in interpreter mode (CPU)."""
    from tpu1x.ops.decode_attention import (
        temporal_decode_attention, temporal_decode_attention_reference)
    L, B, S, T, C, H = 3, 4, 32, 5, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, S, C), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (T, L, B, S, C), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (T, L, B, S, C), jnp.bfloat16)
    kcur = jax.random.normal(ks[3], (B, S, C), jnp.bfloat16)
    vcur = jax.random.normal(ks[4], (B, S, C), jnp.bfloat16)
    tB = jnp.array([1, 2, 3, 4], jnp.int32)
    for layer in (0, 2):
        ref = temporal_decode_attention_reference(
            q, kc[:, layer], vc[:, layer], kcur, vcur, tB, scale=0.25,
            num_heads=H)
        out = temporal_decode_attention(
            q, kc, vc, kcur, vcur, tB, layer=layer, scale=0.25, num_heads=H,
            tile_s=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)


def test_int8_cache_rollout_matches_bf16():
    """int8 KV cache (per-token scales): trained-model greedy rollouts must
    agree with the bf16 cache path at an overwhelming token rate, with close
    step-0 logits (decode is bandwidth-bound; int8 halves the cache stream —
    VERDICT r2 next #3)."""
    from tpu1x.models.sampler import generate_cached_fused
    from tpu1x.train.optim import build_optimizer
    from tpu1x.train.step import create_train_state, make_train_step

    cfg, model, params = setup_model()
    tx = build_optimizer(cfg, learning_rate=1e-2, num_training_steps=1000,
                         lr_scheduler_type="constant")
    state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, cfg.T, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    for _ in range(100):
        state, metrics = step(state, tokens)
    assert float(metrics["loss"]) < 4.0

    sparams = prepare_serving_params(state.params)
    prompt = tokens[:, :2].reshape(2, -1)
    kwargs = dict(input_ids_BN=prompt, num_new_frames=cfg.T - 2,
                  rng=jax.random.PRNGKey(7), config=cfg, maskgit_steps=2,
                  temperature=0.0, unmask_mode="greedy")

    outs = {}
    for cache_dtype in ("bf16", "int8"):
        engine = DecodeEngine(cfg, attn_impl="xla", cache_dtype=cache_dtype)
        outs[cache_dtype] = generate_cached_fused(
            functools.partial(engine.prefill, sparams),
            functools.partial(engine.decode_frame, sparams),
            functools.partial(engine.decode_frame_pair, sparams), **kwargs)

    tok_a, log_a = outs["bf16"]
    tok_b, log_b = outs["int8"]
    agree = (np.asarray(tok_a) == np.asarray(tok_b)).mean()
    assert agree >= 0.98, agree
    # step-0 logits close in absolute terms (trained logits are O(10))
    np.testing.assert_allclose(np.asarray(log_b), np.asarray(log_a),
                               atol=0.5, rtol=0.5)


def test_pallas_decode_kernel_int8_parity_interpret():
    """Quantized-cache kernel == jnp oracle fed the dequantized cache."""
    from tpu1x.ops.decode_attention import (
        dequantize_kv, quantize_kv, temporal_decode_attention,
        temporal_decode_attention_reference)
    L, B, S, T, C, H = 3, 4, 32, 5, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, S, C), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (T, L, B, S, C), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (T, L, B, S, C), jnp.bfloat16)
    kcur = jax.random.normal(ks[3], (B, S, C), jnp.bfloat16)
    vcur = jax.random.normal(ks[4], (B, S, C), jnp.bfloat16)
    tB = jnp.array([1, 2, 3, 4], jnp.int32)
    kq, ksc = quantize_kv(kc)
    vq, vsc = quantize_kv(vc)
    # kernel scale layout is layer-major (L, B, T, S)
    ksc_lbts = jnp.transpose(ksc, (1, 2, 0, 3))
    vsc_lbts = jnp.transpose(vsc, (1, 2, 0, 3))
    for layer in (0, 2):
        deq_k = dequantize_kv(kq, ksc).astype(jnp.bfloat16)
        deq_v = dequantize_kv(vq, vsc).astype(jnp.bfloat16)
        ref = temporal_decode_attention_reference(
            q, deq_k[:, layer], deq_v[:, layer], kcur, vcur, tB, scale=0.25,
            num_heads=H)
        out = temporal_decode_attention(
            q, kq, vq, kcur, vcur, tB, layer=layer, scale=0.25, num_heads=H,
            tile_s=16, interpret=True, k_scale=ksc_lbts, v_scale=vsc_lbts)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_pallas_decode2_kernel_int8_parity_interpret():
    from tpu1x.ops.decode_attention import (
        dequantize_kv, quantize_kv, temporal_decode2_attention,
        temporal_decode2_attention_reference)
    L, B, S, T, C, H = 2, 3, 32, 5, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape, jnp.bfloat16)
    qp, qc = mk(0, B, S, C), mk(1, B, S, C)
    kc, vc = mk(2, T, L, B, S, C), mk(3, T, L, B, S, C)
    kp, vp = mk(4, B, S, C), mk(5, B, S, C)
    kcur, vcur = mk(6, B, S, C), mk(7, B, S, C)
    tB = jnp.array([1, 2, 4], jnp.int32)
    kq, ksc = quantize_kv(kc)
    vq, vsc = quantize_kv(vc)
    # kernel scale layout is layer-major (L, B, T, S)
    ksc_lbts = jnp.transpose(ksc, (1, 2, 0, 3))
    vsc_lbts = jnp.transpose(vsc, (1, 2, 0, 3))
    for layer in (0, 1):
        deq_k = dequantize_kv(kq, ksc).astype(jnp.bfloat16)
        deq_v = dequantize_kv(vq, vsc).astype(jnp.bfloat16)
        want_p, want_c = temporal_decode2_attention_reference(
            qp, qc, deq_k[:, layer], deq_v[:, layer], kp, vp, kcur, vcur, tB,
            scale=0.25, num_heads=H)
        got_p, got_c = temporal_decode2_attention(
            qp, qc, kq, vq, kp, vp, kcur, vcur, tB, layer=layer, scale=0.25,
            num_heads=H, tile_s=16, interpret=True, k_scale=ksc_lbts, v_scale=vsc_lbts)
        np.testing.assert_allclose(np.asarray(got_p, np.float32),
                                   np.asarray(want_p, np.float32),
                                   atol=3e-2, rtol=3e-2)
        np.testing.assert_allclose(np.asarray(got_c, np.float32),
                                   np.asarray(want_c, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_engine_prefill_fused_temporal_matches_flax():
    """Engine prefill with the spatial-major fused temporal kernel
    (attn_impl="pallas", interpret on CPU) == the flax oracle cache."""
    cfg, model, params = setup_model()
    B = 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 2, 4, 4), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    ref = model.apply({"params": params}, prompt, method=STMaskGIT.prefill)
    engine = DecodeEngine(cfg, attn_impl="pallas")
    sparams = prepare_serving_params(params)
    got = engine.prefill(sparams, prompt)
    for key in ("k", "v"):
        assert got[key].shape == ref[key].shape
        np.testing.assert_allclose(np.asarray(got[key], np.float32),
                                   np.asarray(ref[key], np.float32),
                                   atol=2e-2, rtol=2e-2)
