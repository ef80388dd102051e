"""Compiled-kernel parity on the REAL TPU at bench shapes (VERDICT r2 #7).

Interpret-mode parity (tests/test_serving.py etc.) proves kernel *math* on
CPU; this script proves the Mosaic-compiled kernels match their jnp oracles
on actual hardware at GENIE_138M bench shapes — decode attention, fused
two-frame decode attention (bf16 + int8 cache), flash attention, and the
fused LayerNorm. Runnable under the driver budget (~1-2 min).

Usage: python benchmarks/tpu_kernel_check.py
Prints one line per kernel: PASS/FAIL + max abs error vs the fp32 oracle.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


RESULTS = []


def check(name, got, want, atol=None, rtol=None):
    """max-abs error vs the oracle; bound is `atol` OR `rtol * max|want|`
    (relative bounds set with <=1.25x headroom over the observed error on
    v5e — VERDICT r4 weak #5: a flat atol with 1.6x margin could hide a
    real regression)."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    ref = float(np.max(np.abs(want)))
    bound = atol if atol is not None else rtol * ref
    ok = err <= bound
    RESULTS.append({"name": name, "max_abs_err": round(err, 6),
                    "bound": round(bound, 6), "ok": bool(ok)})
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs_err={err:.3e} "
          f"(bound={bound:.3e}{', rtol=%g' % rtol if rtol else ''})",
          flush=True)
    return ok


def main():
    from tpu1x.ops.attention import mha, mha_reference
    from tpu1x.ops.decode_attention import (
        quantize_kv, dequantize_kv, temporal_decode2_attention,
        temporal_decode2_attention_reference, temporal_decode_attention,
        temporal_decode_attention_reference)
    from tpu1x.ops.layernorm import layer_norm, layer_norm_reference

    assert jax.default_backend() == "tpu", jax.default_backend()
    ok = True

    # GENIE_138M bench shapes
    B, S, C, T, L, H = 16, 256, 512, 16, 4, 16  # L=4 slabs is enough to
    # exercise the layer index map; the kernel touches one layer per call
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.bfloat16)
    q = mk(0, B, S, C)
    kc, vc = mk(1, T, L, B, S, C), mk(2, T, L, B, S, C)
    kcur, vcur = mk(3, B, S, C), mk(4, B, S, C)
    tB = jnp.arange(B, dtype=jnp.int32) % (T - 1) + 1
    scale = (C // H) ** -0.5

    for layer in (0, L - 1):
        want = temporal_decode_attention_reference(
            q, kc[:, layer], vc[:, layer], kcur, vcur, tB, scale=scale,
            num_heads=H)
        got = temporal_decode_attention(
            q, kc, vc, kcur, vcur, tB, layer=layer, scale=scale, num_heads=H)
        ok &= check(f"decode_attention[layer={layer}]", got, want, 2e-2)

    kq, ksc = quantize_kv(kc)
    vq, vsc = quantize_kv(vc)
    # kernel scale layout is layer-major (L, B, T, S)
    ksc_lbts = jnp.transpose(ksc, (1, 2, 0, 3))
    vsc_lbts = jnp.transpose(vsc, (1, 2, 0, 3))
    deq_k = dequantize_kv(kq, ksc).astype(jnp.bfloat16)
    deq_v = dequantize_kv(vq, vsc).astype(jnp.bfloat16)
    want = temporal_decode_attention_reference(
        q, deq_k[:, 1], deq_v[:, 1], kcur, vcur, tB, scale=scale, num_heads=H)
    got = temporal_decode_attention(
        q, kq, vq, kcur, vcur, tB, layer=1, scale=scale, num_heads=H,
        k_scale=ksc_lbts, v_scale=vsc_lbts)
    ok &= check("decode_attention[int8]", got, want, 2.9e-2)

    qp, qc2 = mk(5, B, S, C), mk(6, B, S, C)
    kp, vp = mk(7, B, S, C), mk(8, B, S, C)
    want_p, want_c = temporal_decode2_attention_reference(
        qp, qc2, kc[:, 2], vc[:, 2], kp, vp, kcur, vcur, tB, scale=scale,
        num_heads=H)
    got_p, got_c = temporal_decode2_attention(
        qp, qc2, kc, vc, kp, vp, kcur, vcur, tB, layer=2, scale=scale,
        num_heads=H)
    ok &= check("decode2_attention[prev]", got_p, want_p, 2e-2)
    ok &= check("decode2_attention[cur]", got_c, want_c, 2e-2)

    got_p, got_c = temporal_decode2_attention(
        qp, qc2, kq, vq, kp, vp, kcur, vcur, tB, layer=2, scale=scale,
        num_heads=H, k_scale=ksc_lbts, v_scale=vsc_lbts)
    want_p, want_c = temporal_decode2_attention_reference(
        qp, qc2, deq_k[:, 2], deq_v[:, 2], kp, vp, kcur, vcur, tB,
        scale=scale, num_heads=H)
    ok &= check("decode2_attention[int8,prev]", got_p, want_p, 3.9e-2)
    ok &= check("decode2_attention[int8,cur]", got_c, want_c, 2e-2)

    # flash attention at prefill shapes (spatial: bidir; temporal: causal)
    D = C // H
    qh = mk(0, B * 8, S, H, D)
    kh = mk(1, B * 8, S, H, D)
    vh = mk(2, B * 8, S, H, D)
    for causal in (False, True):
        want = mha_reference(qh, kh, vh, scale=scale, causal=causal)
        got = mha(qh, kh, vh, scale=scale, causal=causal, impl="pallas")
        ok &= check(f"flash_mha[causal={causal}]", got, want,
                    9.8e-3 if causal else 4.9e-3)

    # fused LayerNorm at block shapes
    x = mk(3, B, S, C)
    g = jax.random.normal(ks[9], (C,), jnp.float32)
    b = jax.random.normal(ks[5], (C,), jnp.float32)
    want = layer_norm_reference(x, g, b).astype(jnp.bfloat16)
    got = layer_norm(x, g, b, out_dtype=jnp.bfloat16)
    ok &= check("layer_norm", got, want, 1.96e-2)

    # r4 block kernels: fused spatial half + fused temporal+MLP half
    from tpu1x.ops.spatial_block import spatial_block, spatial_block_reference
    from tpu1x.ops.temporal_mlp_block import (
        temporal_mlp_block, temporal_mlp_block_pair,
        temporal_mlp_block_pair_reference, temporal_mlp_block_reference)

    wk = jax.random.split(jax.random.PRNGKey(7), 8)
    wqkv = (jax.random.normal(wk[0], (C, 3 * C)) * 0.05).astype(jnp.bfloat16)
    wproj = (jax.random.normal(wk[1], (C, C)) * 0.05).astype(jnp.bfloat16)
    bproj = (jax.random.normal(wk[2], (C,)) * 0.1).astype(jnp.bfloat16)
    lns = 1.0 + 0.1 * jax.random.normal(wk[3], (C,))
    lnb = 0.1 * jax.random.normal(wk[4], (C,))
    for N in (2 * B, 8 * B):  # pair-call and prefill row counts
        xs = (jax.random.normal(wk[5], (N, S, C)) * 0.5).astype(jnp.bfloat16)
        want = spatial_block_reference(xs, wqkv, wproj, bproj=bproj,
                                       ln_scale=lns, ln_bias=lnb,
                                       num_heads=H, scale=scale)
        got = spatial_block(xs, wqkv, wproj, bproj=bproj, ln_scale=lns,
                            ln_bias=lnb, num_heads=H, scale=scale)
        ok &= check(f"spatial_block[N={N}]", got, want, 1.96e-2)

    wfc1 = (jax.random.normal(wk[6], (C, 4 * C)) * 0.05).astype(jnp.bfloat16)
    wfc2 = (jax.random.normal(wk[7], (4 * C, C)) * 0.05).astype(jnp.bfloat16)
    bw = dict(wqkv=wqkv, wproj=wproj, bproj=bproj, ln_scale=lns, ln_bias=lnb,
              wfc1=wfc1, wfc2=wfc2)
    xs = (jax.random.normal(wk[5], (B, S, C)) * 0.5).astype(jnp.bfloat16)
    got, gk, gv = temporal_mlp_block(xs, kc, vc, tB, layer=1, scale=scale,
                                     num_heads=H, **bw)
    want, wk_, wv_ = temporal_mlp_block_reference(
        xs, kc[:, 1], vc[:, 1], tB, scale=scale, num_heads=H, **bw)
    # full-block outputs chain 4 bf16 matmuls + LN + attention; bounds are
    # RELATIVE to the oracle's max magnitude with <=1.25x headroom over the
    # observed v5e error (the fp32 interpret-mode suites pin the math to
    # 5e-5; these bound bf16 Mosaic drift)
    ok &= check("temporal_mlp_block", got, want, rtol=8.6e-3)
    ok &= check("temporal_mlp_block[k_cur]", gk, wk_, rtol=1e-4)

    zs = (jax.random.normal(wk[6], (B, 2, S, C)) * 0.5).astype(jnp.bfloat16)
    got, gk, gv = temporal_mlp_block_pair(zs, kc, vc, tB, layer=2,
                                          scale=scale, num_heads=H, **bw)
    want, wk_, wv_ = temporal_mlp_block_pair_reference(
        zs, kc[:, 2], vc[:, 2], tB, scale=scale, num_heads=H, **bw)
    ok &= check("temporal_mlp_block_pair", got, want, rtol=8.2e-3)
    ok &= check("temporal_mlp_block_pair[k_prev]", gk, wk_, rtol=1e-4)

    # ---- TRAINING-path backward kernels (r5: VERDICT r4 #6) -------------
    # flash_mha VJP at train shapes (the spatial/temporal fallback kernels)
    from tpu1x.ops.pallas_attention import flash_mha

    def attn_loss(fn, *args, **kw):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_, **kw).astype(jnp.float32) ** 2)

    qh8 = mk(0, 8, S, H, D)
    kh8 = mk(1, 8, S, H, D)
    vh8 = mk(2, 8, S, H, D)
    for causal in (False, True):
        g_got = jax.grad(attn_loss(flash_mha, scale=scale, causal=causal),
                         argnums=(0, 1, 2))(qh8, kh8, vh8)
        g_want = jax.grad(attn_loss(mha_reference, scale=scale,
                                    causal=causal),
                          argnums=(0, 1, 2))(qh8, kh8, vh8)
        rt = ({"q": 1.0e-2, "k": 5.8e-3, "v": 3e-4} if causal
              else {"q": 7.8e-3, "k": 6.5e-3, "v": 2.2e-3})
        for nm, gg, gw in zip("qkv", g_got, g_want):
            ok &= check(f"flash_mha_bwd[causal={causal}].d{nm}", gg, gw,
                        rtol=rt[nm])

    # fused temporal-attention VJP at train shapes (B, T, S, C heads-flat)
    from tpu1x.ops.temporal_attention import (temporal_attention,
                                              temporal_attention_reference)
    qt = mk(3, 4, T, S, C)
    kt = mk(4, 4, T, S, C)
    vt = mk(5, 4, T, S, C)
    g_got = jax.grad(attn_loss(temporal_attention, scale=scale,
                               num_heads=H, causal=True),
                     argnums=(0, 1, 2))(qt, kt, vt)
    g_want = jax.grad(attn_loss(temporal_attention_reference, scale=scale,
                                num_heads=H, causal=True),
                      argnums=(0, 1, 2))(qt, kt, vt)
    rt = {"q": 1.4e-2, "k": 7.3e-3, "v": 7.3e-3}
    for nm, gg, gw in zip("qkv", g_got, g_want):
        ok &= check(f"temporal_attention_bwd.d{nm}", gg, gw, rtol=rt[nm])

    # fused spatial TRAIN block VJP (r5 kernel): dx + every weight grad
    from tpu1x.ops.spatial_train_block import (
        spatial_train_block, spatial_train_block_reference)
    xs8 = (jax.random.normal(wk[5], (2 * T, S, C)) * 0.5).astype(jnp.bfloat16)
    wqkv32 = np.asarray(wqkv, np.float32)
    wproj32 = np.asarray(wproj, np.float32)
    bproj32 = np.asarray(bproj, np.float32)

    def stb_loss(fn):
        def f(x_, wq, wp, bp, s_, b_):
            out = fn(x_, wq, wp, bqkv=None, bproj=bp, ln_scale=s_,
                     ln_bias=b_, num_heads=H, scale=scale)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    args6 = (xs8, jnp.asarray(wqkv32), jnp.asarray(wproj32),
             jnp.asarray(bproj32), jnp.asarray(lns), jnp.asarray(lnb))
    out_got = spatial_train_block(*args6[:3], bproj=args6[3],
                                  ln_scale=args6[4], ln_bias=args6[5],
                                  num_heads=H, scale=scale)
    out_want = spatial_train_block_reference(
        *args6[:3], bproj=args6[3], ln_scale=args6[4], ln_bias=args6[5],
        num_heads=H, scale=scale)
    ok &= check("spatial_train_block[fwd]", out_got, out_want, rtol=6.6e-3)
    g_got = jax.grad(stb_loss(spatial_train_block),
                     argnums=tuple(range(6)))(*args6)
    g_want = jax.grad(stb_loss(spatial_train_block_reference),
                      argnums=tuple(range(6)))(*args6)
    # bounds = 1.25x the observed v5e error per output (floor 1e-4 for
    # the near-exact reductions, where accumulation-order drift dominates)
    rt = {"dx": 7.4e-3, "dwqkv": 2.6e-3, "dwproj": 2.8e-3,
          "dbproj": 4.0e-3, "dln_s": 4.0e-4, "dln_b": 1.0e-4}
    for nm, gg, gw in zip(("dx", "dwqkv", "dwproj", "dbproj", "dln_s",
                           "dln_b"), g_got, g_want):
        ok &= check(f"spatial_train_block_bwd.{nm}", gg, gw, rtol=rt[nm])

    # fused MLP TRAIN block VJP (r5 kernel): exact-erf GELU via the
    # in-kernel rational approximation
    from tpu1x.ops.mlp_train_block import (mlp_train_block,
                                           mlp_train_block_reference)
    wfc1_32 = np.asarray(wfc1, np.float32)
    wfc2_32 = np.asarray(wfc2, np.float32)
    bfc1_32 = 0.02 * np.random.RandomState(0).randn(4 * C).astype(np.float32)
    bfc2_32 = 0.02 * np.random.RandomState(1).randn(C).astype(np.float32)

    def mlp_loss(fn):
        def f(x_, w1, w2, b1, b2, s_, b_):
            out = fn(x_, w1, w2, bfc1=b1, bfc2=b2, ln_scale=s_, ln_bias=b_)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    margs = (xs8, jnp.asarray(wfc1_32), jnp.asarray(wfc2_32),
             jnp.asarray(bfc1_32), jnp.asarray(bfc2_32), jnp.asarray(lns),
             jnp.asarray(lnb))
    out_got = mlp_train_block(margs[0], margs[1], margs[2], bfc1=margs[3],
                              bfc2=margs[4], ln_scale=margs[5],
                              ln_bias=margs[6])
    out_want = mlp_train_block_reference(
        margs[0], margs[1], margs[2], bfc1=margs[3], bfc2=margs[4],
        ln_scale=margs[5], ln_bias=margs[6])
    ok &= check("mlp_train_block[fwd]", out_got, out_want, rtol=8.3e-3)
    g_got = jax.grad(mlp_loss(mlp_train_block),
                     argnums=tuple(range(7)))(*margs)
    g_want = jax.grad(mlp_loss(mlp_train_block_reference),
                      argnums=tuple(range(7)))(*margs)
    # 1.25x the observed v5e error per output (floor 1e-4 relative for the
    # near-exact reductions)
    rt = {"dx": 6.6e-3, "dwfc1": 3.9e-3, "dwfc2": 3.7e-3, "dbfc1": 1.9e-4,
          "dbfc2": 1.0e-4, "dln_s": 1.8e-4, "dln_b": 1.6e-4}
    for nm, gg, gw in zip(("dx", "dwfc1", "dwfc2", "dbfc1", "dbfc2",
                           "dln_s", "dln_b"), g_got, g_want):
        ok &= check(f"mlp_train_block_bwd.{nm}", gg, gw, rtol=rt[nm])

    # ---- bf16 serving GELU: tanh-vs-exact deviation (ADVICE r4) ---------
    # serving defaults to tanh GELU in bf16 (~1 ms/frame cheaper). Quantify
    # the divergence at the LOGITS level on one decode_frame call: the
    # tanh approximation's intrinsic error (~3e-4) must stay buried in the
    # paths' bf16 noise floor (which also differs because exact GELU takes
    # the per-op route — erf does not lower in Mosaic). Token agreement on
    # RANDOM weights is reported as information only: flat random logits
    # make argmax a coin flip, so it is not a meaningful pass/fail signal
    # (with trained weights, confident tokens agree).
    import os

    from tpu1x.model_zoo import genie_138m
    from tpu1x.models.st_maskgit import STMaskGIT
    from tpu1x.serving import DecodeEngine, prepare_serving_params

    cfg = genie_138m()
    model = STMaskGIT(cfg)
    dummy = jnp.zeros((1, cfg.T * cfg.S), jnp.int32)
    params = prepare_serving_params(
        model.init(jax.random.PRNGKey(0), dummy, dummy)["params"])
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 2, 16, 16), 0,
                                cfg.image_vocab_size, dtype=jnp.int32)
    frame = jnp.full((4, cfg.S), cfg.mask_token_id, jnp.int32)
    t4 = jnp.full((4,), 2, jnp.int32)

    def decode_logits(gelu):
        os.environ["TPU1X_GELU"] = gelu
        engine = DecodeEngine(cfg)
        cache = engine.prefill(params, prompt)
        logits, _ = engine.decode_frame(params, frame, t4, cache)
        return np.asarray(logits, np.float32)

    try:
        l_tanh = decode_logits("tanh")
        l_exact = decode_logits("exact")
        diff = float(np.max(np.abs(l_tanh - l_exact)))
        sd = float(np.std(l_exact))
        agree = float((np.argmax(l_tanh, -1) == np.argmax(l_exact, -1))
                      .mean())
        bound = 0.5 * sd
        passed = diff <= bound
        RESULTS.append({"name": "bf16_gelu_tanh_vs_exact_logits",
                        "max_abs_diff": round(diff, 5),
                        "logit_std": round(sd, 5),
                        "argmax_agreement_random_weights": round(agree, 4),
                        "bound": round(bound, 5), "ok": bool(passed)})
        print(f"{'PASS' if passed else 'FAIL'} bf16 GELU tanh-vs-exact "
              f"logits: max_abs_diff={diff:.4f} (bound=0.5*std={bound:.4f}; "
              f"argmax agreement on random weights {agree:.3f}, "
              f"informational)", flush=True)
        ok &= passed
    finally:
        os.environ.pop("TPU1X_GELU", None)

    import json
    print(json.dumps({"metric": "tpu_kernel_parity",
                      "value": 1 if ok else 0, "unit": "all_pass",
                      "checks": RESULTS}))
    print("ALL PASS" if ok else "SOME FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
