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


def check(name, got, want, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs_err={err:.3e} "
          f"(atol={atol})", flush=True)
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
        ok &= check(f"decode_attention[layer={layer}]", got, want, 3e-2)

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
    ok &= check("decode_attention[int8]", got, want, 5e-2)

    qp, qc2 = mk(5, B, S, C), mk(6, B, S, C)
    kp, vp = mk(7, B, S, C), mk(8, B, S, C)
    want_p, want_c = temporal_decode2_attention_reference(
        qp, qc2, kc[:, 2], vc[:, 2], kp, vp, kcur, vcur, tB, scale=scale,
        num_heads=H)
    got_p, got_c = temporal_decode2_attention(
        qp, qc2, kc, vc, kp, vp, kcur, vcur, tB, layer=2, scale=scale,
        num_heads=H)
    ok &= check("decode2_attention[prev]", got_p, want_p, 3e-2)
    ok &= check("decode2_attention[cur]", got_c, want_c, 3e-2)

    got_p, got_c = temporal_decode2_attention(
        qp, qc2, kq, vq, kp, vp, kcur, vcur, tB, layer=2, scale=scale,
        num_heads=H, k_scale=ksc_lbts, v_scale=vsc_lbts)
    want_p, want_c = temporal_decode2_attention_reference(
        qp, qc2, deq_k[:, 2], deq_v[:, 2], kp, vp, kcur, vcur, tB,
        scale=scale, num_heads=H)
    ok &= check("decode2_attention[int8,prev]", got_p, want_p, 5e-2)
    ok &= check("decode2_attention[int8,cur]", got_c, want_c, 5e-2)

    # flash attention at prefill shapes (spatial: bidir; temporal: causal)
    D = C // H
    qh = mk(0, B * 8, S, H, D)
    kh = mk(1, B * 8, S, H, D)
    vh = mk(2, B * 8, S, H, D)
    for causal in (False, True):
        want = mha_reference(qh, kh, vh, scale=scale, causal=causal)
        got = mha(qh, kh, vh, scale=scale, causal=causal, impl="pallas")
        ok &= check(f"flash_mha[causal={causal}]", got, want, 3e-2)

    # fused LayerNorm at block shapes
    x = mk(3, B, S, C)
    g = jax.random.normal(ks[9], (C,), jnp.float32)
    b = jax.random.normal(ks[5], (C,), jnp.float32)
    want = layer_norm_reference(x, g, b).astype(jnp.bfloat16)
    got = layer_norm(x, g, b, out_dtype=jnp.bfloat16)
    ok &= check("layer_norm", got, want, 2e-2)

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
        ok &= check(f"spatial_block[N={N}]", got, want, 5e-2)

    wfc1 = (jax.random.normal(wk[6], (C, 4 * C)) * 0.05).astype(jnp.bfloat16)
    wfc2 = (jax.random.normal(wk[7], (4 * C, C)) * 0.05).astype(jnp.bfloat16)
    bw = dict(wqkv=wqkv, wproj=wproj, bproj=bproj, ln_scale=lns, ln_bias=lnb,
              wfc1=wfc1, wfc2=wfc2)
    xs = (jax.random.normal(wk[5], (B, S, C)) * 0.5).astype(jnp.bfloat16)
    got, gk, gv = temporal_mlp_block(xs, kc, vc, tB, layer=1, scale=scale,
                                     num_heads=H, **bw)
    want, wk_, wv_ = temporal_mlp_block_reference(
        xs, kc[:, 1], vc[:, 1], tB, scale=scale, num_heads=H, **bw)
    # full-block outputs chain 4 bf16 matmuls + LN + attention: one bf16
    # ulp at the output magnitude (~8) is 6.25e-2, so the block tolerance
    # is 1e-1 (the fp32 interpret-mode suites pin the math to 5e-5)
    ok &= check("temporal_mlp_block", got, want, 1e-1)
    ok &= check("temporal_mlp_block[k_cur]", gk, wk_, 3e-2)

    zs = (jax.random.normal(wk[6], (B, 2, S, C)) * 0.5).astype(jnp.bfloat16)
    got, gk, gv = temporal_mlp_block_pair(zs, kc, vc, tB, layer=2,
                                          scale=scale, num_heads=H, **bw)
    want, wk_, wv_ = temporal_mlp_block_pair_reference(
        zs, kc[:, 2], vc[:, 2], tB, scale=scale, num_heads=H, **bw)
    ok &= check("temporal_mlp_block_pair", got, want, 1e-1)
    ok &= check("temporal_mlp_block_pair[k_prev]", gk, wk_, 3e-2)

    import json
    print(json.dumps({"metric": "tpu_kernel_parity",
                      "value": 1 if ok else 0, "unit": "all_pass"}))
    print("ALL PASS" if ok else "SOME FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
