"""Serving decode engine: the KV-cached decode step as pure JAX + Pallas.

Why this exists (measured, benchmarks/profile_gen.py): the flax decode path
runs the layer stack as `nn.scan`, whose per-iteration xs slicing forces XLA
to materialize each layer's KV-cache slice (and, fused with the einsum
lowering, an fp32 *copy* of it) — ~60% of decode wall time at GENIE_138M.
Serving-quality decode needs the cache read exactly once per call, which
requires a fused attention kernel that streams the bf16 cache from HBM
directly — the layer index reaches the kernel's cache index_map via scalar
prefetch (tpu1x/ops/decode_attention.py), so the layer loop itself can be a
plain `lax.scan` (one traced body, fast compiles) or fully unrolled
(`layers_mode`). Neither is expressible through `nn.scan`, so the decode
step is re-implemented here as plain functions over the same parameter
pytree the flax model produces (scan layout: leaves stacked over layers).
The flax `STMaskGIT.decode_frame` remains the parity oracle
(tests/test_serving.py).

Behavioral contract: identical to `STMaskGIT.decode_frame`
(tpu1x/models/st_maskgit.py), which itself mirrors the reference sampler's
per-frame logits (st_mask_git.py:163-169) via temporal causality.

Usage (params always flow as jit ARGUMENTS, never closure constants):
    engine = DecodeEngine(config)                       # stateless
    sparams = prepare_serving_params(params)            # bf16 weights, once

    @jax.jit
    def gen(sparams, prompt, rng):
        decode_fn = functools.partial(engine.decode_frame, sparams)
        return generate_cached(prefill_fn, decode_fn, prompt, ...)

`sparams` also works with the flax model (`model.apply({"params": sparams},
...)`) for the prefill: flax modules cast per-call, so pre-cast bf16 weights
are a no-op there while fp32 LN/head params keep the mixed-precision policy.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu1x.config import GenieConfig
from tpu1x.models.factorization import factorize_token_ids
from tpu1x.ops.attention import mha_reference
from tpu1x.ops.decode_attention import (
    temporal_decode2_attention, temporal_decode2_attention_reference,
    temporal_decode_attention, temporal_decode_attention_reference)


def _layer_norm(x, scale, bias, eps: float = 1e-5):
    """fp32 LayerNorm matching flax nn.LayerNorm semantics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def prepare_serving_params(params: Dict[str, Any],
                           compute_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Cast matmul weights to the compute dtype ONCE (instead of per call).

    LayerNorm params and the fp32 output head stay fp32 (the model's
    mixed-precision policy: fp32 LN/softmax/head, bf16 matmuls).
    """
    def cast(path, x):
        # jnp.asarray COMMITS host (numpy) leaves to the device: checkpoint
        # loaders return numpy, and numpy jit arguments are re-uploaded on
        # EVERY call (~11 s/call for 138M weights over a 25 MB/s dev relay;
        # measured in the round-5 evaluator-CLI debugging)
        x = jnp.asarray(x)
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "norm" in p.lower() or "out_x_proj" in p:
            return x
        return x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map_with_path(cast, params)


class DecodeEngine:
    """Unrolled, kernel-fused decode_frame over a scan-layout param pytree.

    Stateless: holds only static configuration; params are passed to every
    call so they stay jit arguments (closing over 138M fp32 weights would
    bake them into the program as constants).
    """

    def __init__(self, config: GenieConfig, attn_impl: str = "auto",
                 compute_dtype=None, prefill_attn_impl: str = None,
                 layers_mode: str = "scan", cache_dtype: str = "bf16"):
        self.config = config
        self.dtype = (jnp.dtype(config.dtype) if compute_dtype is None
                      else jnp.dtype(compute_dtype))
        if attn_impl == "auto":
            attn_impl = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
        assert attn_impl in ("pallas", "xla"), attn_impl
        self.attn_impl = attn_impl
        # "scan": lax.scan over the stacked layer axis — ONE traced copy of
        # the layer body; the decode kernels take the layer index at runtime
        # (scalar prefetch into the cache index_map), so the single-cache-
        # read property is preserved. ~32x smaller program / compile time at
        # GENIE_138M than "unroll" (static layer indices), same math.
        assert layers_mode in ("scan", "unroll"), layers_mode
        self.layers_mode = layers_mode
        # "int8": per-token symmetric int8 KV cache (scales folded into the
        # kernel's logits/probs) — halves the bytes of the bandwidth-bound
        # cache stream. Parity vs the bf16 oracle in tests/test_serving.py.
        assert cache_dtype in ("bf16", "int8"), cache_dtype
        self.cache_dtype = cache_dtype
        # decode-step spatial attention: "fused" = the monolithic spatial
        # block kernel (LN + qkv + all-heads attention + proj + residual in
        # one Pallas program, tpu1x/ops/spatial_block.py). Measured in-situ
        # on v5e at GENIE_138M: pair call (32, 256, 512) 314 us fused vs
        # 520 us XLA; single-frame decode (16, 256, 512) 156 vs 114 — so
        # "fused" automatically falls back to XLA below 32 rows. "pallas"
        # keeps the r2 flash_mha route (loses on transposes at these
        # shapes); "xla" is the oracle path.
        import os
        default_spatial = ("fused" if self.attn_impl == "pallas" else "xla")
        self.spatial_attn_impl = os.environ.get(
            "TPU1X_DECODE_SPATIAL_IMPL", default_spatial)
        # prefill's bidirectional spatial attention is a separate switch;
        # the fused block kernel wins there too (128 rows: 1297 us vs
        # 2282 us XLA, benchmarks/profile_gen.py r4).
        self.prefill_attn_impl = (prefill_attn_impl
                                  or os.environ.get(
                                      "TPU1X_PREFILL_SPATIAL_IMPL",
                                      default_spatial))
        # MLP activation: exact erf-GELU (the reference's torch nn.GELU)
        # for fp32 compute; tanh-approx for bf16 serving (error below bf16
        # quantization; see _mlp). Override with TPU1X_GELU=exact|tanh.
        self.gelu = os.environ.get(
            "TPU1X_GELU",
            "tanh" if self.dtype == jnp.bfloat16 else "exact")
        assert self.gelu in ("exact", "tanh"), self.gelu
        # "block": the decode step's layer body runs as TWO fused Pallas
        # programs (spatial_block + temporal_mlp_block) — no (B, S, C)
        # intermediate round-trips HBM between ops. "op": r3's per-op
        # kernels. The block kernels cover the bf16 cache and standard
        # pre-LN config; other combinations fall back to "op".
        self.layer_fusion = os.environ.get(
            "TPU1X_DECODE_FUSION",
            "block" if self.attn_impl == "pallas" else "op")
        # exact-erf GELU cannot lower inside Mosaic kernels ON TPU (erf/
        # erfc are unimplemented Pallas TPU primitives — caught by the r5
        # tpu_kernel_check GELU-agreement check), so TPU1X_GELU=exact takes
        # the per-op path there, where XLA provides erf. Off-TPU the block
        # kernels run in interpret mode where erf is available (the fp32
        # CPU parity suites exercise the block path with exact GELU).
        self._block_ok = (self.layer_fusion == "block"
                          and self.attn_impl == "pallas"
                          and cache_dtype == "bf16" and not config.qk_norm
                          and (self.gelu == "tanh"
                               or jax.default_backend() != "tpu"))
        if (config.qk_norm and self.attn_impl == "pallas"
                and self.layer_fusion == "block"):
            import warnings
            warnings.warn(
                "qk_norm=True: the temporal+MLP block fusion and the fused "
                "temporal prefill fall back to the slower per-op path (the "
                "spatial block kernel still applies qk-LN in-kernel; the "
                "per-op path benched 5.09 ms/frame in r3 vs 3.5 with block "
                "fusion). The shipped reference config uses qk_norm=false "
                "(magvit_n32_h8_d256.json).", stacklevel=2)
        cfg = config
        self.head_dim = cfg.d_model // cfg.num_heads
        self.scale = (8.0 / self.head_dim if cfg.use_mup
                      else self.head_dim ** -0.5)

    # -- building blocks ----------------------------------------------------

    def _dense(self, x, w, b=None):
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        if b is not None:
            y = y + b.astype(self.dtype)
        return y

    def _embed(self, params, tokens_BS):
        cfg = self.config
        te = params["token_embed"]
        is_mask = tokens_BS == cfg.mask_token_id
        safe = jnp.where(is_mask, 0, tokens_BS)
        fact = factorize_token_ids(safe, cfg.num_factored_vocabs,
                                   cfg.factored_vocab_size)
        x = None
        for k in range(cfg.num_factored_vocabs):
            tab = te[f"factored_embeds_{k}"]["embedding"].astype(self.dtype)
            e = jnp.take(tab, fact[..., k], axis=0)
            x = e if x is None else x + e
        mask_embed = te["mask_token_embed"].astype(self.dtype)
        return jnp.where(is_mask[..., None], mask_embed, x)

    def _qkv(self, attn_p, x):
        """x (..., C) -> q, k, v each (..., C) flat; qk-norm applied per head
        if configured (fp32 shared LN, genie/attention.py:42-47)."""
        cfg = self.config
        qkv = self._dense(x, attn_p["qkv"]["kernel"],
                          attn_p["qkv"].get("bias"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_norm:
            H, D = cfg.num_heads, self.head_dim
            ln = attn_p["norm"]

            def qknorm(t):
                th = t.reshape(t.shape[:-1] + (H, D))
                tn = _layer_norm(th, ln["scale"], ln["bias"])
                return tn.reshape(t.shape).astype(v.dtype)
            q, k = qknorm(q), qknorm(k)
        return q, k, v

    def _spatial_attn(self, p, x_BSC, impl=None):
        q, k, v = self._qkv(p, x_BSC)
        H, D = self.config.num_heads, self.head_dim
        B, S, C = x_BSC.shape

        def heads(t):
            return t.reshape(B, S, H, D)
        if (impl or self.spatial_attn_impl) == "pallas":
            from tpu1x.ops.pallas_attention import flash_mha
            out = flash_mha(heads(q), heads(k), heads(v), scale=self.scale,
                            causal=False)
        else:
            out = mha_reference(heads(q), heads(k), heads(v),
                                scale=self.scale, causal=False)
        return self._dense(out.reshape(B, S, C), p["proj"]["kernel"],
                           p["proj"].get("bias"))

    def _spatial_half(self, lp, x_NSC, impl: Optional[str] = None):
        """The full spatial half of one STBlock: n1 -> qkv -> bidirectional
        attention -> proj -> residual. "fused" runs it as ONE Pallas program
        (tpu1x/ops/spatial_block.py) — no fp32 (N, H, S, S) logits in HBM;
        measured faster than the XLA lowering from 32 rows up (bench.py
        4.56 ms/frame with the N=16 fallback vs 4.62 always-fused), so
        single-frame decode calls (N = B = 16) keep the XLA path."""
        cfg = self.config
        impl = impl or self.spatial_attn_impl
        if impl == "fused" and x_NSC.shape[0] < int(
                __import__("os").environ.get("TPU1X_SPATIAL_FUSED_MIN_ROWS",
                                             "32")):
            impl = "xla"  # measured: XLA keeps the single-frame decode call
        if impl == "fused":
            from tpu1x.ops.spatial_block import spatial_block
            sp = lp["spatial_attn"]
            return spatial_block(
                x_NSC.astype(self.dtype), sp["qkv"]["kernel"],
                sp["proj"]["kernel"],
                bqkv=sp["qkv"].get("bias"), bproj=sp["proj"].get("bias"),
                ln_scale=None if cfg.qk_norm else lp["norm1"]["scale"],
                ln_bias=None if cfg.qk_norm else lp["norm1"]["bias"],
                qk_ln_scale=sp["norm"]["scale"] if cfg.qk_norm else None,
                qk_ln_bias=sp["norm"]["bias"] if cfg.qk_norm else None,
                num_heads=cfg.num_heads, scale=self.scale)
        if cfg.qk_norm:  # norm1 is Identity (st_transformer.py:44,67)
            h = x_NSC.astype(self.dtype)
        else:
            h = self._pre_norm(lp["norm1"], x_NSC)
        return x_NSC + self._spatial_attn(lp["spatial_attn"], h, impl=impl)

    def _cache_slice(self, cache, layer):
        """Dequantized (T, B, S, C) K/V slices of `layer` (oracle path)."""
        from tpu1x.ops.decode_attention import dequantize_kv
        k_l, v_l = cache["k"][:, layer], cache["v"][:, layer]
        if "k_scale" in cache:
            # scales are (L, B, T, S) -> this layer's (T, B, S)
            ks = jnp.transpose(cache["k_scale"][layer], (1, 0, 2))
            vs = jnp.transpose(cache["v_scale"][layer], (1, 0, 2))
            k_l = dequantize_kv(k_l, ks).astype(self.dtype)
            v_l = dequantize_kv(v_l, vs).astype(self.dtype)
        return k_l, v_l

    def _temporal_attn(self, p, x_BSC, cache, layer, t_B):
        q, k_cur, v_cur = self._qkv(p, x_BSC)
        if self.attn_impl == "pallas":
            out = temporal_decode_attention(
                q, cache["k"], cache["v"], k_cur, v_cur, t_B, layer=layer,
                scale=self.scale, num_heads=self.config.num_heads,
                k_scale=cache.get("k_scale"), v_scale=cache.get("v_scale"))
        else:
            k_l, v_l = self._cache_slice(cache, layer)
            out = temporal_decode_attention_reference(
                q, k_l, v_l, k_cur, v_cur, t_B,
                scale=self.scale, num_heads=self.config.num_heads)
        out = self._dense(out, p["proj"]["kernel"], p["proj"].get("bias"))
        return out, k_cur, v_cur

    def _mlp(self, p, x):
        h = self._dense(x, p["fc1"]["kernel"], p["fc1"].get("bias"))
        # "tanh" (serving default in bf16): erf-GELU costs ~40 VPU cycles
        # per element — measured 4.56 -> 3.52 ms/frame at the bench shape
        # (25M gelu/frame). The tanh approximation's error (~3e-4 in
        # gelu units) is below bf16 quantization (~4e-3 relative), so
        # bf16 serving keeps it; fp32 paths (CPU golden parity) stay
        # exact like the reference's torch nn.GELU (st_transformer.py:7-20).
        h = jax.nn.gelu(h, approximate=(self.gelu == "tanh"))
        return self._dense(h, p["fc2"]["kernel"], p["fc2"].get("bias"))

    def _pre_norm(self, ln_p, x):
        """Pre-LN in the compute dtype (fused Pallas kernel on TPU; fp32
        statistics either way — tpu1x/ops/layernorm.py)."""
        from tpu1x.ops.layernorm import layer_norm
        return layer_norm(x, ln_p["scale"], ln_p["bias"],
                          out_dtype=self.dtype)

    def _layer(self, lp, layer, x, cache, t_B):
        """One STBlock decode step (parity: STBlock.decode_step)."""
        cfg = self.config
        x = self._spatial_half(lp, x)
        if self._block_ok:
            from tpu1x.ops.temporal_mlp_block import temporal_mlp_block
            return temporal_mlp_block(
                x, cache["k"], cache["v"], t_B, layer=layer,
                scale=self.scale, num_heads=cfg.num_heads,
                gelu_tanh=self.gelu == "tanh",
                **self._block_weights(lp))

        def n2(t):
            if cfg.qk_norm:  # norm1/2 are Identity (st_transformer.py:44,67)
                return t.astype(self.dtype)
            return self._pre_norm(lp["norm2"], t)

        t_out, k_cur, v_cur = self._temporal_attn(
            lp["temporal_attn"], x, cache, layer, t_B)
        x = x + t_out  # NOTE: no pre-norm on temporal (st_transformer.py:78)
        x = x + self._mlp(lp["mlp"], n2(x))
        return x, k_cur, v_cur

    def _block_weights(self, lp):
        """Weight kwargs of the fused temporal+MLP block kernel."""
        tp, mp = lp["temporal_attn"], lp["mlp"]
        return dict(
            wqkv=tp["qkv"]["kernel"], bqkv=tp["qkv"].get("bias"),
            wproj=tp["proj"]["kernel"], bproj=tp["proj"].get("bias"),
            ln_scale=lp["norm2"]["scale"], ln_bias=lp["norm2"]["bias"],
            wfc1=mp["fc1"]["kernel"], bfc1=mp["fc1"].get("bias"),
            wfc2=mp["fc2"]["kernel"], bfc2=mp["fc2"].get("bias"))

    def _mha(self, q, k, v, causal: bool, impl: Optional[str] = None):
        """(..., N, C) heads-flat in/out; pallas flash kernel on TPU."""
        from tpu1x.ops.attention import mha
        H, D = self.config.num_heads, self.head_dim

        def heads(t):
            return t.reshape(t.shape[:-1] + (H, D))
        out = mha(heads(q), heads(k), heads(v), scale=self.scale,
                  causal=causal, impl=impl or self.attn_impl)
        return out.reshape(q.shape)

    # -- public API ----------------------------------------------------------

    def prefill(self, params, tokens_BPHW, actions_BP=None):
        """Contract-identical to STMaskGIT.prefill (same cache layout), but
        as an unrolled bf16 loop: the flax nn.scan prefill materializes
        per-layer KV slices + fp32 copies (measured ~30% of rollout wall,
        benchmarks/profile_gen.py) that this path never creates.

        Returns cache {"k","v"}: (T, L, B, S, C), slots >= P zero-padded
        (T-major: the per-frame commit is a contiguous slab write —
        see STMaskGIT.prefill).
        """
        cfg = self.config
        p = params
        if "layers" not in p.get("decoder", {}):
            raise ValueError("DecodeEngine requires scan-layout params")
        B, P, H, W = tokens_BPHW.shape
        S = H * W
        x = self._embed(p, tokens_BPHW.reshape(B, P, S))
        x = x + p["pos_embed_TSC"][:, :P].astype(self.dtype)
        if cfg.action_vocab_size > 0 and actions_BP is not None:
            act = jnp.take(p["action_embed"]["embedding"], actions_BP, axis=0)
            x = x + act[:, :, None, :].astype(self.dtype)

        lp = p["decoder"]["layers"]
        if self.layers_mode == "unroll":
            ks, vs = [], []
            for layer in range(cfg.num_layers):
                layer_p = jax.tree_util.tree_map(lambda a: a[layer], lp)
                x, k, v = self._prefill_layer(layer_p, x)  # k/v (B, S, P, C)
                ks.append(k)
                vs.append(v)
            k = jnp.stack(ks, axis=2)  # (B, S, L, P, C)
            v = jnp.stack(vs, axis=2)
            k = jnp.transpose(k, (3, 2, 0, 1, 4))  # (P, L, B, S, C)
            v = jnp.transpose(v, (3, 2, 0, 1, 4))
        else:
            # write each layer's K/V straight into the final T-major cache
            # inside the scan (carry updated in place by XLA) — the stacked
            # (L, B, S, P, C) ys + big transpose + pad of the naive version
            # cost ~3 extra full-cache HBM passes (measured ~11% of rollout
            # wall, benchmarks/profile_gen.py)
            L = cfg.num_layers
            kc0 = jnp.zeros((cfg.T, L, B, S, cfg.d_model), self.dtype)
            vc0 = jnp.zeros_like(kc0)

            def body(carry, xs):
                x, kc, vc = carry
                lp_l, li = xs
                x, k_l, v_l = self._prefill_layer(lp_l, x)  # (B, S, P, C)
                kT = jnp.transpose(k_l, (2, 0, 1, 3))[:, None]  # (P,1,B,S,C)
                vT = jnp.transpose(v_l, (2, 0, 1, 3))[:, None]
                idx = (0, li, 0, 0, 0)
                kc = jax.lax.dynamic_update_slice(kc, kT, idx)
                vc = jax.lax.dynamic_update_slice(vc, vT, idx)
                return (x, kc, vc), None

            lis = jnp.arange(L, dtype=jnp.int32)
            (x, k, v), _ = jax.lax.scan(body, (x, kc0, vc0), (lp, lis))
            pad = 0
        if self.layers_mode == "unroll":
            pad = cfg.T - P
        if pad > 0:
            widths = [(0, pad), (0, 0), (0, 0), (0, 0), (0, 0)]
            k = jnp.pad(k, widths)
            v = jnp.pad(v, widths)
        if self.cache_dtype == "int8":
            from tpu1x.ops.decode_attention import quantize_kv
            kq, ks = quantize_kv(k)  # scales (T, L, B, S)
            vq, vs = quantize_kv(v)
            # scales stored layer-major (L, B, T, S): one layer's slab is a
            # contiguous Mosaic-aligned (1, B, T, S) kernel block
            to_lbts = lambda s: jnp.transpose(s, (1, 2, 0, 3))  # noqa: E731
            return {"k": kq, "v": vq,
                    "k_scale": to_lbts(ks), "v_scale": to_lbts(vs)}
        return {"k": k, "v": v}

    def _prefill_layer(self, lp, x_BPSC):
        """One STBlock forward collecting temporal K/V (parity:
        STBlock.prefill, tpu1x/models/st_transformer.py)."""
        cfg = self.config
        B, P, S, C = x_BPSC.shape

        def n2(t):
            if cfg.qk_norm:  # norm1/2 are Identity (st_transformer.py:44,67)
                return t.astype(self.dtype)
            return self._pre_norm(lp["norm2"], t)

        # spatial (bidirectional over S, (B, P) batch-like)
        x = self._spatial_half(lp, x_BPSC.reshape(B * P, S, C),
                               impl=self.prefill_attn_impl
                               ).reshape(B, P, S, C)

        # temporal (causal over P, no pre-norm — st_transformer.py:78) in the
        # native spatial-major layout via the fused kernel — no
        # (B, S, P, C) transpose, no head-split tensors (measured as the
        # prefill's dominant fusions/copies, benchmarks/profile_gen.py).
        # qk_norm needs per-head LN on q/k — the transposed oracle path.
        if not cfg.qk_norm and self.attn_impl == "pallas":
            from tpu1x.ops.temporal_attention import temporal_attention
            q, k, v = self._qkv(lp["temporal_attn"], x)  # (B, P, S, C)
            out = temporal_attention(q, k, v, scale=self.scale,
                                     num_heads=cfg.num_heads, causal=True)
            out = self._dense(out, lp["temporal_attn"]["proj"]["kernel"],
                              lp["temporal_attn"]["proj"].get("bias"))
            x = x + out
            x = x + self._mlp(lp["mlp"], n2(x))
            # cache layout (B, S, P, C)
            kv = (jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2))
            return x, kv[0], kv[1]

        x_BSPC = jnp.swapaxes(x, 1, 2)
        q, k, v = self._qkv(lp["temporal_attn"],
                            x_BSPC.reshape(B * S, P, C))
        out = self._mha(q, k, v, causal=True, impl="xla")
        out = self._dense(out, lp["temporal_attn"]["proj"]["kernel"],
                          lp["temporal_attn"]["proj"].get("bias"))
        x_BSPC = x_BSPC + out.reshape(B, S, P, C)
        kv = (k.reshape(B, S, P, C), v.reshape(B, S, P, C))

        # MLP in the (B, S, P, C) layout (same math as the flax block)
        x_BSPC = x_BSPC + self._mlp(lp["mlp"], n2(x_BSPC))
        return jnp.swapaxes(x_BSPC, 1, 2), kv[0], kv[1]

    def decode_frame(self, params, frame_tokens_BS, t_B, cache,
                     action_B: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Contract-identical to STMaskGIT.decode_frame.

        Args:
            params: scan-layout pytree, ideally via `prepare_serving_params`.
        Returns (logits (B, S, V, F) float32, kv_cur each (1, L, B, S, C)).
        """
        cfg = self.config
        p = params
        if "layers" not in p.get("decoder", {}):
            raise ValueError("DecodeEngine requires scan-layout params "
                             "(config.scan_layers=True, the default)")
        B, S = frame_tokens_BS.shape
        t_B = jnp.broadcast_to(jnp.asarray(t_B, jnp.int32), (B,))
        x = self._embed(p, frame_tokens_BS)
        pos = jnp.take(p["pos_embed_TSC"][0], t_B, axis=0)  # (B, S, C)
        x = x + pos.astype(self.dtype)
        if cfg.action_vocab_size > 0 and action_B is not None:
            act = jnp.take(p["action_embed"]["embedding"], action_B, axis=0)
            x = x + act[:, None, :].astype(self.dtype)

        lp = p["decoder"]["layers"]
        if self.layers_mode == "unroll":
            k_curs, v_curs = [], []
            for layer in range(cfg.num_layers):
                layer_p = jax.tree_util.tree_map(lambda a: a[layer], lp)
                x, k_cur, v_cur = self._layer(layer_p, layer, x, cache, t_B)
                k_curs.append(k_cur)
                v_curs.append(v_cur)
            k_cur = jnp.stack(k_curs)[None]  # (1, L, B, S, C)
            v_cur = jnp.stack(v_curs)[None]
        else:
            def body(x, xs):
                lp_l, li = xs
                x, k_cur, v_cur = self._layer(lp_l, li, x, cache, t_B)
                return x, (k_cur, v_cur)
            lis = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            x, (k_curs, v_curs) = jax.lax.scan(body, x, (lp, lis))
            k_cur = k_curs[None]  # (1, L, B, S, C)
            v_cur = v_curs[None]

        if cfg.use_mup:
            x = x / cfg.width_mult
        logits = self._head(p, x)
        logits = logits.reshape(B, S, cfg.num_factored_vocabs,
                                cfg.factored_vocab_size).swapaxes(-1, -2)
        return logits, (k_cur, v_cur)

    def _head(self, p, x):
        """Output head: bf16 operands, fp32 MXU accumulation + fp32 bias.
        (A full-fp32 matmul costs 4x MXU passes for < 1e-2 logit delta on
        inputs that are already bf16; the reference's autocast computes
        this Linear in bf16 too, st_mask_git.py:61.)"""
        head = p["out_x_proj"]
        y = jnp.dot(x.astype(self.dtype), head["kernel"].astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return y + head["bias"].astype(jnp.float32)

    def _layer_pair_block(self, lp, layer, z_B2SC, cache, t_prev_B):
        """Block-fused pair step: spatial_block on the flattened rows, then
        ONE temporal+MLP program per (row, s-tile) serving both frames from
        a single cache stream (interleaved (B, 2, S, C) layout)."""
        from tpu1x.ops.temporal_mlp_block import temporal_mlp_block_pair
        cfg = self.config
        B, _, S, C = z_B2SC.shape
        z = self._spatial_half(lp, z_B2SC.reshape(2 * B, S, C)
                               ).reshape(B, 2, S, C)
        return temporal_mlp_block_pair(
            z, cache["k"], cache["v"], t_prev_B, layer=layer,
            scale=self.scale, num_heads=cfg.num_heads,
            gelu_tanh=self.gelu == "tanh", **self._block_weights(lp))

    def _layer_pair(self, lp, layer, z_2BSC, cache, t_prev_B):
        """One STBlock step over [prev_final; cur_masked] stacked on the
        batch axis (spatial attention stays frame-local for free); temporal
        attention via the fused two-frame kernel — ONE cache stream serves
        both frames."""
        cfg = self.config
        B = z_2BSC.shape[0] // 2

        def n2(t):
            if cfg.qk_norm:  # norm1/2 are Identity (st_transformer.py:44,67)
                return t.astype(self.dtype)
            return self._pre_norm(lp["norm2"], t)

        z = self._spatial_half(lp, z_2BSC)
        p = lp["temporal_attn"]
        q, k_all, v_all = self._qkv(p, z)
        qp, qc = q[:B], q[B:]
        kp, kcur = k_all[:B], k_all[B:]
        vp, vcur = v_all[:B], v_all[B:]
        if self.attn_impl == "pallas":
            op, oc = temporal_decode2_attention(
                qp, qc, cache["k"], cache["v"], kp, vp, kcur, vcur, t_prev_B,
                layer=layer, scale=self.scale,
                num_heads=self.config.num_heads,
                k_scale=cache.get("k_scale"), v_scale=cache.get("v_scale"))
        else:
            k_l, v_l = self._cache_slice(cache, layer)
            op, oc = temporal_decode2_attention_reference(
                qp, qc, k_l, v_l, kp, vp, kcur,
                vcur, t_prev_B, scale=self.scale,
                num_heads=self.config.num_heads)
        out = self._dense(jnp.concatenate([op, oc], axis=0),
                          p["proj"]["kernel"], p["proj"].get("bias"))
        z = z + out  # no temporal pre-norm (st_transformer.py:78)
        z = z + self._mlp(lp["mlp"], n2(z))
        return z, kp, vp

    def decode_frame_pair(self, params, prev_tokens_BS, cur_tokens_BS,
                          t_prev_B, cache, action_prev=None, action_cur=None):
        """Fused pass: commit-grade forward of frame t_prev's FINAL tokens +
        step-0 decode of frame t_prev+1's masked tokens. Mathematically
        identical to a `decode_frame(prev)` (for its K/V) followed by
        `update_cache` + `decode_frame(cur)` — but the cache and the weights
        stream from HBM once instead of twice (the decode path is
        bandwidth-bound, benchmarks/profile_gen.py).

        Returns (logits_cur (B, S, V, F) float32, kv_prev each
        (1, L, B, S, C)) — the caller commits kv_prev at slot t_prev.
        """
        cfg = self.config
        p = params
        B, S = prev_tokens_BS.shape
        t_prev_B = jnp.broadcast_to(jnp.asarray(t_prev_B, jnp.int32), (B,))

        def embed_frame(tokens, t_B, action_B):
            x = self._embed(p, tokens)
            pos = jnp.take(p["pos_embed_TSC"][0], t_B, axis=0)
            x = x + pos.astype(self.dtype)
            if cfg.action_vocab_size > 0 and action_B is not None:
                act = jnp.take(p["action_embed"]["embedding"], action_B,
                               axis=0)
                x = x + act[:, None, :].astype(self.dtype)
            return x

        if self._block_ok:  # interleaved (B, 2, S, C) layout
            z = jnp.stack([
                embed_frame(prev_tokens_BS, t_prev_B, action_prev),
                embed_frame(cur_tokens_BS, t_prev_B + 1, action_cur),
            ], axis=1)
            layer_fn = self._layer_pair_block
        else:
            z = jnp.concatenate([
                embed_frame(prev_tokens_BS, t_prev_B, action_prev),
                embed_frame(cur_tokens_BS, t_prev_B + 1, action_cur),
            ], axis=0)  # (2B, S, C)
            layer_fn = self._layer_pair

        lp = p["decoder"]["layers"]
        if self.layers_mode == "unroll":
            k_prevs, v_prevs = [], []
            for layer in range(cfg.num_layers):
                layer_p = jax.tree_util.tree_map(lambda a: a[layer], lp)
                z, kp, vp = layer_fn(layer_p, layer, z, cache, t_prev_B)
                k_prevs.append(kp)
                v_prevs.append(vp)
            kv_prev = (jnp.stack(k_prevs)[None], jnp.stack(v_prevs)[None])
        else:
            def body(z, xs):
                lp_l, li = xs
                z, kp, vp = layer_fn(lp_l, li, z, cache, t_prev_B)
                return z, (kp, vp)
            lis = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            z, (k_prevs, v_prevs) = jax.lax.scan(body, z, (lp, lis))
            kv_prev = (k_prevs[None], v_prevs[None])

        y = z[:, 1] if self._block_ok else z[B:]  # cur half
        if cfg.use_mup:
            y = y / cfg.width_mult
        logits = self._head(p, y)
        logits = logits.reshape(B, S, cfg.num_factored_vocabs,
                                cfg.factored_vocab_size).swapaxes(-1, -2)
        return logits, kv_prev

    def __call__(self, params, frame_tokens_BS, t_B, cache, action_B=None):
        return self.decode_frame(params, frame_tokens_BS, t_B, cache,
                                 action_B)
