"""Spatio-temporal factored transformer (GENIE Fig. 4).

Behavioral contract matches the reference `genie/st_transformer.py`:
- STBlock: (1) bidirectional *spatial* attention over the S=H*W tokens of each
  frame, (2) causal *temporal* attention over the T frames at each spatial
  position, (3) GELU MLP; residual around each (ref: st_transformer.py:70-83).
- Quirks preserved: `norm1`/`norm2` are identity when `qk_norm=True` and
  LayerNorm(eps=1e-5) otherwise (ref: 44,67); the temporal attention has *no*
  pre-norm (ref: 78); GELU is exact (erf), not tanh-approximate.
- The decoder is a plain stack of `num_layers` STBlocks with no final norm
  (ref: 86-120).

TPU-first design:
- Activations stay (B, T, S, C); the spatial/temporal axis swap is a single
  transpose that XLA lays out once per block (the torch code reshapes through
  (B*T, S, C) / (B*S, T, C) — same math).
- The layer stack is a `lax.scan` over stacked parameters (one traced block,
  32x faster compiles), with optional `jax.checkpoint` per block for
  rematerialization.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu1x.ops.attention import SelfAttention


class Mlp(nn.Module):
    """GELU MLP (reference: st_transformer.py:7-25)."""

    d_model: int
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    gelu_approx: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        hidden_dim = int(self.d_model * self.mlp_ratio)
        x = nn.Dense(hidden_dim, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(stddev=0.02), name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        if self.mlp_drop > 0.0 and not self.deterministic:
            x = nn.Dropout(rate=self.mlp_drop)(x, deterministic=False)
        x = nn.Dense(self.d_model, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(stddev=0.02), name="fc2")(x)
        if self.mlp_drop > 0.0 and not self.deterministic:
            x = nn.Dropout(rate=self.mlp_drop)(x, deterministic=False)
        return x


class STBlock(nn.Module):
    """One spatial-attn -> temporal-attn -> MLP block (ref: st_transformer.py:28-83).

    Three entry points sharing one parameter set:
    - `__call__`: the reference forward over (B, T, S, C).
    - `prefill`: forward that also returns the temporal K/V (B, S, T, C)
      for the KV cache. The cache keeps heads flattened into C = H*D so its
      minor dimension is MXU/VPU-tile friendly (C=512 -> (8,128) tiles); a
      head-split (..., H, D=32) trailing layout would be lane-padded 32->128,
      4x-inflating a multi-GB persistent buffer.
    - `decode_step`: single-frame decode against a cache — the TPU-native
      fast path the reference lacks (its sampler recomputes all T frames
      every MaskGIT step, st_mask_git.py:169); temporal causality makes the
      cached single-frame compute mathematically identical.
    """

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    gelu_approx: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    deterministic: bool = True

    def setup(self):
        attn_kwargs = dict(
            num_heads=self.num_heads, d_model=self.d_model,
            qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
            qk_norm=self.qk_norm, use_mup=self.use_mup,
            attn_drop=self.attn_drop, dtype=self.dtype,
            param_dtype=self.param_dtype, impl=self.attn_impl,
        )
        self.spatial_attn = SelfAttention(**attn_kwargs)
        self.temporal_attn = SelfAttention(**attn_kwargs)
        self.mlp = Mlp(d_model=self.d_model, mlp_ratio=self.mlp_ratio,
                       mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
                       gelu_approx=self.gelu_approx,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       deterministic=self.deterministic)
        # Identity when qk_norm (reference quirk, st_transformer.py:44,67)
        if not self.qk_norm:
            self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      param_dtype=self.param_dtype)
            self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      param_dtype=self.param_dtype)

    def _n1(self, x):
        return x if self.qk_norm else self.norm1(x)

    def _n2(self, x):
        return x if self.qk_norm else self.norm2(x)

    def _forward(self, x_BTSC, collect_kv: bool):
        from jax.ad_checkpoint import checkpoint_name

        from tpu1x.ops.attention import resolve_attn_impl

        # Spatial attention: (B, T) batch dims, sequence axis S. Bidirectional.
        use_fused_spatial = (
            resolve_attn_impl(self.attn_impl) == "pallas"
            and not self.qk_norm
            and (self.deterministic or self.attn_drop == 0.0)
            and not self.is_initializing())
        if use_fused_spatial:
            # Monolithic fused sub-layer (LN + qkv + all-heads attention +
            # proj + residual in ONE Pallas program per row, heads-flat,
            # custom VJP with in-kernel weight grads) — removes the
            # head-split layout copies and the stacked weight-grad fusions
            # that the r4 profile priced at ~130 ms/step at GENIE_138M B=8
            # (tpu1x/ops/spatial_train_block.py).
            from tpu1x.ops.spatial_train_block import spatial_train_block
            B, T, S, C = x_BTSC.shape
            sa = self.spatial_attn
            pq = sa.qkv.variables["params"]
            pp = sa.proj.variables["params"]
            n1 = self.norm1.variables["params"]
            out = spatial_train_block(
                x_BTSC.reshape(B * T, S, C).astype(self.dtype),
                pq["kernel"], pp["kernel"],
                bqkv=pq.get("bias"), bproj=pp.get("bias"),
                ln_scale=n1["scale"], ln_bias=n1["bias"],
                num_heads=self.num_heads, scale=sa.scale)
            # saveable under "attn_outs": the custom vjp's residuals are
            # (x, weights) only — x is the LAYER input (the scan carry), so
            # saving this output removes the whole sub-layer from the remat
            # forward re-run.
            x = checkpoint_name(out.reshape(B, T, S, C), "attn_out")
        else:
            h = self._n1(x_BTSC).astype(self.dtype)
            x = x_BTSC + self.spatial_attn(h, causal=False,
                                           deterministic=self.deterministic)
        # The "attn_outs" remat policy saves ONLY the tensors tagged
        # "attn_out" (the two attention kernels' primal outputs — here
        # inside spatial_attn, ops/attention.py:151 (or the fused block
        # above), and below on the temporal kernel). Both kernels' custom
        # vjps carry (q, k, v) residuals only, so those saves remove the
        # kernel forward re-runs from the backward pass (~45 ms/step at
        # GENIE_138M B=8) for 2 x 33.5 MB/layer of HBM. The residual
        # streams themselves are deliberately NOT saved (cheap to
        # recompute, 2x the HBM if kept).

        # Temporal attention: causal over T. NOTE: no pre-norm (reference
        # st_transformer.py:78).
        use_fused_temporal = (
            resolve_attn_impl(self.attn_impl) == "pallas"
            and not self.qk_norm and not collect_kv
            and (self.deterministic or self.attn_drop == 0.0))
        if use_fused_temporal and not self.is_initializing():
            # (r5) monolithic fused temporal sub-layer: qkv + causal
            # E-matrix attention + proj + residual in one Pallas program
            # per (row, S-tile), custom VJP with in-kernel weight grads —
            # q/k/v and their grads never touch HBM
            # (tpu1x/ops/temporal_train_block.py).
            from tpu1x.ops.temporal_train_block import temporal_train_block
            ta = self.temporal_attn
            pq = ta.qkv.variables["params"]
            pp = ta.proj.variables["params"]
            out = temporal_train_block(
                x.astype(self.dtype), pq["kernel"], pp["kernel"],
                bqkv=pq.get("bias"), bproj=pp.get("bias"),
                num_heads=self.num_heads, scale=ta.scale)
            x = checkpoint_name(out, "attn_out")
            if self.mlp_drop == 0.0 or self.deterministic:
                # (r5) fused MLP sub-layer: LN2 + fc1 + GELU + fc2 +
                # residual in one program with in-kernel weight grads —
                # the (S, 4C) hidden never touches HBM
                # (tpu1x/ops/mlp_train_block.py; exact erf via the
                # in-kernel rational approximation).
                from tpu1x.ops.mlp_train_block import mlp_train_block
                pm = self.mlp.variables["params"]
                n2 = (None if self.qk_norm
                      else self.norm2.variables["params"])
                B, T, S, C = x.shape
                x = mlp_train_block(
                    x.reshape(B * T, S, C).astype(self.dtype),
                    pm["fc1"]["kernel"], pm["fc2"]["kernel"],
                    bfc1=pm["fc1"].get("bias"),
                    bfc2=pm["fc2"].get("bias"),
                    ln_scale=None if n2 is None else n2["scale"],
                    ln_bias=None if n2 is None else n2["bias"],
                    gelu_approx=self.gelu_approx).reshape(B, T, S, C)
            else:
                h = self._n2(x).astype(self.dtype)
                x = x + self.mlp(h)
            return x, None
        if use_fused_temporal:
            # init-time path (params must be created through the modules):
            # the r3 fused attention kernel with XLA qkv/proj
            # (tpu1x/ops/temporal_attention)
            from tpu1x.ops.temporal_attention import temporal_attention
            qkv = self.temporal_attn.qkv(x)  # (B, T, S, 3C)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = temporal_attention(q, k, v,
                                     scale=self.temporal_attn.scale,
                                     num_heads=self.num_heads, causal=True)
            out = checkpoint_name(out, "attn_out")
            x = x + self.temporal_attn.proj(out)
            h = self._n2(x).astype(self.dtype)
            x = x + self.mlp(h)
            return x, None

        # transposed-layout path ((B, S) batch dims, sequence axis T) — the
        # parity oracle, and the route for qk_norm / prefill KV collection
        x_BSTC = jnp.swapaxes(x, 1, 2)
        if collect_kv:
            q, k, v = self.temporal_attn.compute_qkv(x_BSTC)
            from tpu1x.ops.attention import mha
            out = mha(q, k, v, scale=self.temporal_attn.scale, causal=True,
                      impl=self.attn_impl)
            x_BSTC = x_BSTC + self.temporal_attn.project(out)
            B, S, T = k.shape[:3]
            kv = (k.reshape(B, S, T, -1), v.reshape(B, S, T, -1))  # (B,S,T,C)
        else:
            x_BSTC = x_BSTC + self.temporal_attn(
                x_BSTC, causal=True, deterministic=self.deterministic)
            kv = None

        # MLP (in the (B, S, T, C) layout like the reference; same math).
        h = self._n2(x_BSTC).astype(self.dtype)
        x_BSTC = x_BSTC + self.mlp(h)
        return jnp.swapaxes(x_BSTC, 1, 2), kv

    def __call__(self, x_BTSC):
        return self._forward(x_BTSC, collect_kv=False)[0]

    def prefill(self, x_BTSC):
        return self._forward(x_BTSC, collect_kv=True)

    def decode_step(self, x_BSC, cache_k, cache_v, t_B):
        """Single-frame pass against the temporal KV cache.

        Args:
            x_BSC: (B, S, C) current-frame activations.
            cache_k/cache_v: (T, B, S, C) committed frames' K/V (T-major —
                see STMaskGIT.prefill), heads flattened (slots >= each row's
                t are ignored via masking).
            t_B: (B,) int32 current frame index per row.

        Returns: (y_BSC, k_cur, v_cur) with k_cur/v_cur (B, S, C) —
        the current frame's temporal K/V for cache commit.
        """
        B, S, C = x_BSC.shape
        T = cache_k.shape[0]
        H = self.num_heads
        D = self.d_model // H

        # spatial over S
        h = self._n1(x_BSC).astype(self.dtype)
        x = x_BSC + self.spatial_attn(h, causal=False,
                                      deterministic=self.deterministic)

        # Temporal: one query position against cache + self. The softmax over
        # [cache slots < t, current token] is computed in two pieces so the
        # (T, B, S, H, D) cache is never copied into a concatenated buffer —
        # at GENIE_138M decode shapes that concat alone moves ~8.6 GB of HBM
        # per call; this form only *reads* the cache (k for logits, v for PV).
        x_q = x[:, :, None, :]  # (B, S, 1, C)
        q, k_cur, v_cur = self.temporal_attn.compute_qkv(x_q)  # (B,S,1,H,D)
        scale = self.temporal_attn.scale
        q_bshd = q[:, :, 0]  # (B, S, H, D)
        k_c = cache_k.reshape(T, B, S, H, D)
        logits_c = jnp.einsum("bshd,kbshd->bshk", q_bshd, k_c,
                              preferred_element_type=jnp.float32) * scale
        logit_s = jnp.einsum("bshd,bshd->bsh", q_bshd, k_cur[:, :, 0],
                             preferred_element_type=jnp.float32) * scale
        t_iota = jnp.arange(T, dtype=jnp.int32)
        valid = t_iota[None, :] < t_B[:, None]  # (B, T)
        logits_c = jnp.where(valid[:, None, None, :], logits_c,
                             jnp.finfo(jnp.float32).min)
        # joint softmax over the T cache slots and the self logit
        m = jnp.maximum(jnp.max(logits_c, axis=-1), logit_s)  # (B,S,H)
        e_c = jnp.exp(logits_c - m[..., None])
        e_s = jnp.exp(logit_s - m)
        denom = jnp.sum(e_c, axis=-1) + e_s  # (B,S,H)
        p_c = (e_c / denom[..., None]).astype(cache_v.dtype)
        v_c = cache_v.reshape(T, B, S, H, D)
        out = jnp.einsum("bshk,kbshd->bshd", p_c, v_c,
                         preferred_element_type=jnp.float32)
        out = out + (e_s / denom)[..., None] * v_cur[:, :, 0]
        out = out.astype(x.dtype).reshape(B, S, 1, H, D)
        x = x + self.temporal_attn.project(out)[:, :, 0, :]

        # MLP
        h = self._n2(x).astype(self.dtype)
        x = x + self.mlp(h)
        return x, k_cur.reshape(B, S, C), v_cur.reshape(B, S, C)


class _STBlockScanBody(STBlock):
    """Scan bodies dispatching on `mode` with a shared parameter structure."""

    mode: str = "forward"

    def __call__(self, carry, xs=None):  # type: ignore[override]
        if self.mode == "forward":
            return STBlock.__call__(self, carry), None
        if self.mode == "prefill":
            x, kv = STBlock.prefill(self, carry)
            return x, kv
        if self.mode == "decode":
            x, t_B = carry
            cache_k, cache_v = xs
            x, k_cur, v_cur = STBlock.decode_step(self, x, cache_k, cache_v,
                                                  t_B)
            return (x, t_B), (k_cur, v_cur)
        raise ValueError(self.mode)


class STTransformerDecoder(nn.Module):
    """Stack of STBlocks (reference: st_transformer.py:86-120)."""

    num_layers: int
    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    gelu_approx: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "none"
    scan_layers: bool = True
    deterministic: bool = True

    def _remat(self, target):
        """jax.checkpoint with the configured save policy. "dots" keeps
        matmul outputs resident (recompute only elementwise/softmax on the
        backward pass) — less recompute than full remat for ~the activation
        memory of the matmul outputs."""
        policies = {
            "none": None,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            # kernel outputs only: the post-attention residual streams
            # rebuild from them with one proj matmul each, and halving the
            # save set (67 -> 33.5 MB/layer at B=8) is what lets B=16 fit
            # on a 16 GB chip
            "attn_outs": jax.checkpoint_policies.save_only_these_names(
                "attn_out"),
        }
        return nn.remat(target, prevent_cse=False,
                        policy=policies[self.remat_policy])

    def _block_kwargs(self):
        return dict(
            num_heads=self.num_heads, d_model=self.d_model,
            qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
            qk_norm=self.qk_norm, use_mup=self.use_mup, attn_drop=self.attn_drop,
            mlp_ratio=self.mlp_ratio, mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
            gelu_approx=self.gelu_approx,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, deterministic=self.deterministic,
        )

    def _scan_stack(self, mode: str):
        body = _STBlockScanBody
        if self.remat and mode == "forward":
            body = self._remat(body)
        # Decode unrolls the layer loop: with static layer indices XLA fuses
        # each layer's KV-cache slice into its attention consumers instead of
        # materializing a per-iteration dynamic-slice copy (measured ~60% of
        # decode wall time at GENIE_138M, benchmarks/profile_gen.py).
        return nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            unroll=self.num_layers if mode == "decode" else 1,
            # decode xs = the T-major (T, L, B, S, C) caches: layer axis is 1
            in_axes=1 if mode == "decode" else 0,
            metadata_params={nn.PARTITION_NAME: None},
        )(**self._block_kwargs(), mode=mode, name="layers")

    @nn.compact
    def _run(self, mode, x, cache_k=None, cache_v=None, t_B=None):
        if self.scan_layers:
            if mode == "forward":
                y, _ = self._scan_stack("forward")(x, None)
                return y
            if mode == "prefill":
                return self._scan_stack("prefill")(x, None)
            (y, _), kv_cur = self._scan_stack("decode")(
                (x, t_B), (cache_k, cache_v))
            return y, kv_cur

        if mode == "forward":
            for i in range(self.num_layers):
                block = STBlock
                if self.remat:
                    block = self._remat(block)
                x = block(**self._block_kwargs(), name=f"layers_{i}")(x)
            return x
        ks, vs = [], []
        for i in range(self.num_layers):
            block = STBlock(**self._block_kwargs(), name=f"layers_{i}")
            if mode == "prefill":
                x, (k, v) = block.prefill(x)
            else:
                x, k, v = block.decode_step(x, cache_k[:, i], cache_v[:, i],
                                            t_B)
            ks.append(k)
            vs.append(v)
        return x, (jnp.stack(ks), jnp.stack(vs))

    def __call__(self, x_BTSC):
        return self._run("forward", x_BTSC)

    def prefill(self, x_BTSC):
        """Forward while collecting per-layer temporal K/V.

        Returns (y_BTSC, (k, v)) with k/v (L, B, S, T, C), heads flattened.
        """
        return self._run("prefill", x_BTSC)

    def decode_step(self, x_BSC, cache_k, cache_v, t_B):
        """Single-frame decode against the T-major caches (T, L, B, S, C).

        Returns (y_BSC, (k_cur, v_cur)) with k_cur/v_cur (L, B, S, C).
        """
        return self._run("decode", x_BSC, cache_k, cache_v, t_B)
