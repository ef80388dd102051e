"""ST-MaskGIT world model: p(z_{t+1} | z_0..z_t) over factored image tokens.

Behavioral contract matches the reference `genie/st_mask_git.py`:
- compute_logits: factorized embed -> +learned pos embed (1,T,S,C) -> STT
  decoder -> output head over the 2x512 factored vocab (ref: 255-265).
- forward loss/acc: cross-entropy summed over the factored vocabs, averaged
  over *masked* tokens of frames 1..T-1 only; accuracy counts a token correct
  only when both factored argmaxes are correct (ref: 231-253, 267-279).
- muP: attention scale 8/head_dim and a fixed readout that divides activations
  by width_mult before the output projection (ref: 316-323); base shapes are
  8 heads / d_model 256 (ref: 298-304).

Layout note (TPU-first): logits are produced natively as (B, T, S, V, F) with
V=factored_vocab_size innermost-but-one and F=num_factored_vocabs last —
V=512 is 4 x 128 lanes, ideal for the VPU softmax. Use
`logits_to_reference_layout` for the reference's (B, V*F, T, H, W).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu1x.config import GenieConfig
from tpu1x.models.factorization import FactorizedEmbedding, factorize_token_ids
from tpu1x.models.st_transformer import STTransformerDecoder


def cosine_schedule(u):
    """Mask-rate schedule cos(u * pi/2), u in [0, 1] (ref: st_mask_git.py:17-26)."""
    if isinstance(u, float):
        return math.cos(u * math.pi / 2)
    return jnp.cos(u * jnp.pi / 2)


class STMaskGIT(nn.Module):
    """GENIE-style MaskGIT transformer (reference: genie/st_mask_git.py:29-323)."""

    config: GenieConfig

    def setup(self):
        cfg = self.config
        self.h = self.w = cfg.latent_side_len
        assert self.h * self.w == cfg.S, "Expected S to be square"
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)

        self.decoder = STTransformerDecoder(
            num_layers=cfg.num_layers, num_heads=cfg.num_heads, d_model=cfg.d_model,
            qkv_bias=cfg.qkv_bias, proj_bias=cfg.proj_bias, qk_norm=cfg.qk_norm,
            use_mup=cfg.use_mup, attn_drop=cfg.attn_drop, mlp_ratio=cfg.mlp_ratio,
            mlp_bias=cfg.mlp_bias, mlp_drop=cfg.mlp_drop,
            gelu_approx=cfg.gelu_approx, dtype=dtype,
            param_dtype=param_dtype, attn_impl=cfg.attn_impl, remat=cfg.remat,
            remat_policy=cfg.remat_policy,
            scan_layers=cfg.scan_layers, name="decoder",
        )
        self.pos_embed_TSC = self.param(
            "pos_embed_TSC", nn.initializers.zeros, (1, cfg.T, cfg.S, cfg.d_model),
            param_dtype,
        )
        self.token_embed = FactorizedEmbedding(
            factored_vocab_size=cfg.factored_vocab_size,
            num_factored_vocabs=cfg.num_factored_vocabs,
            d_model=cfg.d_model, mask_token_id=cfg.mask_token_id,
            dtype=dtype, param_dtype=param_dtype, name="token_embed",
        )
        self.out_x_proj = nn.Dense(
            cfg.factored_vocab_size * cfg.num_factored_vocabs, use_bias=True,
            dtype=jnp.float32, param_dtype=param_dtype,
            kernel_init=nn.initializers.normal(stddev=0.02), name="out_x_proj",
        )
        if cfg.action_vocab_size > 0:
            self.action_embed = nn.Embed(
                num_embeddings=cfg.action_vocab_size, features=cfg.d_model,
                dtype=dtype, param_dtype=param_dtype,
                embedding_init=nn.initializers.normal(stddev=0.02),
                name="action_embed")

    def compute_logits(self, x_BTHW, actions_BT=None) -> jnp.ndarray:
        """Token ids (B, T, H, W) int32 -> logits (B, T, S, V, F) float32.

        Mirrors the reference pipeline (st_mask_git.py:255-265) in the
        TPU-native layout. `actions_BT` (B, T) int32, if given and
        `config.action_vocab_size > 0`, enters as an additive per-frame
        embedding (the extension the reference points at in README.md:49).
        """
        cfg = self.config
        B, T, H, W = x_BTHW.shape
        x_BTS = x_BTHW.reshape(B, T, H * W)
        x = self.token_embed(x_BTS)
        x = x + self.pos_embed_TSC.astype(x.dtype)
        if cfg.action_vocab_size > 0 and actions_BT is not None:
            act = self.action_embed(actions_BT)  # (B, T, C)
            x = x + act[:, :, None, :].astype(x.dtype)
        x = self.decoder(x)
        if cfg.use_mup:
            # FixedMuReadout: scale activations by output_mult/width_mult before
            # the output projection (ref: st_mask_git.py:316-323).
            x = x / cfg.width_mult
        logits = self.out_x_proj(x.astype(jnp.float32))
        # Head layout is (F, V) concatenated: logits[..., f*V + v] is factor f.
        return logits.reshape(B, T, H * W, cfg.num_factored_vocabs,
                              cfg.factored_vocab_size).swapaxes(-1, -2)

    def prefill(self, tokens_BPHW, actions_BP=None) -> Dict[str, jnp.ndarray]:
        """Build the temporal KV cache from committed frames.

        The reference sampler recomputes every frame on every MaskGIT step
        (st_mask_git.py:163,169); temporal attention is causal and spatial
        attention is frame-local, so committed frames' activations never
        change — they are computed once here and reused by `decode_frame`
        (mathematically identical, ~T x fewer FLOPs per step).

        Args:
            tokens_BPHW: (B, P, H, W) committed frames, P <= T.
        Returns cache {"k","v"}: (T, L, B, S, C) with heads flattened into
        C = num_heads * head_dim (TPU-tile-friendly minor dim), slots >= P
        zero-padded. The frame axis T is MAJOR so the per-frame commit
        (`update_cache`) is one contiguous tile-aligned slab write — with T
        second-minor, XLA rewrote the multi-GB cache every frame (measured
        14% of decode wall, benchmarks/profile_gen.py).
        """
        cfg = self.config
        B, P, H, W = tokens_BPHW.shape
        x = self.token_embed(tokens_BPHW.reshape(B, P, H * W))
        x = x + self.pos_embed_TSC[:, :P].astype(x.dtype)
        if cfg.action_vocab_size > 0 and actions_BP is not None:
            x = x + self.action_embed(actions_BP)[:, :, None, :].astype(x.dtype)
        _, (k, v) = self.decoder.prefill(x)  # each (L, B, S, P, C)
        k = jnp.moveaxis(k, 3, 0)  # (P, L, B, S, C)
        v = jnp.moveaxis(v, 3, 0)
        pad = cfg.T - P
        if pad > 0:
            pad_widths = [(0, pad), (0, 0), (0, 0), (0, 0), (0, 0)]
            k = jnp.pad(k, pad_widths)
            v = jnp.pad(v, pad_widths)
        return {"k": k, "v": v}

    def decode_frame(self, frame_tokens_BS, t_B, cache, action_B=None
                     ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Single-frame logits against the KV cache.

        Args:
            frame_tokens_BS: (B, S) int32 current-frame tokens (may contain
                mask ids).
            t_B: (B,) int32 frame index per row (cache slots >= t are masked).
            cache: {"k","v"} from `prefill`, layout (T, L, B, S, C).

        Returns: (logits (B, S, V, F) float32, kv_cur (k, v) each
        (1, L, B, S, C) for `update_cache`).
        """
        cfg = self.config
        t_B = jnp.broadcast_to(jnp.asarray(t_B, jnp.int32),
                               (frame_tokens_BS.shape[0],))
        x = self.token_embed(frame_tokens_BS)  # (B, S, C)
        pos = self.pos_embed_TSC[0][t_B]  # (B, S, C)
        x = x + pos.astype(x.dtype)
        if cfg.action_vocab_size > 0 and action_B is not None:
            x = x + self.action_embed(action_B)[:, None, :].astype(x.dtype)
        y, (k_cur, v_cur) = self.decoder.decode_step(x, cache["k"],
                                                     cache["v"], t_B)
        if cfg.use_mup:
            y = y / cfg.width_mult
        logits = self.out_x_proj(y.astype(jnp.float32))
        B, S = frame_tokens_BS.shape
        return (logits.reshape(B, S, cfg.num_factored_vocabs,
                               cfg.factored_vocab_size).swapaxes(-1, -2),
                (k_cur[None], v_cur[None]))  # (1, L, B, S, C) for update_cache

    def __call__(self, input_ids, labels, actions=None) -> Dict[str, jnp.ndarray]:
        """Training forward (reference: st_mask_git.py:267-279).

        Args:
            input_ids: (B, T*H*W) int32 corrupted/masked tokens.
            labels: (B, T*H*W) int32 clean tokens.
            actions: optional (B, T) int32 per-frame action ids.
        Returns dict(loss, acc, logits).
        """
        cfg = self.config
        B = input_ids.shape[0]
        x_BTHW = input_ids.reshape(B, cfg.T, self.h, self.w)
        labels_BTHW = labels.reshape(B, cfg.T, self.h, self.w)

        logits = self.compute_logits(x_BTHW, actions)  # (B, T, S, V, F)
        # Loss over masked tokens of frames 1.. only (ref: 276).
        relevant_mask = (x_BTHW[:, 1:] == cfg.mask_token_id).reshape(B, cfg.T - 1, cfg.S)
        loss, acc = compute_loss_and_acc(logits, labels_BTHW, relevant_mask, cfg)
        return {"loss": loss, "acc": acc, "logits": logits}


def compute_loss_and_acc(logits_BTSVF, targets_BTHW, relevant_mask_BTS, cfg: GenieConfig
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked factored cross-entropy + exact-token accuracy (ref: 231-253).

    Args:
        logits_BTSVF: (B, T, S, V, F) float32 — frame 0 included (it is dropped
            here, matching ref: 234).
        targets_BTHW: (B, T, H, W) clean token ids.
        relevant_mask_BTS: (B, T-1, S) bool — which of frames 1.. were masked.
    """
    B, T = targets_BTHW.shape[:2]
    logits = logits_BTSVF[:, 1:]  # (B, T-1, S, V, F)
    targets = targets_BTHW[:, 1:].reshape(B, T - 1, cfg.S)
    factored_targets = factorize_token_ids(
        targets, cfg.num_factored_vocabs, cfg.factored_vocab_size)  # (B,T-1,S,F)

    logp = jax.nn.log_softmax(logits, axis=-2)  # over V
    token_logp = jnp.take_along_axis(
        logp, factored_targets[:, :, :, None, :], axis=-2
    )[:, :, :, 0, :]  # (B, T-1, S, F)
    loss_BTS = -token_logp.sum(axis=-1)  # sum over the factored vocabs (ref: 243)

    pred = jnp.argmax(logits, axis=-2)  # (B, T-1, S, F)
    acc_BTS = jnp.all(pred == factored_targets, axis=-1)  # both factors correct (ref: 244)

    mask = relevant_mask_BTS.astype(jnp.float32)
    num_masked = mask.sum()
    relevant_loss = (loss_BTS * mask).sum() / num_masked
    relevant_acc = (acc_BTS.astype(jnp.float32) * mask).sum() / num_masked
    return relevant_loss, relevant_acc


def update_cache(cache: Dict[str, jnp.ndarray], kv_cur, t) -> Dict[str, jnp.ndarray]:
    """Commit a frame's K/V into cache slot `t` (scalar, may be traced).

    With the T-major cache, the (1, L, B, S, C) update is one contiguous
    tile-aligned slab — XLA updates the carry buffer in place instead of
    copying the whole cache.

    For an int8 serving cache (`k_scale`/`v_scale` present —
    tpu1x/serving.py cache_dtype="int8"), the incoming bf16 K/V are
    quantized per token at commit and their scales stored alongside.
    """
    k_cur, v_cur = kv_cur
    idx = (jnp.asarray(t, jnp.int32), 0, 0, 0, 0)
    if "k_scale" in cache:
        from tpu1x.ops.decode_attention import quantize_kv
        kq, ks = quantize_kv(k_cur)  # scales (1, L, B, S)
        vq, vs = quantize_kv(v_cur)
        # scale store is layer-major (L, B, T, S); frame t is the (. , ., t)
        # column — see tpu1x/serving.py prefill
        ks = jnp.transpose(ks, (1, 2, 0, 3))  # (L, B, 1, S)
        vs = jnp.transpose(vs, (1, 2, 0, 3))
        idx_s = (0, 0, jnp.asarray(t, jnp.int32), 0)
        return {
            "k": jax.lax.dynamic_update_slice(cache["k"], kq, idx),
            "v": jax.lax.dynamic_update_slice(cache["v"], vq, idx),
            "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"], ks,
                                                    idx_s),
            "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"], vs,
                                                    idx_s),
        }
    return {"k": jax.lax.dynamic_update_slice(cache["k"], k_cur, idx),
            "v": jax.lax.dynamic_update_slice(cache["v"], v_cur, idx)}


def logits_to_reference_layout(logits_BTSVF, h: int, w: int) -> jnp.ndarray:
    """(B, T, S, V, F) -> the reference's (B, V*F, T, H, W) with C = F-major.

    The reference's channel axis is `(num_vocabs vocab_size)` — factor-major
    (st_mask_git.py:236-239).
    """
    B, T, S, V, F = logits_BTSVF.shape
    x = logits_BTSVF.swapaxes(-1, -2)  # (B, T, S, F, V)
    x = x.reshape(B, T, h, w, F * V)
    return jnp.moveaxis(x, -1, 1)  # (B, F*V, T, H, W)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def flops_per_update_step(num_params: int, tokens_per_batch: int) -> int:
    """Analytic 6*N*D training FLOPs (reference: train.py:543-544)."""
    return 6 * num_params * tokens_per_batch
