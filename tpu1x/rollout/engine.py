"""Batched rollout engine: thousands of candidate futures over the mesh.

The north-star workload (SURVEY.md §7.5, BASELINE.md): the reference's
evaluation challenge ranks N candidate policies by rolling each policy's
action sequence through the world model and scoring the imagined futures
(README.md:29-32). The reference does this one example at a time on one GPU
(evaluate.py:47-48); here the batch of rollouts is the sharded axis — it
rides the full ("data" x "model") mesh, and per-policy score reduction uses
XLA collectives inserted from the sharding annotations.

Components:
- `RolloutEngine.rollout`: K futures per prompt (optionally per action
  sequence), one jitted program.
- `RolloutEngine.score_policies`: teacher-forced per-policy CE of observed
  continuations (higher likelihood = better policy world-consistency), the
  policy-ranking primitive.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu1x.config import GenieConfig
from tpu1x.models.sampler import generate, generate_cached
from tpu1x.models.st_maskgit import STMaskGIT, compute_loss_and_acc
from tpu1x.parallel.mesh import rollout_sharding


class RolloutEngine:
    """Batched world-model rollouts + policy ranking.

    decode: "cached" (default) rolls out with the KV-cached per-frame decode
    (token-exact vs the uncached sampler, tests/test_kv_cache.py) — on TPU it
    automatically uses the serving DecodeEngine (unrolled layers + fused
    Pallas decode attention, tpu1x/serving.py). "full" is the uncached
    whole-sequence forward per MaskGIT step (the reference's strategy,
    st_mask_git.py:163-169), kept as the parity oracle.
    """

    def __init__(self, model: STMaskGIT, params: Any, config: GenieConfig,
                 mesh=None, maskgit_steps: int = 2, temperature: float = 0.0,
                 decode: str = "cached", cache_dtype: str = "bf16"):
        assert decode in ("cached", "full"), decode
        self.model = model
        self.params = params
        self.config = config
        self.mesh = mesh
        self.maskgit_steps = maskgit_steps
        self.temperature = temperature
        self.decode = decode
        self._serving = None
        if (decode == "cached" and jax.default_backend() == "tpu"
                and config.scan_layers):
            from tpu1x.serving import DecodeEngine, prepare_serving_params
            # cache_dtype="int8" halves the bandwidth-bound cache stream
            # (parity vs bf16: tests/test_serving.py, tpu_kernel_check.py)
            self._serving = DecodeEngine(config, cache_dtype=cache_dtype)
            self.params = prepare_serving_params(params)
        self._rollout_jit = {}
        self._score_jit = {}

    def _logits_fn(self, params, actions=None):
        # params flow in as jit arguments (never closure constants)
        def fn(tokens_BTHW):
            return self.model.apply({"params": params}, tokens_BTHW,
                                    actions, method=STMaskGIT.compute_logits)
        return fn

    def rollout(self, prompt_tokens: jnp.ndarray, num_new_frames: int,
                rng: jax.Array, num_futures: int = 1,
                actions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Generate futures for each prompt.

        Args:
            prompt_tokens: (B, T_prompt, H, W) int32.
            num_futures: K sampled futures per prompt (temperature must be >0
                for them to differ).
            actions: optional (B, T) or (B*K, T) int32 action sequence.

        Returns: (B, K, T, H, W) int32 full rollouts.
        """
        cfg = self.config
        B, Tp, H, W = prompt_tokens.shape
        K = num_futures
        flat = jnp.repeat(prompt_tokens, K, axis=0).reshape(B * K, Tp * H * W)
        if actions is not None and actions.shape[0] == B:
            actions = jnp.repeat(actions, K, axis=0)
        if self.mesh is not None:
            flat = jax.device_put(flat, rollout_sharding(self.mesh))

        key = (num_new_frames, actions is not None)
        if key not in self._rollout_jit:
            if self.decode == "full":
                def run(params, tokens_flat, actions, rng):
                    return generate(
                        self._logits_fn(params, actions), tokens_flat,
                        num_new_frames, rng, cfg,
                        maskgit_steps=self.maskgit_steps,
                        temperature=self.temperature)[0]
            else:
                def run(params, tokens_flat, actions, rng):
                    if self._serving is not None:
                        # fused-commit rollout (token-exact vs
                        # generate_cached, tests/test_serving.py): one cache
                        # stream serves the commit + next step-0 decode
                        from tpu1x.models.sampler import generate_cached_fused
                        return generate_cached_fused(
                            functools.partial(self._serving.prefill, params),
                            functools.partial(self._serving.decode_frame,
                                              params),
                            functools.partial(self._serving.decode_frame_pair,
                                              params),
                            tokens_flat, num_new_frames, rng, cfg,
                            maskgit_steps=self.maskgit_steps,
                            temperature=self.temperature,
                            actions_BT=actions)[0]

                    def prefill_fn(t, a=None):
                        return self.model.apply({"params": params}, t, a,
                                                method=STMaskGIT.prefill)

                    def decode_fn(f, t, c, action_B=None):
                        return self.model.apply(
                            {"params": params}, f, t, c, action_B,
                            method=STMaskGIT.decode_frame)

                    return generate_cached(
                        prefill_fn, decode_fn, tokens_flat, num_new_frames,
                        rng, cfg, maskgit_steps=self.maskgit_steps,
                        temperature=self.temperature, actions_BT=actions)[0]
            self._rollout_jit[key] = jax.jit(run)
        out = self._rollout_jit[key](self.params, flat, actions, rng)
        return out.reshape(B, K, Tp + num_new_frames, H, W)

    def score_policies(self, context_tokens: jnp.ndarray,
                       continuation_tokens: jnp.ndarray,
                       actions: Optional[jnp.ndarray] = None,
                       per_frame: bool = False):
        """Score P candidate policy continuations by world-model likelihood.

        Contract (the reference's evaluation challenge, README.md:29-32:
        "rank N policies via action-conditioned rollouts"):
        - All policies share ONE observed context of T_ctx frames; each
          policy contributes the T - T_ctx frames it would produce
          (its imagined/actual future), plus optionally its full (P, T)
          action sequence.
        - Teacher-forced factored CE is computed over ALL tokens of the
          *policy-controlled* frames only (frames >= T_ctx) — context frames
          never enter the score. This is the challenge CE restricted to the
          continuation region (eval_utils.py:44-77 semantics); no sampler
          masking is involved.
        - The P axis is sharded over the full mesh when one is configured.

        Args:
            context_tokens: (T_ctx, H, W) int32 observed context, T_ctx >= 1.
            continuation_tokens: (P, T - T_ctx, H, W) int32 per-policy futures.
            actions: optional (P, T) int32 per-policy action ids.
            per_frame: also return the per-frame CE breakdown.

        Returns: (P,) float32 mean CE per policy (lower = the world model
        finds the policy's future more likely); with per_frame=True, a tuple
        of that and (P, T - T_ctx) per-frame CE.
        """
        cfg = self.config
        assert context_tokens.ndim == 3, \
            "context is a single (T_ctx, H, W) window shared by all policies"
        T_ctx = context_tokens.shape[0]
        P, T_new = continuation_tokens.shape[:2]
        assert T_ctx + T_new == cfg.T, (T_ctx, T_new, cfg.T)
        assert T_ctx >= 1, "need at least one observed frame to condition on"

        windows = jnp.concatenate([
            jnp.broadcast_to(context_tokens[None],
                             (P, T_ctx, *context_tokens.shape[1:])),
            continuation_tokens,
        ], axis=1).astype(jnp.int32)
        if self.mesh is not None:
            windows = jax.device_put(windows, rollout_sharding(self.mesh))
            if actions is not None:
                actions = jax.device_put(actions, rollout_sharding(self.mesh))

        key = (T_ctx, actions is not None)
        if self._score_jit.get(key) is None:
            def run(params, windows, actions):
                logits = self.model.apply(
                    {"params": params}, windows, actions,
                    method=STMaskGIT.compute_logits)  # (P, T, S, V, F)
                from tpu1x.models.factorization import factorize_token_ids
                targets = windows.reshape(P, cfg.T, cfg.S)[:, 1:]
                ft = factorize_token_ids(targets, cfg.num_factored_vocabs,
                                         cfg.factored_vocab_size)
                logp = jax.nn.log_softmax(
                    logits[:, 1:].astype(jnp.float32), axis=-2)
                tok_logp = jnp.take_along_axis(
                    logp, ft[:, :, :, None, :], axis=-2)[:, :, :, 0, :]
                ce_PTS = -tok_logp.sum(axis=-1)  # sum over factored vocabs
                frame_ce = ce_PTS.mean(axis=-1)  # (P, T-1)
                cont_frame_ce = frame_ce[:, T_ctx - 1:]  # frames >= T_ctx
                return cont_frame_ce.mean(axis=-1), cont_frame_ce
            self._score_jit[key] = jax.jit(run)
        scores, frame_ce = self._score_jit[key](self.params, windows, actions)
        return (scores, frame_ce) if per_frame else scores

    def rank_policies(self, context_tokens, continuation_tokens,
                      actions=None) -> np.ndarray:
        """Return policy indices sorted best (lowest CE) first."""
        scores = np.asarray(self.score_policies(context_tokens,
                                                continuation_tokens, actions))
        return np.argsort(scores)
