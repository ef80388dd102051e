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
                 decode: str = "cached"):
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
            self._serving = DecodeEngine(config)
            self.params = prepare_serving_params(params)
        self._rollout_jit = {}
        self._score_jit = None

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
                        prefill_fn = functools.partial(
                            self._serving.prefill, params)
                        decode_fn = functools.partial(
                            self._serving.decode_frame, params)
                    else:
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
                       actions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Score P candidate continuations by world-model likelihood.

        Args:
            context_tokens: (P, T, H, W) int32 — full windows whose frames
                >= some split come from each policy (teacher-forced CE over
                frames 1.. is computed like the challenge metric).
            continuation_tokens: (P, T, H, W) int32 targets.

        Returns: (P,) float32 mean CE per policy (lower = more likely).
        """
        cfg = self.config

        if self._score_jit is None:
            def run(params, tokens, targets, actions):
                logits = self.model.apply(
                    {"params": params}, tokens, actions,
                    method=STMaskGIT.compute_logits)
                mask = jnp.ones((1, cfg.T - 1, cfg.S), dtype=bool)

                def one(lg, tg):
                    loss, _ = compute_loss_and_acc(lg[None], tg[None], mask, cfg)
                    return loss
                return jax.vmap(one)(logits, targets)
            self._score_jit = jax.jit(run)
        return self._score_jit(self.params, context_tokens,
                               continuation_tokens, actions)

    def rank_policies(self, context_tokens, continuation_tokens,
                      actions=None) -> np.ndarray:
        """Return policy indices sorted best (lowest CE) first."""
        scores = np.asarray(self.score_policies(context_tokens,
                                                continuation_tokens, actions))
        return np.argsort(scores)
