"""MaskGIT sampling as a fully jittable functional program.

Behavioral contract matches the reference `genie/st_mask_git.py:65-229`
(`maskgit_generate` / `generate`), re-expressed TPU-first:

- The reference's in-place token/mask mutation loop becomes a functional
  carry `(tokens, unmasked, rng)`; the data-dependent "re-mask the n least
  confident tokens" becomes a rank computation (double argsort) + `where`,
  so every shape is static and the whole rollout compiles into one XLA
  program (no host round-trips per step/frame).
- `out_t` is a per-batch-row array, which lets the evaluator decode all T-1
  teacher-forced frame tasks of an example *in parallel* as batch rows
  (the reference loops over t in Python, evaluate.py:107-119).
- Temperature semantics match the reference exactly: <=1e-8 is greedy
  (argmax); otherwise tokens are sampled from softmax(logits). (In the
  reference, dividing probs by temperature before `Categorical` is a
  mathematical no-op since Categorical renormalizes, st_mask_git.py:183-187 —
  we reproduce the effective behavior.)
- The cosine re-mask counts n(step) = ceil(cos((step+1)/steps * pi/2) * S)
  are static Python ints (st_mask_git.py:197-199).
- "random" unmask mode randomizes confidences (st_mask_git.py:204-206);
  "greedy" uses the product of chosen-token probabilities (st_mask_git.py:190).

Returned logits are the *step-0* logits, like the reference (st_mask_git.py:165).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tpu1x.config import GenieConfig
from tpu1x.models.st_maskgit import cosine_schedule

# logits_fn: (B, T, H, W) int32 tokens -> (B, T, S, V, F) float32 logits
LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def _sample_frame(frame_logits_BSVF, rng, temperature: float, factored_vocab_size: int):
    """Sample each factored vocab independently; combine ids and confidences.

    Returns (samples_BS int32, confidences_BS float32).
    Matches st_mask_git.py:177-190.
    """
    V = factored_vocab_size
    F = frame_logits_BSVF.shape[-1]
    probs = jax.nn.softmax(frame_logits_BSVF.astype(jnp.float32), axis=-2)

    samples = jnp.zeros(frame_logits_BSVF.shape[:2], dtype=jnp.int32)
    confidences = jnp.ones(frame_logits_BSVF.shape[:2], dtype=jnp.float32)
    for f in range(F):
        if temperature <= 1e-8:
            digit = jnp.argmax(frame_logits_BSVF[..., f], axis=-1).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            digit = jax.random.categorical(
                sub, frame_logits_BSVF[..., f].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
        samples = samples + digit * (V ** f)
        confidences = confidences * jnp.take_along_axis(
            probs[..., f], digit[..., None], axis=-1)[..., 0]
    return samples, confidences


def _frame_update(frame_BS, unmasked_BS, frame_logits_BSVF, step: int,
                  maskgit_steps: int, n_per_step, rng, config: GenieConfig,
                  temperature: float, unmask_mode: str):
    """One MaskGIT step on a single frame's state (shared by the cached and
    uncached samplers). Mirrors st_mask_git.py:166-223."""
    B, S = frame_BS.shape
    rng, sample_rng, conf_rng = jax.random.split(rng, 3)
    samples_BS, confidences_BS = _sample_frame(
        frame_logits_BSVF, sample_rng, temperature, config.factored_vocab_size)

    prev_unmasked = unmasked_BS
    if step != maskgit_steps - 1:
        n = n_per_step[step]
        if unmask_mode == "greedy":
            conf = confidences_BS
        else:  # randomized confidences (st_mask_git.py:204-206)
            conf = jax.random.uniform(conf_rng, (B, S), dtype=jnp.float32)
        conf = jnp.where(unmasked_BS, jnp.inf, conf)
        order = jnp.argsort(conf, axis=1)
        ranks = jnp.argsort(order, axis=1)
        to_mask = ranks < n
        samples_BS = jnp.where(to_mask, config.mask_token_id, samples_BS)
        unmasked_BS = ~to_mask
    samples_BS = jnp.where(prev_unmasked, frame_BS, samples_BS)
    return samples_BS, unmasked_BS


def maskgit_generate_cached(
    decode_fn,
    cache,
    out_t,
    rng: jax.Array,
    config: GenieConfig,
    maskgit_steps: int = 2,
    temperature: float = 0.0,
    unmask_mode: str = "random",
    batch_size: int = None,
    action_B=None,
):
    """KV-cached `maskgit_generate`: decodes frame `out_t` touching only that
    frame's S tokens per step (vs the reference's full (T, S) forward,
    st_mask_git.py:163-169 — identical math via temporal causality).

    Args:
        decode_fn: (frame_tokens_BS, t_B, cache[, action_B]) ->
            (logits_BSVF, kv_cur) (STMaskGIT.decode_frame bound to params).
        cache: {"k","v"} from STMaskGIT.prefill over committed frames < out_t.
        action_B: optional (B,) int32 action id for frame out_t (forwarded to
            decode_fn — the additive action embedding, README.md:49).

    Returns: (sample_BS, orig_logits (B, V, F, H, W), kv_cur of the *last
    sampling pass* — callers committing the frame should re-decode the final
    tokens (see `generate_cached`)).
    """
    assert unmask_mode in ("greedy", "random"), unmask_mode
    # cache layout (T, L, B, S, C)
    B = cache["k"].shape[2] if batch_size is None else batch_size
    S = config.S
    h = w = config.latent_side_len
    out_t = jnp.broadcast_to(jnp.asarray(out_t, jnp.int32), (B,))
    n_per_step = [math.ceil(cosine_schedule((s + 1) / maskgit_steps) * S)
                  for s in range(maskgit_steps - 1)]

    frame = jnp.full((B, S), config.mask_token_id, dtype=jnp.int32)
    unmasked = jnp.zeros((B, S), dtype=bool)
    orig_logits = None
    kv_cur = None
    if action_B is not None:
        decode_fn = partial(decode_fn, action_B=action_B)
    for step in range(maskgit_steps):
        logits, kv_cur = decode_fn(frame, out_t, cache)
        if step == 0:
            orig_logits = logits
        rng, sub = jax.random.split(rng)
        frame, unmasked = _frame_update(
            frame, unmasked, logits, step, maskgit_steps, n_per_step, sub,
            config, temperature, unmask_mode)

    F = orig_logits.shape[-1]
    orig_ref = jnp.moveaxis(orig_logits, 1, -1).reshape(
        B, config.factored_vocab_size, F, h, w)
    return frame, orig_ref, kv_cur


def generate_cached(
    prefill_fn,
    decode_fn,
    input_ids_BN: jnp.ndarray,
    num_new_frames: int,
    rng: jax.Array,
    config: GenieConfig,
    maskgit_steps: int = 2,
    temperature: float = 0.0,
    unmask_mode: str = "random",
    actions_BT=None,
    unroll_frames: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached autoregressive rollout; same contract as `generate`.

    Per generated frame: `maskgit_steps` single-frame decodes + one commit
    decode of the finalized tokens (whose K/V enter the cache) — ~
    (steps+1)/T of the uncached FLOPs.

    Args:
        actions_BT: optional (B, T) int32 action ids; frames <P condition the
            prefill (prefill_fn must accept them), frame t's decode steps get
            action_B = actions_BT[:, t].
        unroll_frames: unroll the frame loop (static frame indices — the
            cache commit becomes an aligned static-index update; costs a
            ~T_new x larger program/compile).
    """
    from tpu1x.models.st_maskgit import update_cache

    h = w = config.latent_side_len
    S = config.S
    B = input_ids_BN.shape[0]
    num_prompt_frames = input_ids_BN.shape[1] // S
    T = num_prompt_frames + num_new_frames
    assert T == config.T, (T, config.T)

    prompt_BPHW = input_ids_BN.reshape(B, num_prompt_frames, h, w).astype(jnp.int32)
    if actions_BT is None:
        cache = prefill_fn(prompt_BPHW)
    else:
        cache = prefill_fn(prompt_BPHW, actions_BT[:, :num_prompt_frames])

    def frame_step(carry, t):
        cache, rng = carry
        rng, sub = jax.random.split(rng)
        action_B = (None if actions_BT is None
                    else jnp.take_along_axis(actions_BT, t[None, None],
                                             axis=1)[:, 0])
        frame, flogits, _ = maskgit_generate_cached(
            decode_fn, cache, t, sub, config, maskgit_steps=maskgit_steps,
            temperature=temperature, unmask_mode=unmask_mode, batch_size=B,
            action_B=action_B)
        # commit: recompute K/V from the finalized tokens
        commit_fn = (decode_fn if action_B is None
                     else partial(decode_fn, action_B=action_B))
        _, kv_cur = commit_fn(frame, jnp.broadcast_to(t, (B,)), cache)
        cache = update_cache(cache, kv_cur, t)
        return (cache, rng), (frame, flogits)

    timesteps = jnp.arange(num_prompt_frames, T, dtype=jnp.int32)
    (_, _), (frames, all_logits) = jax.lax.scan(
        frame_step, (cache, rng), timesteps,
        unroll=num_new_frames if unroll_frames else 1)
    # frames: (num_new, B, S) -> (B, num_new, S)
    frames = jnp.moveaxis(frames, 0, 1).reshape(B, num_new_frames * S)
    tokens = jnp.concatenate([input_ids_BN.astype(jnp.int32), frames], axis=1)
    factored_logits = jnp.moveaxis(all_logits, 0, 3)
    return tokens, factored_logits


def generate_cached_fused(
    prefill_fn,
    decode_fn,
    decode_pair_fn,
    input_ids_BN: jnp.ndarray,
    num_new_frames: int,
    rng: jax.Array,
    config: GenieConfig,
    maskgit_steps: int = 2,
    temperature: float = 0.0,
    unmask_mode: str = "random",
    actions_BT=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`generate_cached` with the commit pass FUSED into the next frame's
    step-0 decode (tpu1x/serving.py decode_frame_pair): per frame the cache
    streams from HBM maskgit_steps times instead of maskgit_steps+1, and the
    final frame's commit is skipped entirely (nothing reads it). Token-exact
    vs `generate_cached` given the same rng (tests/test_serving.py).

    Args:
        decode_pair_fn: (prev_BS, cur_BS, t_prev_B, cache[, action_prev,
            action_cur]) -> (logits_cur (B,S,V,F), kv_prev) — the serving
            engine's fused pass.
    """
    from tpu1x.models.st_maskgit import update_cache

    h = w = config.latent_side_len
    S = config.S
    V = config.factored_vocab_size
    B = input_ids_BN.shape[0]
    num_prompt = input_ids_BN.shape[1] // S
    T = num_prompt + num_new_frames
    assert T == config.T, (T, config.T)
    assert num_new_frames >= 1
    n_per_step = [math.ceil(cosine_schedule((s + 1) / maskgit_steps) * S)
                  for s in range(maskgit_steps - 1)]

    prompt_BPHW = input_ids_BN.reshape(B, num_prompt, h, w).astype(jnp.int32)
    if actions_BT is None:
        cache = prefill_fn(prompt_BPHW)
    else:
        cache = prefill_fn(prompt_BPHW, actions_BT[:, :num_prompt])

    def act(t):
        if actions_BT is None:
            return None
        return jnp.take_along_axis(actions_BT,
                                   jnp.broadcast_to(t, (B,))[:, None],
                                   axis=1)[:, 0]

    def to_ref_layout(logits_BSVF):
        return jnp.moveaxis(logits_BSVF, 1, -1).reshape(
            B, V, logits_BSVF.shape[-1], h, w)

    def sample_frame(cache, frame, logits0, t, sub):
        """Run the maskgit steps for frame t given its step-0 logits."""
        unmasked = jnp.zeros((B, S), dtype=bool)
        sub, s0 = jax.random.split(sub)
        frame, unmasked = _frame_update(frame, unmasked, logits0, 0,
                                        maskgit_steps, n_per_step, s0, config,
                                        temperature, unmask_mode)
        t_B = jnp.broadcast_to(t, (B,))
        a = act(t)
        dec = decode_fn if a is None else partial(decode_fn, action_B=a)
        for step in range(1, maskgit_steps):
            logits, _ = dec(frame, t_B, cache)
            sub, si = jax.random.split(sub)
            frame, unmasked = _frame_update(frame, unmasked, logits, step,
                                            maskgit_steps, n_per_step, si,
                                            config, temperature, unmask_mode)
        return frame

    # first generated frame: standard step-0 decode (its predecessor's K/V
    # came from the prefill), no commit of its own yet
    t0 = jnp.asarray(num_prompt, jnp.int32)
    rng, sub0 = jax.random.split(rng)
    masked = jnp.full((B, S), config.mask_token_id, dtype=jnp.int32)
    a0 = act(t0)
    dec0 = decode_fn if a0 is None else partial(decode_fn, action_B=a0)
    logits0, _ = dec0(masked, jnp.broadcast_to(t0, (B,)), cache)
    frame0 = sample_frame(cache, masked, logits0, t0, sub0)
    orig0 = to_ref_layout(logits0)

    def frame_step(carry, t):
        cache, prev, rng = carry
        rng, sub = jax.random.split(rng)
        ap, ac = act(t - 1), act(t)
        pair = decode_pair_fn
        if ac is not None:
            pair = partial(pair, action_prev=ap, action_cur=ac)
        logits0, kv_prev = pair(prev, masked,
                                jnp.broadcast_to(t - 1, (B,)), cache)
        cache = update_cache(cache, kv_prev, t - 1)
        frame = sample_frame(cache, masked, logits0, t, sub)
        return (cache, frame, rng), (frame, to_ref_layout(logits0))

    if num_new_frames > 1:
        timesteps = jnp.arange(num_prompt + 1, T, dtype=jnp.int32)
        (_, _, _), (frames, logit_frames) = jax.lax.scan(
            frame_step, (cache, frame0, rng), timesteps)
        frames = jnp.concatenate([frame0[None], frames], axis=0)
        logit_frames = jnp.concatenate([orig0[None], logit_frames], axis=0)
    else:
        frames = frame0[None]
        logit_frames = orig0[None]

    frames = jnp.moveaxis(frames, 0, 1).reshape(B, num_new_frames * S)
    tokens = jnp.concatenate([input_ids_BN.astype(jnp.int32), frames], axis=1)
    factored_logits = jnp.moveaxis(logit_frames, 0, 3)
    return tokens, factored_logits


def maskgit_generate(
    logits_fn: LogitsFn,
    prompt_BTHW: jnp.ndarray,
    out_t,
    rng: jax.Array,
    config: GenieConfig,
    maskgit_steps: int = 2,
    temperature: float = 0.0,
    unmask_mode: str = "random",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict frame `out_t` with MaskGIT-style iterative decoding.

    Args:
        prompt_BTHW: (B, T, H, W) int32; frames >= out_t must be fully masked.
        out_t: scalar int or (B,) int32 — per-row target frame (>= 1).
        rng: PRNG key.
        maskgit_steps, temperature, unmask_mode: static sampling hparams.

    Returns: (sample_BHW, orig_factored_logits)
        sample_BHW: (B, H, W) int32 predicted unfactorized tokens for out_t.
        orig_factored_logits: (B, V, F, H, W) float32 step-0 logits
            (the reference's return layout, st_mask_git.py:226-229).
    """
    assert unmask_mode in ("greedy", "random"), unmask_mode
    B, T, H, W = prompt_BTHW.shape
    S = H * W
    V = config.factored_vocab_size
    out_t = jnp.broadcast_to(jnp.asarray(out_t, dtype=jnp.int32), (B,))
    t_iota = jnp.arange(T, dtype=jnp.int32)
    is_out_frame = t_iota[None, :] == out_t[:, None]  # (B, T)

    # Static per-step re-mask counts (st_mask_git.py:197-199).
    n_per_step = [math.ceil(cosine_schedule((s + 1) / maskgit_steps) * S)
                  for s in range(maskgit_steps - 1)]

    def frame_of(tokens_BTHW):
        """Select each row's out_t frame: (B, H, W)."""
        return jnp.take_along_axis(
            tokens_BTHW, out_t[:, None, None, None], axis=1)[:, 0]

    tokens = prompt_BTHW
    unmasked = jnp.zeros((B, S), dtype=bool)  # init_mask (st_mask_git.py:115-120)
    orig_logits = None

    for step in range(maskgit_steps):
        logits_BTSVF = logits_fn(tokens)
        frame_logits = jnp.take_along_axis(
            logits_BTSVF, out_t[:, None, None, None, None], axis=1)[:, 0]  # (B,S,V,F)
        if step == 0:
            orig_logits = frame_logits

        rng, sub = jax.random.split(rng)
        prev_frame_BS = frame_of(tokens).reshape(B, S)
        samples_BS, unmasked = _frame_update(
            prev_frame_BS, unmasked, frame_logits, step, maskgit_steps,
            n_per_step, sub, config, temperature, unmask_mode)

        # functional write-back of the out_t frame (st_mask_git.py:223)
        new_frame = samples_BS.reshape(B, 1, H, W)
        tokens = jnp.where(is_out_frame[:, :, None, None], new_frame, tokens)

    sample_BHW = frame_of(tokens)
    # (B, S, V, F) -> (B, V, F, H, W)
    orig_ref = jnp.moveaxis(orig_logits, 1, -1).reshape(B, V,
                                                        orig_logits.shape[-1], H, W)
    return sample_BHW, orig_ref


def generate(
    logits_fn: LogitsFn,
    input_ids_BN: jnp.ndarray,
    num_new_frames: int,
    rng: jax.Array,
    config: GenieConfig,
    maskgit_steps: int = 2,
    temperature: float = 0.0,
    unmask_mode: str = "random",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-by-frame autoregressive rollout (reference: st_mask_git.py:65-113).

    Args:
        input_ids_BN: (B, T_prompt * S) int32 flattened prompt tokens.
        num_new_frames: frames to generate; total T must equal config.T.

    Returns: (tokens_BN, factored_logits)
        tokens_BN: (B, (T_prompt+num_new_frames) * S) int32, prompt + generated.
        factored_logits: (B, V, F, num_new_frames, H, W) float32 per-frame
            step-0 logits (the reference's stacked layout, st_mask_git.py:111).
    """
    h = w = config.latent_side_len
    S = config.S
    B = input_ids_BN.shape[0]
    assert input_ids_BN.shape[1] % S == 0
    num_prompt_frames = input_ids_BN.shape[1] // S
    T = num_prompt_frames + num_new_frames
    assert T == config.T, (T, config.T)

    prompt = input_ids_BN.reshape(B, num_prompt_frames, h, w).astype(jnp.int32)
    tokens = jnp.concatenate([
        prompt,
        jnp.full((B, num_new_frames, h, w), config.mask_token_id, dtype=jnp.int32),
    ], axis=1)

    def frame_step(carry, t):
        tokens, rng = carry
        rng, sub = jax.random.split(rng)
        sample_BHW, flogits = maskgit_generate(
            logits_fn, tokens, t, sub, config, maskgit_steps=maskgit_steps,
            temperature=temperature, unmask_mode=unmask_mode)
        t_iota = jnp.arange(T, dtype=jnp.int32)
        tokens = jnp.where((t_iota == t)[None, :, None, None],
                           sample_BHW[:, None], tokens)
        return (tokens, rng), flogits

    timesteps = jnp.arange(num_prompt_frames, T, dtype=jnp.int32)
    (tokens, _), all_logits = jax.lax.scan(frame_step, (tokens, rng), timesteps)
    # all_logits: (num_new_frames, B, V, F, H, W) -> (B, V, F, num_new, H, W)
    factored_logits = jnp.moveaxis(all_logits, 0, 3)
    return tokens.reshape(B, T * S), factored_logits
