"""Golden parity against the ACTUAL reference implementation (torch CPU).

Unlike tests/numpy_reference.py (an independent re-implementation, kept as the
fast oracle), these tests instantiate the reference `genie.st_mask_git.STMaskGIT`
itself (via tests/torch_shims.py), export its state dict through
`convert_torch_state_dict`, and require our forward / loss / sampler
trajectories to match the real thing:

- compute_logits + masked factored CE/acc at tiny scale across the
  (qk_norm, use_mup) quirk grid (ref: st_mask_git.py:231-279)
- the same at the shipped-config scale (genie/configs/magvit_n32_h8_d256.json)
- greedy maskgit_generate trajectories, token-exact (ref: st_mask_git.py:122-229)
- greedy full generate() rollouts, token-exact, uncached AND KV-cached
  (ref: st_mask_git.py:65-113)

All deterministic paths only: the reference's "random" unmask mode uses torch
RNG which is not reproducible from JAX (SURVEY.md §7 "Randomness parity").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_shims import install_reference_shims

install_reference_shims()

import torch  # noqa: E402

from genie.config import GenieConfig as RefGenieConfig  # noqa: E402
from genie.st_mask_git import STMaskGIT as RefSTMaskGIT  # noqa: E402

from tpu1x.config import GenieConfig  # noqa: E402
from tpu1x.models.st_maskgit import STMaskGIT, logits_to_reference_layout  # noqa: E402
from tpu1x.models import sampler  # noqa: E402
from tpu1x.train.checkpoint import convert_torch_state_dict  # noqa: E402

TINY = dict(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
            image_vocab_size=262144, num_factored_vocabs=2)
# NOTE: image_vocab_size must stay 2**18: the reference's compute_loss_and_acc
# calls factorize_labels with its *default* vocab args (st_mask_git.py:241,
# factorization_utils.py:87-89), so its loss is only correct at 2x512.


def make_pair(seed=0, **kw):
    """Build (ref torch model .eval(), our config, converted params)."""
    fields = dict(TINY, **kw)
    ref_cfg = RefGenieConfig(**fields)
    torch.manual_seed(seed)
    ref = RefSTMaskGIT(ref_cfg).eval()
    if ref_cfg.use_mup:
        ref.set_mup_shapes(rescale_params=False)
    # perturb params away from default init (pos_embed is zeros at init;
    # LN scales are exactly 1) so quirks can't hide behind zeros
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        for p in ref.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))
    cfg = GenieConfig(**fields, dtype="float32")
    params = convert_torch_state_dict(ref.state_dict(), cfg)
    return ref, cfg, params


def rand_tokens(cfg, B=2, seed=0, mask_from=None):
    rng = np.random.RandomState(seed)
    h = w = cfg.latent_side_len
    toks = rng.randint(0, cfg.image_vocab_size, (B, cfg.T, h, w)).astype(np.int64)
    if mask_from is not None:
        toks[:, mask_from:] = cfg.mask_token_id
    return toks


@pytest.mark.parametrize("qk_norm,use_mup", [
    (False, False),  # shipped-config shape (plain pre-LN)
    (True, False),   # qk-norm quirk: norm1/2 become Identity
    (False, True),   # muP readout (width_mult=0.125 at d=32) + 8/hd scale
    (True, True),
])
def test_forward_parity_tiny(qk_norm, use_mup):
    ref, cfg, params = make_pair(qk_norm=qk_norm, use_mup=use_mup)
    toks = rand_tokens(cfg, B=2, seed=1)
    toks[0, -1] = cfg.mask_token_id  # some masked positions in frames 1+
    toks[1, 2, 0, 0] = cfg.mask_token_id
    labels = rand_tokens(cfg, B=2, seed=2)

    with torch.no_grad():
        want_logits = ref.compute_logits(torch.from_numpy(toks)).numpy()
        out = ref(input_ids=torch.from_numpy(toks.reshape(2, -1)),
                  labels=torch.from_numpy(labels.reshape(2, -1)))

    model = STMaskGIT(cfg)
    got = model.apply({"params": params}, jnp.asarray(toks),
                      method=STMaskGIT.compute_logits)
    got_ref_layout = np.asarray(logits_to_reference_layout(
        got, cfg.latent_side_len, cfg.latent_side_len))
    np.testing.assert_allclose(got_ref_layout, want_logits, atol=2e-4, rtol=2e-3)

    ours = model.apply({"params": params},
                       jnp.asarray(toks.reshape(2, -1)),
                       jnp.asarray(labels.reshape(2, -1)))
    np.testing.assert_allclose(float(ours["loss"]), out.loss.item(),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(ours["acc"]), out.acc.item(), atol=1e-6)


@pytest.mark.slow
def test_forward_parity_shipped_config():
    """The shipped 32L/8H/256d config (GENIE_35M), real reference forward."""
    ref_cfg = RefGenieConfig.from_pretrained(
        "/root/reference/genie/configs/magvit_n32_h8_d256.json")
    torch.manual_seed(0)
    ref = RefSTMaskGIT(ref_cfg).eval()
    if ref_cfg.use_mup:
        ref.set_mup_shapes(rescale_params=False)
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in ref.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))

    fields = {f: getattr(ref_cfg, f) for f in
              ("num_layers", "num_heads", "d_model", "T", "S",
               "image_vocab_size", "num_factored_vocabs", "qkv_bias",
               "proj_bias", "qk_norm", "use_mup", "mlp_ratio", "mlp_bias")}
    cfg = GenieConfig(**fields, dtype="float32")
    params = convert_torch_state_dict(ref.state_dict(), cfg)

    toks = rand_tokens(cfg, B=1, seed=3)
    toks[:, cfg.num_prompt_frames:] = cfg.mask_token_id
    labels = rand_tokens(cfg, B=1, seed=4)

    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(toks.reshape(1, -1)),
                  labels=torch.from_numpy(labels.reshape(1, -1)))

    model = STMaskGIT(cfg)
    ours = model.apply({"params": params},
                       jnp.asarray(toks.reshape(1, -1)),
                       jnp.asarray(labels.reshape(1, -1)))
    # 32 fp32 layers accumulate reduction-order differences
    np.testing.assert_allclose(float(ours["loss"]), out.loss.item(),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(float(ours["acc"]), out.acc.item(), atol=1e-6)


@pytest.mark.parametrize("steps,out_t", [(1, 1), (2, 2), (4, 1)])
def test_maskgit_generate_greedy_trajectory(steps, out_t):
    """Greedy (temp=0, unmask_mode=greedy) is deterministic on both sides:
    the full multi-step MaskGIT trajectory must be token-exact."""
    ref, cfg, params = make_pair(seed=7)
    B = 2
    prompt = rand_tokens(cfg, B=B, seed=5, mask_from=out_t)

    with torch.no_grad():
        want_sample, want_logits = ref.maskgit_generate(
            torch.from_numpy(prompt.copy()), out_t=out_t, maskgit_steps=steps,
            temperature=0.0, unmask_mode="greedy")

    model = STMaskGIT(cfg)

    @jax.jit
    def logits_fn(tokens):
        return model.apply({"params": params}, tokens,
                           method=STMaskGIT.compute_logits)

    got_sample, got_logits = sampler.maskgit_generate(
        logits_fn, jnp.asarray(prompt), out_t, jax.random.PRNGKey(0), cfg,
        maskgit_steps=steps, temperature=0.0, unmask_mode="greedy")

    np.testing.assert_array_equal(np.asarray(got_sample), want_sample.numpy())
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("use_mup", [False, True])
def test_generate_rollout_greedy(use_mup):
    """Full frame-by-frame AR rollout, token-exact vs the reference, through
    BOTH our uncached sampler and the KV-cached serving path.

    maskgit_steps=1 because the reference's `generate` hardcodes
    unmask_mode="random" (torch RNG) for the re-mask step (st_mask_git.py:103);
    with a single step no re-masking happens and greedy is deterministic.
    """
    ref, cfg, params = make_pair(seed=11, use_mup=use_mup)
    B, num_prompt, num_new = 2, 2, 2
    S = cfg.S
    prompt = rand_tokens(cfg, B=B, seed=6)[:, :num_prompt]
    flat_prompt = prompt.reshape(B, -1)

    with torch.no_grad():
        want_tokens, want_logits = ref.generate(
            torch.from_numpy(flat_prompt), attention_mask=None,
            max_new_tokens=num_new * S, return_logits=True,
            maskgit_steps=1, temperature=0.0)

    model = STMaskGIT(cfg)

    @jax.jit
    def logits_fn(tokens):
        return model.apply({"params": params}, tokens,
                           method=STMaskGIT.compute_logits)

    got_tokens, got_logits = sampler.generate(
        logits_fn, jnp.asarray(flat_prompt), num_new, jax.random.PRNGKey(0),
        cfg, maskgit_steps=1, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got_tokens), want_tokens.numpy())
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-4, rtol=2e-3)

    # KV-cached path (the serving decode engine the reference lacks)
    def prefill_fn(p, actions=None):
        return model.apply({"params": params}, p, method=STMaskGIT.prefill)

    def decode_fn(frame, t, cache, action_B=None):
        return model.apply({"params": params}, frame, t, cache,
                           method=STMaskGIT.decode_frame)

    got_tokens_c, got_logits_c = sampler.generate_cached(
        prefill_fn, decode_fn, jnp.asarray(flat_prompt), num_new,
        jax.random.PRNGKey(0), cfg, maskgit_steps=1, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got_tokens_c),
                                  want_tokens.numpy())
    np.testing.assert_allclose(np.asarray(got_logits_c), want_logits.numpy(),
                               atol=3e-4, rtol=3e-3)


def test_safetensors_export_loads_into_reference(tmp_path):
    """A tpu1x-trained model exported via `save_pretrained_torch` must load
    into the ACTUAL reference torch model (strict state_dict load, the
    PyTorchModelHubMixin contract st_mask_git.py:306-313) and produce the
    same logits the flax model does (VERDICT r2 missing #3)."""
    from safetensors.torch import load_file as load_st_torch

    from tpu1x.train.checkpoint import save_pretrained_torch

    ref, cfg, params = make_pair(seed=3)

    # round-trip our (converted) params through the HF export...
    save_pretrained_torch(tmp_path / "hf", params, cfg)
    sd = load_st_torch(str(tmp_path / "hf" / "model.safetensors"))
    ref2 = RefSTMaskGIT(RefGenieConfig(**TINY)).eval()
    missing, unexpected = ref2.load_state_dict(sd, strict=True)
    assert not missing and not unexpected

    toks = rand_tokens(cfg, B=2, seed=5)
    with torch.no_grad():
        want = ref.compute_logits(torch.from_numpy(toks)).numpy()
        got = ref2.compute_logits(torch.from_numpy(toks)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
