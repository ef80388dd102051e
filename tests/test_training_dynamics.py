"""Cross-framework training-dynamics parity (VERDICT r2 next #5).

Forward parity is proven by tests/test_golden_reference.py; this file proves
*training* parity: the same tiny model, from an IDENTICAL converted init,
trained for 200 steps on the SAME pre-masked batches with the same optimizer
hyperparameters (AdamW, grad-clip 1.0, constant LR — the reference loop
semantics train.py:600-727, 427-441, 628-633) must produce CE loss
trajectories that track each other within tight bands in both frameworks.

Masking randomness parity is impossible across torch/JAX RNGs (SURVEY.md §7
"randomness parity"), so the MaskGIT corruption is sampled ONCE per step in
numpy and the identical (input_ids, labels) batch is fed to both loops —
isolating the optimizer/gradient dynamics from collator RNG.
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
from tpu1x.models.st_maskgit import STMaskGIT  # noqa: E402
from tpu1x.train.checkpoint import convert_torch_state_dict  # noqa: E402
from tpu1x.train.optim import build_optimizer  # noqa: E402

TINY = dict(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
            image_vocab_size=262144, num_factored_vocabs=2)
LR = 1e-3
STEPS = 200
BATCH = 4


def make_batches(cfg, steps, batch, seed=0, pool=4):
    """Pre-masked (input_ids, labels) batches, identical for both loops.

    Corruption follows the collator's *spirit* (data.py:113-167): labels are
    clean tokens; inputs mask a cosine-schedule fraction of frames 1+ and
    leave frame 0 clean. Exact RNG parity with torch is impossible and
    unnecessary — both sides see the same realized batches. A small cycled
    `pool` of fixed batches (the reference's --overfit_first_batch debug
    pattern, train.py:204-210) makes the loss *learnable*: fresh random
    tokens every step would pin CE at the uniform floor.
    """
    rng = np.random.RandomState(seed)
    h = w = cfg.latent_side_len
    out = []
    for _ in range(min(steps, pool)):
        toks = rng.randint(0, cfg.image_vocab_size,
                           (batch, cfg.T, h, w)).astype(np.int64)
        inputs = toks.copy()
        for b in range(batch):
            for t in range(1, cfg.T):
                r = np.cos(rng.uniform(0, np.pi / 2))
                m = rng.rand(h, w) < max(r, 1.0 / (h * w))
                if not m.any():
                    m[rng.randint(h), rng.randint(w)] = True
                inputs[b, t][m] = cfg.mask_token_id
        out.append((inputs.reshape(batch, -1), toks.reshape(batch, -1)))
    return [out[i % len(out)] for i in range(steps)]


@pytest.mark.slow
@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_200_step_loss_trajectories_match(attn_impl, monkeypatch):
    """attn_impl="pallas" runs the full fused train-block kernel trio
    (spatial/temporal/MLP custom VJPs, interpret mode on CPU) — proving
    the kernels' GRADIENTS reproduce the real torch reference's training
    dynamics end to end, not just single-step parity."""
    monkeypatch.setenv("TPU1X_ATTN_IMPL", attn_impl)
    fields = dict(TINY)
    ref_cfg = RefGenieConfig(**fields)
    torch.manual_seed(0)
    ref = RefSTMaskGIT(ref_cfg)
    with torch.no_grad():  # perturb away from zero-init pos_embed etc.
        g = torch.Generator().manual_seed(1)
        for p in ref.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))
    cfg = GenieConfig(**fields, dtype="float32")
    params = convert_torch_state_dict(ref.state_dict(), cfg)

    batches = make_batches(cfg, STEPS, BATCH)

    # --- reference loop: AdamW groups + clip 1.0 (train.py:427-441,628-633)
    no_decay = ["bias", "layer_norm.weight"]
    groups = [
        {"params": [p for n, p in ref.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
        {"params": [p for n, p in ref.named_parameters()
                    if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)
    ref_losses = []
    ref.train()
    for inputs, labels in batches:
        out = ref(input_ids=torch.from_numpy(inputs),
                  labels=torch.from_numpy(labels))
        opt.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        ref_losses.append(float(out.loss))

    # --- tpu1x loop: same init, same batches, same hyperparameters
    model = STMaskGIT(cfg)
    tx = build_optimizer(cfg, learning_rate=LR, weight_decay=0.0,
                         max_grad_norm=1.0, lr_scheduler_type="constant",
                         num_training_steps=STEPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, inputs, labels):
        def loss_fn(p):
            out = model.apply({"params": p}, inputs, labels)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    our_losses = []
    for inputs, labels in batches:
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(inputs, jnp.int32),
                                       jnp.asarray(labels, jnp.int32))
        our_losses.append(float(loss))

    ref_l = np.asarray(ref_losses)
    our_l = np.asarray(our_losses)

    # step 0 is pure forward parity on identical weights: very tight
    assert abs(ref_l[0] - our_l[0]) < 1e-3, (ref_l[0], our_l[0])
    # trajectories track: fp32 drift compounds, so band by mean windows
    for lo, hi, tol in [(0, 50, 0.02), (50, 120, 0.05), (120, STEPS, 0.10)]:
        a, b = ref_l[lo:hi].mean(), our_l[lo:hi].mean()
        assert abs(a - b) < tol, (lo, hi, a, b)
    # both memorize the cycled pool (well below the start)
    assert ref_l[-10:].mean() < ref_l[:10].mean() - 0.5, \
        (ref_l[:10].mean(), ref_l[-10:].mean())
    assert our_l[-10:].mean() < our_l[:10].mean() - 0.5, \
        (our_l[:10].mean(), our_l[-10:].mean())
