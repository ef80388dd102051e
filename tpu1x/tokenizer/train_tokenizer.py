"""Tokenizer (LFQ-GAN) training: dual-optimizer generator/discriminator steps.

Behavioral contract matches the reference Lightning `training_step`
(magvit2/models/lfqgan.py:145-183) + `VQLPIPSWithDiscriminator`
(magvit2/modules/losses/vqperceptual.py):
- generator: L1 recon + LPIPS perceptual + adaptive-weight non-saturating
  GAN loss + entropy aux (0.1) + commit (0.25); optimizer over
  encoder+decoder (+quantizer — LFQ has no params here).
- discriminator: hinge (default) + LeCam regularization on detached recon.
- disc terms gated by `adopt_weight` until disc_start.
- EMA of generator params after each update (lfqgan.py:185-187).

The reference has *no* tokenizer-training CLI (SURVEY.md §3.5 — Lightning
fit loop external); here `main` provides one over an .npy/.bin image corpus.

JAX expression: one jitted step computes both optimizer updates; the
adaptive generator weight ||grad nll|| / ||grad g|| is taken w.r.t. the
decoder's final conv kernel via two scoped jax.grad calls (ref: 139-150).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpu1x.config import VQConfig
from tpu1x.tokenizer import losses as L
from tpu1x.tokenizer.discriminator import NLayerDiscriminator
from tpu1x.tokenizer.vqmodel import VQModel, ema_init, ema_update


@flax.struct.dataclass
class TokenizerTrainState:
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    ema_params: Any
    disc_params: Any
    disc_stats: Any          # BatchNorm running stats
    disc_opt: Any
    lecam: L.LeCamState
    rng: jax.Array


def create_tokenizer_state(config: VQConfig, gen_tx, disc_tx, rng,
                           image_size: Optional[int] = None,
                           disc_init_batch=None
                           ) -> Tuple[TokenizerTrainState, VQModel,
                                      NLayerDiscriminator]:
    """`disc_init_batch`: a real (B, H, W, C) image batch used to initialize
    the discriminator. Required in spirit when `config.use_actnorm`: ActNorm's
    loc/scale are data-dependent (the torch version initializes on its first
    training batch, magvit2/modules/util.py:21-41); without one, a
    standard-normal batch is substituted so scales stay finite."""
    model = VQModel(config)
    disc = NLayerDiscriminator(input_nc=config.disc_in_channels,
                               n_layers=config.disc_num_layers,
                               use_actnorm=config.use_actnorm,
                               dtype=jnp.dtype(config.dtype))
    size = image_size or config.resolution
    dummy = jnp.zeros((1, size, size, config.in_channels))
    k1, k2, k3 = jax.random.split(rng, 3)
    gen_params = model.init(k1, dummy)["params"]
    disc_init = disc_init_batch
    if disc_init is None:
        disc_init = (jax.random.normal(k2, (4, size, size,
                                            config.in_channels))
                     if config.use_actnorm else dummy)
    disc_vars = disc.init(k2, jnp.asarray(disc_init, jnp.float32),
                          train=True)
    state = TokenizerTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params, gen_opt=gen_tx.init(gen_params),
        ema_params=ema_init(gen_params) if config.use_ema else None,
        disc_params=disc_vars["params"],
        disc_stats=disc_vars.get("batch_stats", {}),
        disc_opt=disc_tx.init(disc_vars["params"]),
        lecam=L.LeCamState.init(), rng=k3)
    return state, model, disc


def make_tokenizer_train_step(model: VQModel, disc: NLayerDiscriminator,
                              gen_tx, disc_tx, config: VQConfig,
                              lpips_apply: Optional[Callable] = None):
    """Build the jitted dual step: (state, images_BHWC in [-1,1]) ->
    (state, metrics)."""
    recon_loss_fn = L.l1_loss if config.recon_loss == "l1" else L.l2_loss
    d_loss_fn = L.D_LOSSES[config.disc_loss]

    def perceptual(x, y):
        if lpips_apply is None or config.perceptual_weight == 0:
            return jnp.zeros(())
        return jnp.mean(lpips_apply(x, y)) * config.perceptual_weight

    def step(state: TokenizerTrainState, images):
        disc_factor = L.adopt_weight(1.0, state.step, config.disc_start)

        # ---------------- generator ----------------
        def gen_loss_fn(gen_params):
            recon, res = model.apply({"params": gen_params}, images,
                                     training=True)
            rec = recon_loss_fn(images, recon)
            p_loss = perceptual(images, recon)
            nll = rec + p_loss
            logits_fake = disc.apply(
                {"params": state.disc_params, "batch_stats": state.disc_stats},
                recon, train=False)
            g_loss = L.non_saturate_gen_loss(logits_fake)

            if config.gen_loss_weight is None:
                # adaptive weight at the decoder's last conv kernel (ref:139-150)
                def swap_last(params, kernel):
                    dec = dict(params["decoder"])
                    co = dict(dec["conv_out"])
                    co["kernel"] = kernel
                    dec["conv_out"] = co
                    out = dict(params)
                    out["decoder"] = dec
                    return out

                quant = jax.lax.stop_gradient(res.quantized)

                def nll_of(kernel):
                    r = model.apply(
                        {"params": swap_last(gen_params, kernel)}, quant,
                        method=VQModel.decode)
                    return recon_loss_fn(images, r) + perceptual(images, r)

                def g_of(kernel):
                    r = model.apply(
                        {"params": swap_last(gen_params, kernel)}, quant,
                        method=VQModel.decode)
                    lf = disc.apply(
                        {"params": state.disc_params,
                         "batch_stats": state.disc_stats}, r, train=False)
                    return L.non_saturate_gen_loss(lf)

                kernel = gen_params["decoder"]["conv_out"]["kernel"]
                nll_g = optax.global_norm(jax.grad(nll_of)(kernel))
                g_g = optax.global_norm(jax.grad(g_of)(kernel))
                d_weight = L.adaptive_gen_weight(nll_g, g_g, config.disc_weight)
                d_weight = jax.lax.stop_gradient(d_weight)
            else:
                d_weight = config.gen_loss_weight

            total = (nll + d_weight * disc_factor * g_loss
                     + config.entropy_loss_weight * res.entropy_loss
                     + config.commit_loss_weight * res.commit_loss)
            aux = {"rec_loss": rec, "nll_loss": nll, "p_loss": p_loss,
                   "g_loss": g_loss,
                   "d_weight": d_weight, "entropy_loss": res.entropy_loss,
                   "commit_loss": res.commit_loss,
                   "per_sample_entropy": res.per_sample_entropy,
                   "codebook_entropy": res.codebook_entropy,
                   "recon": jax.lax.stop_gradient(recon)}
            return total, aux

        (gen_loss, aux), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gen_updates, gen_opt = gen_tx.update(gen_grads, state.gen_opt,
                                             state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        # ---------------- discriminator ----------------
        recon_detached = aux.pop("recon")

        def disc_loss_fn(disc_params):
            variables = {"params": disc_params, "batch_stats": state.disc_stats}
            logits_real, mut = disc.apply(variables, images, train=True,
                                          mutable=["batch_stats"])
            stats = mut.get("batch_stats", state.disc_stats)  # ActNorm: none
            logits_fake, mut = disc.apply(
                {"params": disc_params, "batch_stats": stats},
                recon_detached, train=True, mutable=["batch_stats"])
            stats = mut.get("batch_stats", stats)
            d_loss = d_loss_fn(logits_real, logits_fake)
            lecam = L.lecam_reg(logits_real, logits_fake, state.lecam)
            total = disc_factor * (d_loss + config.lecam_weight * lecam)
            return total, (logits_real, logits_fake, stats,
                           d_loss, lecam)

        (disc_loss, (lr_, lf_, disc_stats, d_loss, lecam_val)), disc_grads = \
            jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params)
        disc_updates, disc_opt = disc_tx.update(disc_grads, state.disc_opt,
                                                state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        lecam = L.lecam_update(state.lecam, lr_, lf_)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, gen_params,
                                    decay=config.ema_decay,
                                    num_updates=state.step.astype(jnp.float32))

        metrics = {"gen_loss": gen_loss, "disc_loss": disc_loss,
                   "d_loss": d_loss, "lecam": lecam_val,
                   **{k: v for k, v in aux.items()}}
        new_state = TokenizerTrainState(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt,
            ema_params=ema_params, disc_params=disc_params,
            disc_stats=disc_stats, disc_opt=disc_opt, lecam=lecam,
            rng=state.rng)
        return new_state, metrics

    return jax.jit(step)


def build_lpips_apply(lpips_ckpt, net: str = "vgg"):
    """Differentiable VGG-LPIPS term for the generator loss (reference:
    vqperceptual.py:152-158, weight 1.0 via VQConfig.perceptual_weight).

    Args:
        lpips_ckpt: a full LPIPS state dict, a torchvision VGG16 backbone
            state dict (the learned lin heads are vendored in-package from
            the reference's `vgg.pth`), a flax .msgpack, or the explicit
            string "random" for smoke-test weights (loud warning). None
            raises — the backbone is required for meaningful training.

    Returns fn(x, y) of [-1, 1] NHWC floats -> per-image distances; the
    frozen weights live in the closure so gradients flow only through the
    inputs (the reference's frozen-LPIPS semantics, lpips.py:28-41).
    """
    from tpu1x.tokenizer.lpips import LPIPS, resolve_lpips_params

    model = LPIPS(net=net)
    params = resolve_lpips_params(model, lpips_ckpt, net)

    def apply(x, y):
        return model.apply({"params": params}, x, y)
    return apply


def main(argv=None):
    """Minimal tokenizer-training CLI over an image array file.

    Expects a .npy of uint8 images (N, H, W, 3); trains the LFQ-GAN.
    """
    import argparse
    import numpy as np

    p = argparse.ArgumentParser(description="Train the MAGVIT2 LFQ tokenizer.")
    p.add_argument("--images_npy", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--max_train_steps", type=int, default=1000,
                   help="number of micro-batches (optimizer updates happen "
                        "every --accumulate_grad_batches of these)")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--disc_start", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    # reference training dynamics (lfqgan.py:161-180, 211-243)
    p.add_argument("--accumulate_grad_batches", type=int, default=1,
                   help="both optimizers step every N micro-batches "
                        "(lfqgan.py:161)")
    p.add_argument("--adam_beta_1", type=float, default=0.5)
    p.add_argument("--adam_beta_2", type=float, default=0.9)
    p.add_argument("--scheduler_type", type=str, default="none",
                   choices=["none", "linear-warmup",
                            "linear-warmup_cosine-decay"],
                   help="LR schedule attached to BOTH optimizers "
                        "(lfqgan.py:227-238)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="warmup updates (the reference derives this from "
                        "warmup_epochs * steps_per_epoch)")
    p.add_argument("--min_learning_rate", type=float, default=0.0,
                   help="cosine floor; multiplier_min = min_lr / lr "
                        "(lfqgan.py:232-234)")
    p.add_argument("--use_actnorm", action="store_true",
                   help="ActNorm discriminator instead of BatchNorm "
                        "(discriminator/model.py:30-36)")
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="VGG-LPIPS weights for the perceptual loss "
                        "(vendored vgg.pth torch state dict or flax "
                        ".msgpack), or 'random' for randomly initialized "
                        "trunk weights (smoke tests only). The reference "
                        "trains with perceptual_weight=1.0 "
                        "(vqperceptual.py:152-158) — omitting this trains "
                        "with perceptual == 0 and diverges from reference "
                        "dynamics.")
    args = p.parse_args(argv)

    config = VQConfig(disc_start=args.disc_start,
                      use_actnorm=args.use_actnorm)
    images = np.load(args.images_npy, mmap_mode="r")
    size = args.image_size or images.shape[1]
    config.resolution = size

    from tpu1x.tokenizer.schedulers import build_tokenizer_optimizer
    num_updates = args.max_train_steps // max(args.accumulate_grad_batches, 1)
    opt_kwargs = dict(
        learning_rate=args.learning_rate, beta1=args.adam_beta_1,
        beta2=args.adam_beta_2, scheduler_type=args.scheduler_type,
        warmup_steps=args.warmup_steps, training_steps=num_updates,
        min_learning_rate=args.min_learning_rate,
        grad_accum_steps=args.accumulate_grad_batches)
    gen_tx = build_tokenizer_optimizer(**opt_kwargs)
    disc_tx = build_tokenizer_optimizer(**opt_kwargs)
    init_batch = jnp.asarray(
        np.asarray(images[:min(8, len(images))]).astype(np.float32)
        / 127.5 - 1.0)
    state, model, disc = create_tokenizer_state(
        config, gen_tx, disc_tx, jax.random.PRNGKey(args.seed),
        image_size=size, disc_init_batch=init_batch)
    lpips_apply = None
    if args.lpips_ckpt:
        lpips_apply = build_lpips_apply(args.lpips_ckpt)
    elif config.perceptual_weight:
        import warnings
        warnings.warn(
            "Training WITHOUT the LPIPS perceptual loss (no --lpips_ckpt): "
            "the reference's generator loss is L1 + VGG-LPIPS at weight "
            f"{config.perceptual_weight} (vqperceptual.py:152-158) — "
            "dynamics will diverge from the reference. Pass --lpips_ckpt "
            "vgg.pth (or 'random' for smoke tests).", stacklevel=1)
    step_fn = make_tokenizer_train_step(model, disc, gen_tx, disc_tx, config,
                                        lpips_apply=lpips_apply)

    rng = np.random.RandomState(args.seed)
    for i in range(args.max_train_steps):
        idx = rng.randint(0, len(images), args.batch_size)
        batch = jnp.asarray(np.asarray(images[idx]).astype(np.float32)
                            / 127.5 - 1.0)
        state, metrics = step_fn(state, batch)
        if i % 20 == 0:
            print(f"step {i} gen {float(metrics['gen_loss']):.4f} "
                  f"rec {float(metrics['rec_loss']):.4f} "
                  f"disc {float(metrics['disc_loss']):.4f}")

    from tpu1x.tokenizer.checkpoint import save_tokenizer
    params = state.ema_params if state.ema_params is not None else state.gen_params
    save_tokenizer(args.output_dir, params, config)
    print(f"saved tokenizer to {args.output_dir}")


if __name__ == "__main__":
    main()
