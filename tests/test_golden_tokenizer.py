"""Golden parity for the tokenizer stack against the ACTUAL reference
(magvit2, torch CPU) via tests/torch_shims.py.

The reference VQModel cannot be constructed here (its loss builds LPIPS,
which needs torchvision + downloaded VGG weights), so we instantiate the
compute modules directly — exactly what `VQModel.encode/decode` call
(lfqgan.py:121-130): `Encoder`, `Decoder`, `LFQ`, plus `NLayerDiscriminator`
and the pure GAN-loss functions from vqperceptual.

Covers:
- Encoder forward parity through the converted state dict
- LFQ: quantization values, index bit-order relation (our "dataset"
  convention == bit-reversed reference-forward ids; our `codebook_entry` ==
  the reference decode-path composition `get_codebook_entry(...).flip(1)`,
  visualize.py:115)
- LFQ entropy/commit loss breakdown vs the reference's full-codebook math
- Decoder forward parity (depth_to_space upsampling)
- NLayerDiscriminator forward parity (BatchNorm running stats)
- hinge / vanilla / non-saturating / LeCam loss functions
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_shims import install_reference_shims

install_reference_shims()

import torch  # noqa: E402

from magvit2.config import VQConfig as RefVQConfig  # noqa: E402
from magvit2.modules.diffusionmodules.improved_model import (  # noqa: E402
    Decoder as RefDecoder, Encoder as RefEncoder)
from magvit2.modules.vqvae.lookup_free_quantize import LFQ as RefLFQ  # noqa: E402
from magvit2.modules.discriminator.model import (  # noqa: E402
    NLayerDiscriminator as RefDiscriminator)
from magvit2.modules.losses import vqperceptual as ref_losses  # noqa: E402

from tpu1x.config import VQConfig  # noqa: E402
from tpu1x.tokenizer import losses as our_losses  # noqa: E402
from tpu1x.tokenizer.checkpoint import (  # noqa: E402
    convert_discriminator_state_dict, convert_magvit2_state_dict)
from tpu1x.tokenizer.discriminator import NLayerDiscriminator  # noqa: E402
from tpu1x.tokenizer.lfq import LFQ, codebook_entry  # noqa: E402
from tpu1x.tokenizer.vqmodel import VQModel  # noqa: E402

# GroupNorm(32, ...) in the reference CNN requires channel counts >= 32.
TINY = dict(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
            z_channels=6, codebook_size=64)


def perturb_(module: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))


def make_pair(seed=0):
    ref_cfg = RefVQConfig(**TINY)
    torch.manual_seed(seed)
    ref_enc = RefEncoder(ref_cfg).eval()
    ref_dec = RefDecoder(ref_cfg).eval()
    perturb_(ref_enc, seed + 1)
    perturb_(ref_dec, seed + 2)

    sd = {f"encoder.{k}": v for k, v in ref_enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    cfg = VQConfig(resolution=16, dtype="float32", **TINY)
    params = convert_magvit2_state_dict(sd, cfg)
    return ref_enc, ref_dec, cfg, params


def bit_reverse(ids: np.ndarray, num_bits: int) -> np.ndarray:
    out = np.zeros_like(ids)
    for k in range(num_bits):
        out |= (((ids >> k) & 1) << (num_bits - 1 - k))
    return out


def test_encoder_parity():
    ref_enc, _, cfg, params = make_pair()
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref_enc(torch.from_numpy(x)).numpy()  # (B, D, h, w)

    model = VQModel(cfg)
    res = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      method=VQModel.encode)
    # compare pre-quantization latents via the quantized signs + raw z: use
    # the module-internal encoder through a direct apply
    got_z = model.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)),
                        method=lambda m, v: m.encoder(v))
    np.testing.assert_allclose(np.asarray(got_z).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)
    assert res.indices.shape == (2, 8, 8)


def test_lfq_quantize_and_bit_order():
    ref_cfg = RefVQConfig(**TINY)
    ref_lfq = RefLFQ(ref_cfg).eval()
    rng = np.random.RandomState(1)
    z = rng.randn(2, 6, 4, 4).astype(np.float32)  # ref layout (B, D, h, w)

    with torch.no_grad():
        quant_ref, _, ids_ref = ref_lfq(torch.from_numpy(z))

    our_lfq = LFQ(VQConfig(resolution=16, dtype="float32", **TINY))
    res = our_lfq(jnp.asarray(z.transpose(0, 2, 3, 1)), training=False)

    # quantized values identical (up to layout)
    np.testing.assert_array_equal(
        np.asarray(res.quantized).transpose(0, 3, 1, 2), quant_ref.numpy())
    # our ids are the dataset convention == bit-reversed reference-forward ids
    # (the reference encodes channel j at weight 2^(D-1-j),
    # lookup_free_quantize.py:152,253; the dataset/visualizer convention is
    # ascending, visualize.py:115)
    ids_ref = ids_ref.numpy().reshape(2, 4, 4)
    np.testing.assert_array_equal(np.asarray(res.indices),
                                  bit_reverse(ids_ref, 6))


def test_codebook_entry_matches_reference_decode_path():
    """our codebook_entry(ids) == get_codebook_entry(ids).flip(1) — the exact
    composition visualize.py:115 uses to decode dataset tokens."""
    ref_cfg = RefVQConfig(**TINY)
    ref_lfq = RefLFQ(ref_cfg).eval()
    ids = np.arange(64, dtype=np.int64).reshape(1, 64)

    with torch.no_grad():
        want = ref_lfq.get_codebook_entry(
            torch.from_numpy(ids), bhwc=(1, 8, 8, 6)).flip(1)  # (B, D, h, w)

    got = codebook_entry(jnp.asarray(ids.reshape(1, 8, 8)), num_bits=6)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2),
                                  want.numpy())


def test_lfq_loss_breakdown_parity():
    """Entropy (per-sample + codebook) and commit losses vs the reference's
    full-(N, 2^D)-matrix einsum math (lookup_free_quantize.py:82-118,
    262-268, 287-292)."""
    ref_cfg = RefVQConfig(**TINY)
    ref_lfq = RefLFQ(ref_cfg).train()
    rng = np.random.RandomState(2)
    z = (0.1 * rng.randn(2, 6, 4, 4)).astype(np.float32)

    (quant, entropy_aux, ids), breakdown = ref_lfq(
        torch.from_numpy(z), return_loss_breakdown=True)

    our_lfq = LFQ(VQConfig(resolution=16, dtype="float32", **TINY))
    res = our_lfq(jnp.asarray(z.transpose(0, 2, 3, 1)), training=True)

    np.testing.assert_allclose(float(res.per_sample_entropy),
                               breakdown.per_sample_entropy.item(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(res.codebook_entropy),
                               breakdown.codebook_entropy.item(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(res.entropy_loss), entropy_aux.item(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(float(res.commit_loss),
                               breakdown.commitment.item(),
                               atol=1e-5, rtol=1e-5)


def test_decoder_parity():
    _, ref_dec, cfg, params = make_pair(seed=3)
    rng = np.random.RandomState(4)
    codes = np.sign(rng.randn(2, 6, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref_dec(torch.from_numpy(codes)).numpy()

    model = VQModel(cfg)
    got = model.apply({"params": params},
                      jnp.asarray(codes.transpose(0, 2, 3, 1)),
                      method=VQModel.decode)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4, rtol=2e-3)


def test_discriminator_parity():
    torch.manual_seed(5)
    ref_d = RefDiscriminator(input_nc=3, ndf=32, n_layers=2).eval()
    perturb_(ref_d, 6)
    params, batch_stats = convert_discriminator_state_dict(
        ref_d.state_dict(), n_layers=2)

    rng = np.random.RandomState(7)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.from_numpy(x)).numpy()

    disc = NLayerDiscriminator(input_nc=3, ndf=32, n_layers=2,
                               dtype=jnp.float32)
    got = disc.apply({"params": params, "batch_stats": batch_stats},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def test_gan_loss_functions_parity():
    rng = np.random.RandomState(8)
    real = rng.randn(4, 1, 6, 6).astype(np.float32)
    fake = rng.randn(4, 1, 6, 6).astype(np.float32)
    t_real, t_fake = torch.from_numpy(real), torch.from_numpy(fake)
    j_real, j_fake = jnp.asarray(real), jnp.asarray(fake)

    np.testing.assert_allclose(
        float(our_losses.hinge_d_loss(j_real, j_fake)),
        ref_losses.hinge_d_loss(t_real, t_fake).item(), rtol=1e-5)
    np.testing.assert_allclose(
        float(our_losses.vanilla_d_loss(j_real, j_fake)),
        ref_losses.vanilla_d_loss(t_real, t_fake).item(), rtol=1e-5)
    np.testing.assert_allclose(
        float(our_losses.non_saturate_gen_loss(j_fake)),
        ref_losses.non_saturate_gen_loss(t_fake).item(), rtol=1e-5)
    # the reference's non_saturate_discriminator_loss scores its "real" term
    # on fake logits (vqperceptual.py:65, a bug we do not reproduce); passing
    # the same tensor for both makes the comparison bug-invariant
    np.testing.assert_allclose(
        float(our_losses.non_saturate_discriminator_loss(j_fake, j_fake)),
        ref_losses.non_saturate_discriminator_loss(t_fake, t_fake).item(),
        rtol=1e-5)


def test_lecam_parity():
    rng = np.random.RandomState(9)
    state = our_losses.LeCamState.init()
    ref_ema = ref_losses.LeCAM_EMA(init=0.0, decay=0.999)
    for _ in range(3):
        real = rng.randn(4, 1, 6, 6).astype(np.float32)
        fake = rng.randn(4, 1, 6, 6).astype(np.float32)
        ref_ema.update(torch.from_numpy(real), torch.from_numpy(fake))
        state = our_losses.lecam_update(state, jnp.asarray(real),
                                        jnp.asarray(fake))
        want = ref_losses.lecam_reg(torch.from_numpy(real),
                                    torch.from_numpy(fake), ref_ema).item()
        got = float(our_losses.lecam_reg(jnp.asarray(real), jnp.asarray(fake),
                                         state))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_discriminator_actnorm_parity():
    """ActNorm discriminator variant vs the ACTUAL reference
    (model.py:30-36 + util.py:10-92): initialize the torch ActNorms on a
    batch (their lazy data-dependent init), convert, compare forwards."""
    torch.manual_seed(9)
    ref_d = RefDiscriminator(input_nc=3, ndf=32, n_layers=2, use_actnorm=True)
    perturb_(ref_d, 10)

    rng = np.random.RandomState(11)
    init_x = rng.uniform(-1, 1, (4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_d.train()
        ref_d(torch.from_numpy(init_x))  # triggers ActNorm initialize()
        ref_d.eval()

    params, batch_stats = convert_discriminator_state_dict(
        ref_d.state_dict(), n_layers=2)
    assert "an_1" in params and not batch_stats

    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.from_numpy(x)).numpy()

    disc = NLayerDiscriminator(input_nc=3, ndf=32, n_layers=2,
                               use_actnorm=True, dtype=jnp.float32)
    got = disc.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def test_actnorm_data_dependent_init_matches_reference():
    """Our ActNorm's init-time loc/scale == the reference's initialize()
    buffers from the same batch (util.py:21-41)."""
    from magvit2.modules.util import ActNorm as RefActNorm

    from tpu1x.tokenizer.discriminator import ActNorm

    rng = np.random.RandomState(3)
    x = rng.normal(1.5, 2.0, (4, 8, 6, 6)).astype(np.float32)  # NCHW

    ref = RefActNorm(8)
    ref.train()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = ActNorm()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    np.testing.assert_allclose(np.asarray(params["loc"]),
                               ref.loc.detach().numpy().reshape(-1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["scale"]),
                               ref.scale.detach().numpy().reshape(-1),
                               atol=1e-5, rtol=1e-5)
    got = ours.apply({"params": params}, x_nhwc)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5, rtol=1e-4)
