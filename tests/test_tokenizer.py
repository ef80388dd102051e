"""Tokenizer tests: LFQ math, CNN shapes, torch micro-op parity, EMA,
checkpoint conversion, GAN losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.config import VQConfig
from tpu1x.tokenizer import losses as L
from tpu1x.tokenizer.cnn import Decoder, Encoder, depth_to_space
from tpu1x.tokenizer.discriminator import NLayerDiscriminator
from tpu1x.tokenizer.lfq import (LFQ, bits_to_indices, codebook_entry,
                                 indices_to_bits, _bernoulli_entropy_sum,
                                 _codebook_entropy_chunked)
from tpu1x.tokenizer.vqmodel import VQModel, ema_init, ema_update


def small_config(**kw):
    base = dict(resolution=32, base_channels=32, ch_mult=(1, 2), z_channels=6,
                codebook_size=64, num_res_blocks=1, dtype="float32")
    base.update(kw)
    return VQConfig(**base)


class TestLFQ:
    def test_bits_roundtrip(self):
        ids = jnp.arange(0, 2 ** 18, 12345, dtype=jnp.int32)
        bits = indices_to_bits(ids, 18)
        np.testing.assert_array_equal(np.asarray(bits_to_indices(bits)),
                                      np.asarray(ids))

    def test_codebook_entry_dataset_convention(self):
        # decoder channel k carries bit (id >> k) & 1 (reference
        # get_codebook_entry + .flip(1), visualize.py:115)
        entry = np.asarray(codebook_entry(jnp.asarray([5]), 4))[0]
        np.testing.assert_array_equal(entry, [1, -1, 1, -1])  # 5 = 0b0101

    def test_quantize_ste(self):
        cfg = small_config()
        lfq = LFQ(cfg)
        z = jnp.asarray([[0.3, -0.2, 0.1, -0.9, 0.5, 0.01]])
        res = lfq(z, training=False)
        np.testing.assert_array_equal(np.asarray(res.quantized),
                                      [[1, -1, 1, -1, 1, 1]])
        # id: ascending bits
        assert int(res.indices[0]) == 0b110101
        # STE: gradient passes through
        g = jax.grad(lambda z: lfq(z, training=False).quantized.sum())(z)
        np.testing.assert_array_equal(np.asarray(g), np.ones((1, 6)))

    def test_entropy_matches_full_codebook_math(self):
        """Factorized per-sample entropy + chunked codebook entropy must match
        the reference's full (N, 2^D) softmax computation."""
        D = 6
        rng = np.random.RandomState(0)
        z = rng.randn(5, D).astype(np.float32) * 0.5
        temp = 0.01
        # full reference math: logits = 2 z . c over all codes
        codes = np.asarray(indices_to_bits(jnp.arange(2 ** D), D)) * 2.0 - 1.0
        logits = 2 * z @ codes.T / temp
        logits -= logits.max(-1, keepdims=True)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        sample_entropy_ref = (-(probs * np.log(probs + 1e-12)).sum(-1)).mean()
        avg = probs.mean(0)
        codebook_entropy_ref = -(avg * np.log(avg + 1e-5)).sum()

        got_sample = float(_bernoulli_entropy_sum(jnp.asarray(z), temp).mean())
        got_codebook = float(_codebook_entropy_chunked(
            jnp.asarray(z), temp, D, chunk=16))
        np.testing.assert_allclose(got_sample, sample_entropy_ref, rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(got_codebook, codebook_entropy_ref,
                                   rtol=1e-3, atol=1e-4)

    def test_factorized_indices(self):
        cfg = small_config()
        lfq = LFQ(cfg)
        ids = jnp.asarray([0b110101])
        pre, post = lfq.factorized_indices(ids)
        assert int(pre[0]) == 0b101 and int(post[0]) == 0b110


class TestCNN:
    def test_depth_to_space_matches_torch_dcr(self):
        """Our NHWC depth_to_space equals the reference's CHW DCR version."""
        import torch
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 3, 3).astype(np.float32)  # NCHW, C=8, bs=2
        # reference implementation semantics (improved_model.py:185-217)
        t = torch.from_numpy(x)
        c, h, w = 8, 3, 3
        ref = t.view(-1, 2, 2, c // 4, h, w).permute(0, 3, 4, 1, 5, 2) \
            .contiguous().view(2, c // 4, h * 2, w * 2).numpy()
        got = np.asarray(depth_to_space(
            jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_encoder_decoder_shapes(self):
        cfg = small_config()
        enc, dec = Encoder(cfg), Decoder(cfg)
        x = jnp.zeros((2, 32, 32, 3))
        ep = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(ep, x)
        assert z.shape == (2, 16, 16, 6)  # one stride-2 level in (1, 2)
        dp = dec.init(jax.random.PRNGKey(1), z)
        y = dec.apply(dp, z)
        assert y.shape == (2, 32, 32, 3)

    def test_stride2_conv_matches_torch(self):
        """3x3 stride-2 conv with our explicit padding == torch p=1 floor."""
        import torch
        import flax.linen as nn
        rng = np.random.RandomState(0)
        x = rng.randn(1, 8, 8, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32)  # HWIO
        conv = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       use_bias=False)
        out = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w.transpose(3, 2, 0, 1)), stride=2, padding=1)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   t.numpy(), atol=1e-4)


class TestVQModel:
    def test_autoencode_roundtrip_shapes(self):
        cfg = small_config()
        model = VQModel(cfg)
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        recon, res = model.apply(params, x)
        assert recon.shape == x.shape
        assert res.indices.shape == (2, 16, 16)
        assert (np.asarray(res.indices) < cfg.codebook_size).all()

    def test_decode_tokens_consistency(self):
        """decode(quantize(z)) == decode_tokens(indices)."""
        cfg = small_config()
        model = VQModel(cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        recon, res = model.apply(params, x)
        recon2 = model.apply(params, res.indices,
                             method=VQModel.decode_tokens)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2),
                                   atol=1e-5)

    def test_ema(self):
        params = {"a": jnp.ones(3)}
        ema = ema_init(params)
        new = {"a": jnp.zeros(3)}
        ema = ema_update(ema, new, decay=0.9)
        np.testing.assert_allclose(np.asarray(ema["a"]), 0.9)
        # warmup decay
        ema2 = ema_update(ema_init(params), new, decay=0.999,
                          num_updates=jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(ema2["a"]), 0.1)


class TestDiscriminatorAndLosses:
    def test_discriminator_patch_output(self):
        d = NLayerDiscriminator(n_layers=2, ndf=16, dtype=jnp.float32)
        x = jnp.zeros((2, 32, 32, 3))
        variables = d.init(jax.random.PRNGKey(0), x)
        out, _ = d.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape[0] == 2 and out.shape[-1] == 1

    def test_hinge_and_lecam(self):
        real = jnp.asarray([2.0, 0.5])
        fake = jnp.asarray([-2.0, 0.5])
        assert float(L.hinge_d_loss(real, fake)) == pytest.approx(
            0.5 * (0.25 + 0.75))
        state = L.LeCamState.init()
        state = L.lecam_update(state, real, fake, decay=0.0)
        assert float(state.logits_real_ema) == pytest.approx(1.25)
        reg = L.lecam_reg(real, fake, state)
        assert float(reg) >= 0

    def test_adopt_weight(self):
        assert float(L.adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
        assert float(L.adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0


class TestCheckpointConversion:
    def test_magvit2_state_dict_conversion(self):
        """Random torch-named state dict converts and runs through the model."""
        cfg = small_config()
        rng = np.random.RandomState(0)

        def conv_w(o, i, k=3):
            return rng.randn(o, i, k, k).astype(np.float32) * 0.05

        sd = {}
        ch = cfg.base_channels
        sd["encoder.conv_in.weight"] = conv_w(ch, 3)
        chans = [ch * m for m in cfg.ch_mult]
        prev = ch
        for i, c in enumerate(chans):
            for j in range(cfg.num_res_blocks):
                pre = f"encoder.down.{i}.block.{j}"
                sd[f"{pre}.norm1.weight"] = np.ones(prev, np.float32)
                sd[f"{pre}.norm1.bias"] = np.zeros(prev, np.float32)
                sd[f"{pre}.norm2.weight"] = np.ones(c, np.float32)
                sd[f"{pre}.norm2.bias"] = np.zeros(c, np.float32)
                sd[f"{pre}.conv1.weight"] = conv_w(c, prev)
                sd[f"{pre}.conv2.weight"] = conv_w(c, c)
                if prev != c:
                    sd[f"{pre}.nin_shortcut.weight"] = conv_w(c, prev, 1)
                prev = c
            if i < len(chans) - 1:
                sd[f"encoder.down.{i}.downsample.weight"] = conv_w(c, c)
                sd[f"encoder.down.{i}.downsample.bias"] = np.zeros(c, np.float32)
        for j in range(cfg.num_res_blocks):
            pre = f"encoder.mid_block.{j}"
            sd[f"{pre}.norm1.weight"] = np.ones(prev, np.float32)
            sd[f"{pre}.norm1.bias"] = np.zeros(prev, np.float32)
            sd[f"{pre}.norm2.weight"] = np.ones(prev, np.float32)
            sd[f"{pre}.norm2.bias"] = np.zeros(prev, np.float32)
            sd[f"{pre}.conv1.weight"] = conv_w(prev, prev)
            sd[f"{pre}.conv2.weight"] = conv_w(prev, prev)
        sd["encoder.norm_out.weight"] = np.ones(prev, np.float32)
        sd["encoder.norm_out.bias"] = np.zeros(prev, np.float32)
        sd["encoder.conv_out.weight"] = conv_w(cfg.z_channels, prev, 1)
        sd["encoder.conv_out.bias"] = np.zeros(cfg.z_channels, np.float32)

        # decoder
        top = chans[-1]
        sd["decoder.conv_in.weight"] = conv_w(top, cfg.z_channels)
        sd["decoder.conv_in.bias"] = np.zeros(top, np.float32)
        prev = top
        for j in range(cfg.num_res_blocks):
            pre = f"decoder.mid_block.{j}"
            sd[f"{pre}.norm1.weight"] = np.ones(prev, np.float32)
            sd[f"{pre}.norm1.bias"] = np.zeros(prev, np.float32)
            sd[f"{pre}.norm2.weight"] = np.ones(prev, np.float32)
            sd[f"{pre}.norm2.bias"] = np.zeros(prev, np.float32)
            sd[f"{pre}.conv1.weight"] = conv_w(prev, prev)
            sd[f"{pre}.conv2.weight"] = conv_w(prev, prev)
        for i in reversed(range(len(chans))):
            c = chans[i]
            for j in range(cfg.num_res_blocks):
                pre = f"decoder.up.{i}.block.{j}"
                sd[f"{pre}.norm1.weight"] = np.ones(prev, np.float32)
                sd[f"{pre}.norm1.bias"] = np.zeros(prev, np.float32)
                sd[f"{pre}.norm2.weight"] = np.ones(c, np.float32)
                sd[f"{pre}.norm2.bias"] = np.zeros(c, np.float32)
                sd[f"{pre}.conv1.weight"] = conv_w(c, prev)
                sd[f"{pre}.conv2.weight"] = conv_w(c, c)
                if prev != c:
                    sd[f"{pre}.nin_shortcut.weight"] = conv_w(c, prev, 1)
                prev = c
            if i > 0:
                sd[f"decoder.up.{i}.upsample.conv1.weight"] = conv_w(prev * 4, prev)
                sd[f"decoder.up.{i}.upsample.conv1.bias"] = np.zeros(prev * 4,
                                                                     np.float32)
        sd["decoder.norm_out.weight"] = np.ones(prev, np.float32)
        sd["decoder.norm_out.bias"] = np.zeros(prev, np.float32)
        sd["decoder.conv_out.weight"] = conv_w(3, prev)
        sd["decoder.conv_out.bias"] = np.zeros(3, np.float32)

        from tpu1x.tokenizer.checkpoint import convert_magvit2_state_dict
        params = convert_magvit2_state_dict(sd, cfg)
        model = VQModel(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        recon, res = model.apply({"params": params}, x)
        assert recon.shape == x.shape
        assert np.isfinite(np.asarray(recon)).all()
