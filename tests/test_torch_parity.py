"""Golden parity: JAX model + checkpoint converter vs independent numpy math.

A random reference-named (torch-layout) state dict is converted through
`convert_torch_state_dict` and run through the flax model in fp32; the same
weights drive the from-first-principles numpy forward. Exercises embedding,
pos embed, LN placement quirks, both attention patterns, muP readout, and
the (out,in)->(in,out) kernel transposes in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu1x.config import GenieConfig
from tpu1x.models.st_maskgit import STMaskGIT
from tpu1x.train.checkpoint import convert_torch_state_dict

from numpy_reference import forward_logits, random_torch_state_dict


def make_cfg(**kw):
    base = dict(num_layers=2, num_heads=2, d_model=16, T=3, S=16,
                image_vocab_size=64, num_factored_vocabs=2,
                qk_norm=False, use_mup=False, dtype="float32")
    base.update(kw)
    return GenieConfig(**base)


@pytest.mark.parametrize("qk_norm,use_mup,scan_layers,qkv_bias", [
    (False, False, True, False),   # shipped config shape
    (True, False, True, False),    # qk-norm path (identity pre-norms)
    (False, True, True, False),    # muP readout + 8/hd scale
    (False, False, False, True),   # unrolled layers + qkv bias
])
def test_forward_parity(qk_norm, use_mup, scan_layers, qkv_bias):
    cfg = make_cfg(qk_norm=qk_norm, use_mup=use_mup, scan_layers=scan_layers,
                   qkv_bias=qkv_bias,
                   mup_base_d_model=8)  # width_mult = 2 when use_mup
    sd = random_torch_state_dict(cfg, seed=3)
    params = convert_torch_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    h = w = cfg.latent_side_len
    tokens = rng.randint(0, cfg.image_vocab_size, (2, cfg.T, h, w)).astype(np.int32)
    # sprinkle mask tokens
    tokens[0, -1] = cfg.mask_token_id
    tokens[1, 1, 0, 0] = cfg.mask_token_id

    model = STMaskGIT(cfg)
    got = model.apply({"params": params}, jnp.asarray(tokens),
                      method=STMaskGIT.compute_logits)
    want = forward_logits(sd, tokens, cfg)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)
