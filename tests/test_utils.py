"""Utils tests: Lightning migration, FLOPs accounting, Stopwatch."""

import numpy as np

from tpu1x.utils.misc import convert_lightning_checkpoint
from tpu1x.utils.profiling import (Stopwatch, generation_flops,
                                   training_flops)


def test_convert_lightning_checkpoint():
    sd = {
        "model.pos_embed_TSC": np.zeros(2),
        "model.decoder.layers.0.mlp.fc1.weight": np.ones(3),
        "epoch": 5,
        "global_step": 100,
        "optimizer_states": [1, 2],
    }
    out = convert_lightning_checkpoint(sd)
    assert set(out) == {"pos_embed_TSC", "decoder.layers.0.mlp.fc1.weight"}


def test_flops_accounting():
    # 6*N*D (reference train.py:543-544)
    assert training_flops(10, 20) == 1200
    assert generation_flops(10, 2, 100, 8, 2) == 2 * 10 * 2 * 100 * 8 * 2


def test_stopwatch():
    import jax.numpy as jnp

    def f(x):
        return x + 1

    t = Stopwatch(f)(jnp.ones(4), warmup=1, iters=2)
    assert t >= 0
