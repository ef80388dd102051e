"""Tokenizer LR scheduler tests (reference: magvit2 lr_scheduler.py)."""

import numpy as np

from tpu1x.tokenizer.schedulers import linear_warmup, linear_warmup_cosine_decay


def test_linear_warmup():
    s = linear_warmup(10)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(100)), 1.0)


def test_linear_warmup_cosine_decay():
    s = linear_warmup_cosine_decay(10, 110, multiplier_min=0.1)
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
    # midpoint of cosine: (1 + 0.1)/2
    np.testing.assert_allclose(float(s(60)), 0.55, rtol=1e-5)
    np.testing.assert_allclose(float(s(110)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(s(500)), 0.1, rtol=1e-5)
