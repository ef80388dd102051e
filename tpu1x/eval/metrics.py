"""Evaluation metrics: running means and the challenge CE loss.

Behavioral contract matches the reference `eval_utils.py`:
- AvgMetric (ref: 10-25).
- compute_loss: the compression-challenge metric — CE over the two factored
  512-way vocabularies, summed over the vocab axis, mean over everything
  else; logits layout (B, V, F, T-1, H, W) (ref: 44-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu1x.models.factorization import factorize_labels


class AvgMetric:
    """Running sum/count mean (reference: eval_utils.py:10-25)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, val, batch_size: int = 1):
        self.total += float(val) * batch_size
        self.count += batch_size

    def update_list(self, flat_vals):
        self.total += float(np.sum(flat_vals))
        self.count += len(flat_vals)

    def mean(self) -> float:
        return self.total / self.count


def compute_loss(labels_flat, factored_logits, num_factored_vocabs: int = 2,
                 factored_vocab_size: int = 512) -> float:
    """Challenge CE (reference: eval_utils.py:44-77).

    Args:
        labels_flat: (B, T*H*W) int token ids (frame 0 included, dropped here).
        factored_logits: (B, V, F, T-1, H, W) float32.
    """
    labels_flat = jnp.asarray(labels_flat)
    factored_logits = jnp.asarray(factored_logits)
    B, V, F, Tm1, H, W = factored_logits.shape
    assert V == factored_vocab_size and F == num_factored_vocabs
    T = Tm1 + 1
    assert T * H * W == labels_flat.shape[1], \
        "factored_logits do not match flattened latent image size"

    labels_THW = labels_flat.reshape(B, T, H, W)[:, 1:]
    factored_labels = factorize_labels(labels_THW, F, V)  # (B, F, T-1, H, W)

    logp = jax.nn.log_softmax(factored_logits, axis=1)
    token_logp = jnp.take_along_axis(logp, factored_labels[:, None], axis=1)[:, 0]
    return float(-token_logp.sum(axis=1).mean())  # sum over F, mean elsewhere


def token_accuracy(ground_truth_BTHW, samples_BTHW) -> float:
    """Exact-token accuracy of predicted frames 1.. vs ground truth
    (reference: evaluate.py:179)."""
    gt = jnp.asarray(ground_truth_BTHW)[:, 1:]
    return float((gt == jnp.asarray(samples_BTHW)).mean())


def make_lpips_fn(lpips_ckpt=None, net: str = "alex", batch_size: int = 32):
    """Build the frame-wise LPIPS metric (reference: eval_utils.py:80-88;
    the evaluator uses the AlexNet trunk, evaluate.py:154).

    Args:
        lpips_ckpt: torch state dict file (`.pth`/`.pt`, the lpips package's
            weights or a torchvision backbone — for net="vgg" the learned
            lin heads are vendored in-package from the reference's
            `vgg.pth`), a flax msgpack, or the explicit string "random" for
            smoke-test weights (meaningless scores, loud warning). None
            raises unless the vendored weights fully cover the net.
        net: "alex" | "vgg".

    Returns fn(frames_a, frames_b) -> np.ndarray of per-frame distances;
    frames are uint8 NHWC, any leading batch/time dims.
    """
    from tpu1x.tokenizer.lpips import LPIPS, resolve_lpips_params

    model = LPIPS(net=net)
    params = resolve_lpips_params(model, lpips_ckpt, net)

    @jax.jit
    def dist(x, y):
        return model.apply({"params": params}, x, y)

    def fn(frames_a, frames_b) -> np.ndarray:
        a = np.asarray(frames_a)
        b = np.asarray(frames_b)
        assert a.shape == b.shape and a.shape[-1] == 3, (a.shape, b.shape)
        H, W = a.shape[-3:-1]
        a = a.reshape(-1, H, W, 3).astype(np.float32) / 127.5 - 1.0
        b = b.reshape(-1, H, W, 3).astype(np.float32) / 127.5 - 1.0
        out = []
        for lo in range(0, len(a), batch_size):
            xa, xb = a[lo:lo + batch_size], b[lo:lo + batch_size]
            pad = batch_size - len(xa)
            if pad:
                xa = np.concatenate([xa, np.repeat(xa[-1:], pad, 0)])
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            d = np.asarray(dist(jnp.asarray(xa), jnp.asarray(xb))).reshape(-1)
            out.append(d[:len(a[lo:lo + batch_size])])
        return np.concatenate(out)

    return fn
