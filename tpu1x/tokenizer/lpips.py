"""LPIPS perceptual distance (VGG16 features + learned 1x1 heads), in flax.

Behavioral contract matches the reference's vendored LPIPS
(`magvit2/modules/losses/lpips.py:1-124`):
- Input scaling layer with the fixed shift/scale constants.
- VGG16 feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
- Unit-normalize each feature map over channels, squared difference,
  learned 1x1 "lin" heads (non-negative weights), spatial mean, sum over taps.

The reference auto-downloads `vgg.pth` (magvit2/util.py:7-46); this
environment has no egress, so weights must be supplied as a converted
checkpoint via `load_lpips_params` (torch state dict -> flax pytree
converter included). With `params=None` the module runs with random VGG
weights — useful only as a smoke test, and flagged loudly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (channels, convs per stage)
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# Fixed input normalization constants (reference ScalingLayer, lpips.py:56-63)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the 5 LPIPS feature taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            taps.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class AlexNetFeatures(nn.Module):
    """AlexNet trunk emitting the 5 LPIPS taps (the reference evaluator uses
    `lpips.LPIPS(net="alex")`, evaluate.py:154)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance. Inputs NHWC in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32
    net: str = "vgg"  # "vgg" (tokenizer loss) | "alex" (eval, fastest)

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale

        if self.net == "alex":
            trunk = AlexNetFeatures(dtype=self.dtype, name="alex")
        else:
            trunk = VGG16Features(dtype=self.dtype, name="vgg")
        feats_x = trunk(x)
        feats_y = trunk(y)

        total = 0.0
        for i, (fx, fy) in enumerate(zip(feats_x, feats_y)):
            fx = fx / (jnp.linalg.norm(fx, axis=-1, keepdims=True) + 1e-10)
            fy = fy / (jnp.linalg.norm(fy, axis=-1, keepdims=True) + 1e-10)
            diff = (fx - fy) ** 2
            # learned non-negative 1x1 head (NetLinLayer, lpips.py:66-76)
            w = self.param(f"lin_{i}", nn.initializers.ones,
                           (diff.shape[-1],), jnp.float32)
            contrib = (diff * jnp.abs(w)).sum(-1, keepdims=True)
            total = total + contrib.mean(axis=(1, 2, 3))
        return total  # (B,)


def load_vendored_vgg_lin_params() -> dict:
    """The LEARNED part of VGG-LPIPS: the five 1x1 head weights, converted
    from the reference's vendored checkpoint
    (`magvit2/modules/autoencoder/lpips/vgg.pth`, loaded by the reference at
    `magvit2/modules/losses/lpips.py:28-43`) and shipped in-package as
    `weights/lpips_vgg_lin.npz`. Only the VGG16 BACKBONE (torchvision
    pretrained — not redistributable here) still needs external supply."""
    import os
    path = os.path.join(os.path.dirname(__file__), "weights",
                        "lpips_vgg_lin.npz")
    with np.load(path) as z:
        return {f"lin_{i}": jnp.asarray(z[f"lin_{i}"]) for i in range(5)}


def resolve_lpips_params(model: "LPIPS", lpips_ckpt, net: str):
    """Resolve LPIPS params for `make_lpips_fn`/`build_lpips_apply`.

    - `"random"`: fully random weights (smoke tests only) — loud warning.
    - a `.msgpack`/torch path: converted; for net="vgg", missing lin heads
      are filled from the vendored reference weights (so passing a plain
      torchvision VGG16 `features` state dict yields REAL LPIPS), and a
      missing backbone is an error.
    - `None` (default): net="vgg" loads the vendored lin heads but has no
      backbone -> RuntimeError telling the user what to supply; net="alex"
      has no vendored weights -> RuntimeError. Falling back to random
      silently produced meaningless scores, so it is now an explicit opt-in.
    """
    import warnings

    def random_params():
        warnings.warn(
            "LPIPS running with RANDOMLY INITIALIZED weights — scores are "
            "meaningless outside smoke tests.", stacklevel=3)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]

    if lpips_ckpt == "random":
        return random_params()

    trunk_key = "vgg" if net == "vgg" else "alex"
    params = None
    if lpips_ckpt is not None:
        lpips_ckpt = str(lpips_ckpt)
        if lpips_ckpt.endswith(".msgpack"):
            import flax.serialization
            with open(lpips_ckpt, "rb") as f:
                params = flax.serialization.msgpack_restore(f.read())
        else:
            import torch
            sd = torch.load(lpips_ckpt, map_location="cpu", weights_only=True)
            convert = load_lpips_alex_params if net == "alex" else load_lpips_params
            params = convert(sd)
    if net == "vgg":
        if params is None:
            params = {trunk_key: {}}
        # fill missing lin heads from the vendored reference weights
        vendored = load_vendored_vgg_lin_params()
        for k, v in vendored.items():
            params.setdefault(k, v)
    if params is None or not params.get(trunk_key):
        raise RuntimeError(
            f"LPIPS ({net}) has no {trunk_key.upper()} backbone weights. "
            "Supply --lpips_ckpt with a full LPIPS checkpoint or a "
            "torchvision backbone state dict (the learned VGG lin heads "
            "are vendored in-package), or pass 'random' to explicitly run "
            "a smoke test with meaningless scores.")
    return params


def load_lpips_alex_params(torch_state_dict) -> Any:
    """Convert the lpips package's AlexNet checkpoint to our pytree.

    Expected keys: `net.slice{1-5}.{idx}.weight/bias` (torchvision AlexNet
    features indices 0,3,6,8,10) and `lin{0-4}.model.1.weight`.
    """
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    sd = {k: to_np(v) for k, v in torch_state_dict.items()}
    tv_idx = [0, 3, 6, 8, 10]
    alex_params = {}
    for i, idx in enumerate(tv_idx):
        for k in list(sd):
            if k.endswith(f".{idx}.weight") and "lin" not in k:
                alex_params[f"conv{i + 1}"] = {
                    "kernel": sd[k].transpose(2, 3, 1, 0),
                    "bias": sd[k.replace("weight", "bias")],
                }
                break
    params = {"alex": alex_params}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                params[f"lin_{i}"] = sd[key].reshape(-1)
                break
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_lpips_params(torch_state_dict) -> Any:
    """Convert the reference's `vgg.pth` LPIPS state dict to our pytree.

    Expected torch keys: `net.slice{1-5}.{idx}.weight/bias` (VGG convs, OIHW)
    and `lin{0-4}.model.1.weight` (1x1 heads, (1, C, 1, 1)).
    Also accepts torchvision-style `features.{idx}.weight`.
    """
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    sd = {k: to_np(v) for k, v in torch_state_dict.items()}
    # map flat torchvision feature indices to (stage, conv-in-stage)
    conv_names = []
    for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
        for i in range(n_convs):
            conv_names.append(f"conv{stage + 1}_{i + 1}")

    vgg_params = {}
    conv_i = 0
    # torchvision VGG16 features indices of convs
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for name, idx in zip(conv_names, tv_conv_idx):
        for src in (f"features.{idx}", f"net.features.{idx}"):
            if f"{src}.weight" in sd:
                w = sd[f"{src}.weight"]  # (O, I, kh, kw)
                vgg_params[name] = {
                    "kernel": w.transpose(2, 3, 1, 0),  # HWIO
                    "bias": sd[f"{src}.bias"],
                }
                break
        else:
            # lpips-package layout: net.sliceN.M.weight with global M
            for k in sd:
                if k.endswith(f".{idx}.weight") and ("slice" in k or "net" in k):
                    w = sd[k]
                    vgg_params[name] = {
                        "kernel": w.transpose(2, 3, 1, 0),
                        "bias": sd[k.replace("weight", "bias")],
                    }
                    break
        conv_i += 1

    params = {"vgg": vgg_params}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                params[f"lin_{i}"] = sd[key].reshape(-1)
                break
    return jax.tree_util.tree_map(jnp.asarray, params)
