"""Tokenizer checkpoint IO + reference MAGVIT2 checkpoint conversion.

- save_tokenizer / load_tokenizer: VQConfig json + params msgpack (same
  portable format as the world model).
- convert_magvit2_state_dict: maps the reference's Lightning checkpoint
  naming (magvit2/models/lfqgan.py; `init_from_ckpt` at 85-119, EMA-aware)
  to our flax tree. torch convs are OIHW -> flax HWIO; GroupNorm
  weight/bias -> scale/bias.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from tpu1x.config import VQConfig


def save_tokenizer(save_dir, params: Any, config: VQConfig) -> None:
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    config.save_pretrained(save_dir / "vq_config.json")
    with open(save_dir / "tokenizer.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_tokenizer(save_dir, target_params: Optional[Any] = None
                   ) -> Tuple[Any, VQConfig]:
    save_dir = Path(save_dir)
    if save_dir.is_file() and save_dir.suffix == ".ckpt":
        # reference Lightning checkpoint
        config = VQConfig()
        return load_magvit2_checkpoint(save_dir, config), config
    config = VQConfig.from_pretrained(save_dir / "vq_config.json")
    with open(save_dir / "tokenizer.msgpack", "rb") as f:
        data = f.read()
    if target_params is not None:
        return flax.serialization.from_bytes(target_params, data), config
    return flax.serialization.msgpack_restore(data), config


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resblock(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def convert_magvit2_state_dict(state_dict, config: VQConfig) -> Any:
    """Reference VQModel state dict -> flax params for our VQModel."""
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    num_levels = len(config.ch_mult)
    n_res = config.num_res_blocks

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in"),
                           "norm_out": _norm(sd, "encoder.norm_out"),
                           "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(num_levels):
        for j in range(n_res):
            enc[f"down_{i}_block_{j}"] = _resblock(
                sd, f"encoder.down.{i}.block.{j}")
        if i < num_levels - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down.{i}.downsample")
    for j in range(n_res):
        enc[f"mid_block_{j}"] = _resblock(sd, f"encoder.mid_block.{j}")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in"),
                           "norm_out": _norm(sd, "decoder.norm_out"),
                           "conv_out": _conv(sd, "decoder.conv_out")}
    for j in range(n_res):
        dec[f"mid_block_{j}"] = _resblock(sd, f"decoder.mid_block.{j}")
    for i in range(num_levels):
        for j in range(n_res):
            dec[f"up_{i}_block_{j}"] = _resblock(sd, f"decoder.up.{i}.block.{j}")
        if i > 0:
            dec[f"up_{i}_upsample_conv"] = _conv(
                sd, f"decoder.up.{i}.upsample.conv1")

    params = {"encoder": enc, "decoder": dec}
    return jax.tree_util.tree_map(jnp.asarray, params)


def convert_discriminator_state_dict(state_dict, n_layers: int = 3
                                     ) -> Tuple[Any, Any]:
    """Reference NLayerDiscriminator (nn.Sequential `main.{idx}` naming,
    magvit2/modules/discriminator/model.py:17-67) -> (params, batch_stats)
    for our flax NLayerDiscriminator.

    Sequential layout for n_layers=N: idx 0 = first conv, then N (conv, norm,
    lrelu) triples starting at idx 2 with stride 2 (last one stride 1), then
    the 1-channel output conv. BatchNorm running stats map to flax
    batch_stats.
    """
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    sd = {k[len("discriminator."):] if k.startswith("discriminator.") else k: v
          for k, v in sd.items()}

    params: Dict[str, Any] = {"conv_0": _conv(sd, "main.0")}
    stats: Dict[str, Any] = {}
    for n in range(1, n_layers + 1):
        idx = 3 * n - 1  # conv at 2, 5, 8, ...
        params[f"conv_{n}"] = _conv(sd, f"main.{idx}")
        if f"main.{idx + 1}.loc" in sd:  # ActNorm (util.py:10-92): (1,C,1,1)
            params[f"an_{n}"] = {"loc": sd[f"main.{idx + 1}.loc"].reshape(-1),
                                 "scale":
                                     sd[f"main.{idx + 1}.scale"].reshape(-1)}
        else:
            params[f"bn_{n}"] = {"scale": sd[f"main.{idx + 1}.weight"],
                                 "bias": sd[f"main.{idx + 1}.bias"]}
            stats[f"bn_{n}"] = {"mean": sd[f"main.{idx + 1}.running_mean"],
                                "var": sd[f"main.{idx + 1}.running_var"]}
    params["conv_out"] = _conv(sd, f"main.{3 * n_layers + 2}")
    as_jnp = partial(jax.tree_util.tree_map, jnp.asarray)
    return as_jnp(params), as_jnp(stats)


def load_magvit2_checkpoint(path, config: VQConfig, use_ema: bool = True) -> Any:
    """Load the reference `magvit2.ckpt` (Lightning format).

    Prefers EMA weights when present (the reference evaluates under
    `ema_scope`, lfqgan.py:63-76); EMA keys are `model_ema.<flat_name>`
    where flat_name is the param name with dots removed (LitEma naming,
    ema.py:20-24).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v for k, v in sd.items()}

    if use_ema and any(k.startswith("model_ema.") for k in sd):
        ema = {}
        plain_keys = [k for k in sd if not k.startswith("model_ema.")
                      and not k.startswith(("loss.", "lpips."))]
        for k in plain_keys:
            flat = k.replace(".", "")
            ema_key = f"model_ema.{flat}"
            ema[k] = sd.get(ema_key, sd[k])
        sd = ema

    return convert_magvit2_state_dict(sd, config)
