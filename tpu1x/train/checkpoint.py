"""Checkpointing: Orbax full-training-state + portable HF-style params.

Dual-format, matching the reference's strategy (SURVEY.md §5.4,
train.py:233-244):
- `save_pretrained` / `load_pretrained`: config.json + params in a single
  msgpack file (`flax.serialization`) — the portable model-only format
  (the reference uses HF safetensors via PyTorchModelHubMixin).
- `Checkpointer`: Orbax async-capable full training state
  (params + optimizer + step + rng) for exact resume
  (the reference uses accelerate save_state/load_state, train.py:565-604).

Also provides the torch->JAX parameter converter for reference STMaskGIT
checkpoints (st_mask_git.py naming), so published GENIE weights can be
loaded once available.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from tpu1x.config import GenieConfig


# ---------------------------------------------------------------------------
# portable model-only format
# ---------------------------------------------------------------------------

def save_pretrained(save_dir, params: Any, config: GenieConfig) -> None:
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    config.save_pretrained(save_dir / "config.json")
    with open(save_dir / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_pretrained(save_dir, target_params: Optional[Any] = None
                    ) -> tuple[Any, GenieConfig]:
    save_dir = Path(save_dir)
    config = GenieConfig.from_pretrained(save_dir / "config.json")
    with open(save_dir / "params.msgpack", "rb") as f:
        data = f.read()
    if target_params is not None:
        params = flax.serialization.from_bytes(target_params, data)
    else:
        params = flax.serialization.msgpack_restore(data)
    return params, config


# ---------------------------------------------------------------------------
# full training state (Orbax)
# ---------------------------------------------------------------------------

class Checkpointer:
    """Orbax-backed training checkpoints under `{output_dir}/step_{N}`.

    Scale-correct by construction: `save` hands Orbax the *sharded*
    jax.Arrays directly (each host writes only its own shards — no
    full-state host gather), and the save is asynchronous: it returns as
    soon as device buffers are snapshotted, with the serialization running
    in the background. The next `save`/`close` waits for any in-flight
    write first, so at most one step of training overlaps IO.

    Restore takes target *shardings*, not values: arrays are materialized
    directly into their mesh placement (no restore-then-reshard double
    allocation).
    """

    def __init__(self, output_dir):
        self.output_dir = Path(output_dir).resolve()
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()  # AsyncCheckpointer subclass

    def save(self, state: Any, name: str, wait: bool = False) -> Path:
        path = self.output_dir / name
        self._ckpt.wait_until_finished()  # previous async save, if any
        self._ckpt.save(path, state, force=True)
        if wait:
            self._ckpt.wait_until_finished()
        return path

    def restore(self, name: str, target: Any) -> Any:
        """`target`: a pytree of jax.Arrays (or ShapeDtypeStructs) whose
        shapes/dtypes/shardings the restored arrays should take."""
        path = self.output_dir / name

        def as_abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x

        abstract = jax.tree_util.tree_map(as_abstract, target)
        return self._ckpt.restore(path, abstract)

    def wait_until_finished(self) -> None:
        self._ckpt.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = []
        for p in self.output_dir.glob("step_*"):
            try:
                steps.append(int(p.name.split("_")[1]))
            except (IndexError, ValueError):
                continue
        return max(steps) if steps else None


# ---------------------------------------------------------------------------
# torch reference checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             config: GenieConfig) -> Any:
    """Map a reference STMaskGIT torch state dict to our flax param tree.

    Reference naming (genie/st_mask_git.py, st_transformer.py, attention.py):
        pos_embed_TSC                                   (1, T, S, C)
        token_embed.factored_embeds.{k}.weight          (V, C)
        token_embed.mask_token_embed                    (1, C)
        decoder.layers.{i}.{spatial,temporal}_attn.qkv.weight   (3C, C)
        decoder.layers.{i}.{spatial,temporal}_attn.proj.weight  (C, C)
        decoder.layers.{i}.{spatial,temporal}_attn.norm.{weight,bias}  (hd,)
        decoder.layers.{i}.norm{1,2}.{weight,bias}      (C,)
        decoder.layers.{i}.mlp.fc{1,2}.weight           (out, in)
        out_x_proj.{weight,bias}                        (2V, C) / (2V,)

    torch Linear stores (out, in); flax Dense kernels are (in, out) -> transpose.
    Values may be torch tensors or numpy arrays.
    """
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # MUST copy: .numpy() views torch storage, and jnp.asarray on CPU can
        # alias numpy memory zero-copy — without the copy, a later in-place
        # torch mutation (e.g. optimizer.step) silently mutates the
        # "converted" jax params too.
        return np.array(v, copy=True)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    L = config.num_layers
    p: Dict[str, Any] = {}

    p["pos_embed_TSC"] = sd["pos_embed_TSC"]
    te: Dict[str, Any] = {"mask_token_embed": sd["token_embed.mask_token_embed"][0]}
    for k in range(config.num_factored_vocabs):
        te[f"factored_embeds_{k}"] = {
            "embedding": sd[f"token_embed.factored_embeds.{k}.weight"]}
    p["token_embed"] = te
    p["out_x_proj"] = {"kernel": sd["out_x_proj.weight"].T,
                       "bias": sd["out_x_proj.bias"]}

    def attn_params(prefix: str) -> Dict[str, Any]:
        out: Dict[str, Any] = {
            "qkv": {"kernel": sd[f"{prefix}.qkv.weight"].T},
            "proj": {"kernel": sd[f"{prefix}.proj.weight"].T,
                     "bias": sd[f"{prefix}.proj.bias"]},
        }
        if f"{prefix}.qkv.bias" in sd:
            out["qkv"]["bias"] = sd[f"{prefix}.qkv.bias"]
        if f"{prefix}.norm.weight" in sd:
            out["norm"] = {"scale": sd[f"{prefix}.norm.weight"],
                           "bias": sd[f"{prefix}.norm.bias"]}
        return out

    def layer_params(i: int) -> Dict[str, Any]:
        pre = f"decoder.layers.{i}"
        out: Dict[str, Any] = {
            "spatial_attn": attn_params(f"{pre}.spatial_attn"),
            "temporal_attn": attn_params(f"{pre}.temporal_attn"),
            "mlp": {
                "fc1": {"kernel": sd[f"{pre}.mlp.fc1.weight"].T,
                        "bias": sd[f"{pre}.mlp.fc1.bias"]},
                "fc2": {"kernel": sd[f"{pre}.mlp.fc2.weight"].T,
                        "bias": sd[f"{pre}.mlp.fc2.bias"]},
            },
        }
        for norm in ("norm1", "norm2"):
            if f"{pre}.{norm}.weight" in sd:
                out[norm] = {"scale": sd[f"{pre}.{norm}.weight"],
                             "bias": sd[f"{pre}.{norm}.bias"]}
        return out

    layers = [layer_params(i) for i in range(L)]
    if config.scan_layers:
        # stack along the scan axis
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)
        p["decoder"] = {"layers": stacked}
    else:
        p["decoder"] = {f"layers_{i}": lp for i, lp in enumerate(layers)}

    return jax.tree_util.tree_map(jnp.asarray, p)


def convert_to_torch_state_dict(params: Any, config: GenieConfig
                                ) -> Dict[str, np.ndarray]:
    """Inverse of `convert_torch_state_dict`: flax param tree -> reference-
    named torch-layout state dict (st_mask_git.py naming, Linear weights
    transposed back to (out, in)) so reference tooling
    (`STMaskGIT.from_pretrained`, st_mask_git.py:306-313) can load
    tpu1x-trained models. Round-trip tested in tests/test_checkpoint.py."""
    p = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)),
                               params)
    L = config.num_layers
    sd: Dict[str, np.ndarray] = {}

    sd["pos_embed_TSC"] = p["pos_embed_TSC"]
    sd["token_embed.mask_token_embed"] = \
        p["token_embed"]["mask_token_embed"][None]
    for k in range(config.num_factored_vocabs):
        sd[f"token_embed.factored_embeds.{k}.weight"] = \
            p["token_embed"][f"factored_embeds_{k}"]["embedding"]
    sd["out_x_proj.weight"] = p["out_x_proj"]["kernel"].T
    sd["out_x_proj.bias"] = p["out_x_proj"]["bias"]

    def layer_of(i: int) -> Dict[str, Any]:
        if config.scan_layers:
            return jax.tree_util.tree_map(lambda a: a[i],
                                          p["decoder"]["layers"])
        return p["decoder"][f"layers_{i}"]

    for i in range(L):
        lp = layer_of(i)
        pre = f"decoder.layers.{i}"
        for name in ("spatial_attn", "temporal_attn"):
            ap = lp[name]
            sd[f"{pre}.{name}.qkv.weight"] = ap["qkv"]["kernel"].T
            if "bias" in ap["qkv"]:
                sd[f"{pre}.{name}.qkv.bias"] = ap["qkv"]["bias"]
            sd[f"{pre}.{name}.proj.weight"] = ap["proj"]["kernel"].T
            sd[f"{pre}.{name}.proj.bias"] = ap["proj"]["bias"]
            if "norm" in ap:
                sd[f"{pre}.{name}.norm.weight"] = ap["norm"]["scale"]
                sd[f"{pre}.{name}.norm.bias"] = ap["norm"]["bias"]
        for norm in ("norm1", "norm2"):
            if norm in lp:
                sd[f"{pre}.{norm}.weight"] = lp[norm]["scale"]
                sd[f"{pre}.{norm}.bias"] = lp[norm]["bias"]
        sd[f"{pre}.mlp.fc1.weight"] = lp["mlp"]["fc1"]["kernel"].T
        sd[f"{pre}.mlp.fc1.bias"] = lp["mlp"]["fc1"]["bias"]
        sd[f"{pre}.mlp.fc2.weight"] = lp["mlp"]["fc2"]["kernel"].T
        sd[f"{pre}.mlp.fc2.bias"] = lp["mlp"]["fc2"]["bias"]

    # reference ecosystem loads fp32; cast any bf16 leaves
    return {k: np.ascontiguousarray(v, dtype=np.float32)
            if v.dtype != np.float32 else np.ascontiguousarray(v)
            for k, v in sd.items()}


def save_pretrained_torch(save_dir, params: Any, config: GenieConfig) -> None:
    """Write `model.safetensors` + `config.json` in the reference layout
    (PyTorchModelHubMixin contract, st_mask_git.py:29,306-313): a tpu1x-
    trained model becomes loadable by the reference's
    `STMaskGIT.from_pretrained(dir)`."""
    from safetensors.numpy import save_file
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    config.save_pretrained(save_dir / "config.json")
    sd = convert_to_torch_state_dict(params, config)
    save_file(sd, str(save_dir / "model.safetensors"))


def load_torch_checkpoint(path, config: GenieConfig) -> Any:
    """Load a reference checkpoint file (.safetensors or torch .bin/.pt)."""
    path = Path(path)
    if path.is_dir():
        for cand in ("model.safetensors", "pytorch_model.bin"):
            if (path / cand).exists():
                path = path / cand
                break
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        sd = load_file(str(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(sd, config)
