"""Parameter/activation sharding rules for the ST-MaskGIT model.

Tensor-parallel layout (Megatron-style, expressed declaratively — XLA's SPMD
partitioner inserts the collectives):

- attention qkv kernel (.., d_model, 3*d_model): column-parallel -> heads
  split over "model"; proj kernel (.., d_model, d_model): row-parallel ->
  psum after.
- MLP fc1 column-parallel, fc2 row-parallel.
- Embeddings / positional embeddings / output head: replicated (V=2x512 and
  d_model=256 are small; replication avoids gather on the loss path).
- With fsdp=True, the *remaining* (non-TP) dimension of every large kernel is
  additionally sharded over "data" (ZeRO-3 analogue); XLA all-gathers
  just-in-time per layer under lax.scan.

With scan-over-layers, decoder params carry a leading stacked-layer axis,
which is never sharded.

The reference has only DDP (SURVEY.md §2c); TP/FSDP here are the "optional
future mesh axes" the survey calls for, designed in from the start.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu1x.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec builder) — spec is for the *trailing* dims of the kernel;
# a leading scan-stacked layer axis is handled automatically.
_RULES = [
    # column-parallel: output dim over model
    (r"(spatial_attn|temporal_attn)/qkv/kernel$", ("fsdp", MODEL_AXIS)),
    (r"(spatial_attn|temporal_attn)/qkv/bias$", (MODEL_AXIS,)),
    (r"mlp/fc1/kernel$", ("fsdp", MODEL_AXIS)),
    (r"mlp/fc1/bias$", (MODEL_AXIS,)),
    # row-parallel: input dim over model
    (r"(spatial_attn|temporal_attn)/proj/kernel$", (MODEL_AXIS, "fsdp")),
    (r"mlp/fc2/kernel$", (MODEL_AXIS, "fsdp")),
    # everything else replicated (embeddings, norms, pos embed, out head, biases)
]


def _spec_for(path: str, ndim: int, n_trailing: int, fsdp: bool) -> P:
    for pattern, trailing in _RULES:
        if re.search(pattern, path):
            dims = tuple(
                (DATA_AXIS if fsdp else None) if d == "fsdp" else d
                for d in trailing
            )
            lead = (None,) * (ndim - len(dims))
            return P(*(lead + dims))
    return P(*((None,) * ndim))


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """NamedSharding pytree matching `params` (works on shapes or arrays)."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        ndim = len(leaf.shape)
        spec = _spec_for(path_str, ndim, 2, fsdp)
        # Drop axes that don't divide the dim evenly (tiny dims, odd heads).
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        cleaned = []
        for i, axis in enumerate(spec):
            if axis is None:
                cleaned.append(None)
                continue
            ax_size = sizes[axis] if isinstance(axis, str) else 1
            if leaf.shape[i] % max(ax_size, 1) != 0:
                cleaned.append(None)
            else:
                cleaned.append(axis)
        return NamedSharding(mesh, P(*cleaned))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Place a params pytree onto the mesh with TP(/FSDP) shardings."""
    shardings = param_shardings(params, mesh, fsdp=fsdp)
    return jax.device_put(params, shardings)
