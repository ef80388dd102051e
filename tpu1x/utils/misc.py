"""Misc utilities (reference: genie/utils.py, magvit2/modules/util.py).

- `convert_lightning_checkpoint`: migrate a v0.0.1 Lightning-era GENIE
  checkpoint to the portable format (reference genie/utils.py:7-20 strips the
  `model.` prefix and drops Lightning bookkeeping keys).
- `count_params` re-export.
"""

from __future__ import annotations

from typing import Any, Dict

from tpu1x.models.st_maskgit import count_params  # noqa: F401


def convert_lightning_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip the Lightning `model.` prefix and bookkeeping entries so the
    result can flow into `convert_torch_state_dict`
    (reference: genie/utils.py:7-20)."""
    out = {}
    for key, value in state_dict.items():
        if key.startswith("model."):
            out[key[len("model."):]] = value
        elif "." not in key or key.split(".")[0] in (
                "epoch", "global_step", "optimizer_states", "lr_schedulers",
                "callbacks", "loops", "state_dict"):
            continue
        else:
            out[key] = value
    return out
