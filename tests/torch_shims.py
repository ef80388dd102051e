"""Import shims that make the *actual* reference implementation runnable on CPU.

The reference (/root/reference) imports CUDA-only or absent packages at module
scope — `xformers` (genie/attention.py:3), `mup` (genie/st_mask_git.py:3),
`torchvision` (magvit2/modules/losses/lpips.py:5), `lightning`
(magvit2/models/lfqgan.py:9). On the CPU paths we golden-test, none of their
functionality is exercised:

- `BasicSelfAttention` never calls xformers; we force it via
  XFORMERS_DISABLED=true (genie/attention.py:7, 85-88).
- muP is only needed for `FixedMuReadout` (an `nn.Linear` whose forward divides
  by `width_mult()`, st_mask_git.py:316-323) and `set_base_shapes` against the
  hardcoded base (8 heads, d_model 256, st_mask_git.py:298-304). The shim
  implements exactly that semantics: `width_mult` = fan-in ratio vs base.
- torchvision is needed only to *construct* the reference LPIPS; tests that
  import `magvit2.modules.losses.vqperceptual` for its pure loss functions
  never construct it (the shim raises if they try).

Import this module BEFORE any `import genie...` / `import magvit2...`.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_installed = False


def install_reference_shims() -> None:
    global _installed
    if _installed:
        return

    import torch
    import torch.nn as nn

    # The reference picks BasicSelfAttention (pure torch) under this env var
    # (genie/attention.py:7). Must be set before genie.attention is imported.
    os.environ["XFORMERS_DISABLED"] = "true"

    # -- xformers ------------------------------------------------------------
    xformers = types.ModuleType("xformers")
    xformers_ops = types.ModuleType("xformers.ops")

    class LowerTriangularMask:  # only instantiated on the (unused) CUDA path
        pass

    def memory_efficient_attention(*args, **kwargs):
        raise RuntimeError(
            "xformers shim: MemoryEfficientAttention must not run in CPU "
            "golden tests (XFORMERS_DISABLED should have selected "
            "BasicSelfAttention)")

    xformers_ops.LowerTriangularMask = LowerTriangularMask
    xformers_ops.memory_efficient_attention = memory_efficient_attention
    xformers_ops.unbind = torch.unbind
    xformers.ops = xformers_ops

    # -- mup -----------------------------------------------------------------
    mup = types.ModuleType("mup")

    class MuReadout(nn.Linear):
        """Minimal muP readout: nn.Linear + width_mult bookkeeping.

        Real mup stores `infshape` per parameter; the reference only consumes
        `width_mult()` inside FixedMuReadout.forward (st_mask_git.py:316-323),
        which for the readout equals fan_in / base_fan_in.
        """

        def __init__(self, *args, readout_zero_init: bool = False,
                     output_mult: float = 1.0, **kwargs):
            super().__init__(*args, **kwargs)
            self.output_mult = output_mult
            self._width_mult = 1.0
            if readout_zero_init:
                self.weight.data.zero_()
                if self.bias is not None:
                    self.bias.data.zero_()

        def width_mult(self):
            return self._width_mult

    def set_base_shapes(model, base_model, rescale_params: bool = False,
                        **kwargs):
        """Pair modules by name; record the readout fan-in ratio vs base."""
        base = dict(base_model.named_modules())
        for name, module in model.named_modules():
            if isinstance(module, MuReadout):
                base_mod = base[name]
                module._width_mult = (module.weight.shape[1]
                                      / base_mod.weight.shape[1])
        return model

    def normal_(tensor, mean=0.0, std=1.0):
        # Golden tests convert *trained/seeded* state dicts, never muP inits;
        # plain normal keeps init_weights runnable.
        return nn.init.normal_(tensor, mean=mean, std=std)

    mup.MuReadout = MuReadout
    mup.set_base_shapes = set_base_shapes
    mup.normal_ = normal_
    mup.init = types.ModuleType("mup.init")
    mup.init.normal_ = normal_

    # -- torchvision (import-time only; construction must not happen) --------
    torchvision = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def _no_vgg(*args, **kwargs):
        raise RuntimeError(
            "torchvision shim: reference LPIPS/VGG cannot be constructed in "
            "this environment (no torchvision); tests must avoid LPIPS()")

    tv_models.vgg16 = _no_vgg
    torchvision.models = tv_models

    # -- lightning (class hierarchy only) -------------------------------------
    lightning = types.ModuleType("lightning")

    class LightningModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.automatic_optimization = True
            self.strict_loading = True
            self.global_step = 0

        def save_hyperparameters(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

        def register_buffer(self, name, tensor, persistent=True):
            return nn.Module.register_buffer(self, name, tensor,
                                             persistent=persistent)

    lightning.LightningModule = LightningModule

    import importlib.machinery

    for name, module in [("xformers", xformers), ("xformers.ops", xformers_ops),
                         ("mup", mup), ("mup.init", mup.init),
                         ("torchvision", torchvision),
                         ("torchvision.models", tv_models),
                         ("lightning", lightning)]:
        # A real __spec__ keeps importlib.util.find_spec (used by
        # transformers' capability probing) happy.
        module.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, module)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    _installed = True
