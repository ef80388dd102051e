"""Configuration dataclasses for the TPU-native 1xgpt framework.

Behavioral contract mirrors the reference `genie/config.py:7-55` (GenieConfig)
and `magvit2/config.py:9-55` (VQConfig), extended with TPU-specific knobs
(compute dtype, attention kernel implementation, remat, mesh axes).

JSON round-trip is compatible with the reference's config files: unknown keys
in a loaded JSON are ignored, and reference JSONs (which lack the TPU fields)
load with defaults.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


def nth_root(x: int, n: int) -> int:
    """Integer n-th root with exactness check (reference: genie/factorization_utils.py:103-106)."""
    root = round(x ** (1 / n))
    assert root ** n == x, (x, n, root)
    return root


@dataclass
class GenieConfig:
    """ST-MaskGIT world-model configuration (reference: genie/config.py:7-55)."""

    num_layers: int
    num_heads: int
    d_model: int
    T: int = 16  # temporal sequence length (frames)
    S: int = 256  # spatial sequence length (16x16 token grid)
    image_vocab_size: int = 262144  # 2**18; model vocab adds the mask token on top
    use_mup: bool = False

    # Factorization for large vocabs (Open-MAGVIT2 LFQ: 2 x 512)
    num_factored_vocabs: int = 1
    factored_vocab_size: Optional[int] = None

    # MaskGIT training corruption (reference: genie/config.py:22-27)
    max_corrupt_rate: float = 0.2
    non_mlm_ratio: float = 0.5
    num_prompt_frames: int = 8

    # Attention
    qkv_bias: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    qk_norm: bool = True

    # MLP
    mlp_ratio: float = 4.0
    mlp_drop: float = 0.0
    mlp_bias: bool = True

    # Action conditioning (the reference's intended extension: README.md:49,
    # the commented-out actions.bin hook at data.py:48). 0 = disabled.
    action_vocab_size: int = 0

    # ---- TPU-native extensions (not present in the reference) ----
    dtype: str = "bfloat16"  # compute/activation dtype
    param_dtype: str = "float32"  # parameter storage dtype
    # Attention implementation for the training/forward path: "xla" |
    # "pallas" | "auto". "auto" resolves to "pallas" on TPU (measured,
    # tpu1x/ops/attention.py resolve_attn_impl: the flash spatial kernel
    # has a fused forward AND backward, and with the fused temporal kernel
    # the GENIE_138M B=8 step went 1.07 -> 0.61 s) and "xla" elsewhere
    # (kernels would run in interpret mode off-TPU). The serving decode
    # path has its own kernel set (tpu1x/ops/{spatial_block,
    # temporal_mlp_block,decode_attention}.py via tpu1x/serving.py).
    attn_impl: str = "auto"
    # MLP activation: the reference's torch nn.GELU is exact erf
    # (st_transformer.py:7-25), the default. True switches training to the
    # tanh approximation — with the r5 fused MLP kernel (in-kernel rational
    # erf) the gap is down to ~5% a step at GENIE_138M (0.325 vs 0.341
    # s/step) with ~3e-4 activation delta; a deliberate, opt-in deviation.
    gelu_approx: bool = False
    # jax.checkpoint each ST block: backward recomputes instead of saving all
    # L layers' attention/MLP activations (32 layers x B=4 already OOMs a
    # 16 GB chip without it). Free at inference (no-op outside autodiff).
    remat: bool = True
    # What the per-block checkpoint SAVES: "none" (full recompute, min
    # memory), "attn_outs" (save ONLY the two attention kernels' primal
    # outputs, tagged "attn_out" — removes both kernel forward re-runs
    # from the backward at ~67 MB/layer at B=8; the fastest measured
    # policy at GENIE_138M), "dots" (save matmul outputs —
    # jax.checkpoint_policies.checkpoint_dots), "dots_no_batch"
    # (dots_with_no_batch_dims_saveable; OOMs at GENIE_138M B=8).
    remat_policy: str = "attn_outs"
    scan_layers: bool = True  # lax.scan over the layer stack (fast compiles)
    # muP base shapes (reference hardcodes base 8 heads / d_model 256,
    # genie/st_mask_git.py:298-304)
    mup_base_d_model: int = 256
    mup_base_num_heads: int = 8

    def __post_init__(self):
        self.factored_vocab_size = nth_root(self.image_vocab_size, self.num_factored_vocabs)

    # -- derived --
    @property
    def mask_token_id(self) -> int:
        return self.image_vocab_size

    @property
    def latent_side_len(self) -> int:
        return nth_root(self.S, 2)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def width_mult(self) -> float:
        """muP width multiplier vs the base model (reference: mup MuReadout.width_mult)."""
        return self.d_model / self.mup_base_d_model

    def shallow_copy(self) -> "GenieConfig":
        return GenieConfig(**{f.name: getattr(self, f.name) for f in dataclasses.fields(self)})

    def save_pretrained(self, json_path) -> None:
        json_path = Path(json_path)
        if json_path.is_dir() or json_path.suffix != ".json":
            json_path.mkdir(parents=True, exist_ok=True)
            json_path = json_path / "config.json"
        with open(json_path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_pretrained(cls, json_path) -> "GenieConfig":
        json_path = Path(json_path)
        if json_path.is_dir():
            json_path = json_path / "config.json"
        with open(json_path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


@dataclass
class VQConfig:
    """Open-MAGVIT2 LFQ tokenizer configuration (reference: magvit2/config.py:9-55)."""

    # architecture
    resolution: int = 256
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)  # 16x downsample: 256 -> 16
    num_res_blocks: int = 2
    z_channels: int = 18  # log2(codebook_size)
    codebook_size: int = 262144

    # quantizer / losses
    entropy_loss_weight: float = 0.1
    commit_loss_weight: float = 0.25
    entropy_temperature: float = 0.01
    token_factorization: bool = False

    # GAN loss (reference: magvit2/modules/losses/vqperceptual.py)
    disc_start: int = 0
    disc_weight: float = 0.8
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_loss: str = "hinge"  # "hinge" | "vanilla" | "non_saturate"
    use_actnorm: bool = False  # ActNorm instead of BatchNorm (ref config.py:27)
    gen_loss_weight: Optional[float] = None  # None -> adaptive weight
    lecam_weight: float = 0.005
    perceptual_weight: float = 1.0
    recon_loss: str = "l1"

    # EMA
    use_ema: bool = True
    ema_decay: float = 0.999

    # TPU extensions
    dtype: str = "bfloat16"
    param_dtype: str = "float32"

    def __post_init__(self):
        self.ch_mult = tuple(self.ch_mult)
        assert 2 ** self.z_channels == self.codebook_size, (self.z_channels, self.codebook_size)

    def save_pretrained(self, json_path) -> None:
        json_path = Path(json_path)
        if json_path.is_dir():
            json_path = json_path / "vq_config.json"
        with open(json_path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_pretrained(cls, json_path) -> "VQConfig":
        json_path = Path(json_path)
        if json_path.is_dir():
            json_path = json_path / "vq_config.json"
        with open(json_path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})
