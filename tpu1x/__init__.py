"""tpu1x — a TPU-native (JAX/XLA/Pallas/pjit) world-model rollout engine.

A from-scratch framework with the capabilities of 1x-technologies/1xgpt:
a GENIE-style spatio-temporal MaskGIT transformer world model over discrete
Open-MAGVIT2 LFQ image tokens, plus training, sampling, evaluation,
visualization, and a batched policy-ranking rollout engine — all designed
for TPU (SPMD mesh sharding, fused Pallas kernels, jit-compiled end to end).
"""

from tpu1x.config import GenieConfig, VQConfig

__version__ = "0.1.0"
__all__ = ["GenieConfig", "VQConfig"]
