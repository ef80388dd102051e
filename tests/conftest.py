"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake NCCL backend (SURVEY.md §4c):
`xla_force_host_platform_device_count=8` gives 8 CPU devices so mesh/pjit
sharding logic is exercised without TPU hardware. Must run before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers an `axon` TPU PJRT plugin at
# interpreter startup and pins JAX_PLATFORMS=axon, which would silently run
# "CPU" tests on the remote TPU (40s+ compiles over the tunnel). Override via
# jax.config, which wins as long as no backend has been touched yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()
