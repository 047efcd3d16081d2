"""Test configuration: run on CPU with 8 virtual devices.

The sandbox always exposes the TPU via the experimental 'axon' platform and
ignores ``JAX_PLATFORMS``, so instead of selecting a platform we set the
*default device* to CPU.  Multi-chip sharding tests build a Mesh from the 8
virtual CPU devices (``xla_force_host_platform_device_count=8``); parity
numerics are float64 (enabled on package import).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

REFERENCE_DATA = "/root/reference/testing/Data"
