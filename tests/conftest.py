"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a virtual mesh of 8 CPU devices
(`xla_force_host_platform_device_count`), mirroring how the driver validates
`dryrun_multichip`. Must run before jax initializes a backend.
"""

import os

# Hard override: the ambient environment may preset JAX_PLATFORMS to a TPU
# plugin; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
