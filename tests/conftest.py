"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a virtual mesh of 8 CPU devices, mirroring
how the driver validates `dryrun_multichip`. NOTE: env vars are not enough in
this environment — the ambient TPU plugin re-registers itself via the
`jax_platforms` config ("axon,cpu"), so we override the config explicitly
before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
