"""Test configuration: force CPU JAX with an 8-device virtual mesh so all
multi-chip sharding logic is exercised without TPU hardware.

The harness presets ``JAX_PLATFORMS=axon`` (one real TPU via tunnel) and its
sitecustomize imports jax before pytest loads this conftest, so env vars
alone are too late — pin the platform through jax.config as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
