"""Test configuration: force CPU JAX with an 8-device virtual mesh so all
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
