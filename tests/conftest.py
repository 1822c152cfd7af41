"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware, and Pallas kernels run in interpret mode (they auto-detect)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
