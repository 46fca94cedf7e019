"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Mirrors SURVEY.md §4 "multi-chip without a cluster": all sharding/collective
tests run on a faked 8-device CPU topology; the same code runs unmodified on
a real TPU slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
