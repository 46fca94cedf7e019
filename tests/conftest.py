"""Test harness: force an 8-device virtual CPU mesh before any test imports
initialize a backend.

Mirrors SURVEY.md §4 "multi-chip without a cluster": all sharding/collective
tests run on a faked 8-device CPU topology; the same code runs unmodified on
a real TPU slice.

Note: this machine's axon TPU plugin (sitecustomize) pins JAX_PLATFORMS=axon
and ignores in-process env overrides, so we must use jax.config.update —
which works because conftest runs before any test module imports trigger
backend initialization.
"""

import os
import sys

# repo root on sys.path so tests can import __graft_entry__ / bench
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: CPU compiles of the R-CNN graphs take minutes;
# caching makes repeat CI runs fast
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/uwcv_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
