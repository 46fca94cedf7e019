"""One place for the jax platform override + persistent compile cache.

Used by the CLI (lazily, per jax-using subcommand), bench.py, the driver
entry points, and tools/ — previously copy-pasted in each.

- ``UWCV_PLATFORM=cpu|tpu|...`` forces the backend via ``jax.config``:
  some TPU plugins (this machine's axon remote-attach plugin) pin
  JAX_PLATFORMS through sitecustomize and ignore the inherited env var, so
  plain ``JAX_PLATFORMS=cpu`` silently lands on the TPU.
- the persistent compilation cache matters everywhere here: the R-CNN
  graphs take minutes to compile (through the axon tunnel or on CPU) and
  every CLI invocation is a fresh process.

Call BEFORE the first jax computation (importing jax is fine).
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str = "~/.cache/uwcv_jax_cache") -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    platform = os.environ.get("UWCV_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
