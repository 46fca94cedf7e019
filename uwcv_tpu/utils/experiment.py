"""Shared UWCV_BENCH_* environment resolution for bench.py and tools/.

``bench.py``, ``tools/perf_breakdown.py`` and ``tools/serve_latency.py``
all take the same three knobs — ``UWCV_BENCH_DEPTH``,
``UWCV_BENCH_OVERRIDES`` (dotted config overrides, ``;``-separated) and
``UWCV_BENCH_WEIGHTS`` — and must apply them in the same order:

1. overrides onto the default config;
2. adopt the checkpoint's saved model config when the weights dir has one
   (a checkpoint trained with e.g. 5 anchor aspect ratios cannot load into
   the default 3-ratio graph; runtime/inference-budget knobs keep the
   committed defaults — ``adopt_checkpoint_model_cfg`` skips them);
3. re-apply the overrides so explicit env always wins;
4. load trained params, degrading to random init (with the reason
   recorded) instead of erroring the measurement run.

Before this helper the three copies had drifted: bench.py had adoption +
depth-keyed weight paths + a load-failure fallback while the tools kept a
stale depth-50-only variant that crashed on round-4 checkpoints (5 anchor
ratios into the 3-ratio default graph) and silently measured random
weights at depth 101.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Tuple


def _repo_root() -> str:
    import uwcv_tpu

    return os.path.dirname(os.path.dirname(os.path.abspath(
        uwcv_tpu.__file__)))


def bench_config(env: Optional[Mapping[str, str]] = None):
    """Config + (depth, overrides) from UWCV_BENCH_DEPTH/UWCV_BENCH_OVERRIDES."""
    env = os.environ if env is None else env
    from uwcv_tpu.config import Config

    cfg = Config()
    depth = int(env.get("UWCV_BENCH_DEPTH", "50"))
    cfg.model.depth = depth
    ov = env.get("UWCV_BENCH_OVERRIDES")
    if ov:
        cfg.apply([s for s in ov.split(";") if s])
    return cfg, depth, ov


def prepare_bench_model(
    env: Optional[Mapping[str, str]] = None,
    repo_root: Optional[str] = None,
) -> Tuple[Any, Any, Any, Dict[str, Any]]:
    """Resolve (cfg, model, params, info) for a measurement run.

    ``info`` keys: ``depth``, ``overrides`` (or absent), ``weights``
    ("trained(<dir>)" / "random" / "random (load failed: …)"),
    ``weights_path``, and ``ckpt_config`` when a saved model config was
    adopted.  The requested depth is re-pinned after adoption so a
    mislabeled metric (R50 weights benchmarked as "R101") cannot happen —
    a depth-mismatched checkpoint then fails the param load and degrades
    to random init, which ``weights`` records.
    """
    env = os.environ if env is None else env
    import jax

    from uwcv_tpu.engine.predictor import adopt_checkpoint_model_cfg
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg, depth, ov = bench_config(env)
    root = repo_root or _repo_root()
    wpath = env.get(
        "UWCV_BENCH_WEIGHTS",
        os.path.join(root, "output", f"quality_r{depth}", "model_final"))
    info: Dict[str, Any] = {"depth": depth, "weights_path": wpath}
    if ov:
        info["overrides"] = ov

    if os.path.isdir(wpath) and adopt_checkpoint_model_cfg(cfg, wpath):
        cfg.model.depth = depth
        if ov:
            cfg.apply([s for s in ov.split(";") if s])
        info["ckpt_config"] = os.path.join(
            os.path.dirname(wpath), "config.json")

    model = MaskRCNN(cfg.model)
    params = init_params(model, jax.random.key(0))
    if os.path.isdir(wpath):
        try:
            from uwcv_tpu.engine.checkpoint import load_params

            params = load_params(wpath, params)
            info["weights"] = f"trained({os.path.basename(wpath)})"
        except Exception as e:  # tree mismatch → keep random init
            info["weights"] = f"random (load failed: {e})"[:200]
    else:
        info["weights"] = "random"
    return cfg, model, params, info


# ---------------------------------------------------------------------------
# Shared measurement harness (bench.py + tools/*).
#
# One timing convention for every probe in the repo: a call is "done" only
# when >= 4 bytes of its result have been pulled to host (the axon plugin's
# block_until_ready returns before execution finishes — naive timing reads
# dispatch-only, ~1000x too fast; PERF.md), min-of-N against shared-host
# noise, and the per-dispatch tunnel round-trip (~26 ms) measured and
# subtracted for small programs.  Previously four tools carried drifting
# copies of this plumbing.


def timed(fn) -> float:
    """Wall seconds for one call of ``fn``.  ``fn`` must BLOCK on real
    completion — on the axon platform that means pulling a scalar to host
    (``np.asarray(out_scalar)``), not ``block_until_ready``."""
    import time

    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def best_time(fn, n: int = 6) -> float:
    """min-of-n ``timed`` calls (shared-terminal noise is 2-3x, PERF.md)."""
    return min(timed(fn) for _ in range(n))


def dispatch_floor(example, n: int = 8) -> float:
    """Best wall time of a jitted 4-byte scalar pull on ``example`` — the
    round-trip every synced call pays through the tunnel; subtract it from
    small-program timings (marginals between programs are already clean)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    tiny = jax.jit(lambda x: jnp.sum(x.reshape(-1)[:1].astype(jnp.float32)))
    np.asarray(tiny(example))  # compile
    return best_time(lambda: np.asarray(tiny(example)), n)
