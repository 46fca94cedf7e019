"""Single-image serving-latency probe: the batch-1 device-resident program.

The reference serves one micrograph at a time (predictor(im) per file,
/root/reference/nn_inference.py:321); this measures that path's on-chip
latency at committed defaults with trained weights.  Timing uses a forced
4-byte host pull (axon block_until_ready returns early — PERF.md) and
reports both raw wall and the dispatch-floor-corrected program time, the
convention used by the PERF.md serving row.

Usage: python tools/serve_latency.py          (chip)
Env:   UWCV_BENCH_WEIGHTS, UWCV_BENCH_OVERRIDES, UWCV_LAT_REPS (default 30)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uwcv_tpu.engine.predictor import Predictor

    reps = int(os.environ.get("UWCV_LAT_REPS", "30"))
    # shared UWCV_BENCH_* resolution (utils/experiment.py): overrides →
    # checkpoint model-config adoption → trained weights w/ random fallback
    from uwcv_tpu.utils.experiment import prepare_bench_model

    cfg, model, params, winfo = prepare_bench_model(repo_root=REPO)
    weights = winfo["weights"]
    predictor = Predictor(cfg, params)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1024, 1280, 3)).astype(np.uint8)
    device_ops, _ = predictor.stage_batch([img])
    jax.block_until_ready(device_ops[0])

    from uwcv_tpu.utils.experiment import dispatch_floor, timed

    floor = dispatch_floor(device_ops[0], n=10)

    out = predictor._jit_run(*device_ops)
    np.asarray(out[0].scores)  # compile + first exec
    samples = [timed(lambda: np.asarray(
        predictor._jit_run(*device_ops)[0].scores)) for _ in range(reps)]
    best, med = min(samples), statistics.median(samples)
    print(json.dumps({
        "metric": "serving_latency_batch1_device_resident_ms",
        "weights": weights,
        "reps": reps,
        "dispatch_floor_ms": round(floor * 1e3, 2),
        "raw_best_ms": round(best * 1e3, 2),
        "raw_median_ms": round(med * 1e3, 2),
        "best_ms": round((best - floor) * 1e3, 2),
        "median_ms": round((med - floor) * 1e3, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
