"""End-to-end training throughput: loader + compiled step together.

``tools/train_breakdown.py`` measures the compiled step on a pre-staged
batch; this tool measures what a USER gets from ``Trainer.fit`` — host
input pipeline (decode → rasterize → pack, or the in-RAM prepared cache),
device prefetch, and the step — at the quality-run recipe's shapes.  The
r4 R101 quality runs paced 2.7 steps/s end-to-end while the compiled step
alone ran ~5x faster; the gap is the host pipeline on the 1-core bench
host, which DataConfig.cache_prepared exists to close (measured 12.0 →
100.2 batches/s loader-only).  This tool pins the end-to-end effect.

Usage: python tools/train_e2e_bench.py               (chip)
Env:   UWCV_TEB_ITERS (default 40, timed after warmup),
       UWCV_TEB_WARMUP (default 10; includes compile),
       UWCV_TEB_BATCH (default 2, the reference IMS_PER_BATCH),
       UWCV_TEB_DEPTH (default 50), UWCV_TEB_SIZE (default 800),
       UWCV_TEB_DATA (default ./DATASET_QUALITY/Train),
       UWCV_TEB_CACHE ("ab" = both, "on", "off"; default "ab")
Prints one JSON line per cache mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import numpy as np

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.trainer import Trainer

    iters = int(os.environ.get("UWCV_TEB_ITERS", "40"))
    warmup = int(os.environ.get("UWCV_TEB_WARMUP", "10"))
    batch = int(os.environ.get("UWCV_TEB_BATCH", "2"))
    depth = int(os.environ.get("UWCV_TEB_DEPTH", "50"))
    size = int(os.environ.get("UWCV_TEB_SIZE", "800"))
    data = os.environ.get("UWCV_TEB_DATA",
                          os.path.join(REPO, "DATASET_QUALITY", "Train"))
    mode = os.environ.get("UWCV_TEB_CACHE", "ab")
    modes = {"ab": (False, True), "on": (True,), "off": (False,)}[mode]

    dicts = get_superannotate_dicts(data)
    rows = []
    for cached in modes:
        cfg = Config()
        cfg.model.depth = depth
        cfg.solver.ims_per_batch = batch
        cfg.input.train_size = (size, size)
        cfg.data.classes_csv = os.path.join(os.path.dirname(data),
                                            "classes.csv")
        cfg.data.cache_prepared = cached
        cfg.output_dir = "/tmp/uwcv_train_e2e_out"
        cfg.solver.max_iter = warmup + iters
        cfg.solver.log_period = 10 ** 9     # no metric pulls in the window
        cfg.solver.checkpoint_period = 0

        trainer = Trainer(cfg)
        trainer.init_state()
        loader = TrainLoader(dicts, cfg, seed=0).start()
        it = iter(loader)
        rng = jax.random.key(1)
        state = trainer.state
        # warmup: compile + (for cached mode) one pass filling the cache
        pending = trainer._step_fn  # alias
        for i in range(warmup):
            b = {k: jax.device_put(v) for k, v in next(it).items()}
            rng, sr = jax.random.split(rng)
            state, metrics = pending(state, b, sr)
        np.asarray(metrics["total_loss"])   # sync (axon: forced 4-byte pull)

        t0 = time.perf_counter()
        for i in range(iters):
            b = {k: jax.device_put(v) for k, v in next(it).items()}
            rng, sr = jax.random.split(rng)
            state, metrics = pending(state, b, sr)
        np.asarray(metrics["total_loss"])
        dt = time.perf_counter() - t0
        loader.stop()

        row = {"cache_prepared": cached, "batch": batch, "depth": depth,
               "size": size, "iters": iters,
               "steps_per_s": round(iters / dt, 2),
               "img_per_s": round(iters * batch / dt, 2),
               "cache_mb": round(loader._cache_bytes / 1e6, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del trainer, state
    return 0


if __name__ == "__main__":
    sys.exit(main())
