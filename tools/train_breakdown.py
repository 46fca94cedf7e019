"""Train-step perf probe: measured steps/s and the fwd/bwd+update split.

The reference's training cost model is invisible (Detectron2 prints only
ETA); this measures ours on chip at the production schedule's shapes
(batch 2, the reference's IMS_PER_BATCH at nn_train.py:202; plus a batch
ladder to show dispatch-floor amortization).  Stages:

  fwd        jitted loss_fn forward only (augment + unpack included —
             both run on device inside the step)
  fwd+bwd+sgd  the full compiled train step (value_and_grad + optax)

Timing uses a forced scalar pull (axon block_until_ready returns early —
PERF.md), minus the measured dispatch floor.

Usage: python tools/train_breakdown.py          (chip)
Env:   UWCV_TB_BATCHES="2,4,8", UWCV_TB_SIZE (default 1024),
       UWCV_BENCH_DEPTH (default 50)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.synthetic import generate_dataset
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.trainer import Trainer, make_train_step

    batches = tuple(int(x) for x in os.environ.get(
        "UWCV_TB_BATCHES", "2,4,8").split(","))
    size = int(os.environ.get("UWCV_TB_SIZE", "1024"))
    depth = int(os.environ.get("UWCV_BENCH_DEPTH", "50"))

    root = "/tmp/uwcv_train_breakdown_ds"
    if not os.path.isdir(os.path.join(root, "Train")):
        generate_dataset(root, num_train=8, num_test=0, num_inference=0,
                         image_size=(512, 512), seed=11)
    dicts = get_superannotate_dicts(os.path.join(root, "Train"))

    from uwcv_tpu.utils.experiment import best_time, dispatch_floor, timed

    rows = []
    for b in batches:
        cfg = Config()
        cfg.model.depth = depth
        cfg.solver.ims_per_batch = b
        cfg.input.train_size = (size, size)
        cfg.data.classes_csv = os.path.join(root, "classes.csv")
        cfg.output_dir = "/tmp/uwcv_train_breakdown_out"
        trainer = Trainer(cfg)
        state = trainer.init_state()
        loader = TrainLoader(dicts, cfg, seed=0).start()
        batch = {k: jax.device_put(v) for k, v in next(iter(loader)).items()}
        loader.stop()
        jax.block_until_ready(batch["image"])

        floor = dispatch_floor(batch["image"])

        # forward-only loss (same in-step augment/unpack work)
        step = make_train_step(trainer.model, cfg, trainer.tx)

        def fwd_fn(params, batch, rng):
            # rebuild loss_fn the way make_train_step does, forward only
            train_size = cfg.input.train_size[1]
            from uwcv_tpu.data.augment import augment_batch, unpack_bitmasks
            from uwcv_tpu.models.rcnn import MaskRCNN

            aug_rng, samp_rng = jax.random.split(rng)
            masks = unpack_bitmasks(batch["masks_packed"], train_size)
            aug = augment_batch(
                {"image": batch["image"].astype(jnp.float32),
                 "boxes": batch["boxes"], "classes": batch["classes"],
                 "valid": batch["valid"], "masks": masks},
                aug_rng, cfg.input)
            losses = trainer.model.apply(
                params, aug["image"], aug["boxes"], aug["classes"],
                aug["masks"], aug["valid"], samp_rng,
                method=type(trainer.model).forward_train)
            return sum(jax.tree_util.tree_leaves(
                {k: jnp.sum(v) for k, v in losses.items()}))

        jfwd = jax.jit(fwd_fn)
        rng = jax.random.key(0)
        np.asarray(jfwd(state.params, batch, rng))
        fwd = best_time(lambda: np.asarray(jfwd(state.params, batch, rng)),
                        n=6) - floor

        # step FLOPs from XLA's cost model → train MFU at the v5e bf16 peak
        # (197 TFLOP/s); same convention as bench.py's inference MFU.
        # Lower BEFORE executing: the step donates the state argument, and
        # lowering a donated-then-deleted buffer raises.
        tflops = None
        try:
            ca = (step.lower(state, batch, rng).compile().cost_analysis()
                  or {})
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            tflops = float(ca.get("flops", 0.0)) / 1e12 or None
        except Exception:
            pass

        # full step (donated state: rebind each call)
        st = state
        def full_once():
            nonlocal st
            st, metrics = step(st, batch, rng)
            np.asarray(metrics["total_loss"])
        full_once()  # compile
        full = min(timed(full_once) for _ in range(6)) - floor

        row = {"batch": b, "dispatch_floor_ms": round(floor * 1e3, 1),
               "fwd_ms": round(fwd * 1e3, 1),
               "full_step_ms": round(full * 1e3, 1),
               "bwd_update_ms": round((full - fwd) * 1e3, 1),
               "steps_per_s": round(1.0 / (full + floor), 2),
               "img_per_s": round(b / (full + floor), 2)}
        if tflops:
            row["step_tflop"] = round(tflops, 2)
            row["train_mfu_pct"] = round(100.0 * tflops / max(full, 1e-9)
                                         / 197.0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        del state, st, step, jfwd
    print(json.dumps({"size": size, "depth": depth, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
