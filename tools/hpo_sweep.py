"""On-chip 8-trial HPO sweep → HPO_r03.json (VERDICT r2 next #6).

The reference DECLARES Optuna HPO and never implements it
(/root/reference/README.md:5, nn_train.py:194 "DO OPTUNA OPTIMIZATION").
This runs the production sweep on the real chip against the synthetic
4-class dataset: 8 trials searching (base_lr, anchor_scale, roi_batch),
objective = held-out segm mAP, trial training from scratch (no pretrained
weights exist in this image).  The eval-predictor compile is amortized
across trials per hpo/study.py.

Usage: python tools/hpo_sweep.py   (repo root, chip attached)
Env: UWCV_HPO_TRIALS (8), UWCV_HPO_ITERS (150), UWCV_HPO_OUT.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIALS = int(os.environ.get("UWCV_HPO_TRIALS", "8"))
ITERS = int(os.environ.get("UWCV_HPO_ITERS", "150"))
ROOT = os.environ.get("UWCV_Q_ROOT", os.path.join(REPO, "DATASET_QUALITY"))
OUT = os.environ.get("UWCV_HPO_OUT", os.path.join(REPO, "HPO_r03.json"))
SPACE = os.environ.get("UWCV_HPO_SPACE", "v1")  # v2 = round-4 knob space

T0 = time.time()


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax

    print(f"[hpo +{time.time() - T0:6.1f}s] devices: {jax.devices()}",
          flush=True)

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.synthetic import generate_dataset
    from uwcv_tpu.hpo.study import run_reference_hpo

    if not os.path.isdir(os.path.join(ROOT, "Train")):
        generate_dataset(ROOT, num_train=64, num_test=16, num_inference=4,
                         image_size=(512, 512), seed=7)

    cfg = Config()
    cfg.model.depth = 50
    cfg.solver.freeze_at = 0              # trials train from scratch
    cfg.solver.warmup_iters = 50
    cfg.input.max_gt_instances = 16
    cfg.output_dir = os.path.join(REPO, "output", f"hpo_{SPACE}")
    cfg.data.classes_csv = os.path.join(ROOT, "classes.csv")
    if SPACE == "v2":
        # pin the r4 recipe; the v2 space searches the class-imbalance/
        # orientation knobs around it (hpo/study.py)
        cfg.model.anchor_aspect_ratios = (0.1, 0.5, 1.0, 2.0, 10.0)
        cfg.model.roi_batch_size_per_image = 64

    t = time.time()
    best = run_reference_hpo(cfg, n_trials=TRIALS,
                             data_dir=os.path.join(ROOT, "Train"),
                             max_iter=ITERS, eval_max_images=16,
                             space=SPACE)
    wall = time.time() - t
    best["space"] = SPACE
    best["wall_s"] = round(wall, 1)
    best["trial_iters"] = ITERS
    best["hardware"] = str(jax.devices())
    with open(OUT, "w") as f:
        json.dump(best, f, indent=2, default=str)
    print(f"[hpo +{time.time() - T0:6.1f}s] wrote {OUT} "
          f"(best segm mAP {best['best_value']:.4f} in {wall:.0f}s)",
          flush=True)
    print(json.dumps({"best_value": best["best_value"],
                      "best_params": best["best_params"]}, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
