"""A/B eval probe on a saved checkpoint: isolate eval-path effects.

Evaluates one checkpoint on the DATASET_QUALITY Test split under several
inference configurations (current defaults vs relaxed detection budgets vs
batch-1 eval) and prints per-class segm/bbox AP for each.  Written for the
QUALITY_r04_retrain class0=0.0 investigation: the retrain used the same
training recipe as QUALITY_r04.json, but several eval-path defaults changed
in between (detections_per_image 100->50, rpn_post_nms_topk_test 1000->300,
batched evaluate_split).  This separates "model never learned the class"
from "eval budget/path cuts it".

Usage: python tools/eval_probe.py <ckpt_dir> [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[probe +{time.time() - T0:6.1f}s] {msg}", flush=True)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax

    log(f"devices: {jax.devices()}")

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.predictor import adopt_checkpoint_model_cfg
    from uwcv_tpu.eval.coco_eval import evaluate_split

    ckpt = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else None
    root = os.environ.get("UWCV_Q_ROOT", os.path.join(REPO, "DATASET_QUALITY"))
    dicts = get_superannotate_dicts(os.path.join(root, "Test"))
    if n_images:
        dicts = dicts[:n_images]

    def fresh_cfg():
        cfg = Config()
        adopt_checkpoint_model_cfg(cfg, ckpt)
        cfg.data.classes_csv = os.path.join(root, "classes.csv")
        cfg.model.roi_score_thresh_test = 0.05
        return cfg

    variants = []
    if os.environ.get("UWCV_PROBE_TOPKS"):
        # Knee-finding sweep: det stays at the committed default, only the
        # post-NMS proposal budget varies.  Used to pick the smallest
        # rpn_post_nms_topk_test that keeps the rare thin class alive
        # (300 zeroed class0 on the retrain checkpoint; 1000 recovers it).
        for tk in os.environ["UWCV_PROBE_TOPKS"].split(","):
            # "300" or "300:60" (budget:per-level floor)
            tk, _, fl = tk.partition(":")
            c = fresh_cfg()
            c.model.rpn_post_nms_topk_test = int(tk)
            c.model.rpn_post_nms_level_floor = int(fl or 0)
            variants.append(
                (f"topk={int(tk)}" + (f", floor={fl}" if fl else ""), c, 8))
    elif os.environ.get("UWCV_PROBE_DISAGG"):
        # Round-4 follow-up: the combined relaxation recovered class0
        # (0.0 -> 0.49 segm); these two isolate WHICH budget cut kills it.
        c2 = fresh_cfg()
        c2.model.detections_per_image = 100          # topk stays 300
        variants.append(("det=100, topk=300", c2, 8))
        c3 = fresh_cfg()
        c3.model.rpn_post_nms_topk_test = 1000       # det stays 50
        variants.append(("det=50, topk=1000", c3, 8))
    else:
        variants.append(("defaults", fresh_cfg(), 8))
        c2 = fresh_cfg()
        c2.model.detections_per_image = 100
        c2.model.rpn_post_nms_topk_test = 1000
        variants.append(("relaxed budgets (det=100, topk=1000)", c2, 8))
        variants.append(("defaults, batch-1 eval", fresh_cfg(), 1))

    out = {}
    for name, cfg, bs in variants:
        from uwcv_tpu.engine.checkpoint import load_weights
        from uwcv_tpu.models.rcnn import MaskRCNN, init_params

        model = MaskRCNN(cfg.model)
        params = init_params(model, jax.random.key(0))
        params = load_weights(ckpt, params, cfg.model)
        log(f"=== {name} (batch_size={bs}) ===")
        t = time.time()
        res = evaluate_split(cfg, dicts, params=params, batch_size=bs)
        log(f"eval {time.time()-t:.1f}s")
        row = {}
        for iou in ("bbox", "segm"):
            r = res[iou]
            cls = {k: round(vv, 4) for k, vv in r.items()
                   if k.startswith("AP_class")}
            log(f"  {iou}: AP={r['AP']:.4f} AP50={r['AP50']:.4f} {cls}")
            row[iou] = {"AP": r["AP"], **cls}
        out[name] = row
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
