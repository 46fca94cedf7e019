"""A/B: inference-time proposal budget (rpn_post_nms_topk_test) vs held-out
mAP — the measurement behind the `model.rpn_post_nms_topk_test` perf knob.

The box stage (pooler DMA + box head + NMS) is the largest non-backbone
slice of the batch-32 pipeline (71.4 ms of 262, tools/perf_breakdown.py at
the adaptive canvas) and scales ~linearly with the Detectron2-default 1000
proposals/image (/root/reference's zoo config inherits POST_NMS_TOPK_TEST
1000).  polyHIPE-style micrographs carry tens of instances, not hundreds —
this script measures what a smaller test-time budget costs in mAP on the
held-out split so the knob ships with evidence instead of folklore.

Usage: python tools/topk_ab.py   (chip; ~3 evals x ~2 min)
Env: UWCV_AB_TOPKS="1000,500,300", UWCV_AB_CKPT, UWCV_AB_ROOT.
UWCV_AB_OVERRIDES (';'-separated dotted config overrides) turns this into
a generic held-out-mAP neutrality check for ANY knob: set UWCV_AB_TOPKS to
a single value and A/B the override against a run without it — e.g.
UWCV_AB_OVERRIDES="postprocess.paste_dtype=bfloat16".
UWCV_AB_SWEEP="model.detections_per_image=100,50,32" sweeps ONE dotted knob
over several values instead of the topk list (TOPKS then pins the proposal
budget for every row).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOPKS = tuple(int(x) for x in os.environ.get(
    "UWCV_AB_TOPKS", "1000,500,300").split(","))
CKPT = os.environ.get(
    "UWCV_AB_CKPT", os.path.join(REPO, "output", "quality_r50_r4",
                                 "model_final"))
ROOT = os.environ.get("UWCV_AB_ROOT", os.path.join(REPO, "DATASET_QUALITY"))
T0 = time.time()


def log(msg: str) -> None:
    print(f"[topk_ab +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax

    log(f"devices: {jax.devices()}")

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.predictor import load_predictor
    from uwcv_tpu.eval.coco_eval import evaluate_split

    test_dicts = get_superannotate_dicts(os.path.join(ROOT, "Test"))
    log(f"test split: {len(test_dicts)} images, ckpt {CKPT}")

    ov = os.environ.get("UWCV_AB_OVERRIDES")
    sweep = os.environ.get("UWCV_AB_SWEEP")  # "dotted.key=v1,v2,..."
    if sweep:
        skey, svals = sweep.split("=", 1)
        variants = [(f"{skey}={v}", [f"{skey}={v}"]) for v in svals.split(",")]
    else:
        variants = [(f"topk={t}", [f"model.rpn_post_nms_topk_test={t}"])
                    for t in TOPKS]
    rows = []
    for label, var_overrides in variants:
        cfg = Config()
        if sweep:  # pin the proposal budget (first TOPKS entry) per row
            cfg.model.rpn_post_nms_topk_test = TOPKS[0]
        cfg.model.roi_score_thresh_test = 0.05
        cfg.data.classes_csv = os.path.join(ROOT, "classes.csv")
        if ov:
            cfg.apply([s for s in ov.split(";") if s])
        cfg.apply(var_overrides)
        predictor = load_predictor(cfg, weights=CKPT)
        t = time.time()
        res = evaluate_split(predictor.cfg, test_dicts, predictor=predictor)
        row = {"variant": label,
               "segm_AP": round(res["segm"]["AP"], 4),
               "segm_AP50": round(res["segm"]["AP50"], 4),
               "bbox_AP": round(res["bbox"]["AP"], 4),
               "eval_s": round(time.time() - t, 1)}
        rows.append(row)
        log(json.dumps(row))
    print(json.dumps({"ckpt": CKPT, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
