"""Why does a small cross-level proposal budget starve some classes?

``rpn_post_nms_topk_test`` cuts the concatenated, per-level-NMS-masked
candidate list with ONE global top-k (models/rpn.py::generate_proposals).
The round-4 retrain checkpoint showed that cut is checkpoint-fragile:
topk=300 zeroed class0 AND halved class1 held-out AP while topk=1000
scored 0.68 bbox (tools/eval_probe.py, QUALITY.md).  This probe measures
the mechanism on a trained checkpoint:

  1. per-level composition of the global top-k for k in {300,500,700,1000}
     — does one level's objectness calibration dominate the budget?
  2. for every GT instance: the best-IoU NMS-surviving candidate, its
     LEVEL, its GLOBAL rank and its WITHIN-LEVEL rank.

If the best candidates' within-level ranks are small while their global
ranks exceed the budget, a per-level floor in the global cut recovers
them at small budgets; if within-level ranks are also huge, only a larger
budget (or retraining) can.

Usage: python tools/proposal_budget_diag.py <ckpt_dir> [n_images]
Env: UWCV_D_ROOT (default DATASET_QUALITY), UWCV_D_SPLIT (Test).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()
BUDGETS = (300, 500, 700, 1000)


def log(msg):
    print(f"[bdiag +{time.time() - T0:6.1f}s] {msg}", flush=True)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.loader import load_image_rgb, resize_image
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.checkpoint import load_weights
    from uwcv_tpu.engine.predictor import adopt_checkpoint_model_cfg
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params
    from uwcv_tpu.models.rpn import LEVELS, NEG_INF
    from uwcv_tpu.ops.nms import nms_mask
    from uwcv_tpu.structures.boxes import box_iou, clip_boxes, decode_deltas, \
        nonempty_boxes

    ckpt = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    root = os.environ.get("UWCV_D_ROOT", os.path.join(REPO, "DATASET_QUALITY"))
    split = os.environ.get("UWCV_D_SPLIT", "Test")
    size = int(os.environ.get("UWCV_D_SIZE", "800"))

    cfg = Config()
    adopt_checkpoint_model_cfg(cfg, ckpt)
    cfg.data.classes_csv = os.path.join(root, "classes.csv")

    model = MaskRCNN(cfg.model)
    params = init_params(model, jax.random.key(0))
    params = load_weights(ckpt, params, cfg.model)
    log(f"loaded {ckpt} (ARs {cfg.model.anchor_aspect_ratios})")

    dicts = get_superannotate_dicts(os.path.join(root, split))[:n_images]
    h = w = size
    pre_k = cfg.model.rpn_pre_nms_topk_test

    def candidates(m, images):
        """Per-level NMS-masked candidate boxes+scores (the exact inputs to
        the global top-k in generate_proposals's exact path)."""
        feats = m._features(images)
        obj, deltas = m.rpn_head(feats)
        anchors = m._anchors((h, w))
        out_boxes, out_scores = [], []
        for name in LEVELS:
            logits = obj[name][0].reshape(-1)
            d = deltas[name][0].reshape(-1, 4)
            k = min(pre_k, logits.shape[0])
            top_scores, idx = jax.lax.top_k(logits, k)
            boxes = decode_deltas(d[idx], anchors[name][idx],
                                  m.cfg.rpn_bbox_reg_weights)
            boxes = clip_boxes(boxes, (h, w))
            scores = jnp.where(nonempty_boxes(boxes, 0.0), top_scores,
                               NEG_INF)
            keep = nms_mask(boxes, scores, m.cfg.rpn_nms_thresh)
            out_boxes.append(boxes)
            out_scores.append(jnp.where(keep, scores, NEG_INF))
        return out_boxes, out_scores

    cand_j = jax.jit(lambda p, im: model.apply(p, im, method=candidates))

    level_comp = {k: np.zeros(len(LEVELS), np.int64) for k in BUDGETS}
    gt_rows = []
    for d in dicts:
        img = load_image_rgb(d["file_name"])
        img = resize_image(img, h, w).astype(np.float32)
        bx, sc = cand_j(params, jnp.asarray(img[None]))
        bx = [np.asarray(b) for b in bx]
        sc = [np.asarray(s) for s in sc]
        sizes = [len(s) for s in sc]
        level_of = np.repeat(np.arange(len(LEVELS)), sizes)
        allb = np.concatenate(bx)
        alls = np.concatenate(sc)
        order = np.argsort(-alls)                  # global rank 0 = best
        grank = np.empty_like(order)
        grank[order] = np.arange(len(order))
        # within-level rank
        lrank = np.empty(len(alls), np.int64)
        off = 0
        for li, n in enumerate(sizes):
            o = np.argsort(-alls[off:off + n])
            r = np.empty(n, np.int64)
            r[o] = np.arange(n)
            lrank[off:off + n] = r
            off += n
        valid = alls > NEG_INF / 2
        for k in BUDGETS:
            sel = order[:k]
            sel = sel[valid[sel]]
            level_comp[k] += np.bincount(level_of[sel], minlength=len(LEVELS))
        sy, sx = h / d["height"], w / d["width"]
        for a in d["annotations"]:
            g = np.array([[a["bbox"][0] * sx, a["bbox"][1] * sy,
                           a["bbox"][2] * sx, a["bbox"][3] * sy]], np.float32)
            iou = np.asarray(box_iou(jnp.asarray(g), jnp.asarray(allb)))[0]
            iou = np.where(valid, iou, 0.0)
            j = int(iou.argmax())
            gt_rows.append({"class": a["category_id"],
                            "best_iou": float(iou[j]),
                            "level": LEVELS[level_of[j]],
                            "global_rank": int(grank[j]),
                            "level_rank": int(lrank[j])})
        log(f"{os.path.basename(d['file_name'])}: "
            f"{len(d['annotations'])} gts")

    n_img = len(dicts)
    out = {"per_level_share_of_topk": {
        str(k): {lv: round(level_comp[k][i] / max(level_comp[k].sum(), 1), 3)
                 for i, lv in enumerate(LEVELS)} for k in BUDGETS}}
    per_cls = {}
    for c in sorted({r["class"] for r in gt_rows}):
        rows = [r for r in gt_rows if r["class"] == c]
        gr = sorted(r["global_rank"] for r in rows)
        lr = sorted(r["level_rank"] for r in rows)
        per_cls[str(c)] = {
            "n": len(rows),
            "median_best_iou": round(float(np.median(
                [r["best_iou"] for r in rows])), 3),
            "global_rank_med/p90/max": [int(np.median(gr)),
                                        int(np.percentile(gr, 90)), gr[-1]],
            "level_rank_med/p90/max": [int(np.median(lr)),
                                       int(np.percentile(lr, 90)), lr[-1]],
            "levels": {lv: sum(r["level"] == lv for r in rows)
                       for lv in LEVELS if any(r["level"] == lv
                                               for r in rows)},
            "pct_global_rank_gt300": round(100 * sum(
                r["global_rank"] >= 300 for r in rows) / len(rows), 1),
        }
    out["gt_best_candidate_by_class"] = per_cls
    out["n_images"] = n_img
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
