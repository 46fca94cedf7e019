"""Scale-bar failure-chain probe (QUALITY.md root-cause tooling).

For a trained checkpoint, measures each link of the chain that must hold for
the thin 20:1 scale-bar class to score:

  1. anchor coverage: best anchor IoU vs each class-0 gt box;
  2. RPN recall: best test-time proposal IoU vs the bar;
  3. box-head response: softmax P(class0) on the PERFECT gt crop;
  4. end-to-end: detections overlapping the bar at IoU>=0.3.

Usage:
  python tools/scalebar_diag.py <ckpt_dir_or_params> [n_images]
Env: UWCV_D_ANCHOR_ARS (default "0.1,0.5,1.0,2.0"), UWCV_D_ROOT (dataset
root, default DATASET_QUALITY), UWCV_D_SPLIT (Test), UWCV_D_CLASS (0).
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
    print(f"[diag +{time.time() - T0:6.1f}s] {msg}", flush=True)


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
    from uwcv_tpu.models.anchors import generate_anchors
    from uwcv_tpu.models.rcnn import STRIDES, MaskRCNN, init_params
    from uwcv_tpu.models.rpn import LEVELS, generate_proposals
    from uwcv_tpu.ops.roi_align import multilevel_roi_align_batched
    from uwcv_tpu.structures.boxes import box_iou

    ckpt = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ars = tuple(float(x) for x in os.environ.get(
        "UWCV_D_ANCHOR_ARS", "0.1,0.5,1.0,2.0").split(","))
    root = os.environ.get("UWCV_D_ROOT", os.path.join(REPO, "DATASET_QUALITY"))
    split = os.environ.get("UWCV_D_SPLIT", "Test")
    klass = int(os.environ.get("UWCV_D_CLASS", "0"))
    size = int(os.environ.get("UWCV_D_SIZE", "800"))

    cfg = Config()
    cfg.model.depth = int(os.environ.get("UWCV_D_DEPTH", "50"))
    cfg.model.anchor_aspect_ratios = ars
    cfg.model.roi_score_thresh_test = 0.05
    cfg.data.classes_csv = os.path.join(root, "classes.csv")

    model = MaskRCNN(cfg.model)
    params = init_params(model, jax.random.key(0))
    params = load_weights(ckpt, params, cfg.model)
    log(f"loaded {ckpt}")

    dicts = get_superannotate_dicts(os.path.join(root, split))[:n_images]

    h = w = size

    def probe(m, images, gt_boxes):
        feats = m._features(images)
        obj, deltas = m.rpn_head(feats)
        anchors = m._anchors((h, w))
        props = generate_proposals(obj, deltas, anchors, (h, w), m.cfg,
                                   training=False)
        # flat per-anchor objectness + deltas for the anchor-rank probe
        obj_cat = jnp.concatenate(
            [obj[n].reshape(-1) for n in LEVELS])
        deltas_cat = jnp.concatenate(
            [deltas[n].reshape(-1, 4) for n in LEVELS])
        fpi = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
        pooled = multilevel_roi_align_batched(
            fpi, gt_boxes[None], STRIDES, m.cfg.pooler_resolution_box,
            m.cfg.canonical_box_size, m.cfg.canonical_level,
            window=m.cfg.pooler_window, use_pallas=m.cfg.pooler_pallas)
        g = pooled.shape[1]
        logits, _ = m.box_head(pooled.reshape((g,) + pooled.shape[2:]))
        dets, _ = m.inference(images, with_mask_logits=False)
        return props.boxes[0], props.valid[0], logits, dets, \
            obj_cat, deltas_cat

    probe_j = jax.jit(lambda p, im, gb: model.apply(p, im, gb, method=probe))

    anchors_np = np.concatenate(generate_anchors(
        (h, w), cfg.model.anchor_stride_levels, cfg.model.anchor_sizes,
        cfg.model.anchor_aspect_ratios))

    rows = []
    for d in dicts:
        img = load_image_rgb(d["file_name"])
        img = resize_image(img, h, w).astype(np.float32)
        annos = [a for a in d["annotations"] if a["category_id"] == klass]
        if not annos:
            continue
        sy = h / d["height"]
        sx = w / d["width"]
        gt = np.array([[a["bbox"][0] * sx, a["bbox"][1] * sy,
                        a["bbox"][2] * sx, a["bbox"][3] * sy]
                       for a in annos], np.float32)
        gpad = np.zeros((8, 4), np.float32)
        gpad[:len(gt)] = gt[:8]
        pboxes, pvalid, logits, dets, obj_cat, deltas_cat = probe_j(
            params, jnp.asarray(img[None]), jnp.asarray(gpad))
        pboxes = np.asarray(pboxes)[np.asarray(pvalid)]
        probs = np.asarray(jax.nn.softmax(
            np.asarray(logits, np.float32), axis=-1))
        a_iou = np.asarray(box_iou(jnp.asarray(anchors_np),
                                   jnp.asarray(gt))).max(axis=0)
        p_iou = np.asarray(box_iou(jnp.asarray(pboxes),
                                   jnp.asarray(gt))).max(axis=0) \
            if len(pboxes) else np.zeros(len(gt))
        db = np.asarray(dets.boxes[0])[np.asarray(dets.valid[0])]
        dc = np.asarray(dets.classes[0])[np.asarray(dets.valid[0])]
        d_iou = np.asarray(box_iou(jnp.asarray(db), jnp.asarray(gt))
                           ).max(axis=0) if len(db) else np.zeros(len(gt))
        hit = 0
        if len(db):
            m_iou = np.asarray(box_iou(jnp.asarray(db), jnp.asarray(gt)))
            hit = int(((m_iou >= 0.3) & (dc[:, None] == klass)).any())
        # anchor-rank probe: objectness RANK of the best-IoU anchor and the
        # IoU of ITS regressed box — separates "RPN never scores the bar
        # anchor" from "scored but regressed away / NMS'd"
        from uwcv_tpu.structures.boxes import decode_deltas

        obj_np = np.asarray(obj_cat, np.float32)
        iou_all = np.asarray(box_iou(jnp.asarray(anchors_np),
                                     jnp.asarray(gt)))
        for gi in range(len(gt)):
            ai = int(iou_all[:, gi].argmax())
            rank = int((obj_np > obj_np[ai]).sum())
            reg = decode_deltas(jnp.asarray(anchors_np[ai][None]),
                                np.asarray(deltas_cat)[ai][None],
                                cfg.model.rpn_bbox_reg_weights)
            reg_iou = float(np.asarray(box_iou(
                reg, jnp.asarray(gt[gi][None])))[0, 0])
            rows.append({
                "image": os.path.basename(d["file_name"]),
                "anchor_best_iou": round(float(a_iou[gi]), 3),
                "anchor_obj_rank": rank,
                "anchor_reg_iou": round(reg_iou, 3),
                "proposal_best_iou": round(float(p_iou[gi]), 3),
                "p_class_on_gt_crop": round(float(probs[gi, klass]), 4),
                "p_bg_on_gt_crop": round(float(probs[gi, -1]), 4),
                "det_best_iou": round(float(d_iou[gi]), 3),
                "detected_as_class": hit,
            })
        log(rows[-1])

    agg = {k: round(float(np.mean([r[k] for r in rows])), 4)
           for k in ("anchor_best_iou", "anchor_obj_rank", "anchor_reg_iou",
                     "proposal_best_iou", "p_class_on_gt_crop",
                     "p_bg_on_gt_crop", "det_best_iou", "detected_as_class")}
    print(json.dumps({"n_gt": len(rows), "mean": agg}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
