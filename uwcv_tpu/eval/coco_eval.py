"""COCO-style mAP evaluator — pycocotools-free (SURVEY.md N10).

The reference imports COCOEvaluator but never calls it (nn_train.py:49,
README ToDo "metrics") — making mAP a declared-missing feature this rebuild
must provide.  This is a from-scratch implementation of the COCOeval
protocol for box and mask IoU:

- 101-point interpolated AP per (class, IoU threshold), averaged over
  IoU .50:.05:.95 ("AP"), plus AP50/AP75;
- greedy matching of predictions (score-sorted) to ground truth at each
  threshold, one gt per prediction;
- mask IoU computed on bitmasks; box IoU on XYXY arrays;
- AR@100 (average recall) as a secondary diagnostic.

Known simplifications vs pycocotools (documented, conservative): no crowd
handling (the SA datasets have none — nn_train.py:150 drops iscrowd) and no
area-range breakdown (can be added per report need).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# linspace, not arange: arange's accumulated error makes the .70 threshold
# 0.7000000000000001, rejecting exact-0.7 IoU matches (pycocotools uses
# linspace for the same reason)
IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)


def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def mask_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a [N,H,W] bool, b [M,H,W] bool → [N,M] IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    af = a.reshape(len(a), -1).astype(np.float32)
    bf = b.reshape(len(b), -1).astype(np.float32)
    inter = af @ bf.T
    area_a = af.sum(1)
    area_b = bf.sum(1)
    union = area_a[:, None] + area_b[None, :] - inter
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
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    recall_points = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, recall_points, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


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
        # per (class, threshold): list of (score, matched) + gt count
        self._preds: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = \
            defaultdict(list)
        self._num_gt = np.zeros(num_classes, np.int64)

    def add_image(self, pred: Dict[str, np.ndarray],
                  gt: Dict[str, np.ndarray]) -> None:
        for c in range(self.num_classes):
            p_sel = pred["classes"] == c
            g_sel = gt["classes"] == c
            self._num_gt[c] += int(g_sel.sum())
            if not p_sel.any():
                continue
            scores = pred["scores"][p_sel]
            if self.iou_type == "bbox":
                iou = box_iou_np(pred["boxes"][p_sel], gt["boxes"][g_sel])
            else:
                iou = mask_iou_np(pred["masks"][p_sel], gt["masks"][g_sel])
            # greedy match per threshold, score order
            order = np.argsort(-scores, kind="stable")
            matched_all = np.zeros((len(scores), len(IOU_THRESHOLDS)), bool)
            for t_i, thr in enumerate(IOU_THRESHOLDS):
                taken = np.zeros(iou.shape[1], bool)
                for rank, pi in enumerate(order):
                    if iou.shape[1] == 0:
                        break
                    cand = iou[pi] * ~taken
                    gi = int(np.argmax(cand))
                    if cand[gi] >= thr:
                        taken[gi] = True
                        matched_all[pi, t_i] = True
            self._preds[c].append((scores, matched_all))

    def summarize(self) -> Dict[str, float]:
        ap_per_class_thr = np.full(
            (self.num_classes, len(IOU_THRESHOLDS)), np.nan)
        for c in range(self.num_classes):
            if self._preds[c]:
                scores = np.concatenate([s for s, _ in self._preds[c]])
                matched = np.concatenate([m for _, m in self._preds[c]])
            else:
                scores = np.zeros(0)
                matched = np.zeros((0, len(IOU_THRESHOLDS)), bool)
            for t_i in range(len(IOU_THRESHOLDS)):
                ap_per_class_thr[c, t_i] = _average_precision(
                    scores, matched[:, t_i], int(self._num_gt[c]))

        with np.errstate(invalid="ignore"):
            per_class_ap = np.nanmean(ap_per_class_thr, axis=1)
            results = {
                "AP": float(np.nanmean(ap_per_class_thr)),
                "AP50": float(np.nanmean(ap_per_class_thr[:, 0])),
                "AP75": float(np.nanmean(ap_per_class_thr[:, 5])),
            }
        for c in range(self.num_classes):
            results[f"AP_class{c}"] = float(per_class_ap[c])
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
