"""Fixed-shape non-maximum suppression (SURVEY.md N3).

The reference relies on torchvision's CUDA NMS (dynamic output length) inside
Detectron2's RPN and ROI heads.  TPU/XLA wants static shapes and no
data-dependent control flow, so this NMS:

- works on padded [N] box sets (invalid entries carry score -inf);
- returns a fixed-size keep *mask* plus scores, never a dynamic index list;
- is O(N²) IoU matrix + N sequential suppression steps expressed as
  ``lax.fori_loop`` over a vector state — each step is one row lookup and a
  vectorized mask update, which XLA maps onto the VPU (no host sync, no
  sort-free approximation: exact greedy NMS semantics, matching torchvision
  up to strict-inequality tie handling).

For the RPN/ROI use we cap the number of survivors at ``max_out`` and return
their indices via top_k on masked scores, keeping everything static.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from uwcv_tpu.structures.boxes import box_iou

NEG_INF = -1e10


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Exact greedy NMS over padded boxes.

    boxes  [N,4], scores [N] (padding = NEG_INF or valid=False upstream).
    Returns keep [N] bool.  Greedy order = descending score, ties broken by
    lower index (matches torch stable sort).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores, stable=True)  # descending
    boxes_sorted = boxes[order]
    scores_sorted = scores[order]
    iou = box_iou(boxes_sorted, boxes_sorted)  # [N,N]

    def body(i, keep):
        # if candidate i is still alive, kill all lower-ranked overlaps
        alive = keep[i]
        suppress = (iou[i] > iou_threshold) & (
            jnp.arange(n) > i) & alive
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(
        0, n, body, scores_sorted > NEG_INF / 2)
    # unsort
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep & (scores > NEG_INF / 2)


def nms_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS then take the top ``max_out`` survivors (static shape).

    Returns (boxes [K,4], scores [K], valid [K]).  Padded slots have zero
    boxes and NEG_INF scores.
    """
    keep = nms_mask(boxes, scores, iou_threshold)
    masked = jnp.where(keep, scores, NEG_INF)
    k = min(max_out, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(masked, k)
    valid = top_scores > NEG_INF / 2
    out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
    if k < max_out:  # pad up
        pad = max_out - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=NEG_INF)
        valid = jnp.pad(valid, (0, pad))
    return out_boxes, top_scores, valid


def batched_class_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Per-class NMS via the coordinate-offset trick (torchvision
    batched_nms): shift each class's boxes to a disjoint region so one NMS
    pass never crosses classes."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = classes.astype(boxes.dtype)[:, None] * (max_coord * 2.0)
    return nms_mask(boxes + offsets, scores, iou_threshold)
