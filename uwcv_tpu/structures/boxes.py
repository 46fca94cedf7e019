"""Box geometry in pure JAX — XYXY_ABS convention throughout.

The reference's box handling is implicit in Detectron2 (Boxes / Box2BoxTransform
with weights, torchvision box_iou).  Everything here is fixed-shape, vectorized,
and safe under jit: padded (zero-area) boxes produce zero IoU rows/cols rather
than NaNs, which the matcher relies on.

Box2Box parameterization matches Detectron2's Box2BoxTransform (dx,dy scale-
invariant center shift; dw,dh log-scale), used by both RPN (weights 1,1,1,1)
and ROI heads (weights 10,10,5,5) — see config.ModelConfig.*_bbox_reg_weights.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# Detectron2 clamps dw/dh to log(1000/16) before exp to avoid overflow.
_SCALE_CLAMP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] XYXY boxes (0 for degenerate/padded boxes)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: [N,4] × [M,4] → [N,M].  Padded boxes → 0 IoU."""
    area1 = box_area(boxes1)  # [N]
    area2 = box_area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N,M,2]
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Clip XYXY boxes to [0,W]×[0,H].  image_size is (H, W)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_boxes(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Bool mask of boxes with both sides > threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def encode_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Regression targets (dx,dy,dw,dh) that map src→target (Detectron2
    Box2BoxTransform.get_deltas)."""
    wx, wy, ww, wh = weights
    src_w = jnp.maximum(src_boxes[..., 2] - src_boxes[..., 0], 1e-6)
    src_h = jnp.maximum(src_boxes[..., 3] - src_boxes[..., 1], 1e-6)
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-6)
    tgt_h = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-6)
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    dx = wx * (tgt_cx - src_cx) / src_w
    dy = wy * (tgt_cy - src_cy) / src_h
    dw = ww * jnp.log(tgt_w / src_w)
    dh = wh * jnp.log(tgt_h / src_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Apply (dx,dy,dw,dh) deltas to boxes (Box2BoxTransform.apply_deltas).

    deltas [..., 4] may broadcast over a trailing class axis against boxes
    [..., 4].
    """
    wx, wy, ww, wh = weights
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
