"""ROI heads: box head + predictors, mask head, and test-time inference
(SURVEY.md N5).

Matches the Detectron2 StandardROIHeads used by the reference's zoo config:

- box head: 2×FC-1024 over 7×7 pooled features; class head emits C+1 logits
  (last = background); box head emits class-specific deltas (C×4);
- mask head: 4×conv-256 + deconv×2 + 1×1 conv → C mask logits at 28²;
- test-time: per-class score matrix → threshold → batched-class NMS →
  fixed ``detections_per_image`` top-k (all static shapes).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uwcv_tpu.config import ModelConfig
from uwcv_tpu.ops.nms import NEG_INF, batched_class_nms_mask
from uwcv_tpu.structures.boxes import clip_boxes, decode_deltas, nonempty_boxes


class BoxHead(nn.Module):
    """7×7×C pooled roi features → (class logits [R,C+1], deltas [R,C,4])."""

    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        r = x.shape[0]
        h = x.reshape(r, -1).astype(self.dtype)
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(h))
        h = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(h))
        # Detectron2 init: cls_score N(0, 0.01), bbox_pred N(0, 0.001)
        logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_score")(h).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(h).astype(jnp.float32)
        return logits, deltas.reshape(r, self.num_classes, 4)


class MaskHead(nn.Module):
    """14×14×C pooled features → per-class mask logits [R, 28, 28, C]."""

    num_classes: int
    conv_dim: int = 256
    num_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = x.astype(self.dtype)
        for i in range(self.num_convs):
            h = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                dtype=self.dtype, name=f"mask_fcn{i + 1}")(h))
        h = nn.relu(nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="deconv")(h))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="predictor")(h)
        return logits.astype(jnp.float32)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # [D, 4]
    scores: jnp.ndarray   # [D]
    classes: jnp.ndarray  # [D] int32
    valid: jnp.ndarray    # [D] bool


def inference_detections(
    proposal_boxes: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    class_logits: jnp.ndarray,
    deltas: jnp.ndarray,
    image_size: Tuple[int, int],
    cfg: ModelConfig,
) -> Detections:
    """Detectron2 fast_rcnn_inference for one image, static shapes.

    proposal_boxes [R,4]; class_logits [R,C+1]; deltas [R,C,4].
    Candidate set = R×C (each proposal × each fg class); score threshold +
    per-class NMS + detections_per_image top-k.
    """
    r = proposal_boxes.shape[0]
    c = cfg.num_classes
    probs = jax.nn.softmax(class_logits, axis=-1)[:, :c]      # [R,C]

    boxes_per_class = decode_deltas(
        deltas, proposal_boxes[:, None, :], cfg.roi_bbox_reg_weights)
    boxes_per_class = clip_boxes(boxes_per_class, image_size)  # [R,C,4]

    flat_boxes = boxes_per_class.reshape(r * c, 4)
    flat_scores = probs.reshape(r * c)
    flat_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))

    ok = (flat_scores > cfg.roi_score_thresh_test)
    ok &= jnp.repeat(proposal_valid, c)
    ok &= nonempty_boxes(flat_boxes, 0.0)
    flat_scores = jnp.where(ok, flat_scores, NEG_INF)

    # candidate cap: greedy NMS is sequential in N, so prefilter the R×C
    # matrix to the top nms_candidates_test scores (result-identical — only
    # detections_per_image survive anyway)
    n_cand = min(cfg.nms_candidates_test, flat_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(flat_scores, n_cand)
    cand_boxes = flat_boxes[cand_idx]
    cand_classes = flat_classes[cand_idx]

    keep = batched_class_nms_mask(
        cand_boxes, cand_scores, cand_classes, cfg.roi_nms_thresh_test)
    masked = jnp.where(keep, cand_scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, cfg.detections_per_image)
    valid = top_scores > NEG_INF / 2
    return Detections(
        boxes=jnp.where(valid[:, None], cand_boxes[idx], 0.0),
        scores=jnp.where(valid, top_scores, 0.0),
        classes=jnp.where(valid, cand_classes[idx], 0),
        valid=valid,
    )
