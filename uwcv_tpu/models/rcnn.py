"""GeneralizedRCNN — the full Mask R-CNN assembly (SURVEY.md N1-N6).

One Flax module owning backbone, FPN, RPN head, box head, and mask head, with
two entry points:

- ``inference(images)``: padded batch → per-image padded ``Detections`` +
  mask logits (the reference's ``DefaultPredictor`` semantics,
  nn_inference.py:227,321);
- ``forward_train(batch, rng)``: joint RPN + ROI losses with in-graph label
  assignment and balanced sampling (the reference's CustomTrainer.train(),
  nn_train.py:213).

The image front-end (normalize) lives here so the exported jit program takes
raw uint8/float RGB images — decode/resize stay on host, everything after is
one XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uwcv_tpu.config import ModelConfig
from uwcv_tpu.models.anchors import generate_anchors
from uwcv_tpu.models.fpn import FPN
from uwcv_tpu.models.heads import (
    BoxHead,
    Detections,
    MaskHead,
    inference_detections,
)
from uwcv_tpu.models.resnet import ResNet
from uwcv_tpu.models.rpn import LEVELS, Proposals, RPNHead, generate_proposals
from uwcv_tpu.ops.mask_paste import crop_and_resize_masks
from uwcv_tpu.ops.matcher import match_boxes, subsample_labels
from uwcv_tpu.ops.roi_align import multilevel_roi_align_batched
from uwcv_tpu.structures.boxes import encode_deltas

STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def _rgb_to_model_format(images: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """RGB float images → normalized model input.

    The reference feeds BGR (DefaultPredictor INPUT.FORMAT, caffe-style
    pixel_mean 103.53/116.28/123.675 — BGR order).  Host keeps RGB; we flip
    channels here if the weights expect BGR."""
    if cfg.input_format == "BGR":
        images = images[..., ::-1]
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    return (images - mean) / std


class MaskRCNN(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        for name in ("class_loss_weights", "roi_fg_class_weights",
                     "rpn_fg_class_weights"):
            w = getattr(c, name)
            if w and len(w) != c.num_classes:
                # a short tuple would silently mis-weight via JAX's
                # out-of-bounds index clamping (background would read the
                # last class's weight) instead of erroring
                raise ValueError(
                    f"model.{name} has {len(w)} entries but "
                    f"num_classes={c.num_classes}; per-class weights must "
                    f"cover every foreground class")
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.backbone = ResNet(depth=c.depth, dtype=dtype,
                               stem_im2col=c.stem_im2col)
        self.fpn = FPN(channels=c.fpn_channels, dtype=dtype)
        self.rpn_head = RPNHead(num_anchors=c.num_anchors_per_cell,
                                channels=c.fpn_channels, dtype=dtype)
        self.box_head = BoxHead(num_classes=c.num_classes,
                                fc_dim=c.box_fc_dim, dtype=dtype)
        if c.mask_on:
            self.mask_head = MaskHead(num_classes=c.num_classes, dtype=dtype)

    # ---------- shared trunk ----------

    def _features(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = _rgb_to_model_format(images.astype(jnp.float32), self.cfg)
        return self.fpn(self.backbone(x))

    def _anchors(self, image_size) -> Dict[str, jnp.ndarray]:
        per_level = generate_anchors(
            image_size, self.cfg.anchor_stride_levels,
            self.cfg.anchor_sizes, self.cfg.anchor_aspect_ratios)
        return {name: jnp.asarray(a) for name, a in zip(LEVELS, per_level)}

    # ---------- inference ----------

    def inference(self, images: jnp.ndarray,
                  with_mask_logits: bool = True):
        """images [B,H,W,3] RGB float/uint8 (padded) → per-image detections.

        Returns (Detections with leading batch dim, mask_logits
        [B,D,28,28] sigmoid probabilities for the predicted class, or None).
        """
        b, h, w, _ = images.shape
        feats = self._features(images)
        obj, deltas = self.rpn_head(feats)
        anchors = self._anchors((h, w))
        proposals = generate_proposals(
            obj, deltas, anchors, (h, w), self.cfg, training=False)

        # batched pooler: the fused Pallas kernel on TPU (2.3× the vmapped
        # XLA path, PERF.md), and the heads see one [B·K, ...] batch —
        # bigger matmuls than per-image vmapping
        feats_per_img = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
        pooled = multilevel_roi_align_batched(
            feats_per_img, proposals.boxes, STRIDES,
            self.cfg.pooler_resolution_box,
            self.cfg.canonical_box_size, self.cfg.canonical_level,
            window=self.cfg.pooler_window,
            use_pallas=self.cfg.pooler_pallas)
        k = pooled.shape[1]
        logits, box_deltas = self.box_head(
            pooled.reshape((b * k,) + pooled.shape[2:]))
        logits = logits.reshape(b, k, -1)
        box_deltas = box_deltas.reshape(b, k, self.cfg.num_classes, 4)

        def per_image(prop_boxes, prop_valid, logits_i, deltas_i):
            return inference_detections(
                prop_boxes, prop_valid, logits_i, deltas_i, (h, w), self.cfg)

        dets = jax.vmap(per_image)(proposals.boxes, proposals.valid,
                                   logits, box_deltas)

        mask_probs = None
        if self.cfg.mask_on and with_mask_logits:
            pooled_m = multilevel_roi_align_batched(
                feats_per_img, dets.boxes, STRIDES,
                self.cfg.pooler_resolution_mask,
                self.cfg.canonical_box_size, self.cfg.canonical_level,
                window=self.cfg.pooler_window,
                use_pallas=self.cfg.pooler_pallas)
            d = pooled_m.shape[1]
            mlogits = self.mask_head(
                pooled_m.reshape((b * d,) + pooled_m.shape[2:]))
            mlogits = mlogits.reshape((b, d) + mlogits.shape[1:])
            sel = jax.nn.one_hot(dets.classes, self.cfg.num_classes,
                                 dtype=mlogits.dtype)
            per_class = jnp.einsum("bdhwc,bdc->bdhw", mlogits, sel)
            mask_probs = jax.nn.sigmoid(per_class)
        return dets, mask_probs

    def __call__(self, images: jnp.ndarray):
        return self.inference(images)

    # ---------- training ----------

    def forward_train(
        self,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_classes: jnp.ndarray,
        gt_masks: jnp.ndarray,
        gt_valid: jnp.ndarray,
        rng: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """Full training forward → loss dict.

        images [B,H,W,3]; gt_boxes [B,N,4]; gt_classes [B,N];
        gt_masks [B,N,H,W] bool; gt_valid [B,N].
        Losses follow Detectron2: rpn_cls (BCE), rpn_loc (L1), cls (softmax
        CE incl. background), box_reg (L1, fg only), mask (per-roi BCE on the
        matched class channel).
        """
        c = self.cfg
        b, h, w, _ = images.shape
        feats = self._features(images)
        obj, deltas = self.rpn_head(feats)
        anchors = self._anchors((h, w))
        anchors_cat = jnp.concatenate([anchors[n] for n in LEVELS])  # [A,4]

        proposals = generate_proposals(
            obj, deltas, anchors, (h, w), c, training=True)

        obj_cat = jnp.concatenate(
            [obj[n].reshape(b, -1) for n in LEVELS], axis=1)          # [B,A]
        deltas_cat = jnp.concatenate(
            [deltas[n].reshape(b, -1, 4) for n in LEVELS], axis=1)    # [B,A,4]

        def per_image_sample(obj_i, deltas_i, prop_boxes, prop_valid,
                             boxes_i, classes_i, masks_i, valid_i, key_i):
            """RPN losses + ROI sampling for ONE image.  Pooling and the
            heads run AFTER the vmap, batched over all images' rois at once:
            the fused Pallas pooler (ops/roi_align.py pool_windows, now
            differentiable) wants one flat roi array, and [B·R] head matmuls
            tile the MXU better than vmapped per-image [R] ones."""
            rpn_key, roi_key = jax.random.split(key_i)
            # --- RPN losses ---
            m = match_boxes(anchors_cat, boxes_i, valid_i,
                            c.rpn_fg_iou_thresh, c.rpn_bg_iou_thresh,
                            allow_low_quality=True)
            rpn_w = None
            if c.rpn_fg_class_weights:
                # rebalance the positive-anchor draw toward rare classes
                # (matched_idx is only consulted where labels==1, so the
                # garbage class at unmatched rows is harmless)
                wtab = jnp.asarray(c.rpn_fg_class_weights, jnp.float32)
                rpn_w = wtab[jnp.clip(classes_i[m.matched_idx], 0,
                                      c.num_classes - 1)]
            idx, is_pos = subsample_labels(
                m.labels, c.rpn_batch_size_per_image, c.rpn_positive_fraction,
                rpn_key, fg_weights=rpn_w)
            sampled_obj = obj_i[idx]
            sampled_lbl = is_pos.astype(jnp.float32)
            rpn_cls = optax_sigmoid_ce(sampled_obj, sampled_lbl).mean()

            pos_anchor = anchors_cat[idx]
            pos_gt = boxes_i[m.matched_idx[idx]]
            rpn_targets = encode_deltas(pos_anchor, pos_gt,
                                        c.rpn_bbox_reg_weights)
            rpn_loc = (jnp.abs(deltas_i[idx] - rpn_targets).sum(-1)
                       * sampled_lbl).sum() / jnp.maximum(
                           c.rpn_batch_size_per_image, 1)

            # --- ROI sampling: proposals + gt boxes as candidates ---
            cand_boxes = jnp.concatenate([prop_boxes, boxes_i])
            cand_valid = jnp.concatenate(
                [prop_valid, valid_i])
            mm = match_boxes(cand_boxes, boxes_i, valid_i,
                             c.roi_fg_iou_thresh, c.roi_fg_iou_thresh)
            cand_labels = jnp.where(cand_valid, mm.labels, -1)
            roi_w = None
            if c.roi_fg_class_weights:
                wtab = jnp.asarray(c.roi_fg_class_weights, jnp.float32)
                roi_w = wtab[jnp.clip(classes_i[mm.matched_idx], 0,
                                      c.num_classes - 1)]
            sidx, s_pos = subsample_labels(
                cand_labels, c.roi_batch_size_per_image,
                c.roi_positive_fraction, roi_key, fg_weights=roi_w)
            roi_boxes = cand_boxes[sidx]
            roi_gt_idx = mm.matched_idx[sidx]
            roi_gt_boxes = boxes_i[roi_gt_idx]
            # class target: matched class for fg, background (C) for bg
            roi_cls_target = jnp.where(
                s_pos, classes_i[roi_gt_idx], c.num_classes)
            out = {
                "rpn_cls": rpn_cls, "rpn_loc": rpn_loc,
                "roi_boxes": roi_boxes,
                "cls_target": roi_cls_target,
                "reg_targets": encode_deltas(roi_boxes, roi_gt_boxes,
                                             c.roi_bbox_reg_weights),
                "is_pos": s_pos,
            }
            if c.mask_on:
                out["gt_roi_masks"] = crop_and_resize_masks(
                    masks_i[roi_gt_idx], roi_boxes, c.mask_head_resolution)
            return out

        sampled = jax.vmap(per_image_sample)(
            obj_cat, deltas_cat, proposals.boxes, proposals.valid,
            gt_boxes, gt_classes, gt_masks, gt_valid,
            jax.random.split(rng, b))

        feats_b = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
        roi_boxes = sampled["roi_boxes"]                      # [B,R,4]
        r = roi_boxes.shape[1]
        n = b * r
        tgt = sampled["cls_target"].reshape(n)
        fg = sampled["is_pos"].reshape(n).astype(jnp.float32)

        pooled = multilevel_roi_align_batched(
            feats_b, roi_boxes, STRIDES, c.pooler_resolution_box,
            c.canonical_box_size, c.canonical_level,
            window=c.pooler_window, use_pallas=c.pooler_pallas)
        logits, box_deltas = self.box_head(
            pooled.reshape((n,) + pooled.shape[2:]))

        if c.class_loss_weights:
            # per-roi weight by target class, background weight 1.0; torch
            # CrossEntropyLoss(weight=w) semantics: sum(w·ce)/sum(w)
            cw = jnp.asarray(tuple(c.class_loss_weights) + (1.0,),
                             jnp.float32)
            roi_w = cw[tgt]
            cls_loss = (softmax_ce(logits, tgt) * roi_w).sum() \
                / jnp.maximum(roi_w.sum(), 1.0)
        else:
            roi_w = jnp.ones((n,), jnp.float32)
            cls_loss = softmax_ce(logits, tgt).mean()

        fg_onehot = jax.nn.one_hot(
            jnp.clip(tgt, 0, c.num_classes - 1),
            c.num_classes, dtype=box_deltas.dtype)
        per_roi_deltas = jnp.einsum("rcd,rc->rd", box_deltas, fg_onehot)
        box_loss = (jnp.abs(per_roi_deltas
                            - sampled["reg_targets"].reshape(n, 4)).sum(-1)
                    * fg * roi_w).sum() / jnp.maximum(n, 1)

        losses = {"rpn_cls": sampled["rpn_cls"].mean(),
                  "rpn_loc": sampled["rpn_loc"].mean(),
                  "cls": cls_loss, "box_reg": box_loss}

        if c.mask_on:
            mpooled = multilevel_roi_align_batched(
                feats_b, roi_boxes, STRIDES, c.pooler_resolution_mask,
                c.canonical_box_size, c.canonical_level,
                window=c.pooler_window, use_pallas=c.pooler_pallas)
            mlogits = self.mask_head(
                mpooled.reshape((n,) + mpooled.shape[2:]))   # [B·R,28,28,C]
            sel = jax.nn.one_hot(
                jnp.clip(tgt, 0, c.num_classes - 1),
                c.num_classes, dtype=mlogits.dtype)
            per_class = jnp.einsum("rhwc,rc->rhw", mlogits, sel)
            gt_roi = sampled["gt_roi_masks"].reshape(
                n, c.mask_head_resolution, c.mask_head_resolution)
            mask_ce = optax_sigmoid_ce(per_class,
                                       (gt_roi > 0.5).astype(jnp.float32))
            # Detectron2's mask_rcnn_loss: mean over ALL fg rois in the
            # batch jointly (not per-image means averaged); with
            # class_loss_weights the mean is weighted per-roi by target class
            losses["mask"] = (mask_ce.mean(axis=(1, 2)) * fg * roi_w).sum() \
                / jnp.maximum((fg * roi_w).sum(), 1.0)
        return losses


def init_params(model: "MaskRCNN", rng: jax.Array,
                init_size: int = 128):
    """Initialize parameters with a tiny dummy image, under jit.

    Two pitfalls this avoids: (1) all parameters are H/W-independent, but
    ``model.init`` traces the entire inference graph at the dummy's
    resolution — at the production 1024×1344 canvas that is a 10+ minute
    compile; (2) un-jitted flax init executes eagerly, op by op — on a
    remote-attached TPU each op is a ~30 ms round-trip and init takes
    minutes even at 128².  jit + tiny dummy → seconds, identical params.
    """
    dummy = jnp.zeros((1, init_size, init_size, 3), jnp.float32)
    init_fn = jax.jit(
        lambda r: model.init(r, dummy, method=MaskRCNN.inference))
    return init_fn(rng)


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid BCE (max(x,0) - x*z + log1p(exp(-|x|)))."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def softmax_ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
