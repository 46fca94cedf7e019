"""Region Proposal Network — head + static-shape proposal selection
(SURVEY.md N2).

Detectron2's RPN does per-image dynamic filtering; here every stage has a
compile-time size:

1. the shared 3×3 conv head emits objectness + 4·A deltas per level;
2. per level: ``lax.top_k`` takes ``pre_nms_topk`` candidates (anchors are
   static constants folded into the program);
3. candidates from all levels are concatenated (padded), decoded, clipped;
4. one fixed-shape NMS keeps ``post_nms_topk`` proposals per image.

Note: Detectron2 runs NMS per level then takes the global top-k; since v0.3
it actually does NMS over the concatenated levels with level-offset ids
(batched_nms on level index).  We match that: NMS never merges boxes from
different levels (level offset trick), matching torch semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uwcv_tpu.config import ModelConfig
from uwcv_tpu.ops.nms import NEG_INF, nms_mask

# Added to per-level-guaranteed candidates before the cross-level top-k
# (rpn_post_nms_level_floor); far above any objectness logit, far below
# |NEG_INF| so suppressed entries stay last even if bonused by a bug.
# f32 quantization at 1e6 (~0.06) coarsens ordering WITHIN the bonused
# tier; harmless when 5*floor <= post_k (every guaranteed candidate wins a
# slot and downstream is order-agnostic), and only slot-arbitrates among
# near-tied guarantees when the floor overcommits the budget.
_FLOOR_BONUS = 1e6
from uwcv_tpu.structures.boxes import clip_boxes, decode_deltas, nonempty_boxes

LEVELS = ("p2", "p3", "p4", "p5", "p6")


class RPNHead(nn.Module):
    """Shared conv head: [B,H,W,C] → (objectness [B,H,W,A], deltas [B,H,W,A*4])."""

    num_anchors: int
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]):
        # Detectron2 init: all RPN convs N(0, 0.01), zero bias
        init = nn.initializers.normal(0.01)
        conv = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=init, name="rpn_conv")
        obj_head = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                           kernel_init=init, name="objectness")
        delta_head = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                             kernel_init=init, name="anchor_deltas")
        obj, deltas = {}, {}
        for name in LEVELS:
            h = nn.relu(conv(feats[name]))
            obj[name] = obj_head(h).astype(jnp.float32)
            deltas[name] = delta_head(h).astype(jnp.float32)
        return obj, deltas


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # [B, K, 4]
    scores: jnp.ndarray  # [B, K] objectness logits (sorted desc)
    valid: jnp.ndarray   # [B, K] bool


def generate_proposals(
    obj: Dict[str, jnp.ndarray],
    deltas: Dict[str, jnp.ndarray],
    anchors: Dict[str, jnp.ndarray],
    image_size: Tuple[int, int],
    cfg: ModelConfig,
    training: bool,
) -> Proposals:
    """Static-shape proposal selection for a batch.

    obj[level]: [B,H,W,A] logits; deltas[level]: [B,H,W,A*4];
    anchors[level]: [H*W*A, 4] constants for the padded image size.
    """
    pre_k = (cfg.rpn_pre_nms_topk_train if training
             else cfg.rpn_pre_nms_topk_test)
    post_k = (cfg.rpn_post_nms_topk_train if training
              else cfg.rpn_post_nms_topk_test)

    # proposal selection carries no gradients (Detectron2 decorates
    # find_top_rpn_proposals with @torch.no_grad(): RPN learns only from its
    # own losses; the ROI heads treat proposals as fixed training data).
    # This also keeps autodiff out of the Pallas NMS kernel, which has no
    # JVP rule — differentiating through it raises "Linearization failed"
    # when the candidate count fits the kernel's n<=1024 window.
    # Train-only: in inference it would be a no-op that still changes the
    # HLO hash and forces a pointless recompile of the predictor program.
    if training:
        obj = jax.lax.stop_gradient(obj)
        deltas = jax.lax.stop_gradient(deltas)

    def per_image(obj_i, deltas_i):
        cand_boxes, cand_scores = [], []
        for name in LEVELS:
            logits = obj_i[name].reshape(-1)          # [HWA]
            d = deltas_i[name].reshape(-1, 4)         # [HWA,4]
            k = min(pre_k, logits.shape[0])
            if cfg.rpn_approx_topk and not training and k < logits.shape[0]:
                # TPU PartialReduce approximate top-k (see config knob doc);
                # results are unsorted, which is fine: NMS sorts internally
                # and the final cross-level top_k re-sorts.
                top_scores, idx = jax.lax.approx_max_k(
                    logits, k, recall_target=cfg.rpn_approx_topk_recall)
            else:
                top_scores, idx = jax.lax.top_k(logits, k)
            sel_anchors = anchors[name][idx]
            sel_deltas = d[idx]
            boxes = decode_deltas(sel_deltas, sel_anchors,
                                  cfg.rpn_bbox_reg_weights)
            boxes = clip_boxes(boxes, image_size)
            ok = nonempty_boxes(boxes, 0.0)
            scores = jnp.where(ok, top_scores, NEG_INF)
            # PER-LEVEL NMS: Detectron2 (v0.3+) batched_nms on level ids
            # never suppresses across levels, so its suppression graph is
            # block-diagonal by level and per-level NMS is EXACTLY
            # equivalent to the concatenated level-offset pass this
            # replaces — while cutting the work ~levels× (five N≤pre_k
            # problems instead of one N=5·pre_k one) and keeping every
            # problem inside the Pallas VMEM kernel's n≤1024 window
            # (ops/pallas/nms_kernel.py), which the 5000-candidate
            # concatenated problem overflowed (PERF.md r3 sink: RPN head +
            # proposal NMS was 25.3 ms/batch).
            keep = nms_mask(boxes, scores, cfg.rpn_nms_thresh)
            cand_boxes.append(boxes)
            cand_scores.append(jnp.where(keep, scores, NEG_INF))

        boxes = jnp.concatenate(cand_boxes)      # [sum_k, 4]
        masked = jnp.concatenate(cand_scores)
        floor = 0 if training else cfg.rpn_post_nms_level_floor
        if floor > 0:
            # Guarantee each level's top-floor NMS survivors a slot in the
            # global budget: bonus them far above the logit range, select
            # on the bonused scores, then report the ORIGINAL scores.  A
            # level with fewer than `floor` survivors guarantees all of
            # them (the threshold falls to NEG_INF and the >NEG_INF/2
            # guard keeps suppressed entries out).  Exactly the global
            # top-k when every level's quota already ranks inside the
            # budget, so floor=0 ≡ no-op is also value-exact at large k.
            bonused = []
            for s in cand_scores:
                m = min(floor, s.shape[0])
                thr = jax.lax.top_k(s, m)[0][-1]
                guarantee = (s >= thr) & (s > NEG_INF / 2)
                bonused.append(jnp.where(guarantee, s + _FLOOR_BONUS, s))
            sel_scores = jnp.concatenate(bonused)
        else:
            sel_scores = masked
        top_sel, idx = jax.lax.top_k(sel_scores,
                                     min(post_k, sel_scores.shape[0]))
        top_scores = masked[idx] if floor > 0 else top_sel
        valid = top_scores > NEG_INF / 2
        out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
        return out_boxes, top_scores, valid

    b, s, v = jax.vmap(per_image)(obj, deltas)
    return Proposals(b, s, v)
