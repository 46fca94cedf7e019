"""IoU matcher + fixed-size balanced subsampler (SURVEY.md N6).

Rebuilds Detectron2's Matcher + subsample_labels for static shapes:

- match_quality: [A anchors/proposals × G padded gt] IoU matrix; padded gt
  rows contribute IoU 0 and can never match.
- labels: 1 = foreground, 0 = background, -1 = ignore (between thresholds).
- ``allow_low_quality_matches`` (RPN): every gt's best anchor is forced fg
  (Detectron2's set_low_quality_matches_, including the all-ties behavior).
- subsampling keeps counts *exactly* fixed (batch_size_per_image with
  positive_fraction cap) using random-priority top_k instead of dynamic
  masking — every train step sees identical shapes, so XLA compiles once.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from uwcv_tpu.structures.boxes import box_iou


class MatchResult(NamedTuple):
    matched_idx: jnp.ndarray   # [A] int32 — index of matched gt (0 if none)
    labels: jnp.ndarray        # [A] int32 — 1 fg / 0 bg / -1 ignore


def match(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_threshold: float,
    bg_threshold: float,
    allow_low_quality: bool = False,
) -> MatchResult:
    """iou [A,G] (rows anchors, cols gt), gt_valid [G] bool."""
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched_vals = jnp.max(iou, axis=1)          # [A]
    matched_idx = jnp.argmax(iou, axis=1)        # [A]

    labels = jnp.where(matched_vals >= fg_threshold, 1,
                       jnp.where(matched_vals < bg_threshold, 0, -1))

    if allow_low_quality:
        # for each valid gt, anchors achieving its max IoU become fg
        best_per_gt = jnp.max(iou, axis=0)       # [G]
        is_best = (iou == best_per_gt[None, :]) & gt_valid[None, :] & (
            best_per_gt[None, :] > 0)
        force_fg = jnp.any(is_best, axis=1)
        labels = jnp.where(force_fg, 1, labels)
        # point forced anchors at the gt they are best for
        forced_idx = jnp.argmax(is_best, axis=1)
        matched_idx = jnp.where(force_fg & (matched_vals < fg_threshold),
                                forced_idx, matched_idx)

    # anchors matched to nothing valid are background
    labels = jnp.where(matched_vals < 0, 0, labels)
    return MatchResult(matched_idx.astype(jnp.int32), labels.astype(jnp.int32))


def match_boxes(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_threshold: float,
    bg_threshold: float,
    allow_low_quality: bool = False,
) -> MatchResult:
    return match(box_iou(anchors, gt_boxes), gt_valid,
                 fg_threshold, bg_threshold, allow_low_quality)


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
    fg_weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly pick a fixed-size balanced sample (Detectron2
    subsample_labels) without dynamic shapes.

    Returns (idx [num_samples] int32, is_positive [num_samples] bool).
    Selection: up to num_samples*positive_fraction positives (random among
    fg), remainder backgrounds (random among bg).  If there are fewer
    positives/negatives than requested, the other kind fills in; rows beyond
    all available labeled entries fall back to background slots (index may
    repeat — harmless for loss averaging, standard padded-sample trick).

    ``fg_weights`` [N] (optional): relative sampling weight per candidate for
    the POSITIVE draw — weighted sampling *without replacement* via
    Gumbel-top-k (Efraimidis–Spirakis): priority = log(w) + Gumbel noise, so
    a candidate with weight w is w× as likely as a weight-1 peer at every
    draw.  Weight 0 (or negative) excludes the candidate.  This is the
    class-rebalance hook for rare classes that uniform sampling starves —
    the reference's uniform sampler visits the lone scale-bar ROI in only
    ~6% of image visits (QUALITY.md root-cause #2), which is why that class
    trains to AP 0.  None = uniform (exact Detectron2 behavior).
    """
    n = labels.shape[0]
    k_pos, k_neg = jax.random.split(key)
    max_pos = int(num_samples * positive_fraction)

    is_fg = labels == 1
    is_bg = labels == 0

    # random priorities; invalid candidates get -inf
    if fg_weights is None:
        pos_prio = jnp.where(is_fg, jax.random.uniform(k_pos, (n,)), -jnp.inf)
    else:
        u = jax.random.uniform(k_pos, (n,), minval=1e-20, maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
        logw = jnp.log(jnp.maximum(fg_weights.astype(jnp.float32), 1e-20))
        pos_prio = jnp.where(is_fg & (fg_weights > 0), logw + gumbel,
                             -jnp.inf)
    neg_prio = jnp.where(is_bg, jax.random.uniform(k_neg, (n,)), -jnp.inf)

    pos_vals, pos_idx = jax.lax.top_k(pos_prio, min(max_pos, n))
    pos_take = pos_vals > -jnp.inf
    num_pos = jnp.sum(pos_take.astype(jnp.int32))

    n_neg_slots = num_samples - min(max_pos, n)
    # negatives fill: requested = num_samples - num_pos
    neg_vals, neg_idx = jax.lax.top_k(neg_prio, min(num_samples, n))
    neg_rank = jnp.arange(min(num_samples, n))
    neg_take = (neg_vals > -jnp.inf) & (neg_rank < (num_samples - num_pos))

    # assemble fixed-size output: positives first, then negatives
    all_idx = jnp.concatenate([pos_idx, neg_idx])
    all_take = jnp.concatenate([pos_take, neg_take])
    all_pos = jnp.concatenate([jnp.ones_like(pos_take),
                               jnp.zeros_like(neg_take)])
    # stable-compact the taken entries to the front
    order = jnp.argsort(~all_take, stable=True)
    idx = all_idx[order][:num_samples]
    taken = all_take[order][:num_samples]
    is_pos = all_pos[order][:num_samples] & taken
    # untaken tail repeats the first taken background (or index 0)
    fallback = idx[0]
    idx = jnp.where(taken, idx, fallback)
    return idx.astype(jnp.int32), is_pos
