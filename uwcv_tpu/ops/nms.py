"""Fixed-shape non-maximum suppression (SURVEY.md N3).

The reference relies on torchvision's CUDA NMS (dynamic output length) inside
Detectron2's RPN and ROI heads.  TPU/XLA wants static shapes and no
data-dependent control flow, so this NMS:

- works on padded [N] box sets (invalid entries carry score -inf);
- returns a fixed-size keep *mask* plus scores, never a dynamic index list;
- computes the EXACT greedy-NMS fixpoint without a length-N sequential loop.

The algorithm: sort by score, build the boolean suppression matrix
S[i, j] = (i < j) & (IoU > thr), then iterate

    k ← valid & (Sᵀ k == 0)

starting from k = valid.  The iteration converges to the unique greedy
solution in at most the longest suppression-chain length (typically < 16,
never more than N), and each step is one [N,N]×[N] matvec on the MXU —
thousands of times fewer sequential steps than the textbook loop.  The same
trick underlies TF's TPU NMS.  S is kept in bf16 (values 0/1) with f32
accumulation, so N=5000 RPN-scale problems stay cheap.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from uwcv_tpu.structures.boxes import box_iou

NEG_INF = -1e10

# The Pallas VMEM-resident kernel handles N ≤ this cap (see
# ops/pallas/nms_kernel.py).  It is OPT-IN (UWCV_NMS_PALLAS=1): the greedy
# kernel runs N sequential fori_loop steps of O(N) VPU work — latency-bound
# at ~2.7 ms per problem regardless of size — while the fixpoint is
# ~chain-depth (10-15) highly-parallel matvec iterations.  Measured in-graph
# on a v5e chip (tools/nms_bench.py, 40 problems of N=1024 per batch):
# fixpoint 3.4 ms vs kernel 109 ms, identical keep masks.  The r2 standalone
# measurement (3.3-4.0 ms/call) was dispatch-floor-bound and hid this.
_PALLAS_MAX_N = 1024


def _pallas_available() -> bool:
    """Generic TPU-kernel gate (also used by the RoIAlign kernel — a
    measured 3.8× win that stays DEFAULT-ON, unlike the NMS kernel)."""
    import os

    if os.environ.get("UWCV_DISABLE_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


def _nms_kernel_enabled() -> bool:
    import os

    return bool(os.environ.get("UWCV_NMS_PALLAS")) and _pallas_available()


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Exact greedy NMS over padded boxes.

    boxes  [N,4], scores [N] (padding = NEG_INF scores).
    Returns keep [N] bool.  Greedy order = descending score, ties broken by
    lower index (matches torch stable sort).

    Default path = the XLA fixpoint (fastest in-graph formulation measured,
    see _PALLAS_MAX_N note); UWCV_NMS_PALLAS=1 opts into the sequential
    Pallas greedy kernel for N ≤ 1024 (identical results).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores, stable=True)
    boxes_sorted = boxes[order]
    scores_sorted = scores[order]
    valid = scores_sorted > NEG_INF / 2

    if n <= _PALLAS_MAX_N and _nms_kernel_enabled():
        from uwcv_tpu.ops.pallas.nms_kernel import nms_fixpoint_pallas

        # pad to the 128-lane tile: Mosaic mis-handles sub-tile lane dims
        # (small-N problems appear since RPN NMS went per-level — p5/p6
        # candidate counts at small canvases are 12..192).  Padded entries
        # are invalid zero-area boxes: IoU 0 against everything, no effect.
        n_pad = max(128, -(-n // 128) * 128)
        if n_pad != n:
            boxes_sorted = jnp.pad(boxes_sorted, ((0, n_pad - n), (0, 0)))
            valid_p = jnp.pad(valid, (0, n_pad - n))
        else:
            valid_p = valid
        keep_sorted = nms_fixpoint_pallas(
            boxes_sorted, valid_p, float(iou_threshold))[:n]
        keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
        return keep & (scores > NEG_INF / 2)

    iou = box_iou(boxes_sorted, boxes_sorted)
    # strict upper triangle via iota comparison — NOT jnp.triu(ones), which
    # constant-folds an n² literal into the HLO (25 MB at RPN scale)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s_mat = ((iou > iou_threshold) & (rows < cols) & valid[None, :]
             & valid[:, None]).astype(jnp.bfloat16)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        k, _, it = state
        suppressed = jnp.dot(k.astype(jnp.bfloat16), s_mat,
                             preferred_element_type=jnp.float32)
        k_new = valid & (suppressed < 0.5)
        return k_new, jnp.any(k_new != k), it + 1

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.array(True), 0))
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
