"""Pallas TPU kernel: fused greedy-NMS fixpoint (SURVEY.md N3).

The XLA formulation (ops/nms.py) materializes the [N,N] suppression matrix
in HBM and re-reads it every fixpoint iteration.  This kernel fuses the
whole pipeline in VMEM:

    boxes (sorted by score) → pairwise IoU → S = (IoU > thr) ∧ upper-tri
    → iterate k ← valid ∧ (Sᵀk == 0) until fixpoint → keep mask

For N ≤ 1024 everything (4 MB IoU f32 + 2 MB S bf16 + workspace) fits in a
v5e core's ~16 MB VMEM, so the iterations run at VMEM bandwidth with zero
HBM traffic after the 16 KB box load.  Larger problems (RPN's 5-level
concat) stay on the XLA path.

The kernel is exact greedy NMS — same fixpoint argument as ops/nms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_fixpoint_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold):
    boxes = boxes_ref[:]                       # [N, 4] f32 VMEM
    valid = valid_ref[:]                       # [N, 1] f32 (1.0 = valid)
    n = boxes.shape[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)   # [N,1]

    # pairwise IoU [N, N] — broadcasting column vs row vectors
    lt_x = jnp.maximum(x1, x1.T)
    lt_y = jnp.maximum(y1, y1.T)
    rb_x = jnp.minimum(x2, x2.T)
    rb_y = jnp.minimum(y2, y2.T)
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    union = area + area.T - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    upper = rows < cols
    vpair = (valid * valid.T) > 0.5
    s_mat = jnp.where((iou > iou_threshold) & upper & vpair,
                      1.0, 0.0).astype(jnp.bfloat16)             # [N,N]

    valid_row = valid.T > 0.5                                     # [1,N]

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < n)

    def body(state):
        k, _, it = state                                          # k [1,N]
        suppressed = jnp.dot(k.astype(jnp.bfloat16), s_mat,
                             preferred_element_type=jnp.float32)  # [1,N]
        k_new = jnp.logical_and(valid_row, suppressed < 0.5)
        return k_new, jnp.any(k_new != k), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid_row, jnp.array(True), 0))
    keep_ref[:] = keep.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_fixpoint_pallas(
    boxes_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """boxes_sorted [N,4] f32 (descending score), valid [N] bool →
    keep [N] bool (in sorted order)."""
    n = boxes_sorted.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_fixpoint_kernel, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32),
      valid.astype(jnp.float32).reshape(n, 1))
    return keep[0] > 0.5
