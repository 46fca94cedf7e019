"""Pallas TPU kernel: fused greedy NMS (SURVEY.md N3).

Exact sequential greedy NMS in a single kernel: boxes (sorted by score
descending) live in VMEM (N×4 f32 = 16 KB at N=1000) and a ``fori_loop``
walks the ranking; each step computes box i's IoU row against all boxes
*on the fly* (no [N,N] matrix anywhere) and clears suppressed survivors —
O(N) VPU work per step, O(N²) total, all at VMEM bandwidth with zero
HBM traffic and zero per-step dispatch overhead.

Why not the fixpoint matvec here: Mosaic cannot legalize
``lax.while_loop`` with convergence-dependent trips (scf.yield), and a
matvec fixpoint needs the [N,N] suppression matrix in VMEM, capping N at
~1024.  This formulation needs only O(N) memory, so one kernel serves both
ROI-head NMS (N≈1024) and RPN NMS (N≈5000).

The XLA fixpoint in ops/nms.py remains the fallback/oracle path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_greedy_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold):
    boxes = boxes_ref[:]                     # [N, 4] f32 VMEM
    n = boxes.shape[0]

    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)   # [N]

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]       # [N]

    def body(i, k):
        # row i of the box set, read with a dynamic sublane slice
        bi = boxes_ref[pl.ds(i, 1), :]                              # [1,4]
        bx1, by1, bx2, by2 = bi[0, 0], bi[0, 1], bi[0, 2], bi[0, 3]
        ai = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)

        inter_w = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        inter_h = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = inter_w * inter_h
        union = ai + area - inter
        iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)

        alive = jnp.sum(jnp.where(cols == i, k, 0.0))               # k[i]
        suppress = ((iou > iou_threshold) & (cols > i)
                    & (alive > 0.5)).astype(jnp.float32)
        return k * (1.0 - suppress)

    k0 = valid_ref[:].reshape(n)                                    # [N] f32
    keep = jax.lax.fori_loop(0, n, body, k0)
    keep_ref[:] = keep.reshape(1, n)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_greedy_pallas(
    boxes_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """boxes_sorted [N,4] f32 (descending score), valid [N] bool →
    keep [N] bool (in sorted order)."""
    n = boxes_sorted.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_greedy_kernel, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32),
      valid.astype(jnp.float32).reshape(1, n))
    return keep[0] > 0.5


# kept as the public name used by ops/nms.py
nms_fixpoint_pallas = nms_greedy_pallas
