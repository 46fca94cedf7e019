"""Pallas kernels in interpret mode vs the XLA reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uwcv_tpu.ops.nms import NEG_INF, nms_mask
from uwcv_tpu.ops.pallas.nms_kernel import nms_fixpoint_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_nms_matches_xla(seed):
    rng = np.random.default_rng(seed)
    n = 128
    centers = rng.uniform(20, 200, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    scores[-16:] = NEG_INF

    order = np.argsort(-scores, kind="stable")
    boxes_sorted = jnp.asarray(boxes[order])
    valid = jnp.asarray(scores[order] > NEG_INF / 2)

    keep_pallas = np.asarray(nms_fixpoint_pallas(
        boxes_sorted, valid, 0.5, interpret=True))
    keep_xla = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))[order]
    np.testing.assert_array_equal(keep_pallas, keep_xla)


def test_pallas_nms_all_disjoint():
    n = 8
    boxes = jnp.asarray(
        [[i * 100.0, 0, i * 100 + 50, 50] for i in range(n)], jnp.float32)
    valid = jnp.ones((n,), bool)
    keep = np.asarray(nms_fixpoint_pallas(boxes, valid, 0.5, interpret=True))
    assert keep.all()


def test_pallas_nms_chain_suppression():
    # A overlaps B, B overlaps C, A∩C small: greedy keeps A and C.
    boxes = jnp.asarray([[0, 0, 10, 10], [6, 0, 16, 10], [12, 0, 22, 10]],
                        jnp.float32)
    valid = jnp.ones((3,), bool)
    keep = np.asarray(nms_fixpoint_pallas(boxes, valid, 0.2, interpret=True))
    assert list(keep) == [True, False, True]


def test_pallas_roi_align_matches_xla():
    """Fused batched RoIAlign kernel (interpret mode) vs the vmapped XLA
    windowed path — must agree to float tolerance incl. the virtual-p6
    bump for oversized rois."""
    from uwcv_tpu.ops.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_batched,
    )

    rng = np.random.default_rng(5)
    B, C = 2, 8
    feats = {f"p{l}": jnp.asarray(rng.normal(
        0, 1, (B, 256 >> (l - 2), 320 >> (l - 2), C)).astype(np.float32))
        for l in range(2, 6)}
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    boxes = []
    for _ in range(B):
        ctr = rng.uniform(60, 900, (15, 2))
        wh = rng.uniform(16, 400, (15, 2))
        bx = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
        bx = np.concatenate([bx, [[10, 200, 1000, 230]]])  # image-wide bar
        boxes.append(bx)
    rois = jnp.asarray(np.stack(boxes).astype(np.float32))

    ref = jax.vmap(lambda f, r: multilevel_roi_align(f, r, strides, 7))(
        feats, rois)
    got = multilevel_roi_align_batched(feats, rois, strides, 7,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pooler_custom_vjp_grad_matches_xla():
    """Gradient through the custom_vjp pooler (Pallas-kernel forward in
    interpret mode, XLA scatter-add backward) vs autodiff of the plain
    vmapped XLA pooler — training pools through the kernel (VERDICT r2 #3),
    so d(loss)/d(features) must agree."""
    from uwcv_tpu.ops.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_batched,
    )

    rng = np.random.default_rng(11)
    B, C = 2, 4
    feats = {f"p{l}": jnp.asarray(rng.normal(
        0, 1, (B, 64 >> (l - 2), 80 >> (l - 2), C)).astype(np.float32))
        for l in range(2, 6)}
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    ctr = rng.uniform(40, 200, (B, 6, 2))
    wh = rng.uniform(16, 120, (B, 6, 2))
    rois = jnp.asarray(np.concatenate(
        [ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32))
    cotangent = jnp.asarray(
        rng.normal(0, 1, (B, 6, 7, 7, C)).astype(np.float32))

    def loss_kernel(f):
        out = multilevel_roi_align_batched(f, rois, strides, 7,
                                           interpret=True)
        return (out * cotangent).sum()

    def loss_xla(f):
        out = jax.vmap(lambda ff, rr: multilevel_roi_align(
            ff, rr, strides, 7))(f, rois)
        return (out * cotangent).sum()

    v_k, g_kernel = jax.value_and_grad(loss_kernel)(feats)
    v_x, g_xla = jax.value_and_grad(loss_xla)(feats)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    for lvl in g_xla:
        np.testing.assert_allclose(np.asarray(g_kernel[lvl]),
                                   np.asarray(g_xla[lvl]),
                                   rtol=1e-4, atol=1e-5)
