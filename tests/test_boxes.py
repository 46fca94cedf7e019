import jax.numpy as jnp
import numpy as np
import pytest

from uwcv_tpu.structures import (
    box_area,
    box_iou,
    clip_boxes,
    decode_deltas,
    encode_deltas,
    nonempty_boxes,
)


def test_box_area():
    boxes = jnp.array([[0, 0, 10, 10], [5, 5, 5, 5], [2, 2, 0, 0]], jnp.float32)
    np.testing.assert_allclose(box_area(boxes), [100.0, 0.0, 0.0])


def test_box_iou_identity_and_disjoint():
    a = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    iou = box_iou(a, a)
    np.testing.assert_allclose(iou, [[1.0, 0.0], [0.0, 1.0]], atol=1e-6)


def test_box_iou_half_overlap():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 5, 10, 15]], jnp.float32)  # half overlap
    np.testing.assert_allclose(box_iou(a, b), [[50.0 / 150.0]], atol=1e-6)


def test_box_iou_padded_boxes_zero():
    a = jnp.array([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    iou = box_iou(a, a)
    assert iou[1, 1] == 0.0 and iou[0, 1] == 0.0
    assert not np.any(np.isnan(np.asarray(iou)))


def test_clip_and_nonempty():
    boxes = jnp.array([[-5, -5, 15, 8], [3, 3, 2, 9]], jnp.float32)
    clipped = clip_boxes(boxes, (10, 12))
    np.testing.assert_allclose(clipped, [[0, 0, 12, 8], [3, 3, 2, 9]])
    mask = nonempty_boxes(clipped)
    assert list(np.asarray(mask)) == [True, False]


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_encode_decode_roundtrip(weights):
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (64, 2))
    src = np.concatenate([src, src + rng.uniform(5, 50, (64, 2))], axis=1)
    tgt = rng.uniform(0, 100, (64, 2))
    tgt = np.concatenate([tgt, tgt + rng.uniform(5, 50, (64, 2))], axis=1)
    src_j = jnp.asarray(src, jnp.float32)
    tgt_j = jnp.asarray(tgt, jnp.float32)
    deltas = encode_deltas(src_j, tgt_j, weights)
    rec = decode_deltas(deltas, src_j, weights)
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


def test_decode_broadcast_over_classes():
    boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)  # [1,4]
    deltas = jnp.zeros((1, 3, 4), jnp.float32)  # per-class deltas
    out = decode_deltas(deltas, boxes[:, None, :])
    assert out.shape == (1, 3, 4)
    np.testing.assert_allclose(out[0, 0], [0, 0, 10, 10], atol=1e-5)


def test_decode_scale_clamp_no_overflow():
    boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]], jnp.float32)
    out = decode_deltas(deltas, boxes)
    assert np.all(np.isfinite(np.asarray(out)))
