import jax
import jax.numpy as jnp
import numpy as np

from uwcv_tpu.ops.matcher import match_boxes, subsample_labels


def test_matcher_thresholds():
    anchors = jnp.array([
        [0, 0, 10, 10],    # iou 1.0 with gt0 → fg
        [0, 0, 20, 10],    # iou 0.5 → between 0.3 and 0.7 → ignore
        [100, 100, 110, 110],  # iou 0 → bg
    ], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    gt_valid = jnp.array([True, False])
    res = match_boxes(anchors, gt, gt_valid, 0.7, 0.3)
    assert list(np.asarray(res.labels)) == [1, -1, 0]
    assert int(res.matched_idx[0]) == 0


def test_matcher_padded_gt_never_matches():
    anchors = jnp.array([[0, 0, 10, 10]], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
    res = match_boxes(anchors, gt, jnp.array([False]), 0.7, 0.3)
    assert list(np.asarray(res.labels)) == [0]


def test_low_quality_matches():
    # gt1's best anchor only reaches IoU ~0.36 — forced fg under RPN rules
    anchors = jnp.array([
        [0, 0, 10, 10],
        [40, 40, 60, 60],
    ], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [45, 45, 57, 57]], jnp.float32)
    valid = jnp.array([True, True])
    res = match_boxes(anchors, gt, valid, 0.7, 0.3, allow_low_quality=False)
    assert list(np.asarray(res.labels)) == [1, -1]  # 0.36 → ignore band
    res2 = match_boxes(anchors, gt, valid, 0.7, 0.3, allow_low_quality=True)
    assert list(np.asarray(res2.labels)) == [1, 1]
    assert int(res2.matched_idx[1]) == 1


def test_subsample_counts_and_balance():
    labels = jnp.asarray(
        np.array([1] * 10 + [0] * 100 + [-1] * 20, np.int32))
    idx, is_pos = subsample_labels(labels, 32, 0.5, jax.random.key(0))
    assert idx.shape == (32,)
    lab = np.asarray(labels)[np.asarray(idx)]
    n_pos = int(np.asarray(is_pos).sum())
    assert n_pos == 10  # all positives taken (≤ 16 cap)
    np.testing.assert_array_equal(lab[np.asarray(is_pos)], 1)
    np.testing.assert_array_equal(lab[~np.asarray(is_pos)], 0)


def test_subsample_pos_cap():
    labels = jnp.asarray(np.array([1] * 100 + [0] * 100, np.int32))
    idx, is_pos = subsample_labels(labels, 32, 0.25, jax.random.key(1))
    assert int(np.asarray(is_pos).sum()) == 8  # 32 * 0.25
    lab = np.asarray(labels)[np.asarray(idx)]
    assert (lab[~np.asarray(is_pos)] == 0).all()


def test_subsample_no_positives():
    labels = jnp.asarray(np.array([0] * 50 + [-1] * 10, np.int32))
    idx, is_pos = subsample_labels(labels, 16, 0.5, jax.random.key(2))
    assert not np.asarray(is_pos).any()
    assert (np.asarray(labels)[np.asarray(idx)] == 0).all()


def test_subsample_jits():
    labels = jnp.zeros((64,), jnp.int32)
    f = jax.jit(lambda l, k: subsample_labels(l, 16, 0.5, k))
    idx, is_pos = f(labels, jax.random.key(0))
    assert idx.shape == (16,)


def test_subsample_weighted_prefers_heavy_candidates():
    # 1 rare-class fg among 40 fg; uniform sampling picks it in ~8/16 draws
    # in expectation is wrong — P(in sample of 8 of 40) = 0.2; with weight
    # 50 the Gumbel-top-k draw should nearly always include it.
    labels = jnp.asarray(np.array([1] * 40 + [0] * 100, np.int32))
    weights = np.ones(140, np.float32)
    weights[0] = 50.0
    hits = 0
    for s in range(30):
        idx, is_pos = subsample_labels(
            labels, 32, 0.25, jax.random.key(s),
            fg_weights=jnp.asarray(weights))
        sel = np.asarray(idx)[np.asarray(is_pos)]
        assert len(sel) == 8
        assert (np.asarray(labels)[sel] == 1).all()
        hits += int(0 in sel)
    assert hits >= 27  # ~50:1 odds per draw; uniform would give ~6/30


def test_subsample_weighted_zero_weight_excluded():
    labels = jnp.asarray(np.array([1] * 10 + [0] * 50, np.int32))
    weights = np.ones(60, np.float32)
    weights[3] = 0.0
    for s in range(20):
        idx, is_pos = subsample_labels(
            labels, 16, 0.5, jax.random.key(s),
            fg_weights=jnp.asarray(weights))
        sel = np.asarray(idx)[np.asarray(is_pos)]
        assert 3 not in sel
        # the other 9 positives still all fit under the cap of 8? no: cap=8,
        # 9 candidates — just check counts and labels
        assert len(sel) == 8
        assert (np.asarray(labels)[sel] == 1).all()


def test_subsample_weighted_uniform_weights_match_counts():
    # weights all equal == unweighted behavior statistically; counts exact
    labels = jnp.asarray(np.array([1] * 4 + [0] * 60, np.int32))
    idx, is_pos = subsample_labels(
        labels, 32, 0.25, jax.random.key(0),
        fg_weights=jnp.ones(64, jnp.float32))
    assert int(np.asarray(is_pos).sum()) == 4
    lab = np.asarray(labels)[np.asarray(idx)]
    np.testing.assert_array_equal(lab[np.asarray(is_pos)], 1)
    np.testing.assert_array_equal(lab[~np.asarray(is_pos)], 0)
