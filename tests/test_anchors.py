import numpy as np

from uwcv_tpu.models.anchors import (
    anchors_for_level,
    generate_anchors,
    generate_cell_anchors,
)


def test_cell_anchor_geometry():
    cell = generate_cell_anchors([32.0], [0.5, 1.0, 2.0])
    assert cell.shape == (3, 4)
    for row, ar in zip(cell, [0.5, 1.0, 2.0]):
        w = row[2] - row[0]
        h = row[3] - row[1]
        np.testing.assert_allclose(w * h, 32.0 * 32.0, rtol=1e-5)
        np.testing.assert_allclose(h / w, ar, rtol=1e-5)
        # centered at origin
        np.testing.assert_allclose(row[0] + row[2], 0.0, atol=1e-5)


def test_level_anchor_grid():
    a = anchors_for_level(2, 3, 16, [32.0], [1.0])
    assert a.shape == (6, 4)
    centers_x = (a[:, 0] + a[:, 2]) / 2
    centers_y = (a[:, 1] + a[:, 3]) / 2
    # row-major over (y, x): x cycles 0,16,32 then repeats
    np.testing.assert_allclose(centers_x, [0, 16, 32, 0, 16, 32])
    np.testing.assert_allclose(centers_y, [0, 0, 0, 16, 16, 16])


def test_fpn_anchor_counts():
    anchors = generate_anchors(
        (800, 800),
        strides=(4, 8, 16, 32, 64),
        sizes_per_level=((32.0,), (64.0,), (128.0,), (256.0,), (512.0,)),
        aspect_ratios=(0.5, 1.0, 2.0),
    )
    assert len(anchors) == 5
    expected = [200 * 200 * 3, 100 * 100 * 3, 50 * 50 * 3, 25 * 25 * 3, 13 * 13 * 3]
    assert [a.shape[0] for a in anchors] == expected


def test_generate_proposals_approx_topk_matches_exact():
    """rpn_approx_topk swaps the per-level pre-NMS selection for
    jax.lax.approx_max_k; with recall_target high and k << N the surviving
    proposal set must be (near-)identical to the exact path.  On the CPU
    backend approx_max_k lowers to an exact reduction, so this pins the
    wiring (unsorted candidate order must not change the final top-k) while
    the mAP neutrality of the true TPU approximation is measured on chip
    (tools/topk_ab.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from uwcv_tpu.config import ModelConfig
    from uwcv_tpu.models.rpn import LEVELS, generate_proposals

    cfg = ModelConfig(depth=26, rpn_pre_nms_topk_test=50,
                      rpn_post_nms_topk_test=20)
    h = w = 64
    per_level = generate_anchors(
        (h, w), strides=cfg.anchor_stride_levels,
        sizes_per_level=cfg.anchor_sizes,
        aspect_ratios=cfg.anchor_aspect_ratios)
    anchors = {n: jnp.asarray(a) for n, a in zip(LEVELS, per_level)}
    a = len(cfg.anchor_aspect_ratios)
    rng = np.random.default_rng(3)
    obj, deltas = {}, {}
    for name, stride in zip(LEVELS, cfg.anchor_stride_levels):
        fh, fw = -(-h // stride), -(-w // stride)
        obj[name] = jnp.asarray(
            rng.normal(0, 1, (2, fh, fw, a)).astype("f"))
        deltas[name] = jnp.asarray(
            rng.normal(0, 0.1, (2, fh, fw, a * 4)).astype("f"))

    exact = generate_proposals(obj, deltas, anchors, (h, w), cfg,
                               training=False)
    cfg_approx = dataclasses.replace(cfg, rpn_approx_topk=True)
    approx = generate_proposals(obj, deltas, anchors, (h, w), cfg_approx,
                                training=False)

    assert approx.boxes.shape == exact.boxes.shape
    assert approx.scores.shape == exact.scores.shape
    # scores sorted descending in both paths
    s = np.asarray(approx.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # surviving sets near-identical (CPU lowering is exact → equal; leave
    # headroom for a backend that returns a true approximation)
    for b in range(2):
        se = set(np.round(np.asarray(exact.scores[b])[
            np.asarray(exact.valid[b])], 5).tolist())
        sa = set(np.round(s[b][np.asarray(approx.valid[b])], 5).tolist())
        inter = len(se & sa)
        assert inter >= 0.9 * max(len(se), 1)


def _toy_rpn_inputs(cfg, h, w, seed=7, bias=None):
    """Random RPN maps; ``bias`` maps level name -> additive logit shift."""
    import jax.numpy as jnp

    from uwcv_tpu.models.rpn import LEVELS

    per_level = generate_anchors(
        (h, w), strides=cfg.anchor_stride_levels,
        sizes_per_level=cfg.anchor_sizes,
        aspect_ratios=cfg.anchor_aspect_ratios)
    anchors = {n: jnp.asarray(a) for n, a in zip(LEVELS, per_level)}
    a = len(cfg.anchor_aspect_ratios)
    rng = np.random.default_rng(seed)
    obj, deltas = {}, {}
    for name, stride in zip(LEVELS, cfg.anchor_stride_levels):
        fh, fw = -(-h // stride), -(-w // stride)
        shift = (bias or {}).get(name, 0.0)
        obj[name] = jnp.asarray(
            rng.normal(shift, 1, (1, fh, fw, a)).astype("f"))
        deltas[name] = jnp.asarray(
            rng.normal(0, 0.1, (1, fh, fw, a * 4)).astype("f"))
    return obj, deltas, anchors


def test_post_nms_level_floor():
    """rpn_post_nms_level_floor guarantees every level's top-m NMS
    survivors a slot in the cross-level budget; floor=0 is the exact
    Detectron2 global top-k; with a budget large enough for everything the
    selected SET is identical either way."""
    import dataclasses

    from uwcv_tpu.config import ModelConfig
    from uwcv_tpu.models.rpn import LEVELS, generate_proposals

    h = w = 64
    # p2 logits shifted +4: it would monopolize a small global budget
    cfg = ModelConfig(depth=26, rpn_pre_nms_topk_test=100,
                      rpn_post_nms_topk_test=40)
    obj, deltas, anchors = _toy_rpn_inputs(cfg, h, w, bias={"p2": 4.0})

    def boxes_set(props):
        b = np.asarray(props.boxes[0])[np.asarray(props.valid[0])]
        return {tuple(np.round(r, 4)) for r in b}

    base = generate_proposals(obj, deltas, anchors, (h, w), cfg,
                              training=False)
    floored = generate_proposals(
        obj, deltas, anchors, (h, w),
        dataclasses.replace(cfg, rpn_post_nms_level_floor=5),
        training=False)
    # every level's top-5 survivors must be present with the floor
    per_level = generate_proposals(
        obj, deltas, anchors, (h, w),
        dataclasses.replace(cfg, rpn_post_nms_topk_test=5,
                            rpn_post_nms_level_floor=5),
        training=False)
    got = boxes_set(floored)
    # reconstruct each level's top-5 by running with a huge budget and
    # grouping survivors by their level's anchor ownership: simpler — the
    # floored run at budget 40 must contain >= 5 boxes NOT in the
    # unfloored run (p5/p6 starve without the floor at this budget)
    base_set = boxes_set(base)
    assert len(got - base_set) >= 5
    # scores must be the ORIGINAL logits (no bonus leaking out)
    s = np.asarray(floored.scores[0])[np.asarray(floored.valid[0])]
    assert np.abs(s).max() < 100.0
    # same candidate count out
    assert floored.boxes.shape == base.boxes.shape
    # with a budget that fits every NMS survivor, floor changes nothing
    big = dataclasses.replace(cfg, rpn_post_nms_topk_test=500)
    bigf = dataclasses.replace(big, rpn_post_nms_level_floor=5)
    assert boxes_set(
        generate_proposals(obj, deltas, anchors, (h, w), big,
                           training=False)) == boxes_set(
        generate_proposals(obj, deltas, anchors, (h, w), bigf,
                           training=False))
