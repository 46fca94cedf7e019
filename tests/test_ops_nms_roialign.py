import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwcv_tpu.ops.nms import NEG_INF, batched_class_nms_mask, nms_mask, nms_topk
from uwcv_tpu.ops.roi_align import (
    fpn_level_assignment,
    multilevel_roi_align,
    roi_align_level,
)


# ---------------- NMS oracle ----------------

def nms_oracle(boxes, scores, thresh):
    """Greedy NMS, plain numpy (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= NEG_INF / 2:
            continue
        keep[i] = True
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        union = a1 + a2 - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
        lower = scores < scores[i]
        same = (scores == scores[i]) & (np.arange(len(boxes)) != i)
        # stable order: among equal scores, lower index ranks first
        later = lower | (same & (np.argsort(np.argsort(-scores, kind="stable"))
                                 > np.argsort(np.argsort(-scores, kind="stable"))[i]))
        suppressed |= (iou > thresh) & later
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 64
    centers = rng.uniform(20, 200, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1
                           ).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    # add padding entries
    boxes[-8:] = 0
    scores[-8:] = NEG_INF
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    expected = nms_oracle(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, expected)


def test_nms_simple_case():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7], jnp.float32)
    keep = nms_mask(boxes, scores, 0.5)
    assert list(np.asarray(keep)) == [True, False, True]


def test_nms_topk_shapes_and_padding():
    boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.array([0.9, 0.7], jnp.float32)
    out_boxes, out_scores, valid = nms_topk(boxes, scores, 0.5, max_out=5)
    assert out_boxes.shape == (5, 4)
    assert list(np.asarray(valid)) == [True, True, False, False, False]
    np.testing.assert_allclose(out_boxes[0], [0, 0, 10, 10])


def test_batched_class_nms_keeps_cross_class_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8], jnp.float32)
    classes = jnp.array([0, 1], jnp.int32)
    keep = batched_class_nms_mask(boxes, scores, classes, 0.5)
    assert list(np.asarray(keep)) == [True, True]
    same = batched_class_nms_mask(boxes, scores, jnp.array([0, 0]), 0.5)
    assert list(np.asarray(same)) == [True, False]


def test_nms_jit_compiles():
    f = jax.jit(lambda b, s: nms_mask(b, s, 0.5))
    boxes = jnp.zeros((16, 4), jnp.float32)
    scores = jnp.full((16,), NEG_INF, jnp.float32)
    assert not np.asarray(f(boxes, scores)).any()


# ---------------- RoIAlign oracle ----------------

def roi_align_oracle(feat, roi, stride, out_size, spb=2):
    """Direct per-sample bilinear implementation (numpy)."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = roi / stride - np.array([0.5, 0.5, 0.5, 0.5]) * 0  # placeholder
    x1 = roi[0] / stride - 0.5
    y1 = roi[1] / stride - 0.5
    x2 = roi[2] / stride - 0.5
    y2 = roi[3] / stride - 0.5
    rw = max(x2 - x1, 1e-6)
    rh = max(y2 - y1, 1e-6)
    s = out_size * spb
    out = np.zeros((out_size, out_size, c), np.float32)
    for by in range(out_size):
        for bx in range(out_size):
            acc = np.zeros(c, np.float32)
            for jy in range(spb):
                for jx in range(spb):
                    ty = (by * spb + jy + 0.5) / s
                    tx = (bx * spb + jx + 0.5) / s
                    y = np.clip(y1 + ty * rh, 0, h - 1)
                    x = np.clip(x1 + tx * rw, 0, w - 1)
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    fy, fx = y - y0, x - x0
                    v = (feat[y0, x0] * (1 - fy) * (1 - fx)
                         + feat[y0, x1i] * (1 - fy) * fx
                         + feat[y1i, x0] * fy * (1 - fx)
                         + feat[y1i, x1i] * fy * fx)
                    acc += v
            out[by, bx] = acc / (spb * spb)
    return out


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(32, 40, 3)).astype(np.float32)
    rois = np.array([[8, 8, 72, 48], [0, 0, 20, 20], [30, 40, 150, 120]],
                    np.float32)
    got = np.asarray(roi_align_level(jnp.asarray(feat), jnp.asarray(rois),
                                     stride=4, output_size=7))
    for i, roi in enumerate(rois):
        want = roi_align_oracle(feat, roi, 4, 7)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_roi_align_constant_feature():
    feat = jnp.full((16, 16, 2), 3.5, jnp.float32)
    rois = jnp.array([[4, 4, 40, 40]], jnp.float32)
    out = roi_align_level(feat, rois, stride=4, output_size=7)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_fpn_level_assignment():
    boxes = jnp.array([
        [0, 0, 56, 56],     # sqrt(area)=56 → lvl 2
        [0, 0, 112, 112],   # → lvl 3
        [0, 0, 224, 224],   # → lvl 4
        [0, 0, 448, 448],   # → lvl 5
        [0, 0, 1000, 1000], # → clamp 5
        [0, 0, 10, 10],     # → clamp 2
    ], jnp.float32)
    lv = np.asarray(fpn_level_assignment(boxes))
    assert list(lv) == [2, 3, 4, 5, 5, 2]


def test_multilevel_windowed_matches_single_level_oracle():
    # rois assigned to p3 (size 112) and p4 (size 224): windowed multilevel
    # pooling must equal the exact single-level gather implementation
    rng = np.random.default_rng(3)
    feats = {f"p{l}": jnp.asarray(
        rng.normal(size=(256 >> (l - 2), 256 >> (l - 2), 8)), jnp.float32)
        for l in range(2, 6)}
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    rois = jnp.array([[40, 40, 152, 152],      # 112 → p3
                      [100, 60, 324, 284]],     # 224 → p4
                     jnp.float32)
    got = np.asarray(multilevel_roi_align(feats, rois, strides, 7))
    want_p3 = np.asarray(roi_align_level(feats["p3"], rois[:1], 8, 7))
    want_p4 = np.asarray(roi_align_level(feats["p4"], rois[1:], 16, 7))
    np.testing.assert_allclose(got[0], want_p3[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want_p4[0], rtol=1e-4, atol=1e-4)


def test_multilevel_roi_align_selects_level():
    # make each level a distinct constant; the output per roi reveals its level
    feats = {f"p{l}": jnp.full((max(1, 64 >> (l - 2)),
                                max(1, 64 >> (l - 2)), 1), float(l))
             for l in range(2, 6)}
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    rois = jnp.array([[0, 0, 56, 56], [0, 0, 224, 224], [0, 0, 448, 448]],
                     jnp.float32)
    out = multilevel_roi_align(feats, rois, strides, output_size=3)
    vals = np.asarray(out).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(vals, [2.0, 4.0, 5.0], rtol=1e-5)


def _ramp_feats(h_img, w_img, c=2):
    """f(x,y) = x_px + 2*y_px sampled at each level's cell centers —
    bilinear interpolation and 2x avg-pooling are both EXACT on a linear
    ramp, so any output error means lost coverage, not resampling blur."""
    feats = {}
    for l in range(2, 6):
        s = 2 ** l
        h, w = h_img // s, w_img // s
        ys = (np.arange(h) + 0.5) * s
        xs = (np.arange(w) + 0.5) * s
        f = (xs[None, :] + 2.0 * ys[:, None]).astype(np.float32)
        feats[f"p{l}"] = jnp.asarray(np.repeat(f[..., None], c, -1))
    return feats


def test_image_wide_roi_full_coverage():
    """VERDICT r1 #6: the SEM scale-bar scenario — an image-wide thin box
    (sqrt-area assigns it to a FINE level, span overflows the window) and an
    image-sized box clamped at p5.  Both must see their full extent via the
    coarse-level bump; window truncation would miss ~90% of the bar."""
    h_img, w_img = 1024, 1344
    feats = _ramp_feats(h_img, w_img)
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    rois = jnp.array([
        [20.0, 500.0, 1320.0, 512.0],    # scale bar: 1300x12 px -> lvl 3
        [10.0, 10.0, 1334.0, 1014.0],    # image-sized -> clamped lvl 5
    ], jnp.float32)
    out = np.asarray(multilevel_roi_align(feats, rois, strides, 7))

    # oracle: exact RoIAlign on each roi's eq.-1 assigned level
    f3 = np.asarray(feats["p3"])
    f5 = np.asarray(feats["p5"])
    want0 = roi_align_oracle(f3, np.asarray(rois[0]), 8, 7)
    want1 = roi_align_oracle(f5, np.asarray(rois[1]), 32, 7)
    # ramp values span [0, ~3400]; demand <0.5% of the dynamic range
    np.testing.assert_allclose(out[0], want0, atol=15.0)
    np.testing.assert_allclose(out[1], want1, atol=15.0)


def test_multilevel_windowed_window28_matches_oracle():
    """window=28 (the DMA-narrowed production setting, config
    model.pooler_window): in-window rois stay exact, and the elongated /
    oversized rois still get full coverage via the earlier coarse-level
    bump."""
    rng = np.random.default_rng(4)
    feats = {f"p{l}": jnp.asarray(
        rng.normal(size=(256 >> (l - 2), 256 >> (l - 2), 8)), jnp.float32)
        for l in range(2, 6)}
    strides = {f"p{l}": 2 ** l for l in range(2, 6)}
    rois = jnp.array([[40, 40, 152, 152],      # 112 → p3, span 14 cells
                      [100, 60, 324, 284]],     # 224 → p4, span 14 cells
                     jnp.float32)
    got = np.asarray(multilevel_roi_align(feats, rois, strides, 7,
                                          window=28))
    want_p3 = np.asarray(roi_align_level(feats["p3"], rois[:1], 8, 7))
    want_p4 = np.asarray(roi_align_level(feats["p4"], rois[1:], 16, 7))
    np.testing.assert_allclose(got[0], want_p3[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want_p4[0], rtol=1e-4, atol=1e-4)

    # scale-bar coverage at window 28 (ramp oracle, like
    # test_image_wide_roi_full_coverage)
    h_img, w_img = 1024, 1344
    rfeats = _ramp_feats(h_img, w_img)
    rois2 = jnp.array([
        [20.0, 500.0, 1320.0, 512.0],
        [10.0, 10.0, 1334.0, 1014.0],
    ], jnp.float32)
    out = np.asarray(multilevel_roi_align(rfeats, rois2, strides, 7,
                                          window=28))
    f3 = np.asarray(rfeats["p3"])
    f5 = np.asarray(rfeats["p5"])
    want0 = roi_align_oracle(f3, np.asarray(rois2[0]), 8, 7)
    want1 = roi_align_oracle(f5, np.asarray(rois2[1]), 32, 7)
    np.testing.assert_allclose(out[0], want0, atol=15.0)
    np.testing.assert_allclose(out[1], want1, atol=15.0)
