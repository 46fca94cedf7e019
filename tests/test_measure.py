import math
import os

import numpy as np
import pytest

from uwcv_tpu.config import MeasureConfig
from uwcv_tpu.data.classes import ClassRegistry
from uwcv_tpu.measure.contours import (
    arc_length,
    box_points,
    contour_area,
    convex_hull,
    find_contours,
    min_area_rect,
    order_points,
)
from uwcv_tpu.measure.descriptors import (
    DESCRIPTOR_NAMES,
    describe_contour,
    measure_mask,
)
from uwcv_tpu.measure.reports import (
    MeasurementReport,
    count_instances,
    moving_average,
)
from uwcv_tpu.measure.rle import (
    binary_mask_to_rle,
    rle_decode,
    rle_encode,
    rle_encoding,
    rle_from_coco,
)


def _disk(h=64, w=64, cy=32, cx=32, r=15):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def _rect_mask(h=64, w=64, y0=10, y1=30, x0=15, x1=55):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


# ---------------- contours ----------------

def test_find_contours_counts_and_order():
    m = np.zeros((40, 80), bool)
    m[5:15, 50:70] = True   # right
    m[20:30, 5:25] = True   # left
    cs = find_contours(m)
    assert len(cs) == 2
    # sorted left-to-right
    assert cs[0][:, 0].min() < cs[1][:, 0].min()
    # boundary points lie on the mask
    for c in cs:
        for x, y in c[:10]:
            assert m[int(y), int(x)]


def test_contour_area_perimeter_rect():
    m = _rect_mask()
    c = find_contours(m)[0]
    # boundary through pixel centers of a 20x40 block: 19x39 polygon
    assert abs(contour_area(c) - 19 * 39) < 1e-6
    assert abs(arc_length(c) - 2 * (19 + 39)) < 1e-6


def test_contour_area_disk():
    m = _disk(r=20)
    c = find_contours(m)[0]
    assert abs(contour_area(c) - math.pi * 20 ** 2) / (math.pi * 400) < 0.05


def test_min_area_rect_axis_aligned():
    pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4]], float)
    (cx, cy), (w, h), ang = min_area_rect(pts)
    assert {round(w, 5), round(h, 5)} == {10.0, 4.0}
    assert abs(cx - 5) < 1e-6 and abs(cy - 2) < 1e-6


def test_min_area_rect_rotated():
    # 45°-rotated rectangle
    base = np.array([[0, 0], [8, 0], [8, 3], [0, 3]], float)
    a = math.radians(30)
    rot = np.array([[math.cos(a), -math.sin(a)], [math.sin(a), math.cos(a)]])
    pts = base @ rot.T + [5, 7]
    _, (w, h), ang = min_area_rect(pts)
    assert {round(w, 4), round(h, 4)} == {8.0, 3.0}
    corners = box_points(((0, 0), (4, 2), 90.0))
    assert corners.shape == (4, 2)


def test_order_points():
    pts = np.array([[10, 10], [0, 0], [10, 0], [0, 10]], float)
    tl, tr, br, bl = order_points(pts)
    np.testing.assert_allclose(tl, [0, 0])
    np.testing.assert_allclose(tr, [10, 0])
    np.testing.assert_allclose(br, [10, 10])
    np.testing.assert_allclose(bl, [0, 10])


def test_convex_hull_square():
    rng = np.random.default_rng(0)
    inner = rng.uniform(1, 9, (50, 2))
    corners = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hull = convex_hull(np.vstack([inner, corners]))
    assert len(hull) == 4


# ---------------- descriptors ----------------

def test_descriptors_circle():
    m = _disk(r=20)
    descs = measure_mask(m, pixels_per_metric=1.0, min_contour_area=100)
    assert len(descs) == 1
    d = descs[0]
    assert abs(d.circular_ed - 40) / 40 < 0.06
    # Moore-traced boundaries stair-step like cv2's, inflating perimeter ~5%,
    # so an ideal disk lands ≈0.85-0.9 rather than 1.0 (cv2 behaves the same)
    assert d.circularity > 0.82
    assert d.sphericity > 0.9
    assert 0.9 < d.aspect_ratio < 1.12
    assert abs(d.feret - 40) / 40 < 0.08


def test_descriptors_rectangle_ppm():
    m = _rect_mask()  # 20 x 40 block
    d = measure_mask(m, pixels_per_metric=0.85, min_contour_area=100)[0]
    # caliper: min-area rect of the boundary = 39 x 19 through centers
    assert abs(d.length - 19 / 0.85) < 1.0
    assert abs(d.width - 39 / 0.85) < 1.0
    assert abs(d.aspect_ratio - 39 / 19) < 0.15
    assert d.circularity < 0.85  # rectangle is less circular


def test_measure_mask_min_area_filter():
    m = np.zeros((64, 64), bool)
    m[2:6, 2:6] = True  # 16 px² — below 100
    assert measure_mask(m, 1.0, 100.0) == []


# ---------------- rle ----------------

def test_rle_encoding_fortran_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.random((13, 17)) > 0.6
    rle = rle_encoding(m)
    back = rle_decode(rle, m.shape, order="F")
    np.testing.assert_array_equal(back, m)
    # 1-indexed starts
    if rle:
        assert rle[0] >= 1


def test_rle_encode_c_order_roundtrip():
    rng = np.random.default_rng(1)
    m = rng.random((9, 11)) > 0.5
    s = rle_encode(m)
    back = rle_decode(s, m.shape, order="C")
    np.testing.assert_array_equal(back, m)


def test_coco_rle_roundtrip():
    rng = np.random.default_rng(2)
    m = rng.random((12, 8)) > 0.5
    rle = binary_mask_to_rle(m)
    assert sum(rle["counts"]) == m.size
    back = rle_from_coco(rle)
    np.testing.assert_array_equal(back, m)


def test_coco_rle_leading_one():
    m = np.ones((3, 3), bool)
    rle = binary_mask_to_rle(m)
    assert rle["counts"][0] == 0  # leading zero-run of length 0


def test_rle_empty_mask():
    m = np.zeros((5, 5), bool)
    assert rle_encoding(m) == []
    assert rle_encode(m) == ""
    np.testing.assert_array_equal(rle_decode([], (5, 5)), m)


# ---------------- reports ----------------

def test_moving_average_window3():
    vals = [1, 2, 3, 4, 5]
    np.testing.assert_allclose(moving_average(vals, 3), [2.0, 3.0, 4.0])
    assert moving_average([1, 2], 3) == []


def test_count_instances():
    inst = {"classes": np.array([0, 0, 3, 2, 3])}
    np.testing.assert_array_equal(count_instances(inst, 4), [2, 0, 1, 2])


def test_measurement_report_artifacts(tmp_path):
    reg = ClassRegistry()
    cfg = MeasureConfig()
    rep = MeasurementReport(reg, cfg, str(tmp_path))
    masks = np.stack([_disk(), _rect_mask()])
    inst = {
        "boxes": np.array([[10, 10, 50, 50], [15, 10, 55, 30]], float),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([3, 0]),
        "masks": masks,
    }
    rep.add_image(inst)
    assert rep.summary()["Pores of polyHIPEs"] == 1
    p = rep.write_shape_descriptor_csv()
    assert os.path.exists(p)
    import pandas as pd
    df = pd.read_csv(p)
    assert list(df.columns) == ["Class", *DESCRIPTOR_NAMES]
    assert len(df) == 2
    paths = rep.write_results_csvs()
    assert any(x.endswith("ResultsPore_.csv") for x in paths)
    assert any(x.endswith("ResultsScale_.csv") for x in paths)
    dfp = pd.read_csv([x for x in paths if "Pore_" in x][0])
    assert len(dfp) == 1  # accumulators are per-class, no bleed
    plots = rep.write_distribution_plots(columns=["Feret Diameter"])
    assert len(plots) == 2 and all(os.path.exists(x) for x in plots)


def test_pinched_component_traces_both_lobes():
    """A component pinched diagonally at the raster-first pixel
    ([[0,1,0],[1,0,1]]) must trace ALL its pixels — stop-at-start-pixel
    termination lost a whole lobe (both in C++ and the Python twin)."""
    from uwcv_tpu.measure.contours import find_contours

    mask = np.zeros((5, 6), np.uint8)
    mask[1, 2] = 1   # top of the pinch
    mask[2, 1] = 1   # left lobe
    mask[2, 3] = 1   # right lobe
    cs = find_contours(mask)
    assert len(cs) == 1
    pts = {tuple(p) for p in cs[0].astype(int)}
    assert {(2, 1), (1, 2), (3, 2)} <= pts, pts


def test_rle_accepts_0_255_masks():
    """0/255 uint8 masks (PIL convention) must encode like boolean masks —
    an int8 cast overflowed 255 -> -1 and emitted negative run lengths."""
    from uwcv_tpu.measure.rle import binary_mask_to_rle, rle_encode, rle_encoding

    m255 = np.array([[0, 255, 255, 0, 255]], np.uint8)
    mbool = m255 != 0
    assert rle_encode(m255) == rle_encode(mbool) == "2 2 5 1"
    assert rle_encoding(m255) == rle_encoding(mbool)
    assert binary_mask_to_rle(m255) == binary_mask_to_rle(mbool)
    assert all(c >= 0 for c in binary_mask_to_rle(m255)["counts"])
