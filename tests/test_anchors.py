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
