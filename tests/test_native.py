"""Native C++ kernels vs the numpy fallbacks (skipped when g++ is absent)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from uwcv_tpu.utils import native


requires_native = pytest.mark.skipif(
    native.lib() is None, reason="native library unavailable (no g++?)")


@requires_native
def test_native_rle_matches_numpy():
    from uwcv_tpu.measure.rle import _runs, rle_decode

    rng = np.random.default_rng(0)
    for shape in [(7, 9), (64, 64), (33, 127)]:
        m = rng.random(shape) > 0.6
        got = native.rle_encode_fortran(m)
        flat = np.asarray(m, np.uint8).flatten(order="F")
        starts, lengths = _runs(flat)
        want = []
        for s, l in zip(starts, lengths):
            want.extend((s + 1, l))
        assert got == want
        np.testing.assert_array_equal(rle_decode(got, shape, "F"), m)


@requires_native
def test_native_label_matches_scipy():
    rng = np.random.default_rng(1)
    m = rng.random((48, 64)) > 0.72
    labels, n = native.label_components(m)
    want, n_want = ndi.label(m, structure=np.ones((3, 3)))
    assert n == n_want
    # identical partitions
    for comp in range(1, n + 1):
        sel = labels == comp
        ids = np.unique(want[sel])
        assert len(ids) == 1
        assert (want == ids[0]).sum() == sel.sum()


@requires_native
def test_native_trace_used_by_find_contours():
    from uwcv_tpu.measure.contours import contour_area, find_contours

    m = np.zeros((40, 40), bool)
    m[10:30, 5:25] = True
    cs = find_contours(m)
    assert len(cs) == 1
    assert abs(contour_area(cs[0]) - 19 * 19) < 1e-6


@requires_native
def test_native_and_python_contours_agree():
    import uwcv_tpu.measure.contours as C

    rng = np.random.default_rng(2)
    m = ndi.binary_dilation(rng.random((60, 80)) > 0.9,
                            np.ones((5, 5)))
    native_cs = C.find_contours(m)
    # force the python path
    real_lib = native.lib
    try:
        native.lib = lambda: None
        py_cs = C.find_contours(m)
    finally:
        native.lib = real_lib
    assert len(native_cs) == len(py_cs)
    for a, b in zip(native_cs, py_cs):
        assert abs(C.contour_area(a) - C.contour_area(b)) < 1e-6
        assert abs(C.arc_length(a) - C.arc_length(b)) < 1e-6
