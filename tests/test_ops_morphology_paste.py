import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from uwcv_tpu.ops.mask_paste import crop_and_resize_masks, paste_masks
from uwcv_tpu.ops.morphology import (
    close_open_smooth,
    connected_components,
    count_components,
    dilate,
    erode,
    fill_holes,
    postprocess_masks,
    remove_overlaps,
)


def _ring(h=32, w=32, y0=8, y1=24, x0=8, x1=24, t=3):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    m[y0 + t:y1 - t, x0 + t:x1 - t] = False
    return m


# ---------------- morphology vs scipy oracles ----------------

def _snake(h, w):
    """Boustrophedon path: one connected component whose geodesic diameter
    (and whose neighboring background corridor) is O(h*w), not h+w."""
    m = np.zeros((h, w), bool)
    for i, r in enumerate(range(1, h - 1, 2)):
        m[r, 1:w - 1] = True
        if r + 2 < h:
            m[r + 1, w - 2 if i % 2 == 0 else 1] = True
    return m


def test_dilate_erode_match_scipy():
    rng = np.random.default_rng(0)
    m = rng.random((24, 28)) > 0.7
    # default = cross footprint (skimage.morphology.dilation/erosion with
    # footprint=None — what the reference's smoothing calls), which is
    # scipy's generate_binary_structure(2, 1)
    cross = ndi.generate_binary_structure(2, 1)
    np.testing.assert_array_equal(
        np.asarray(dilate(jnp.asarray(m))), ndi.binary_dilation(m, cross))
    # border_value=1: skimage.morphology.erosion semantics (what the
    # reference's smoothing uses) — the border is not eroded from outside
    np.testing.assert_array_equal(
        np.asarray(erode(jnp.asarray(m))),
        ndi.binary_erosion(m, cross, border_value=1))
    # connectivity=2 = full 3×3 square
    st = np.ones((3, 3), bool)
    np.testing.assert_array_equal(
        np.asarray(dilate(jnp.asarray(m), connectivity=2)),
        ndi.binary_dilation(m, st))
    np.testing.assert_array_equal(
        np.asarray(erode(jnp.asarray(m), connectivity=2)),
        ndi.binary_erosion(m, st, border_value=1))


def test_fill_holes_matches_scipy():
    m = _ring()
    got = np.asarray(fill_holes(jnp.asarray(m)))
    want = ndi.binary_fill_holes(m)
    np.testing.assert_array_equal(got, want)
    # randomized agreement — catches connectivity mismatches the ring can't
    rng = np.random.default_rng(5)
    for _ in range(8):
        r = rng.random((20, 24)) > 0.6
        np.testing.assert_array_equal(
            np.asarray(fill_holes(jnp.asarray(r))), ndi.binary_fill_holes(r))


def test_fill_holes_diagonal_gap_matches_scipy():
    """A ring whose boundary closes via a diagonal step: scipy's 4-connected
    background flood cannot slip through the corner-to-corner gap, so the
    enclosed region IS a hole — an 8-connected flood would leak through and
    wrongly leave it unfilled."""
    m = np.zeros((9, 9), bool)
    m[2, 2:6] = True          # top
    m[6, 2:7] = True          # bottom
    m[2:7, 2] = True          # left
    m[3:6, 6] = False
    m[2, 5] = True
    m[3, 6] = True            # diagonal step from (2,5) to (3,6)
    m[4:6, 6] = True          # right wall below the step
    got = np.asarray(fill_holes(jnp.asarray(m)))
    want = ndi.binary_fill_holes(m)
    np.testing.assert_array_equal(got, want)
    assert want[4, 4] and not m[4, 4]  # the case is non-trivial: a real hole


def test_fill_holes_serpentine_corridor():
    """A spiral background corridor longer than H+W: the flood must keep
    going until convergence (the old H+W iteration cap misclassified the
    still-border-connected corridor interior as a hole and filled it)."""
    m = _snake(21, 21)
    # sanity: the inter-bar corridor is border-connected background, NOT a
    # hole — scipy leaves the mask unchanged
    want = ndi.binary_fill_holes(m)
    np.testing.assert_array_equal(want, m)
    np.testing.assert_array_equal(np.asarray(fill_holes(jnp.asarray(m))), want)


def test_fill_holes_batched():
    m = np.stack([_ring(), np.zeros((32, 32), bool)])
    got = np.asarray(jax.vmap(fill_holes)(jnp.asarray(m)))
    np.testing.assert_array_equal(got[0], ndi.binary_fill_holes(m[0]))
    assert not got[1].any()


def test_smooth_matches_scipy_closing():
    rng = np.random.default_rng(1)
    m = rng.random((20, 20)) > 0.5
    cross = ndi.generate_binary_structure(2, 1)
    got = np.asarray(close_open_smooth(jnp.asarray(m)))
    wanted = ndi.binary_erosion(ndi.binary_dilation(m, cross),
                                cross, border_value=1)
    np.testing.assert_array_equal(got, wanted)


def test_connected_components_count():
    m = np.zeros((32, 32), bool)
    m[2:8, 2:8] = True
    m[20:28, 20:28] = True
    m[5:7, 20:22] = True
    assert int(count_components(jnp.asarray(m))) == 3
    # 8-connectivity: diagonal touch merges
    m2 = np.zeros((8, 8), bool)
    m2[0:2, 0:2] = True
    m2[2:4, 2:4] = True
    assert int(count_components(jnp.asarray(m2))) == 1
    assert int(count_components(jnp.zeros((8, 8), bool))) == 0


def test_connected_components_labels_match_scipy():
    rng = np.random.default_rng(2)
    m = rng.random((24, 24)) > 0.75
    got = np.asarray(connected_components(jnp.asarray(m)))
    want, n = ndi.label(m, structure=np.ones((3, 3)))
    # same partition (label values differ): compare co-membership
    assert (got > 0).sum() == (want > 0).sum()
    ids_got = {tuple(np.sort(np.unique(got[want == k]))) for k in range(1, n + 1)}
    assert all(len(s) == 1 for s in ids_got)  # each scipy comp has 1 our-label
    assert len({s[0] for s in ids_got}) == n  # and they're distinct


def test_connected_components_serpentine_single():
    """A single spiral component whose geodesic diameter is O(H·W): label
    min-propagation must run to convergence (the old H+W cap left multiple
    surviving labels → count >= 2 → clean_head_masks silently zeroed a
    perfectly valid winding instance)."""
    m = _snake(21, 21)
    _, n = ndi.label(m, structure=np.ones((3, 3)))
    assert n == 1  # sanity: the snake really is one 8-connected component
    assert int(count_components(jnp.asarray(m))) == 1


def test_remove_overlaps_priority():
    a = np.zeros((16, 16), bool); a[4:12, 4:12] = True
    b = np.zeros((16, 16), bool); b[8:14, 8:14] = True
    masks = jnp.asarray(np.stack([a, b]))
    # order: a first (higher priority)
    out = np.asarray(remove_overlaps(masks, jnp.array([0, 1], jnp.int32)))
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[1], b & ~a)
    # order reversed
    out2 = np.asarray(remove_overlaps(masks, jnp.array([1, 0], jnp.int32)))
    np.testing.assert_array_equal(out2[1], b)
    np.testing.assert_array_equal(out2[0], a & ~b)


def test_postprocess_pipeline():
    ring = _ring()  # has a hole → gets filled
    dot = np.zeros((32, 32), bool); dot[30, 30] = True  # too small → dropped
    frag = np.zeros((32, 32), bool)
    frag[2:6, 2:6] = True; frag[2:6, 26:30] = True  # two pieces → dropped
    masks = jnp.asarray(np.stack([ring, dot, frag]))
    scores = jnp.array([0.9, 0.8, 0.7], jnp.float32)
    valid = jnp.ones((3,), bool)
    cleaned, keep = jax.jit(
        lambda m, s, v: postprocess_masks(m, s, v, min_pixels=4))(
            masks, scores, valid)
    keep = np.asarray(keep)
    assert list(keep) == [True, False, False]
    filled = np.asarray(cleaned[0])
    # hole is filled (allow 1px boundary nibble from smoothing)
    assert filled[16, 16] or filled.sum() >= ring.sum()


# ---------------- paste / crop ----------------

def test_paste_masks_full_box_identity():
    # a mask of all ones pasted into box covering pixels 8..24 → those pixels on
    m = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.array([[8, 8, 24, 24]], jnp.float32)
    out = np.asarray(paste_masks(m, boxes, (32, 32)))
    assert out[0, 16, 16]
    assert not out[0, 2, 2] and not out[0, 30, 30]
    # pasted area ≈ box area
    assert abs(out[0].sum() - 16 * 16) <= 40


def test_paste_crop_roundtrip():
    # rasterize a disk, crop to its bbox at 28², paste back, expect high IoU
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    disk = ((yy - 30) ** 2 + (xx - 34) ** 2) < 15 ** 2
    box = jnp.array([[34 - 15, 30 - 15, 34 + 15, 30 + 15]], jnp.float32)
    crop = crop_and_resize_masks(jnp.asarray(disk[None]), box, 28)
    assert crop.shape == (1, 28, 28)
    pasted = np.asarray(paste_masks(crop, box, (h, w)))[0]
    inter = (pasted & disk).sum()
    union = (pasted | disk).sum()
    assert inter / union > 0.9


def test_crop_and_resize_values():
    m = np.zeros((16, 16), bool)
    m[0:8, :] = True  # top half on
    box = jnp.array([[0, 0, 16, 16]], jnp.float32)
    crop = np.asarray(crop_and_resize_masks(jnp.asarray(m[None]), box, 4))
    assert crop[0, 0].min() > 0.9  # top rows ≈ 1
    assert crop[0, 3].max() < 0.1  # bottom rows ≈ 0


def test_paste_select_pack_matches_unfused_pipeline():
    """The fused scan (paste_select_pack) must be bit-identical to the
    unfused paste → remove_overlaps → min-pixel filter → pack chain it
    replaces (PERF.md r4 tail fusion)."""
    import jax.numpy as jnp

    from uwcv_tpu.data.augment import pack_bitmasks
    from uwcv_tpu.ops.mask_paste import paste_masks, paste_select_pack
    from uwcv_tpu.ops.morphology import remove_overlaps

    rng = np.random.default_rng(11)
    d, m, h, w = 17, 28, 128, 160
    probs = jnp.asarray(rng.uniform(0, 1, (d, m, m)), jnp.float32)
    x1 = rng.uniform(0, w - 30, d)
    y1 = rng.uniform(0, h - 30, d)
    boxes = jnp.asarray(np.stack([
        x1, y1, x1 + rng.uniform(10, 60, d), y1 + rng.uniform(10, 60, d)],
        axis=1), jnp.float32)
    keep = jnp.asarray(rng.uniform(size=d) < 0.8)
    scores = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)
    min_pixels = 40

    # unfused reference chain (exact predictor semantics pre-fusion)
    masks = paste_masks(probs, boxes, (h, w))
    order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf), stable=True)
    masks_o = remove_overlaps(masks, order.astype(jnp.int32))
    keep_ref = keep & (masks_o.sum(axis=(1, 2)) >= min_pixels)
    masks_o = masks_o & keep_ref[:, None, None]
    packed_ref = pack_bitmasks(masks_o)

    packed, keep_out = paste_select_pack(
        probs, boxes, keep, scores, (h, w), min_pixels=min_pixels,
        do_remove_overlaps=True, chunk=5)
    np.testing.assert_array_equal(np.asarray(keep_out), np.asarray(keep_ref))
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(packed_ref))

    # no-overlap-removal variant
    keep_ref2 = keep & (
        (masks & keep[:, None, None]).sum(axis=(1, 2)) >= min_pixels)
    packed_ref2 = pack_bitmasks(masks & keep_ref2[:, None, None])
    packed2, keep_out2 = paste_select_pack(
        probs, boxes, keep, scores, (h, w), min_pixels=min_pixels,
        do_remove_overlaps=False, chunk=4)
    np.testing.assert_array_equal(np.asarray(keep_out2),
                                  np.asarray(keep_ref2))
    np.testing.assert_array_equal(np.asarray(packed2),
                                  np.asarray(packed_ref2))

    # extent clipping (per-image content rectangle inside a shared batch
    # canvas): fused == unfused with the same post-paste AND; overlap claims
    # are per-pixel independent so clipping is exact for in-extent pixels
    eh, ew = 100, 120
    extent = jnp.asarray(
        (np.arange(h)[:, None] < eh) & (np.arange(w)[None, :] < ew))
    masks_e = masks & extent[None]
    masks_eo = remove_overlaps(masks_e, order.astype(jnp.int32))
    keep_ref3 = keep & (masks_eo.sum(axis=(1, 2)) >= min_pixels)
    packed_ref3 = pack_bitmasks(masks_eo & keep_ref3[:, None, None])
    packed3, keep_out3 = paste_select_pack(
        probs, boxes, keep, scores, (h, w), min_pixels=min_pixels,
        do_remove_overlaps=True, chunk=5, extent=extent)
    np.testing.assert_array_equal(np.asarray(keep_out3),
                                  np.asarray(keep_ref3))
    np.testing.assert_array_equal(np.asarray(packed3),
                                  np.asarray(packed_ref3))
