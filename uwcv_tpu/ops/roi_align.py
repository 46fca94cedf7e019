"""RoIAlign (aligned=True), TPU-first (SURVEY.md N4).

Rebuilds Detectron2's C++/CUDA ROIAlign.  Three formulations live here, in
ascending performance (PERF.md has the measured ladder):

1. ``roi_align_level``: per-sample 4-corner flat gather against ONE level —
   the numpy-oracle-matching reference implementation used by tests.
2. ``multilevel_roi_align``: the *windowed* XLA formulation — each roi
   ``dynamic_slice``s a [window, window, C] neighborhood from a padded
   level canvas and interpolates with two small matmuls (bin-average folded
   into the weight matrices; exact).  Differentiable — training pools
   through this path.
3. ``multilevel_roi_align_batched``: the FUSED Pallas kernel
   (ops/pallas/roi_align_kernel.py) — per-roi window DMA straight into
   VMEM, both interpolation contractions on the MXU in-kernel, only
   [P,P,C] written back; 3.4× (2) at production scale.  DIFFERENTIABLE via
   ``pool_windows``'s custom_vjp: forward = the kernel, backward = the
   transpose of the mathematically-identical XLA window formulation (XLA
   turns the dynamic_slice transpose into a scatter-add of the
   back-interpolated window gradients), so training pools through the fused
   kernel too.  Rois/geometry get zero cotangents — proposals are
   stop_gradient'd upstream (models/rpn.py:92), matching Detectron2, which
   never backprops through proposal coordinates.  Falls back to the same
   flat XLA formulation off-TPU.

Shared semantics: Detectron2 ``aligned=True`` (half-pixel shift, the -0.5
below); static 2×2 sample grid per bin (the standard static-shape stand-in
for ``sampling_ratio=0`` — TF TPU Mask R-CNN does the same; mAP-neutral);
FPN-paper eq. 1 level assignment, with oversized rois (image-wide scale
bars, p5-clamped boxes) bumped to coarser levels incl. a virtual 2×-pooled
p5 so they get full coverage instead of window truncation.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fpn_level_assignment(
    boxes: jnp.ndarray,
    min_level: int = 2,
    max_level: int = 5,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper eq. 1: level = floor(k0 + log2(sqrt(area)/224)), clamped."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    size = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level + jnp.log2(
        jnp.maximum(size, 1e-6) / canonical_size))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def _interp_matrix(coords: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[S] continuous coords → [S, dim] bilinear weight rows.

    Each row holds (1-frac) at floor(c) and frac at floor(c)+1, clamped to
    the border — so interpolation along one axis is a small matmul.
    """
    c = jnp.clip(coords, 0.0, dim - 1.0)
    lo = jnp.floor(c)
    frac = c - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, dim - 1)
    cols = jnp.arange(dim)
    w_lo = (cols[None, :] == lo_i[:, None]) * (1.0 - frac)[:, None]
    w_hi = (cols[None, :] == hi_i[:, None]) * frac[:, None]
    return (w_lo + w_hi).astype(jnp.float32)


def _sample_grid(rois: jnp.ndarray, stride, output_size: int,
                 samples_per_bin: int):
    """Continuous sample coords in feature space for each roi.

    rois [R,4]; stride scalar or [R].  Returns (xs, ys) each [R, S] with
    S = output_size * samples_per_bin.
    """
    s = output_size * samples_per_bin
    stride = jnp.asarray(stride, jnp.float32)
    x1 = rois[:, 0] / stride - 0.5
    y1 = rois[:, 1] / stride - 0.5
    x2 = rois[:, 2] / stride - 0.5
    y2 = rois[:, 3] / stride - 0.5
    t = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s        # [S]
    xs = x1[:, None] + t[None, :] * jnp.maximum(x2 - x1, 1e-6)[:, None]
    ys = y1[:, None] + t[None, :] * jnp.maximum(y2 - y1, 1e-6)[:, None]
    return xs, ys


def _bilinear_gather(
    flat_feat: jnp.ndarray,   # [T, C]
    xs: jnp.ndarray,          # [R, S] continuous x in level space
    ys: jnp.ndarray,          # [R, S]
    level_w,                  # [R] or scalar — row stride of the level
    level_h,                  # [R] or scalar
    base,                     # [R] or scalar — slab offset into flat_feat
    output_size: int,
    samples_per_bin: int,
) -> jnp.ndarray:
    """4-corner bilinear sampling via one flat gather → [R, P, P, C]."""
    r, s = xs.shape
    w_max = jnp.asarray(level_w, jnp.float32)
    h_max = jnp.asarray(level_h, jnp.float32)

    xc = jnp.clip(xs, 0.0, (w_max - 1.0).reshape(-1, 1) if w_max.ndim else w_max - 1.0)
    yc = jnp.clip(ys, 0.0, (h_max - 1.0).reshape(-1, 1) if h_max.ndim else h_max - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    fx = (xc - x0)[:, None, :]   # [R,1,S] broadcast over y-samples
    fy = (yc - y0)[:, :, None]   # [R,S,1]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wlim = (w_max - 1.0).astype(jnp.int32)
    hlim = (h_max - 1.0).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, wlim.reshape(-1, 1) if w_max.ndim else wlim)
    y1i = jnp.minimum(y0i + 1, hlim.reshape(-1, 1) if h_max.ndim else hlim)

    wrow = jnp.asarray(level_w, jnp.int32)
    base = jnp.asarray(base, jnp.int32)
    if wrow.ndim:
        wrow = wrow.reshape(-1, 1, 1)
        base_b = base.reshape(-1, 1, 1)
    else:
        base_b = base

    # flat indices for the 4 corners: [R, Sy, Sx]
    def idx(yi, xi):
        return base_b + yi[:, :, None] * wrow + xi[:, None, :]

    corners = jnp.stack([
        idx(y0i, x0i), idx(y0i, x1i), idx(y1i, x0i), idx(y1i, x1i)
    ], axis=-1)                                   # [R,S,S,4]
    gathered = jnp.take(flat_feat, corners.reshape(-1), axis=0)
    gathered = gathered.reshape(r, s, s, 4, flat_feat.shape[-1])

    w00 = (1 - fy) * (1 - fx)                     # [R,S,S]
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    weights = jnp.stack([w00, w01, w10, w11], axis=-1)  # [R,S,S,4]
    samples = (gathered * weights[..., None]).sum(axis=3)  # [R,S,S,C]

    p = output_size
    spb = samples_per_bin
    binned = samples.reshape(r, p, spb, p, spb, -1).mean(axis=(2, 4))
    return binned


def roi_align_level(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    stride: int,
    output_size: int,
    samples_per_bin: int = 2,
) -> jnp.ndarray:
    """Pool rois against ONE level's [H,W,C] features → [R,P,P,C]."""
    h, w, c = feat.shape
    xs, ys = _sample_grid(rois, stride, output_size, samples_per_bin)
    return _bilinear_gather(
        feat.reshape(h * w, c), xs, ys, w, h, 0, output_size,
        samples_per_bin).astype(feat.dtype)


_LEVEL_NAMES = ("p2", "p3", "p4", "p5")


def _level_canvas(features, window: int, extra_w: int = 0):
    """Single-image {level: [H,W,C]} → [5, Hmax, Wmax+extra_w, C] slab stack.

    Slab 4 is the *virtual level 6*: the 2× average-pooled p5 (cell j
    represents continuous position (j+0.5)·2·stride₅ px — consistent with
    the stride convention), used by the oversized-roi level bump.
    ``extra_w`` adds padded columns for DMA-tile-aligned window origins
    (the Pallas path).  Shared by the XLA and Pallas poolers so the two
    stay bit-identical; the batched caller vmaps it.
    """
    shapes = _level_shapes([features[n].shape for n in _LEVEL_NAMES])
    c = shapes[0][-1]
    dtype = features[_LEVEL_NAMES[0]].dtype
    hmax = max(max(s[0] for s in shapes), window)
    wmax = max(max(s[1] for s in shapes), window)

    h5, w5 = shapes[3][:2]
    p5 = jnp.pad(features["p5"], ((0, h5 % 2), (0, w5 % 2), (0, 0)),
                 mode="edge")
    h6, w6 = shapes[4][:2]
    p6v = p5.reshape(h6, 2, w6, 2, c).mean(axis=(1, 3)).astype(dtype)
    slabs = [features[n] for n in _LEVEL_NAMES] + [p6v]
    return jnp.stack([
        jnp.pad(f, ((0, hmax - s[0]), (0, wmax + extra_w - s[1]), (0, 0)))
        for f, s in zip(slabs, shapes)
    ])


def _level_shapes(shapes4):
    """4 level shapes → 5 (appends the virtual pooled-p5 level)."""
    shapes4 = [tuple(s) for s in shapes4]
    h5, w5, c = shapes4[3]
    return shapes4 + [((h5 + 1) // 2, (w5 + 1) // 2, c)]


def _level_strides(strides):
    return [float(strides[n]) for n in _LEVEL_NAMES] + [2.0 * strides["p5"]]


def multilevel_roi_align(
    features: Dict[str, jnp.ndarray],
    rois: jnp.ndarray,
    strides: Dict[str, int],
    output_size: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    samples_per_bin: int = 2,
    window: int = 32,
) -> jnp.ndarray:
    """Pool padded rois from their assigned FPN level (single image) —
    *windowed* formulation.

    TPU gathers of individual C-vectors run ~300 MB/s (measured: 1.9-4.9 s
    for 1000 rois at production scale), so per-sample-point gathers are a
    non-starter.  Instead we exploit the FPN level-assignment invariant: a
    roi spans < 2·canonical/stride ≈ 28 cells on its assigned level (eq. 1
    clamps size/stride into [14, 28) away from the end levels).  Each roi
    therefore needs only a ``window``² cell neighborhood:

    1. all levels are padded into one [4, Hmax, Wmax, C] canvas;
    2. one vmapped ``dynamic_slice`` per roi cuts its [window, window, C]
       patch (XLA lowers this to an efficient large-slice gather);
    3. the bilinear interpolation becomes two tiny matmuls per roi
       ([S,window] weight matrices against the patch) — MXU work.

    Rois whose max extent would overflow the window on their assigned level
    (eq. 1 assigns by sqrt(area), so image-wide-but-thin boxes — SEM scale
    bars — can overflow ANY level, and boxes clamped at p5 overflow p5) are
    bumped to the coarsest level that fits, including a *virtual level 6*
    (2× avg-pooled p5, stride 64).  They get full spatial coverage at a
    reduced sample rate (a blur) instead of a truncated field of view;
    tests/test_ops_nms_roialign.py::test_image_wide_roi_full_coverage pins
    exactness on linear-ramp features.  Everything in [14, 28) is exact.
    """
    c = features["p2"].shape[-1]
    dtype = features["p2"].dtype
    shapes = _level_shapes([features[n].shape for n in _LEVEL_NAMES])
    canvas = _level_canvas(features, window)     # [5,Hmax,Wmax,C]

    strides_vals = _level_strides(strides)
    li, y0, x0, wy, wx = _window_geometry(
        rois, shapes, strides_vals, output_size, canonical_size,
        canonical_level, samples_per_bin, window)

    def slice_one(lvl_idx, oy, ox):
        return jax.lax.dynamic_slice(
            canvas, (lvl_idx, oy, ox, 0), (1, window, window, c))[0]

    patches = jax.vmap(slice_one)(li, y0, x0)                 # [R,win,win,C]

    # Feed the MXU in the feature dtype with f32 accumulation — a separate
    # f32 cast of the [R,win,win,C] patches doubles the op's HBM traffic.
    # bf16 interp weights add ~2^-9 relative rounding, the same order as
    # the bf16 features themselves; float32 models keep exact f32 weights
    # (oracle tests run f32).
    wdt = patches.dtype
    rows = jnp.einsum("rph,rhwc->rpwc", wy.astype(wdt), patches,
                      preferred_element_type=jnp.float32)     # [R,P,win,C]
    out = jnp.einsum("rqw,rpwc->rpqc", wx.astype(wdt),
                     rows.astype(wdt),
                     preferred_element_type=jnp.float32)      # [R,P,P,C]
    return out.astype(dtype)


def _window_geometry(rois, shapes, strides_vals, output_size,
                     canonical_size, canonical_level, samples_per_bin,
                     window, x_align: int = 1):
    """Per-roi window placement + folded interpolation weights.

    rois [R,4]; shapes = 5 level shapes incl the virtual pooled p6;
    strides_vals = 5 per-level strides.  Returns
    (li [R] int32 in 0..4, y0 [R] int32, x0 [R] int32,
    wy [R,P,window] f32, wx [R,P,window_x] f32).  The spb×spb bin average
    is folded into the weights — interpolation is linear, so averaging
    sample WEIGHTS equals averaging samples (exact), halving the first
    contraction and removing the [R,S,S,C] samples tensor entirely.

    ``x_align > 1`` snaps the x origin DOWN to that multiple and widens the
    x window to ``_aligned_window_x(window, x_align)``: TPU DMA slices in
    the sublane-tiled W dimension must start on a tile boundary AND span a
    multiple of the 8-sublane tile (Mosaic "slice shape must be aligned to
    tiling (8)"), so the Pallas kernel path uses x_align=8 and rounds the
    width up.  The caller's canvas must carry ``window_x - window`` extra
    padded columns.
    """
    levels = fpn_level_assignment(
        rois, 2, 5, canonical_size, canonical_level)         # [R] in 2..5
    # smallest level whose stride fits max(w,h) inside the window
    span_px = jnp.maximum(rois[..., 2] - rois[..., 0],
                          rois[..., 3] - rois[..., 1])
    fit = jnp.ceil(jnp.log2(jnp.maximum(span_px / (window - 2.0), 1e-6)))
    # the bump tops out at the virtual stride-64 level: rois spanning more
    # than (window-2)*64 px (≈1920 at window=32) DO window-truncate —
    # unreachable below test_max_size≈1900 (documented at the config knob)
    levels = jnp.clip(jnp.maximum(levels, fit.astype(jnp.int32)), 2, 6)
    li = levels - 2                                           # [R] in 0..4
    tbl = lambda vals: jnp.asarray(vals, jnp.float32)[li]     # [R]
    level_w = tbl([s[1] for s in shapes])
    level_h = tbl([s[0] for s in shapes])
    stride_per_roi = tbl(strides_vals)

    xs, ys = _sample_grid(rois, stride_per_roi, output_size, samples_per_bin)
    # clamp samples into the level extent (border replication, aligned=True)
    xs = jnp.clip(xs, 0.0, level_w[:, None] - 1.0)
    ys = jnp.clip(ys, 0.0, level_h[:, None] - 1.0)

    # window origin: center the sample span, clamp into the level
    def origin(coords, extent):
        lo = jnp.floor((coords[:, 0] + coords[:, -1]) / 2.0
                       - window / 2.0 + 0.5)
        return jnp.clip(lo, 0.0, jnp.maximum(extent - window, 0.0))

    x0 = origin(xs, level_w)                                  # [R]
    y0 = origin(ys, level_h)
    window_x = window
    if x_align > 1:
        x0 = jnp.floor(x0 / x_align) * x_align
        window_x = _aligned_window_x(window, x_align)
    xs_rel = jnp.clip(xs - x0[:, None], 0.0, window_x - 1.0)  # [R,S]
    ys_rel = jnp.clip(ys - y0[:, None], 0.0, window - 1.0)

    wy = jax.vmap(partial(_interp_matrix, dim=window))(ys_rel)  # [R,S,win]
    wx = jax.vmap(partial(_interp_matrix, dim=window_x))(xs_rel)
    r = rois.shape[0]
    p = output_size
    spb = samples_per_bin
    wy = wy.reshape(r, p, spb, window).mean(axis=2)           # [R,P,win]
    wx = wx.reshape(r, p, spb, window_x).mean(axis=2)
    return li, y0.astype(jnp.int32), x0.astype(jnp.int32), wy, wx


def _aligned_window_x(window: int, x_align: int) -> int:
    """Width of the x window after origin snapping: must cover
    window + (x_align-1) misalignment AND be a multiple of the 8-sublane
    DMA tile (Mosaic rejects unaligned slice spans in the W dim)."""
    need = window + x_align - 1
    return -(-need // 8) * 8


def _pool_windows_xla(canvas, slab, y0, x0, wy, wx, window: int,
                      window_x: int):
    """Flat windowed pool against a [S, Hmax, Wmax, C] slab canvas — the
    XLA twin of the Pallas kernel (same geometry, same dtype discipline:
    feature-dtype MXU contractions with f32 accumulation).  Natively
    differentiable: the vjp of ``dynamic_slice`` is a scatter-add of the
    back-interpolated window cotangents into a zero canvas, which is exactly
    the RoIAlign backward."""
    c = canvas.shape[-1]

    def one(sl, oy, ox, wy_r, wx_r):
        patch = jax.lax.dynamic_slice(
            canvas, (sl, oy, ox, jnp.zeros_like(sl)),
            (1, window, window_x, c))[0]
        wdt = patch.dtype
        rows = jnp.einsum("ph,hwc->pwc", wy_r.astype(wdt), patch,
                          preferred_element_type=jnp.float32)   # [P,win_x,C]
        out = jnp.einsum("qw,pwc->pqc", wx_r.astype(wdt),
                         rows.astype(wdt),
                         preferred_element_type=jnp.float32)    # [P,P,C]
        return out.astype(canvas.dtype)

    return jax.vmap(one)(slab, y0, x0, wy, wx)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def pool_windows(window: int, window_x: int, use_kernel: bool,
                 interpret: bool, canvas, slab, y0, x0, wy, wx):
    """Windowed pool with a TPU-kernel forward and an XLA backward.

    canvas [S,Hmax,Wmax,C]; slab/y0/x0 [R] int32 window origins (x0
    8-aligned when use_kernel); wy [R,P,window] / wx [R,P,window_x]
    bin-folded interp weights → pooled [R,P,P,C].
    """
    if use_kernel:
        from uwcv_tpu.ops.pallas.roi_align_kernel import (
            roi_align_windows_pallas,
        )

        return roi_align_windows_pallas(slab, y0, x0, wy, wx, canvas,
                                        window=window, window_x=window_x,
                                        interpret=interpret)
    return _pool_windows_xla(canvas, slab, y0, x0, wy, wx, window, window_x)


def _pool_windows_fwd(window, window_x, use_kernel, interpret,
                      canvas, slab, y0, x0, wy, wx):
    out = pool_windows(window, window_x, use_kernel, interpret,
                       canvas, slab, y0, x0, wy, wx)
    return out, (canvas, slab, y0, x0, wy, wx)


def _pool_windows_bwd(window, window_x, use_kernel, interpret, res, g):
    canvas, slab, y0, x0, wy, wx = res
    _, vjp = jax.vjp(
        lambda cv: _pool_windows_xla(cv, slab, y0, x0, wy, wx,
                                     window, window_x), canvas)
    (dcanvas,) = vjp(g)
    # int geometry: tangent dtype is float0; weights: zero cotangents —
    # they are functions of stop_gradient'd proposal boxes only
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dcanvas, f0(slab), f0(y0), f0(x0),
            jnp.zeros_like(wy), jnp.zeros_like(wx))


pool_windows.defvjp(_pool_windows_fwd, _pool_windows_bwd)


def multilevel_roi_align_batched(
    features: Dict[str, jnp.ndarray],
    rois: jnp.ndarray,
    strides: Dict[str, int],
    output_size: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    samples_per_bin: int = 2,
    window: int = 32,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Batched pooler: features {level: [B,H,W,C]}, rois [B,R,4] →
    [B,R,P,P,C].

    On TPU this runs the FUSED Pallas kernel
    (ops/pallas/roi_align_kernel.py): the whole batch's level slabs stay in
    HBM, each roi DMAs exactly its window into VMEM and both interpolation
    contractions happen in-kernel — ~6× less HBM traffic than the XLA
    formulation (PERF.md).  Off-TPU the same geometry pools through the
    flat XLA twin ``_pool_windows_xla``.  Both routes go through
    ``pool_windows``'s custom_vjp, so this is fully DIFFERENTIABLE —
    training pools here (backward = XLA scatter-add transpose; roi
    coordinates are stop_gradient'd upstream).

    ``use_pallas=False`` keeps the per-image vmapped formulation instead:
    that path is SPMD-partitionable by XLA (dp×sp sharded predictors use
    it — pallas_call has no partitioning rule for a *spatially* sharded
    canvas; pure-DP meshes keep the kernel via shard_map in the
    Predictor)."""
    from uwcv_tpu.ops.nms import _pallas_available

    if not use_pallas and not interpret:
        def one(f, r):
            return multilevel_roi_align(
                f, r, strides, output_size, canonical_size,
                canonical_level, samples_per_bin, window)
        return jax.vmap(one)(features, rois)

    use_kernel = (interpret or _pallas_available())

    b = features["p2"].shape[0]
    r = rois.shape[1]
    c = features["p2"].shape[-1]
    shapes = _level_shapes([features[n].shape[1:] for n in _LEVEL_NAMES])

    # extra columns: the 8-aligned x origins can push the (tile-rounded)
    # window past the widest level's extent
    x_align = 8
    window_x = _aligned_window_x(window, x_align)
    canvas = jax.vmap(
        partial(_level_canvas, window=window,
                extra_w=window_x - window))(features)
    canvas = canvas.reshape((b * 5,) + canvas.shape[2:])

    strides_vals = _level_strides(strides)
    li, y0, x0, wy, wx = jax.vmap(lambda rr: _window_geometry(
        rr, shapes, strides_vals, output_size, canonical_size,
        canonical_level, samples_per_bin, window, x_align=x_align))(rois)

    slab = (jnp.arange(b, dtype=jnp.int32)[:, None] * 5 + li).reshape(-1)
    p = output_size
    pooled = pool_windows(
        window, window_x, use_kernel, interpret,
        canvas, slab, y0.reshape(-1), x0.reshape(-1),
        wy.reshape(b * r, p, window),
        wx.reshape(b * r, p, window_x))
    return pooled.reshape(b, r, p, p, c)
