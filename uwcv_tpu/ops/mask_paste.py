"""Mask paste-to-image + GT mask cropping (SURVEY.md N5).

Two symmetric resampling ops around the mask head:

- ``paste_masks``: Detectron2's ``paste_masks_in_image`` — a predicted
  [M, M] mask in roi-relative coordinates is bilinearly resampled onto the
  full image canvas.  Torch does a dynamic per-box crop; here each output
  pixel inverse-maps into roi space (branch-free, static [N, H, W] output).
  The per-pixel weights are separable in x and y, so the whole paste is two
  one-hot-free matmuls per mask — MXU work, not gather.

- ``crop_and_resize_masks``: the training-side inverse (Detectron2
  ``crop_and_resize``): GT bitmasks are sampled at the matched proposal's
  bin centers to build [S, S] mask targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(dim_out: int, lo: jnp.ndarray, hi: jnp.ndarray,
                  mask_dim: int) -> jnp.ndarray:
    """Weights W[out_pix, mask_pix] resampling a 1-D mask axis onto image
    pixels, for a roi spanning [lo, hi) in image coords (aligned=True
    convention: mask cell centers at (i+0.5)/M of the roi extent)."""
    span = jnp.maximum(hi - lo, 1e-6)
    pix = jnp.arange(dim_out, dtype=jnp.float32) + 0.5       # image pixel centers
    # position of each image pixel in mask-cell coordinates
    u = (pix - lo) / span * mask_dim - 0.5                    # [dim_out]
    uc = jnp.clip(u, 0.0, mask_dim - 1.0)
    l = jnp.floor(uc)
    frac = uc - l
    li = l.astype(jnp.int32)
    hi_i = jnp.minimum(li + 1, mask_dim - 1)
    cols = jnp.arange(mask_dim)
    w = ((cols[None, :] == li[:, None]) * (1.0 - frac)[:, None]
         + (cols[None, :] == hi_i[:, None]) * frac[:, None])
    inside = (u >= -1.0) & (u <= mask_dim + 0.0)
    # zero outside the roi (with 1-cell bilinear skirt, like torch paste)
    return w * inside[:, None]


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_size,
    threshold: float = 0.5,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[N,M,M] mask probabilities + [N,4] XYXY boxes → [N,H,W] bool.

    threshold < 0 returns the float paste (no binarization).
    ``dtype`` is the resample-matmul compute type (PostprocessConfig
    .paste_dtype): bfloat16 runs at full MXU rate; the 0.5-threshold
    flips only on |p-0.5| < ~4e-3 boundary pixels.
    """
    h, w = image_size
    m = masks.shape[-1]

    def paste_one(mask, box):
        wy = _axis_weights(h, box[1], box[3], m)   # [H,M]
        wx = _axis_weights(w, box[0], box[2], m)   # [W,M]
        img = (wy.astype(dtype) @ mask.astype(dtype)
               @ wx.T.astype(dtype))               # [H,W]
        return img

    out = jax.vmap(paste_one)(masks, boxes)
    if threshold >= 0:
        return out > threshold
    return out


def crop_and_resize_masks(
    gt_masks: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """[N,H,W] GT bitmasks sampled inside [N,4] boxes → [N,S,S] float targets.

    Bilinear sampling at bin centers (Detectron2 BitMasks.crop_and_resize
    uses ROIAlign with aligned=True on the bitmask)."""
    n, h, w = gt_masks.shape

    def crop_one(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
        xs = x1 + t * jnp.maximum(x2 - x1, 1e-6) - 0.5
        ys = y1 + t * jnp.maximum(y2 - y1, 1e-6) - 0.5
        xs = jnp.clip(xs, 0.0, w - 1.0)
        ys = jnp.clip(ys, 0.0, h - 1.0)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x1i = jnp.minimum(x0 + 1, w - 1)
        y1i = jnp.minimum(y0 + 1, h - 1)
        fx = xs - x0
        fy = ys - y0
        mf = mask.astype(jnp.float32)
        # gather 4 corners on the small S×S grid
        v00 = mf[y0[:, None], x0[None, :]]
        v01 = mf[y0[:, None], x1i[None, :]]
        v10 = mf[y1i[:, None], x0[None, :]]
        v11 = mf[y1i[:, None], x1i[None, :]]
        top = v00 * (1 - fx)[None, :] + v01 * fx[None, :]
        bot = v10 * (1 - fx)[None, :] + v11 * fx[None, :]
        return top * (1 - fy)[:, None] + bot * fy[:, None]

    return jax.vmap(crop_one)(gt_masks, boxes)


def paste_select_pack(
    probs: jnp.ndarray,
    boxes: jnp.ndarray,
    keep: jnp.ndarray,
    scores: jnp.ndarray,
    image_size,
    min_pixels: int = 0,
    do_remove_overlaps: bool = True,
    threshold: float = 0.5,
    chunk: int = 10,
    dtype=jnp.float32,
    extent=None,
):
    """Fused paste → overlap-claim → min-pixel filter → bitpack, one pass.

    The unfused pipeline (paste_masks → ops.morphology.remove_overlaps →
    count filter → pack) materializes the [D,H,W] mask stack in HBM four+
    times (f32 paste, bool, the uint8 rank map, the winner compare) —
    measured 60 ms of a 374 ms batch-32 inference (PERF.md r4).  Here a
    ``lax.scan`` walks the detections in score-rank order, ``chunk`` at a
    time, carrying only the [H,W] pixel-owner map: each step pastes its
    chunk, claims still-unowned pixels (first-painter-wins — identical to
    remove_overlaps' min-rank winner, proven by the unit test), applies the
    min-pixel filter, and emits the chunk already bit-packed.  Peak extra
    HBM = one [chunk,H,W] transient + the owner map instead of 4×[D,H,W].

    probs [D,M,M] float head-res masks (cleaned), boxes [D,4] XYXY,
    keep [D] bool (validity ∧ score-floor ∧ topology), scores [D] →
    (packed [D,H,W/8] uint8 in the ORIGINAL detection order,
    keep_out [D] bool after the min-pixel filter).

    ``extent`` (optional [H,W] bool): the image's TRUE resized extent
    inside a batch-shared canvas.  Pasted pixels outside it are dropped
    BEFORE the min-pixel count (Detectron2's detector_postprocess crops to
    the image size the same way); per-pixel overlap claims are independent,
    so clipping here is exact for every in-extent pixel.
    """
    h, w = image_size
    d, m, _ = probs.shape
    pad = -d % chunk
    if pad:
        probs = jnp.pad(probs, ((0, pad), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        keep = jnp.pad(keep, (0, pad))
        scores = jnp.pad(scores, (0, pad))
    dp = d + pad
    # rank = position in the score-descending order among KEEP masks
    # (non-keep rank last; they never claim pixels — equivalent to the
    # unfused path, which zeroed their output after the claim anyway)
    order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf), stable=True)
    inv = jnp.zeros((dp,), jnp.int32).at[order].set(
        jnp.arange(dp, dtype=jnp.int32))
    probs_o = probs[order]
    boxes_o = boxes[order]
    keep_o = keep[order]
    unclaimed = jnp.asarray(dp, jnp.int32)

    def step(owner, xs):
        pc, bc, kc, base = xs

        def paste_one(mask, box):
            wy = _axis_weights(h, box[1], box[3], m)
            wx = _axis_weights(w, box[0], box[2], m)
            return (wy.astype(dtype) @ mask.astype(dtype)
                    @ wx.T.astype(dtype))

        img = jax.vmap(paste_one)(pc, bc) > threshold      # [C,H,W]
        img &= kc[:, None, None]
        if extent is not None:
            img &= extent[None]
        if do_remove_overlaps:
            ranks = base + jnp.arange(pc.shape[0], dtype=jnp.int32)
            eff = jnp.where(img, ranks[:, None, None], unclaimed)
            new_owner = jnp.minimum(owner, eff.min(axis=0))
            img &= eff == new_owner[None]
            owner = new_owner
        cnt = img.sum(axis=(1, 2))
        ok = kc & (cnt >= min_pixels)
        img &= ok[:, None, None]
        from uwcv_tpu.data.augment import pack_bitmasks

        return owner, (pack_bitmasks(img), ok)

    owner0 = jnp.full((h, w), dp, jnp.int32)
    xs = (probs_o.reshape(dp // chunk, chunk, m, m),
          boxes_o.reshape(dp // chunk, chunk, 4),
          keep_o.reshape(dp // chunk, chunk),
          jnp.arange(0, dp, chunk, dtype=jnp.int32))
    _, (packed_r, ok_r) = jax.lax.scan(step, owner0, xs)
    packed_r = packed_r.reshape(dp, h, w // 8)
    ok_r = ok_r.reshape(dp)
    return packed_r[inv][:d], ok_r[inv][:d]
