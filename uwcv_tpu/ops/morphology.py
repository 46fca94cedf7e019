"""Device-side binary mask morphology (SURVEY.md N12).

The reference cleans every predicted mask on the CPU with scipy/skimage
(nn_inference.py:286-306): ``binary_fill_holes`` → ``erosion(dilation(m))``
→ overlap removal → connected-component check.  That per-mask Python loop is
the batch-inference bottleneck after the model itself.  Here the whole
cleanup is a fixed-shape XLA program over [N, H, W] mask stacks:

- dilate/erode: cross/3×3 max/min pooling (``lax.reduce_window``; the cross
  is skimage's default footprint, which the reference's smoothing uses);
- fill_holes: flood the *background* from the border with iterated
  4-connected dilation constrained to ~mask (scipy's default structure;
  lax.while_loop exits on the first converged pass — typical masks need a
  handful of iterations, the cap is the true O(H·W) geodesic worst case);
- connected components: iterated 8-neighborhood label-min-propagation over
  a unique-seed int32 labeling, same while_loop pattern;
- overlap removal: cumulative "claimed" canvas in score order via
  ``lax.scan`` (associative in paint order, matches nn_inference.py:298).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _pool(x: jnp.ndarray, op: str, window: Tuple[int, int]) -> jnp.ndarray:
    """Windowed max/min over the last two dims of [..., H, W] arrays."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf if op == "max" else jnp.inf
    else:
        info = jnp.iinfo(x.dtype)
        init = info.min if op == "max" else info.max
    comp = jax.lax.max if op == "max" else jax.lax.min
    nd = x.ndim
    win = (1,) * (nd - 2) + tuple(window)
    strides = (1,) * nd
    pads = ((0, 0),) * (nd - 2) + tuple((k // 2, k // 2) for k in window)
    return jax.lax.reduce_window(x, init, comp, win, strides, pads)


def _pool3x3(x: jnp.ndarray, op: str) -> jnp.ndarray:
    """Full 3×3 (8-connected) max/min."""
    return _pool(x, op, (3, 3))


def _pool_cross(x: jnp.ndarray, op: str) -> jnp.ndarray:
    """Cross-shaped (4-connected) max/min: N/S/E/W neighbors + center —
    scipy's ``generate_binary_structure(2, 1)``."""
    comb = jnp.maximum if op == "max" else jnp.minimum
    return comb(_pool(x, op, (3, 1)), _pool(x, op, (1, 3)))


def dilate(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """Binary dilation of bool [..., H, W].

    ``connectivity=1`` (default) = cross footprint, matching
    ``skimage.morphology.dilation(footprint=None)`` — what the reference's
    smoothing calls (nn_inference.py:296); 2 = full 3×3 square.
    """
    f = _pool_cross if connectivity == 1 else _pool3x3
    return f(mask.astype(jnp.float32), "max") > 0.5


def erode(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """Binary erosion of bool [..., H, W] (footprint as in :func:`dilate`)."""
    f = _pool_cross if connectivity == 1 else _pool3x3
    return f(mask.astype(jnp.float32), "min") > 0.5


def close_open_smooth(mask: jnp.ndarray) -> jnp.ndarray:
    """erosion(dilation(mask)) — the reference's smoothing
    (nn_inference.py:296-297; skimage's default footprint is the cross)."""
    return erode(dilate(mask))


def fill_holes(mask: jnp.ndarray, max_iters: int = 0) -> jnp.ndarray:
    """``scipy.ndimage.binary_fill_holes`` for bool [..., H, W] stacks.

    Floods background from the image border with the 4-connected cross
    (scipy's default ``structure=None`` → ``generate_binary_structure(2,
    1)``); pixels unreachable from the border are holes and get filled.
    Convergence-tested while_loop: typical masks stabilize in a few
    iterations (the loop exits on the first unchanged pass), but the true
    worst case is the longest geodesic background path — O(H·W) for
    serpentine corridors, NOT H+W — so the cap defaults to H·W to never
    misclassify still-reachable background as holes.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    max_iters = max_iters or (h * w)
    inv = ~mask

    border = jnp.zeros_like(mask)
    border = border.at[..., 0, :].set(True)
    border = border.at[..., -1, :].set(True)
    border = border.at[..., :, 0].set(True)
    border = border.at[..., :, -1].set(True)
    seed = border & inv

    def cond(state):
        i, flood, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, flood, _ = state
        new = dilate(flood, connectivity=1) & inv
        return i + 1, new, jnp.any(new != flood)

    _, flood, _ = jax.lax.while_loop(cond, body, (0, seed, jnp.array(True)))
    return mask | (~flood & inv)


def connected_components(mask: jnp.ndarray, max_iters: int = 0) -> jnp.ndarray:
    """Label 8-connected components of one bool [H, W] mask.

    8-connectivity matches the reference's ``skimage.measure.label``
    default for 2-D input (nn_inference.py:300).  Returns int32 [H, W]:
    0 = background, components carry the (arbitrary but distinct) minimum
    seed id of their pixels.  Iterated min-propagation in int32 (exact for
    any H·W an int32 can index — float32 would collide seed ids above
    2²⁴ ≈ 4k×4k); early-exits on convergence, capped at the true O(H·W)
    worst case (a serpentine component's geodesic diameter, not H+W).
    """
    h, w = mask.shape
    max_iters = max_iters or (h * w)
    seeds = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1)
    big = jnp.int32(h * w + 2)
    labels = jnp.where(mask, seeds, big)

    def cond(state):
        i, lab, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, lab, _ = state
        prop = _pool3x3(lab, "min")
        new = jnp.where(mask, jnp.minimum(lab, prop), lab)
        return i + 1, new, jnp.any(new != lab)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (0, labels, jnp.array(True)))
    return jnp.where(mask, labels, 0)


def count_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Number of 8-connected components in one bool [H, W] mask (scalar).

    A component is counted by its unique root label: count pixels whose
    label equals their own seed id."""
    labels = connected_components(mask)
    h, w = mask.shape
    seeds = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1
    roots = mask & (labels == seeds)
    return jnp.sum(roots.astype(jnp.int32))


def remove_overlaps(masks: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """Zero pixels already claimed by earlier (higher-priority) masks.

    masks [N,H,W] bool; order [N] int32 — priority ranking (0 = first
    painter).  Matches nn_inference.py:298 (higher-score masks win pixels).
    """
    n = masks.shape[0]
    # Parallel formulation: each pixel's winner is the best-ranked mask
    # covering it; mask i keeps exactly the pixels it wins.  Identical to
    # the sequential first-painter scan (ranks are unique), but one
    # min-reduction over N instead of N latency-chained scan steps over the
    # full [H,W] canvas (at N=100 × 1024×1344 the scan was ~100 dependent
    # HBM passes).
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))                   # rank per mask
    rank_dtype = jnp.uint8 if n < 255 else jnp.int32
    unclaimed = jnp.asarray(n, rank_dtype)
    eff = jnp.where(masks, inv.astype(rank_dtype)[:, None, None],
                    unclaimed)                            # [N,H,W]
    winner = eff.min(axis=0)                              # [H,W]
    return masks & (eff == winner[None])


def clean_head_masks(
    probs: jnp.ndarray,
    threshold: float = 0.5,
    do_fill_holes: bool = True,
    do_smooth: bool = True,
    drop_fragmented: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask cleanup at head resolution (TPU-first redesign of
    nn_inference.py:286-306).

    The reference cleans each pasted full-image mask on CPU.  Hole-filling
    and connected-component analysis are iterative floods — at 1024×1344 ×
    100 masks that is thousands of sequential passes over 137M pixels, which
    no hardware should do per image.  The same topological operations on the
    28×28 head mask converge in a few early-exit iterations on 78K pixels
    and vmap across instances; holes and fragments at sub-cell scale cannot
    survive the bilinear paste anyway, so cleaning *before* paste preserves
    the reference's intent at ~1/2000 of the work.

    probs [N,M,M] float → (cleaned [N,M,M] bool, single_component [N] bool).
    """
    m = probs > threshold
    if do_fill_holes:
        m = jax.vmap(fill_holes)(m)
    if do_smooth:
        m = close_open_smooth(m)
    single = jnp.ones((m.shape[0],), bool)
    if drop_fragmented:
        n_comp = jax.vmap(count_components)(m)
        single = n_comp <= 1
        m = m & single[:, None, None]
    return m, single


def postprocess_masks(
    masks: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    min_pixels: int = 2,
    score_floor: float = 0.5,
    do_fill_holes: bool = True,
    do_smooth: bool = True,
    do_remove_overlaps: bool = True,
    drop_fragmented: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's full postprocess_masks (nn_inference.py:265-306) as one
    jit-able program over a padded [N,H,W] stack.

    Reference bugs intentionally fixed (SURVEY.md §2a): size filtering uses a
    proper mask instead of the ``keep_ind`` truncation; the score floor is
    per-instance rather than ``ori_score.all() < 0.5``.
    Returns (cleaned_masks [N,H,W] bool, keep [N] bool).
    """
    keep = valid & (scores >= score_floor)
    keep &= masks.sum(axis=(1, 2)) >= min_pixels
    m = masks & keep[:, None, None]

    if do_fill_holes:
        m = jax.vmap(fill_holes)(m)
    if do_smooth:
        m = close_open_smooth(m)
    if do_remove_overlaps:
        order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf), stable=True)
        m = remove_overlaps(m, order.astype(jnp.int32))
    if drop_fragmented:
        n_comp = jax.vmap(count_components)(m)
        keep &= n_comp == 1
        m = m & keep[:, None, None]

    keep &= m.sum(axis=(1, 2)) >= min_pixels
    m = m & keep[:, None, None]
    return m, keep
