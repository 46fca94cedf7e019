"""Pallas TPU kernel: fused windowed RoIAlign (SURVEY.md N4, PERF.md sink #2).

The XLA formulation in ops/roi_align.py materializes every intermediate in
HBM: the [R,win,win,C] window gather (4.3 GB at production scale), the
row-interpolated [R,P,win,C], and the output — measured 70 ms/batch on a
v5e chip, ~13× over the traffic floor.  This kernel fuses the whole op:

- grid = one program per BLOCK of rois; each roi's (slab, y0, x0) window
  origin rides scalar prefetch, so the kernel DMAs exactly its
  [win, win_x, C] window from the HBM-resident level canvas into VMEM;
- DMA is double-buffered across grid steps (scratch persists — the TPU
  grid is a sequential loop): step i computes on slot i%2 while step
  i+1's windows are in flight;
- rois are processed ``BLOCK`` at a time to amortize the per-grid-step
  fixed cost over several DMAs/matmul pairs;
- both separable interpolation contractions run on the MXU against the
  VMEM patch (feature dtype in, f32 accumulate);
- only the [P, P, C] pooled blocks are written back.

HBM traffic = window reads + pooled writes ≈ 5 GB/batch — nothing else.
The XLA path stays as the oracle/fallback (CPU, interpret mode, training —
this kernel carries no VJP; proposal pooling in training uses the XLA op).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 4  # rois per grid step


def _roi_align_kernel(slab_ref, y0_ref, x0_ref, wy_ref, wx_ref,
                      canvas_ref, out_ref, patch, sem, *, window, window_x):
    # three 1-D scalar-prefetch arrays, NOT one [R,3]: SMEM pads the minor
    # dimension to the 128-lane tile, so [R,3] i32 costs R*512 B and blows
    # the 1 MB SMEM budget at R=8000
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(j, slot, k):
        roi = j * BLOCK + k
        # x origins are snapped to the W-dim DMA tile by the caller; Mosaic
        # needs the divisibility asserted (pl.multiple_of) since it cannot
        # prove it for a runtime SMEM value
        return pltpu.make_async_copy(
            canvas_ref.at[slab_ref[roi],
                          pl.ds(y0_ref[roi], window),
                          pl.ds(pl.multiple_of(x0_ref[roi], 8), window_x), :],
            patch.at[slot, k], sem.at[slot, k])

    @pl.when(i == 0)
    def _():
        for k in range(BLOCK):
            dma(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(BLOCK):
            dma(i + 1, (i + 1) % 2, k).start()

    for k in range(BLOCK):
        dma(i, i % 2, k).wait()

    p_out = wy_ref.shape[1]
    c = patch.shape[-1]
    for k in range(BLOCK):
        wy = wy_ref[k]                                  # [P, win]
        wx = wx_ref[k]                                  # [P, win_x]
        pt = patch[i % 2, k].reshape(window, window_x * c)
        # rows[p, wx*c] = Σ_h wy[p, h] · patch[h, wx*c]
        rows = jax.lax.dot_general(
            wy, pt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [P, win_x*C]
        rows = rows.astype(wy.dtype).reshape(p_out, window_x, c)
        # out[q, p, c] = Σ_w wx[q, w] · rows[p, w, c]
        out = jax.lax.dot_general(
            wx, rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [P(q), P(p), C]
        out_ref[k] = out.transpose(1, 0, 2).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window", "window_x", "interpret"))
def roi_align_windows_pallas(
    slab: jnp.ndarray,     # [R] int32 level-slab index per roi
    y0: jnp.ndarray,       # [R] int32 window y origin
    x0: jnp.ndarray,       # [R] int32 window x origin (8-aligned)
    wy: jnp.ndarray,       # [R, P, window] interp weights (bin-folded)
    wx: jnp.ndarray,       # [R, P, window_x]
    canvas: jnp.ndarray,   # [S_total, Hmax, Wmax, C] level slabs (HBM)
    window: int = 32,
    window_x: int = 40,    # window + 8: x origins snap to the W DMA tile
    interpret: bool = False,
) -> jnp.ndarray:
    """→ pooled [R, P, P, C] in the canvas dtype."""
    r, p_out, _ = wy.shape
    c = canvas.shape[-1]
    dtype = canvas.dtype

    # pad the roi axis to the block multiple (padded lanes point at
    # slab 0 / origin 0 — a harmless window fetch; output sliced away)
    pad = -r % BLOCK
    if pad:
        slab = jnp.pad(slab, (0, pad))
        y0 = jnp.pad(y0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
    r_pad = r + pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(r_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, p_out, window), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((BLOCK, p_out, window_x), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),          # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec((BLOCK, p_out, p_out, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, window, window_x, c), dtype),
            pltpu.SemaphoreType.DMA((2, BLOCK)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_roi_align_kernel, window=window,
                          window_x=window_x),
        out_shape=jax.ShapeDtypeStruct((r_pad, p_out, p_out, c), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slab, y0, x0, wy.astype(dtype), wx.astype(dtype), canvas)
    return out[:r] if pad else out
