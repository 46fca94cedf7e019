"""Image front-end helpers (SURVEY.md N8).

Test-time geometry follows Detectron2's ResizeShortestEdge used by
DefaultPredictor (short edge → 800, cap long edge at 1333): the *scale* is
computed on host (cheap scalars), the resample itself runs on device inside
the jitted predictor via ``jax.image.scale_and_translate`` with a static
output canvas — dynamic scale, static shapes, so one compiled program serves
every input size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def shortest_edge_scale(h: int, w: int, short: int = 800,
                        max_size: int = 1333) -> float:
    """Detectron2 ResizeShortestEdge scale factor."""
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return float(scale)


def pad_to_canvas(img: np.ndarray, canvas_h: int, canvas_w: int) -> np.ndarray:
    """Zero-pad HWC uint8 to the static host canvas (top-left anchored)."""
    h, w = img.shape[:2]
    if h > canvas_h or w > canvas_w:
        img = img[:canvas_h, :canvas_w]
        h, w = img.shape[:2]
    out = np.zeros((canvas_h, canvas_w, img.shape[2]), img.dtype)
    out[:h, :w] = img
    return out


def device_resize(
    image: jnp.ndarray,
    scale: jnp.ndarray,
    out_h: int,
    out_w: int,
    antialias: bool = True,
) -> jnp.ndarray:
    """Resample a padded HWC image by dynamic ``scale`` onto a static
    (out_h, out_w) canvas — XLA-compiled bilinear (becomes two matmuls).

    Content occupies the top-left scale*(h,w) region; the rest is zero.
    """
    return jax.image.scale_and_translate(
        image.astype(jnp.float32),
        (out_h, out_w, image.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale, scale]),
        translation=jnp.zeros((2,), jnp.float32),
        method="bilinear",
        antialias=antialias,
    )


def bucket_up(v: int, bucket: int) -> int:
    """Round ``v`` up to the next multiple of ``bucket``.

    One definition shared by Predictor.stage_batch and engine/export.py —
    an exported artifact's canvas must keep matching the live host
    bucketing or from_exported fails on wide images."""
    return -(-v // bucket) * bucket


def bucket128(v: int) -> int:
    """Round up to the default 128-multiple host-canvas bucket."""
    return bucket_up(v, 128)
