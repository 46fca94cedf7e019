"""Run-length-encoding codecs — all three reference formats plus decode
(SURVEY.md C8), vectorized numpy (no Python per-pixel loops).

(a) ``binary_mask_to_rle``: COCO uncompressed dict {counts, size},
    Fortran-order run lengths starting with a zero-run
    (nn_inference.py:177-186 — minus its stray ``d()`` NameError);
(b) ``rle_encode``: C-order 1-indexed "start length ..." string
    (nn_inference.py:192-201);
(c) ``rle_encoding``: Fortran-order 1-indexed start/length list — the
    variant the reference actually exports to CSV (nn_inference.py:253-263);
(d) ``rle_decode``: inverse of (c)/(b) given order (nn_inference.py:237-251).
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np


def _runs(flat: np.ndarray):
    """start indices (0-based) and lengths of nonzero runs in a flat array.

    Binarize FIRST: a 0/255 uint8 mask (the common PIL mask convention)
    cast straight to int8 overflows 255 → -1 and swaps every run's
    start/end, producing negative run lengths."""
    padded = np.concatenate([[0], (flat != 0).astype(np.int8), [0]])
    diff = np.diff(padded)
    starts = np.flatnonzero(diff == 1)
    ends = np.flatnonzero(diff == -1)
    return starts, ends - starts


def binary_mask_to_rle(mask: np.ndarray) -> Dict:
    """COCO uncompressed RLE: counts alternate 0-runs/1-runs, column-major."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    starts, lengths = _runs(flat)
    counts: List[int] = []
    prev_end = 0
    for s, l in zip(starts, lengths):
        counts.append(int(s - prev_end))   # zero run (may be 0 for leading 1)
        counts.append(int(l))
        prev_end = s + l
    counts.append(int(n - prev_end))
    if counts and counts[-1] == 0:
        counts.pop()
    return {"counts": counts, "size": list(mask.shape)}


def rle_from_coco(rle: Dict) -> np.ndarray:
    """Inverse of binary_mask_to_rle."""
    h, w = rle["size"]
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in rle["counts"]:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F").astype(bool)


def rle_encode(mask: np.ndarray) -> str:
    """C-order 1-indexed 'start length' pairs string."""
    flat = np.asarray(mask, np.uint8).flatten(order="C")
    starts, lengths = _runs(flat)
    return " ".join(f"{s + 1} {l}" for s, l in zip(starts, lengths))


def rle_encoding(mask: np.ndarray) -> List[int]:
    """Fortran-order 1-indexed flat [start, length, ...] list — the format
    the reference writes to its EncodedPixels CSV column.

    Dispatches to the native C++ encoder when built (single pass, no
    transposed copy); numpy fallback otherwise."""
    if mask.ndim == 2:
        from uwcv_tpu.utils import native

        res = native.rle_encode_fortran(mask)
        if res is not None:
            return res
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    starts, lengths = _runs(flat)
    out: List[int] = []
    for s, l in zip(starts, lengths):
        out.extend((int(s + 1), int(l)))
    return out


def rle_decode(
    rle: Union[str, List[int]],
    shape,
    order: str = "F",
) -> np.ndarray:
    """'start length ...' string or flat list → bool mask of ``shape``."""
    if isinstance(rle, str):
        vals = [int(x) for x in rle.split()]
    else:
        vals = [int(x) for x in rle]
    starts = np.asarray(vals[0::2], np.int64) - 1
    lengths = np.asarray(vals[1::2], np.int64)
    flat = np.zeros(int(np.prod(shape)), np.uint8)
    for s, l in zip(starts, lengths):
        flat[s:s + l] = 1
    return flat.reshape(shape, order=order).astype(bool)
