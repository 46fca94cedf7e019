"""Ahead-of-time export of the inference program (serving path).

The reference deploys by shipping Python + Detectron2 + a ``.pth`` and
re-building the model in every process (nn_inference.py:222-234).  Here the
ENTIRE compiled pipeline — resize → backbone/FPN → RPN → RoIAlign → heads →
NMS → paste → morphology → bitpack, with the weights baked in as constants
— is serialized to one portable StableHLO artifact via ``jax.export``:

- no model code, params, or retracing needed at load time — a serving
  process calls ``Predictor.from_exported(cfg, path)`` and gets the same
  host API (``predict_batch`` / ``__call__``);
- the artifact pins static shapes: one (batch, canvas_h, canvas_w) program;
  smaller batches are zero-padded in and sliced out by the loader wrapper;
- exports are cross-process and cross-machine for the same platform
  (StableHLO carries its own VHLO version guarantees).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register_pytrees() -> None:
    """Output pytrees with custom nodes need registered serialization."""
    from uwcv_tpu.models.heads import Detections

    try:
        jax.export.register_namedtuple_serialization(
            Detections, serialized_name="uwcv_tpu.Detections")
    except ValueError:
        pass  # already registered in this process


def export_predictor(predictor, path: str, batch_size: int = 8,
                     canvas: Optional[Tuple[int, int]] = None,
                     platforms: Optional[Tuple[str, ...]] = None) -> str:
    """Serialize ``predictor``'s device program (weights baked in) to
    ``path``.  ``canvas`` is the static host-ship image size — default:
    the test pad canvas rounded up to the input.canvas_bucket multiple the
    host padding uses."""
    from uwcv_tpu.utils.image import bucket_up

    _register_pytrees()
    bkt = predictor.cfg.input.canvas_bucket
    ch, cw = canvas or predictor.cfg.input.pad_size_test
    ch, cw = bucket_up(ch, bkt), bucket_up(cw, bkt)
    args = (
        jax.ShapeDtypeStruct((batch_size, ch, cw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.int32),
    )
    kwargs = {"platforms": platforms} if platforms else {}
    # _jit_run is a host-side lambda closing over (jit fn, params); export
    # wants ONE jitted callable — re-jitting the closure embeds the weights
    # as constants in the traced program, which is exactly the "weights
    # baked in" serving contract
    exp = jax.export.export(jax.jit(predictor._jit_run), **kwargs)(*args)
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(data))
    return path


def load_exported(path: str):
    """Deserialize an exported inference program; returns
    (callable, batch_size, (canvas_h, canvas_w)) — the callable has the
    ``Predictor._jit_run`` signature and pads/slices smaller batches."""
    _register_pytrees()
    with open(path, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    img_aval = exp.in_avals[0]
    b, ch, cw = img_aval.shape[0], img_aval.shape[1], img_aval.shape[2]
    call = jax.jit(exp.call)

    def run(images, scales, out_sizes, model_canvas=None):
        # model_canvas is a live-predictor optimization knob; the exported
        # program's canvas is baked — smaller batches/canvases pad in below
        n = images.shape[0]
        if n > b:
            raise ValueError(f"exported for batch {b}, got {n}")
        if images.shape[1] > ch or images.shape[2] > cw:
            raise ValueError(
                f"exported for canvas {(ch, cw)}, got {images.shape[1:3]}")
        if images.shape[-1] == 1:
            # grayscale-transfer fast path: the host ships one channel
            # (predictor.py); the exported program is fixed at 3 — the
            # broadcast runs device-side, after the link was crossed 1ch
            images = jnp.broadcast_to(images, images.shape[:-1] + (3,))
        if n < b or images.shape[1:3] != (ch, cw):
            images = jnp.pad(images, ((0, b - n), (0, ch - images.shape[1]),
                                      (0, cw - images.shape[2]), (0, 0)))
            scales = jnp.pad(scales, (0, b - n), constant_values=1.0)
            out_sizes = jnp.pad(out_sizes, ((0, b - n), (0, 0)))
        out = call(images, scales, out_sizes)
        if n < b:
            out = jax.tree_util.tree_map(lambda x: x[:n], out)
        return out

    return run, b, (ch, cw)
