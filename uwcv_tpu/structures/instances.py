"""Fixed-shape Instances pytree.

The reference consumes Detectron2's dynamic-length ``Instances`` (pred_boxes,
scores, pred_classes, pred_masks — nn_inference.py:321-327).  On TPU dynamic
lengths are poison for the compiler, so this Instances is a *padded* struct:
every field has a static leading capacity ``N`` plus a ``valid`` bool mask.
It is a registered pytree, so it flows through jit/pjit/vmap unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Instances:
    """Padded instance set.

    boxes   : [N, 4] float  XYXY_ABS in the (resized, unpadded) image frame
    scores  : [N]    float
    classes : [N]    int32
    valid   : [N]    bool    — padding mask; invalid rows are all-zero
    masks   : [N, H, W] (optional) bool/float full-image masks, or
              [N, M, M] head-resolution mask logits before paste
    image_size : (H, W) static python ints — the true (resized) image extent
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
    image_size: Tuple[int, int] = (0, 0)

    # -- pytree protocol: arrays are leaves, image_size is static aux data --
    def tree_flatten(self):
        children = (self.boxes, self.scores, self.classes, self.valid, self.masks)
        return children, self.image_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        boxes, scores, classes, valid, masks = children
        return cls(boxes=boxes, scores=scores, classes=classes, valid=valid,
                   masks=masks, image_size=aux)

    @property
    def capacity(self) -> int:
        return self.boxes.shape[0]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @classmethod
    def empty(cls, capacity: int, image_size: Tuple[int, int],
              with_masks: Optional[Tuple[int, int]] = None,
              dtype=jnp.float32) -> "Instances":
        masks = None
        if with_masks is not None:
            masks = jnp.zeros((capacity,) + tuple(with_masks), dtype=dtype)
        return cls(
            boxes=jnp.zeros((capacity, 4), dtype=dtype),
            scores=jnp.zeros((capacity,), dtype=dtype),
            classes=jnp.zeros((capacity,), dtype=jnp.int32),
            valid=jnp.zeros((capacity,), dtype=bool),
            masks=masks,
            image_size=image_size,
        )

    # -- host-side conversion for the measurement/report layers --
    def to_numpy(self) -> Dict[str, np.ndarray]:
        """Pull to host and strip padding; returns dense numpy arrays."""
        valid = np.asarray(self.valid)
        out = {
            "boxes": np.asarray(self.boxes)[valid],
            "scores": np.asarray(self.scores)[valid],
            "classes": np.asarray(self.classes)[valid],
        }
        if self.masks is not None:
            h, w = self.image_size
            masks = np.asarray(self.masks)[valid]
            if masks.ndim == 3 and h and w and masks.shape[1] >= h and masks.shape[2] >= w:
                masks = masks[:, :h, :w]
            out["masks"] = masks
        return out
