"""Feature Pyramid Network head over ResNet C2..C5 (SURVEY.md N1).

Standard Detectron2 FPN for Mask R-CNN: 1x1 laterals, nearest-neighbor
top-down upsampling, 3x3 output convs, and a stride-2 max-pool P6
(LastLevelMaxPool).  Output: {"p2".."p6"} all with ``channels`` channels.
Nearest upsample by 2 is a pure reshape/broadcast — no gather — so XLA fuses
it into the elementwise add.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] → [B,2H,2W,C] via broadcast (fusion-friendly on TPU)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        laterals = {
            name: nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                          name=f"lateral_{name}")(feats[name])
            for name in ("c2", "c3", "c4", "c5")
        }
        # top-down pathway
        td = {"c5": laterals["c5"]}
        for upper, lower in (("c5", "c4"), ("c4", "c3"), ("c3", "c2")):
            td[lower] = laterals[lower] + upsample2x_nearest(td[upper])

        out = {
            f"p{i}": nn.Conv(self.channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"output_p{i}")(td[f"c{i}"])
            for i in range(2, 6)
        }
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
