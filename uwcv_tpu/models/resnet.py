"""ResNet-50/101 backbone (Flax linen, NHWC, bf16-friendly).

TPU-native rebuild of the Detectron2 backbone the reference trains through
its zoo config (mask_rcnn_R_101_FPN_3x.yaml, nn_train.py:196; SURVEY.md N1):

- NHWC layout end-to-end (XLA's native TPU conv layout);
- FrozenBatchNorm is a per-channel affine (scale, bias) — exactly what
  Detectron2's FrozenBatchNorm2d computes after folding running stats; the
  torch-weight importer (engine/checkpoint.py) performs the fold.  The affine
  lives under a ``frozen_bn`` collection-like param name so the optimizer can
  mask it out (Detectron2 keeps it frozen during fine-tune);
- compute dtype bf16, params fp32 (MXU-friendly mixed precision);
- returns the C2..C5 feature pyramid for the FPN.

Stage layouts: R50 = [3,4,6,3], R101 = [3,4,23,3] bottleneck blocks.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# 26 is a minimal 1-block-per-stage variant for tests/smoke runs; 50/101 are
# the production depths (the reference trains 101, benches 50 — SURVEY.md §6)
STAGE_BLOCKS = {26: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBN(nn.Module):
    """Per-channel y = x*scale + bias with non-learned-stat semantics.

    Equivalent to FrozenBatchNorm2d after folding:
        scale = gamma / sqrt(running_var + eps);  bias = beta - mean*scale.

    ``zero_scale`` zero-initializes the scale — used on the LAST BN of each
    residual branch so every block starts as identity ("zero-init residual");
    without real batch stats an identity-affine trunk otherwise grows
    activations with depth and from-scratch smoke training diverges.  Weight
    imports overwrite these values with folded stats either way.
    """

    dtype: Any = jnp.bfloat16
    zero_scale: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_scale
                else nn.initializers.ones)
        scale = self.param("frozen_bn_scale", init, (c,), jnp.float32)
        bias = self.param("frozen_bn_bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class StemConv(nn.Module):
    """The 7×7/2 stem conv, computed as explicit im2col + ONE [147,64]
    matmul when ``im2col`` is set.

    Why: as a spatial conv the contraction dim is C_in=3 — the MXU runs at
    ~3% utilization and the stem costs 35% of backbone wall time for 1.2%
    of its FLOPs (PERF.md sink #3; the MLPerf space-to-depth re-expression
    measured SLOWER on this XLA/libtpu).  im2col re-expresses it with
    K=7·7·3=147: 49 strided slices concatenate into [B·H/2·W/2, 147]
    patches (pure relayout traffic, ~100 MB/img) and one dense matmul tiles
    the MXU properly.  Bit-comparable: same f32 accumulation of the same
    147 products, only the summation order differs.

    Param tree is identical to the ``nn.Conv`` it replaces
    (``stem_conv/kernel`` [7,7,3,64] f32) so checkpoints and the torch
    importer (engine/checkpoint.py) are unaffected.
    """

    dtype: Any = jnp.bfloat16
    # default False = the measured winner (im2col was a 2.5x regression on
    # chip, PERF.md r4 ladder); matches ModelConfig.stem_im2col
    im2col: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64), jnp.float32)
        k = kernel.astype(self.dtype)
        if not self.im2col:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        ho, wo = (h + 1) // 2, (w + 1) // 2
        cols = [
            jax.lax.slice(xp, (0, dy, dx, 0),
                          (b, dy + 2 * (ho - 1) + 1, dx + 2 * (wo - 1) + 1,
                           c), (1, 2, 2, 1))
            for dy in range(7) for dx in range(7)
        ]
        patches = jnp.concatenate(cols, axis=-1)      # [B,Ho,Wo,49*C]
        y = jax.lax.dot_general(
            patches.reshape(b * ho * wo, 49 * c), k.reshape(49 * c, 64),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(self.dtype).reshape(b, ho, wo, 64)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck with optional projection shortcut.

    Stride sits on the 3x3 conv (torchvision/Detectron2 modern ordering).
    """

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.use_projection:
            shortcut = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="shortcut_conv")(x)
            shortcut = FrozenBN(self.dtype, name="shortcut_bn")(shortcut)

        y = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = FrozenBN(self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.bottleneck_channels, (3, 3),
                    strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBN(self.dtype, zero_scale=True, name="bn3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Backbone returning {"c2","c3","c4","c5"} NHWC features at /4../32."""

    depth: int = 50
    dtype: Any = jnp.bfloat16
    stem_im2col: bool = False  # matches ModelConfig (im2col measured slower)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)

        # stem: 7x7/2 conv + 3x3/2 maxpool → /4 (im2col re-expression —
        # see StemConv; param tree identical to the nn.Conv original)
        x = StemConv(dtype=self.dtype, im2col=self.stem_im2col,
                     name="stem_conv")(x)
        x = FrozenBN(self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        channels = (256, 512, 1024, 2048)
        for stage, (n_blocks, out_c) in enumerate(zip(blocks, channels)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    out_channels=out_c,
                    bottleneck_channels=out_c // 4,
                    stride=stride if b == 0 else 1,
                    use_projection=(b == 0),
                    dtype=self.dtype,
                    name=f"res{stage + 2}_block{b}",
                )(x)
            feats[f"c{stage + 2}"] = x
        return feats
