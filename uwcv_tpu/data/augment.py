"""On-device training augmentations (pure JAX, keyed PRNG).

Rebuilds the reference's CPU-worker augmentation pipeline (nn_train.py:134-144)
as batched XLA ops so the TPU does the pixel math and the host only decodes:

    Resize((800,800))              → host (variable→static shape change)
    RandomBrightness(0.8, 1.8)     → blend with black      (here)
    RandomContrast(0.6, 1.3)       → blend with mean       (here)
    RandomSaturation(0.8, 1.4)     → blend with grayscale  (here)
    RandomRotation(angle=[90,90])  → exact rot90           (here, square only)
    RandomLighting(0.7)            → PCA color jitter      (here)
    RandomFlip(prob=0.4, vertical) → row reverse           (here)

Blend semantics match Detectron2's BlendTransform: out = (1-w)*src + w*img
with w drawn uniformly from the configured range.  All geometric ops are
applied consistently to image (HWC, RGB, float32 0..255), instance masks
([N,H,W]), and boxes (XYXY in pixels).  Everything is shape-preserving and
jit-safe; randomness comes from a threaded jax.random key.

Note: the reference feeds BGR images into Detectron2's RandomSaturation and
RandomLighting, whose ITU-R 601 / ImageNet-PCA constants assume RGB — a
silent channel-order bug in the reference.  We keep images RGB end-to-end on
device and convert to the model's input format only in the model front-end,
so the constants apply to the channels they were derived for.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uwcv_tpu.config import InputConfig

# numpy (not jnp) on purpose: this module can be imported lazily while
# another function is being traced, and module-level jnp ops executed under
# an active trace would cache tracers in these globals (leaks into every
# later jit) — numpy constants are trace-proof.
import numpy as _np

# ITU-R 601 luma weights (RGB) — Detectron2 RandomSaturation.
_GRAY_RGB = _np.array([0.299, 0.587, 0.114], _np.float32)
# ImageNet PCA lighting basis — Detectron2 RandomLighting (RGB order).
_EIGVEC = _np.array(
    [[-0.5675, 0.7192, 0.4009],
     [-0.5808, -0.0045, -0.8140],
     [-0.5836, -0.6948, 0.4203]], _np.float32)
_EIGVAL = _np.array([0.2175, 0.0188, 0.0045], _np.float32)


def _blend(img: jnp.ndarray, src, w) -> jnp.ndarray:
    return (1.0 - w) * src + w * img


def random_brightness(img, key, lo, hi):
    w = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return _blend(img, 0.0, w)


def random_contrast(img, key, lo, hi):
    w = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return _blend(img, img.mean(), w)


def random_saturation(img, key, lo, hi):
    w = jax.random.uniform(key, (), minval=lo, maxval=hi)
    gray = (img * _GRAY_RGB).sum(axis=-1, keepdims=True)
    return _blend(img, gray, w)


def random_lighting(img, key, scale):
    """Detectron2 RandomLighting: adds eigvecs·(w·eigvals) DIRECTLY to the
    0-255 image.  The eigenvalues are from [0,1]-normalized PCA, so in D2
    the jitter is ~±0.15 intensity units — effectively invisible — a known
    quirk it inherited from fb.resnet.torch.  We match it exactly (an
    earlier ×255 here perturbed every pixel ~±40 units, silently changing
    the training distribution vs the reference, nn_train.py:141)."""
    weights = jax.random.normal(key, (3,)) * scale
    delta = jnp.asarray(_EIGVEC) @ (weights * _EIGVAL)
    return img + delta


def rot90_image(img: jnp.ndarray) -> jnp.ndarray:
    """CCW 90° for HWC (or HW) arrays — requires H == W to stay static."""
    return jnp.rot90(img, k=1, axes=(0, 1))


def rot90_boxes(boxes: jnp.ndarray, size: int) -> jnp.ndarray:
    """XYXY boxes under jnp.rot90 (CCW): (x, y) → (y, W - x)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([y1, size - x2, y2, size - x1], axis=-1)


def vflip_image(img: jnp.ndarray) -> jnp.ndarray:
    return img[::-1]


def vflip_boxes(boxes: jnp.ndarray, height: int) -> jnp.ndarray:
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([x1, height - y2, x2, height - y1], axis=-1)


def augment_sample(
    sample: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: InputConfig,
) -> Dict[str, jnp.ndarray]:
    """Apply the full reference pipeline to one sample.

    sample: {image [H,W,3] f32 RGB 0..255, boxes [N,4], masks [N,H,W] bool,
             classes [N], valid [N]}.  H must equal W (the reference resizes
    to square 800×800 before rotating, nn_train.py:135-139).
    """
    img = sample["image"]
    boxes = sample["boxes"]
    masks = sample.get("masks")
    size = img.shape[0]
    assert img.shape[0] == img.shape[1], "rot90 augment requires square images"

    kb, kc, ks, kl, kf, kr = jax.random.split(key, 6)

    img = random_brightness(img, kb, *cfg.brightness_range)
    img = random_contrast(img, kc, *cfg.contrast_range)
    img = random_saturation(img, ks, *cfg.saturation_range)

    # RandomRotation(angle=[90,90]) — the reference rotates EVERY sample 90°
    # (Detectron2 samples uniformly from [90,90]; nn_train.py:139), so its
    # training distribution contains ONLY the rotated orientation: a
    # horizontal test-time scale bar literally never occurs in training, and
    # the RPN objectness/regression for thin-horizontal anchors trains as
    # pure background (measured: the bar's best anchor ranks ~200k/256k in
    # objectness after fine-tune — tools/scalebar_diag.py).  ``rotation_prob``
    # < 1 restores both orientations; 1.0 reproduces the reference exactly.
    if tuple(cfg.rotation_angles) == (90.0,):
        do_rot = jax.random.uniform(kr, ()) < cfg.rotation_prob
        img = jnp.where(do_rot, rot90_image(img), img)
        boxes = jnp.where(do_rot, rot90_boxes(boxes, size), boxes)
        if masks is not None:
            masks = jnp.where(do_rot, jnp.rot90(masks, k=1, axes=(1, 2)),
                              masks)

    img = random_lighting(img, kl, cfg.lighting_scale)

    do_flip = jax.random.uniform(kf, ()) < cfg.vflip_prob
    img = jnp.where(do_flip, vflip_image(img), img)
    boxes = jnp.where(do_flip, vflip_boxes(boxes, size), boxes)
    if masks is not None:
        masks = jnp.where(do_flip, masks[:, ::-1, :], masks)

    img = jnp.clip(img, 0.0, 255.0)
    out = dict(sample)
    out["image"] = img
    out["boxes"] = boxes
    if masks is not None:
        out["masks"] = masks
    return out


def augment_batch(batch: Dict[str, jnp.ndarray], key: jax.Array,
                  cfg: InputConfig) -> Dict[str, jnp.ndarray]:
    """vmapped per-sample augmentation over the leading batch axis."""
    n = batch["image"].shape[0]
    keys = jax.random.split(key, n)
    return jax.vmap(lambda s, k: augment_sample(s, k, cfg))(batch, keys)


def pack_bitmasks(masks: jnp.ndarray) -> jnp.ndarray:
    """[..., W] bool → [..., W/8] uint8 (device-side np.packbits, MSB first).

    Used to shrink device→host mask transfers 8× (full-image instance masks
    dominate D2H traffic on batch inference).  W must be a multiple of 8.
    """
    *lead, w = masks.shape
    assert w % 8 == 0, f"width {w} not a multiple of 8"
    bits = masks.reshape(*lead, w // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_bitmasks(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """[..., W/8] uint8 bit-packed masks → [..., W] bool (device-side).

    Host packs with np.packbits (MSB first); this is the XLA-side inverse,
    keeping host→device transfers 8× smaller (SURVEY.md N14 bandwidth note).
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :width] != 0
