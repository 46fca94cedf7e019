import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwcv_tpu.config import Config
from uwcv_tpu.data.augment import (
    augment_batch,
    augment_sample,
    rot90_boxes,
    unpack_bitmasks,
    vflip_boxes,
)
from uwcv_tpu.data.loader import TrainLoader, collate, prepare_train_sample
from uwcv_tpu.data.superannotate import get_superannotate_dicts
from uwcv_tpu.data.synthetic import generate_dataset


def _mask_bbox(mask):
    ys, xs = np.nonzero(np.asarray(mask))
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def test_rot90_box_mask_consistency():
    size = 64
    mask = np.zeros((size, size), bool)
    mask[10:20, 30:50] = True  # y 10..20, x 30..50
    box = jnp.asarray(_mask_bbox(mask))
    rot_mask = jnp.rot90(jnp.asarray(mask), k=1, axes=(0, 1))
    rot_box = rot90_boxes(box, size)
    np.testing.assert_allclose(np.asarray(rot_box), _mask_bbox(rot_mask))


def test_vflip_box_mask_consistency():
    size = 64
    mask = np.zeros((size, size), bool)
    mask[5:15, 20:40] = True
    box = jnp.asarray(_mask_bbox(mask))
    flip_mask = jnp.asarray(mask)[::-1]
    flip_box = vflip_boxes(box, size)
    np.testing.assert_allclose(np.asarray(flip_box), _mask_bbox(flip_mask))


def test_unpack_bitmasks_roundtrip():
    rng = np.random.default_rng(0)
    masks = rng.random((3, 16, 20)) > 0.5
    packed = np.packbits(masks, axis=-1)
    unpacked = unpack_bitmasks(jnp.asarray(packed), 20)
    np.testing.assert_array_equal(np.asarray(unpacked), masks)


def test_pack_bitmasks_matches_numpy_packbits():
    from uwcv_tpu.data.augment import pack_bitmasks

    rng = np.random.default_rng(1)
    masks = rng.random((2, 5, 7, 64)) > 0.5
    dev = np.asarray(pack_bitmasks(jnp.asarray(masks)))
    host = np.packbits(masks, axis=-1)
    np.testing.assert_array_equal(dev, host)
    # and np.unpackbits inverts it
    np.testing.assert_array_equal(
        np.unpackbits(dev, axis=-1).astype(bool), masks)


def test_augment_sample_shapes_and_determinism():
    cfg = Config()
    size = 64
    rng = np.random.default_rng(1)
    sample = {
        "image": jnp.asarray(rng.uniform(0, 255, (size, size, 3)), jnp.float32),
        "boxes": jnp.asarray([[10, 10, 30, 20]] * 5, jnp.float32),
        "classes": jnp.zeros((5,), jnp.int32),
        "valid": jnp.ones((5,), bool),
        "masks": jnp.zeros((5, size, size), bool),
    }
    key = jax.random.key(0)
    out1 = augment_sample(sample, key, cfg.input)
    out2 = augment_sample(sample, key, cfg.input)
    assert out1["image"].shape == (size, size, 3)
    assert out1["boxes"].shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(out1["image"]),
                                  np.asarray(out2["image"]))
    # pixels stay in range
    arr = np.asarray(out1["image"])
    assert arr.min() >= 0.0 and arr.max() <= 255.0
    # different key → different image
    out3 = augment_sample(sample, jax.random.key(1), cfg.input)
    assert not np.allclose(np.asarray(out1["image"]), np.asarray(out3["image"]))


def test_augment_batch_jits():
    cfg = Config()
    size = 32
    batch = {
        "image": jnp.ones((2, size, size, 3), jnp.float32) * 128,
        "boxes": jnp.tile(jnp.asarray([[4, 4, 12, 12]], jnp.float32), (2, 3, 1))[...],
        "classes": jnp.zeros((2, 3), jnp.int32),
        "valid": jnp.ones((2, 3), bool),
        "masks": jnp.zeros((2, 3, size, size), bool),
    }
    fn = jax.jit(lambda b, k: augment_batch(b, k, cfg.input))
    out = fn(batch, jax.random.key(0))
    assert out["image"].shape == (2, size, size, 3)
    assert out["boxes"].shape == (2, 3, 4)


def test_prepare_train_sample_and_loader(tmp_path):
    paths = generate_dataset(str(tmp_path), num_train=3, num_test=0,
                             num_inference=0, image_size=(96, 128))
    dicts = get_superannotate_dicts(paths["Train"])
    cfg = Config()
    cfg.input.train_size = (64, 64)
    cfg.input.max_gt_instances = 16
    cfg.solver.ims_per_batch = 2

    sample = prepare_train_sample(dicts[0], cfg)
    assert sample["image"].shape == (64, 64, 3)
    assert sample["boxes"].shape == (16, 4)
    assert sample["masks_packed"].shape == (16, 64, 8)
    n = int(sample["num_instances"])
    assert n > 0
    assert sample["valid"][:n].all() and not sample["valid"][n:].any()
    # boxes scaled into the 64x64 frame
    assert sample["boxes"][:n].max() <= 64.0 + 1e-3
    # mask/box agreement for first instance
    masks = np.unpackbits(sample["masks_packed"], axis=-1)[:, :, :64]
    ys, xs = np.nonzero(masks[0])
    bx = sample["boxes"][0]
    assert xs.min() >= bx[0] - 2 and xs.max() <= bx[2] + 2
    assert ys.min() >= bx[1] - 2 and ys.max() <= bx[3] + 2

    loader = TrainLoader(dicts, cfg, seed=0, num_workers=1).start()
    it = iter(loader)
    batch = next(it)
    loader.stop()
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["boxes"].shape == (2, 16, 4)
    assert batch["image"].dtype == np.uint8

    # multi-host sharding with fewer samples than processes would give a
    # process an empty order[pid::pcount] slice and its index stream would
    # spin forever — must raise up front, not deadlock
    cfg4 = Config()
    cfg4.solver.ims_per_batch = 4
    with pytest.raises(ValueError, match="process_count"):
        TrainLoader(dicts, cfg4, process_index=3, process_count=4)


def test_loader_prepared_cache_identical_and_budgeted(tmp_path):
    """The in-RAM prepared-sample cache must be invisible to consumers:
    hit-path samples byte-identical to cold preparation (augment is
    on-device, so the prepared sample is deterministic), and the byte
    budget must bound what gets inserted."""
    paths = generate_dataset(str(tmp_path), num_train=3, num_test=0,
                             num_inference=0, image_size=(96, 128))
    dicts = get_superannotate_dicts(paths["Train"])
    cfg = Config()
    cfg.input.train_size = (64, 64)
    cfg.input.max_gt_instances = 16
    cfg.solver.ims_per_batch = 2

    loader = TrainLoader(dicts, cfg, seed=0, num_workers=1)
    cold = [loader._prepared(i) for i in range(3)]     # misses: fill cache
    assert loader._cache_bytes > 0 and len(loader._cache) == 3
    hot = [loader._prepared(i) for i in range(3)]      # hits: expand path
    for c, h in zip(cold, hot):
        assert set(c) == set(h)
        for k in c:
            np.testing.assert_array_equal(np.asarray(c[k]), np.asarray(h[k]))

    # cache off → no inserts
    cfg_off = Config()
    cfg_off.input.train_size = (64, 64)
    cfg_off.input.max_gt_instances = 16
    cfg_off.solver.ims_per_batch = 2
    cfg_off.data.cache_prepared = False
    off = TrainLoader(dicts, cfg_off, seed=0, num_workers=1)
    off._prepared(0)
    assert off._cache_bytes == 0 and not off._cache

    # tiny budget → first sample may not fit; bytes never exceed budget
    cfg_tiny = Config()
    cfg_tiny.input.train_size = (64, 64)
    cfg_tiny.input.max_gt_instances = 16
    cfg_tiny.solver.ims_per_batch = 2
    cfg_tiny.data.cache_prepared_mb = 0
    tiny = TrainLoader(dicts, cfg_tiny, seed=0, num_workers=1)
    s = tiny._prepared(0)
    assert tiny._cache_bytes == 0 and not tiny._cache
    np.testing.assert_array_equal(s["image"], cold[0]["image"])


def test_loader_auto_gt_cap_tightens_static_shapes(tmp_path):
    """auto_gt_cap (default on) must shrink the padded GT dimension to the
    dataset's observed max annotation count rounded to 8 (capped by the
    config cap) — identical instances, smaller [B, N, ...] arrays (less
    H2D and matcher traffic).  auto_gt_cap=False keeps the config cap."""
    paths = generate_dataset(str(tmp_path), num_train=3, num_test=0,
                             num_inference=0, image_size=(96, 128))
    dicts = get_superannotate_dicts(paths["Train"])
    observed = max(len(r["annotations"]) for r in dicts)
    expected = min(100, max(8, -(-observed // 8) * 8))
    assert expected < 100  # synthetic fixtures carry a handful of instances

    cfg = Config()
    cfg.input.train_size = (64, 64)
    cfg.solver.ims_per_batch = 2
    loader = TrainLoader(dicts, cfg, seed=0, num_workers=1).start()
    batch = next(iter(loader))
    loader.stop()
    assert loader.n_max == expected
    assert batch["boxes"].shape == (2, expected, 4)
    assert batch["masks_packed"].shape == (2, expected, 64, 8)

    cfg_off = Config()
    cfg_off.input.train_size = (64, 64)
    cfg_off.input.auto_gt_cap = False
    cfg_off.solver.ims_per_batch = 2
    off = TrainLoader(dicts, cfg_off, seed=0, num_workers=1).start()
    batch_off = next(iter(off))
    off.stop()
    assert batch_off["boxes"].shape == (2, 100, 4)

    # same instances either way (order within a sample is deterministic)
    s_on = loader._prepared(0)
    s_off = off._prepared(0)
    k = int(s_on["num_instances"])
    assert k == int(s_off["num_instances"])
    np.testing.assert_array_equal(s_on["boxes"][:k], s_off["boxes"][:k])
    np.testing.assert_array_equal(s_on["masks_packed"][:k],
                                  s_off["masks_packed"][:k])


def test_loader_process_shards_are_disjoint_and_cover(tmp_path):
    """Multi-host input sharding invariant (SURVEY §2c): processes seeded
    identically draw the SAME epoch permutation, so their order[pid::pcount]
    slices are disjoint and their union covers the dataset each epoch —
    the property the 2-process dryrun's identical-loss assertion rests on."""
    paths = generate_dataset(str(tmp_path), num_train=6, num_test=0,
                             num_inference=0, image_size=(64, 64))
    dicts = get_superannotate_dicts(paths["Train"])
    cfg = Config()
    cfg.solver.ims_per_batch = 2

    streams = [TrainLoader(dicts, cfg, seed=7, process_index=p,
                           process_count=2)._index_stream()
               for p in range(2)]
    for _epoch in range(3):
        per_proc = [{next(s) for _ in range(3)} for s in streams]
        assert per_proc[0].isdisjoint(per_proc[1])
        assert per_proc[0] | per_proc[1] == set(range(6))


def test_rotation_prob_controls_orientation_mix():
    """rotation_prob: 0 → never rotates, 1 → always (reference parity),
    0.5 → both orientations occur (the scale-bar fix, config.py
    rotation_prob)."""
    import dataclasses

    import jax

    from uwcv_tpu.config import InputConfig
    from uwcv_tpu.data.augment import augment_sample

    size = 32
    img = np.zeros((size, size, 3), np.float32)
    img[2:6, 4:28] = 255.0          # horizontal bar
    sample = {
        "image": jnp.asarray(img),
        "boxes": jnp.asarray([[4.0, 2.0, 28.0, 6.0]]),
        "classes": jnp.asarray([0]),
        "valid": jnp.asarray([True]),
    }
    base = InputConfig(brightness_range=(1.0, 1.0),
                       contrast_range=(1.0, 1.0),
                       saturation_range=(1.0, 1.0), lighting_scale=0.0,
                       vflip_prob=0.0)

    def is_rotated(out):
        b = np.asarray(out["boxes"][0])
        return (b[3] - b[1]) > (b[2] - b[0])   # taller than wide

    rot = [is_rotated(augment_sample(
        sample, jax.random.key(s),
        dataclasses.replace(base, rotation_prob=0.5))) for s in range(16)]
    assert any(rot) and not all(rot)
    assert not is_rotated(augment_sample(
        sample, jax.random.key(0),
        dataclasses.replace(base, rotation_prob=0.0)))
    assert is_rotated(augment_sample(
        sample, jax.random.key(0),
        dataclasses.replace(base, rotation_prob=1.0)))
