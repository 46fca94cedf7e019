import os

import numpy as np

from uwcv_tpu.data.classes import ClassRegistry
from uwcv_tpu.engine.batch_inference import (
    apply_class_filters,
    resize_masks_to_original,
    save_gt_visualizations,
    save_visualizations,
)


def _inst(n=4, h=32, w=32):
    rng = np.random.default_rng(0)
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        masks[i, 4 * i:4 * i + 8, 4:20] = True
    return {
        "boxes": np.array([[4, 4 * i, 20, 4 * i + 8] for i in range(n)],
                          float),
        "scores": np.array([0.9, 0.5, 0.3, 0.1]),
        "classes": np.array([0, 1, 2, 3]),
        "masks": masks,
    }


def test_apply_class_filters_scores():
    inst = _inst()
    out = apply_class_filters(inst, thresholds=(0.18, 0.35, 0.58, 0.58),
                              min_pixels=(1, 1, 1, 1))
    # class0: 0.9>=0.18 keep; class1: 0.5>=0.35 keep; class2: 0.3<0.58 drop;
    # class3: 0.1<0.58 drop
    assert list(out["classes"]) == [0, 1]
    assert out["masks"].shape[0] == 2


def test_apply_class_filters_min_pixels():
    inst = _inst()
    out = apply_class_filters(inst, thresholds=(0.0,) * 4,
                              min_pixels=(1000, 1, 1, 1))
    assert 0 not in out["classes"]  # 128-px mask < 1000


def test_resize_masks_to_original():
    inst = {"classes": np.array([0]), "scores": np.array([0.9]),
            "boxes": np.zeros((1, 4)),
            "masks": np.zeros((1, 16, 16), bool)}
    inst["masks"][0, :8] = True
    out = resize_masks_to_original(inst, (32, 48))
    assert out["masks"].shape == (1, 32, 48)
    assert out["masks"][0, :16].all() and not out["masks"][0, 16:].any()


def test_visualizations(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    reg = ClassRegistry()
    preds = {img_path: _inst()}
    paths = save_visualizations(preds, reg, str(tmp_path / "viz"))
    assert len(paths) == 1 and os.path.exists(paths[0])
    out = np.asarray(Image.open(paths[0]))
    assert out.sum() > 0  # something was drawn

    dicts = [{
        "file_name": img_path, "image_id": 0, "height": 32, "width": 32,
        "annotations": [{
            "bbox": [4, 4, 20, 12], "category_id": 3,
            "segmentation": [[4, 4, 20, 4, 20, 12, 4, 12]],
        }],
    }]
    gt_paths = save_gt_visualizations(dicts, reg, str(tmp_path / "gt"))
    assert len(gt_paths) == 1 and os.path.exists(gt_paths[0])
    out = np.asarray(Image.open(gt_paths[0]))
    assert out.sum() > 0


def test_union_masks_dump(tmp_path):
    """Reference predicted_masks.jpg/Masks.jpg parity
    (nn_inference.py:394-405): union canvas, 255 at any selected-class
    mask, class filter honored."""
    from PIL import Image

    from uwcv_tpu.engine.batch_inference import save_union_masks

    img_path = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    inst = {"classes": np.array([0, 2]), "scores": np.array([0.9, 0.8]),
            "boxes": np.array([[2, 2, 10, 10], [16, 16, 30, 30.0]]),
            "masks": np.zeros((2, 32, 32), bool)}
    inst["masks"][0, 2:10, 2:10] = True
    inst["masks"][1, 16:30, 16:30] = True
    paths = save_union_masks({img_path: inst}, str(tmp_path / "viz"))
    out = np.asarray(Image.open(paths[0]).convert("L"))
    assert out[5, 5] > 128 and out[20, 20] > 128 and out[0, 0] < 64

    paths = save_union_masks({img_path: inst}, str(tmp_path / "viz2"),
                             classes_of_interest=[2])
    out = np.asarray(Image.open(paths[0]).convert("L"))
    assert out[20, 20] > 128 and out[5, 5] < 64


def test_grayscale_transfer_fast_path():
    """Grayscale batches (SEM norm) ship one channel and must be
    bit-identical to the 3-channel path."""
    import jax

    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_test = 64
    cfg.model.rpn_post_nms_topk_test = 32
    cfg.model.nms_candidates_test = 64
    cfg.model.detections_per_image = 8
    cfg.input.pad_size_test = (96, 96)
    cfg.input.test_short_edge = 96
    cfg.input.test_max_size = 96

    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (96, 96, 1)).astype(np.uint8)
    img = np.repeat(gray, 3, axis=-1)

    pred = Predictor(cfg, params)
    ref_out = pred.predict_batch_device([img])
    assert ref_out[0].boxes is not None
    # the fast path really shipped 1 channel: the jit saw a [.,.,.,1] input
    fast = pred.predict_batch([img])[0]

    pred.cfg.input.grayscale_transfer = False
    slow = pred.predict_batch([img])[0]
    np.testing.assert_allclose(fast.boxes, slow.boxes, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fast.scores, slow.scores, rtol=1e-6, atol=1e-6)
    assert (fast.valid == slow.valid).all()
