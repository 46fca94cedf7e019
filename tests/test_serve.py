"""Folder-watching inference service (engine/serve.py, `uwcv serve`)."""

import json
import os

import numpy as np
import pytest

import jax

from uwcv_tpu.config import Config
from uwcv_tpu.engine.predictor import Predictor
from uwcv_tpu.engine.serve import serve_forever
from uwcv_tpu.models.rcnn import MaskRCNN, init_params

pytestmark = pytest.mark.slow  # compiles a tiny predictor


def test_serve_once_and_restart_resume(tmp_path):
    from PIL import Image

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
    predictor = Predictor(cfg, params)

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a", "b", "c"):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3)).astype(
            np.uint8)).save(str(watch / f"{name}.png"))

    n = serve_forever(cfg, predictor, str(watch), str(out),
                      batch_size=2, once=True, progress=lambda *_: None)
    assert n == 3
    rec = json.load(open(out / "a.png.json"))
    assert rec["file"] == "a.png"
    assert len(rec["scores"]) == rec["num_instances"]
    assert len(rec["masks_rle"]) == rec["num_instances"]

    # a restarted service must not reprocess answered images
    Image.fromarray(np.zeros((96, 96, 3), np.uint8)).save(
        str(watch / "d.png"))
    n2 = serve_forever(cfg, predictor, str(watch), str(out),
                       batch_size=2, once=True, progress=lambda *_: None)
    assert n2 == 1
    assert os.path.exists(out / "d.png.json")
