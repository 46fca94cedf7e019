"""jax.export serving-path roundtrip (engine/export.py): the serialized
StableHLO artifact must reproduce the live predictor exactly, with no model
code or params at load time, including zero-padded partial batches."""

import numpy as np
import pytest

import jax

from uwcv_tpu.config import Config
from uwcv_tpu.engine.export import export_predictor
from uwcv_tpu.engine.predictor import Predictor
from uwcv_tpu.models.rcnn import MaskRCNN, init_params

pytestmark = pytest.mark.slow  # heavy XLA compiles; excluded from the fast default


def _tiny_cfg():
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
    return cfg


def test_export_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    live = Predictor(cfg, params)

    path = str(tmp_path / "pred.stablehlo")
    export_predictor(live, path, batch_size=4)

    served = Predictor.from_exported(cfg, path)
    assert served.exported_batch == 4
    assert served.params is None and served.model is None

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
              for _ in range(4)]
    ref = live.predict_batch(images)
    got = served.predict_batch(images)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g.boxes, r.boxes, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(g.scores, r.scores, rtol=1e-5, atol=1e-5)
        assert (g.valid == r.valid).all()
        if r.masks is not None:
            assert (g.masks == r.masks).all()

    # partial batch: padded in, sliced out
    got2 = served.predict_batch(images[:2])
    assert len(got2) == 2
    for r, g in zip(ref[:2], got2):
        np.testing.assert_allclose(g.boxes, r.boxes, rtol=1e-5, atol=1e-4)
        assert (g.valid == r.valid).all()


def test_export_serves_grayscale_fast_path(tmp_path):
    """Grayscale batches ship 1 channel (predictor fast path); the loader
    wrapper must re-broadcast before the 3-channel exported program."""
    cfg = _tiny_cfg()
    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    live = Predictor(cfg, params)
    path = str(tmp_path / "pred.stablehlo")
    export_predictor(live, path, batch_size=2)
    served = Predictor.from_exported(cfg, path)

    rng = np.random.default_rng(1)
    gray = np.repeat(rng.integers(0, 255, (96, 96, 1)).astype(np.uint8),
                     3, axis=-1)
    ref = live.predict_batch([gray])[0]
    got = served.predict_batch([gray])[0]
    np.testing.assert_allclose(got.boxes, ref.boxes, rtol=1e-5, atol=1e-4)
    assert (got.valid == ref.valid).all()
