import pytest

from uwcv_tpu.config import Config, get_config


def test_defaults_match_reference_constants():
    cfg = Config()
    # nn_train.py:201-206
    assert cfg.solver.ims_per_batch == 2
    assert cfg.solver.base_lr == 2.5e-4
    assert cfg.solver.max_iter == 1000
    assert cfg.model.roi_batch_size_per_image == 32
    assert cfg.model.num_classes == 4
    # nn_inference.py:226 / 409 / 412
    assert cfg.model.roi_score_thresh_test == 0.80
    assert cfg.measure.pixels_per_metric == 0.85
    assert cfg.measure.min_contour_area == 100.0


def test_overrides():
    cfg = get_config([
        "solver.base_lr=1e-3",
        "model.depth=101",
        "model.anchor_aspect_ratios=0.5,1.0",
        "input.train_size=640,640",
        "solver.steps=()",
        "postprocess.fill_holes=false",
    ])
    assert cfg.solver.base_lr == 1e-3
    assert cfg.model.depth == 101
    assert cfg.model.anchor_aspect_ratios == (0.5, 1.0)
    assert cfg.input.train_size == (640, 640)
    assert cfg.solver.steps == ()
    assert cfg.postprocess.fill_holes is False


def test_bad_override_raises():
    with pytest.raises(AttributeError):
        get_config(["model.nonexistent=1"])
    with pytest.raises(ValueError):
        get_config(["no_equals_sign"])


def test_roundtrip_dict():
    cfg = get_config(["solver.max_iter=50"])
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.solver.max_iter == 50
    assert cfg2.model.anchor_sizes == cfg.model.anchor_sizes


def test_inference_budget_defaults_are_detectron2_safe():
    """Correctness-regression pin: the test-time proposal budget default
    must stay at Detectron2's 1000.  A 300 default measured mAP-neutral on
    the checkpoint it was A/B'd on, then zeroed the scale-bar class and
    halved class1 on a same-recipe retrain (QUALITY.md, eval-budget
    section; QUALITY_r04_evalbudget.json).  Budget cuts are a
    per-deployed-checkpoint tuning, never a default."""
    cfg = Config()
    assert cfg.model.rpn_post_nms_topk_test == 1000
    # the starvation mitigations ship OFF: pure Detectron2 semantics
    assert cfg.model.rpn_post_nms_level_floor == 0
