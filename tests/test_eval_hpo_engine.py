import math
import os

import numpy as np
import pytest

from uwcv_tpu.config import Config, SolverConfig
from uwcv_tpu.engine.lr_schedule import warmup_multistep
from uwcv_tpu.eval.coco_eval import (
    COCOEvaluator,
    box_iou_np,
    evaluate_dataset,
    mask_iou_np,
)
from uwcv_tpu.hpo.study import Study, create_study


# ---------------- evaluator ----------------

def _gt(boxes, classes):
    return {"boxes": np.asarray(boxes, float),
            "classes": np.asarray(classes)}


def _pred(boxes, scores, classes):
    return {"boxes": np.asarray(boxes, float),
            "scores": np.asarray(scores, float),
            "classes": np.asarray(classes)}


def test_perfect_predictions_ap1():
    ev = COCOEvaluator(num_classes=2, iou_type="bbox")
    gt = _gt([[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1])
    pred = _pred([[0, 0, 10, 10], [20, 20, 40, 40]], [0.9, 0.8], [0, 1])
    ev.add_image(pred, gt)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_no_predictions_ap0():
    ev = COCOEvaluator(num_classes=1, iou_type="bbox")
    ev.add_image(_pred(np.zeros((0, 4)), [], []), _gt([[0, 0, 10, 10]], [0]))
    assert ev.summarize()["AP"] == 0.0


def test_wrong_class_no_credit():
    ev = COCOEvaluator(num_classes=2, iou_type="bbox")
    ev.add_image(_pred([[0, 0, 10, 10]], [0.9], [1]),
                 _gt([[0, 0, 10, 10]], [0]))
    res = ev.summarize()
    assert res["AP_class0"] == 0.0


def test_jittered_boxes_ap_between():
    # IoU = 0.7 → matches thresholds .50-.70 (5 of 10), misses .75+
    ev = COCOEvaluator(num_classes=1, iou_type="bbox")
    ev.add_image(_pred([[0, 0, 10, 7]], [0.9], [0]),
                 _gt([[0, 0, 10, 10]], [0]))
    res = ev.summarize()
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP75"] == pytest.approx(0.0, abs=1e-6)
    assert res["AP"] == pytest.approx(0.5, abs=0.01)


def test_duplicate_detection_penalized():
    ev = COCOEvaluator(num_classes=1, iou_type="bbox")
    ev.add_image(
        _pred([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.85], [0, 0]),
        _gt([[0, 0, 10, 10]], [0]))
    res = ev.summarize()
    # 1 TP + 1 FP after it: precision envelope stays 1.0 up to recall 1.0
    assert res["AP50"] == pytest.approx(1.0, abs=0.01)
    # score order flipped: FP first → AP drops
    ev2 = COCOEvaluator(num_classes=1, iou_type="bbox")
    ev2.add_image(
        _pred([[50, 50, 60, 60], [0, 0, 10, 10]], [0.9, 0.85], [0, 0]),
        _gt([[0, 0, 10, 10]], [0]))
    assert ev2.summarize()["AP50"] < 0.75


def test_mask_iou_and_segm_eval():
    a = np.zeros((2, 8, 8), bool)
    a[0, :4] = True
    a[1, 4:] = True
    iou = mask_iou_np(a, a)
    np.testing.assert_allclose(iou, np.eye(2), atol=1e-6)
    gt = {"boxes": np.array([[0, 0, 8, 4.0]]), "classes": np.array([0]),
          "masks": a[:1]}
    pred = dict(gt, scores=np.array([0.9]))
    res = evaluate_dataset([pred], [gt], 1, iou_types=("segm",))
    assert res["segm"]["AP"] == pytest.approx(1.0, abs=1e-6)


# ---------------- lr schedule ----------------

def test_warmup_and_constant():
    cfg = SolverConfig(base_lr=1e-3, warmup_iters=100, warmup_factor=1e-3,
                       steps=())
    s = warmup_multistep(cfg)
    assert float(s(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(s(50)) == pytest.approx(1e-3 * (0.001 * 0.5 + 0.5), rel=1e-3)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(999)) == pytest.approx(1e-3, rel=1e-5)


def test_multistep_decay():
    cfg = SolverConfig(base_lr=1.0, warmup_iters=1, steps=(10, 20), gamma=0.1)
    s = warmup_multistep(cfg)
    assert float(s(5)) == pytest.approx(1.0, rel=1e-5)
    assert float(s(15)) == pytest.approx(0.1, rel=1e-5)
    assert float(s(25)) == pytest.approx(0.01, rel=1e-5)


# ---------------- hpo engine ----------------

def test_study_minimizes_quadratic():
    study = Study(direction="minimize", seed=0, n_startup_trials=5)

    def obj(trial):
        x = trial.suggest_float("x", -5, 5)
        return (x - 2.0) ** 2

    study.optimize(obj, n_trials=40)
    assert abs(study.best_params["x"] - 2.0) < 1.0
    assert study.best_value < 1.0


def test_study_log_scale_and_categorical():
    study = Study(direction="maximize", seed=1, n_startup_trials=4)

    def obj(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        kind = trial.suggest_categorical("kind", ("a", "b"))
        bonus = 1.0 if kind == "a" else 0.0
        return bonus - abs(math.log10(lr) + 3)  # best at lr=1e-3, kind=a

    study.optimize(obj, n_trials=40)
    assert study.best_params["kind"] == "a"
    assert 1e-4 < study.best_params["lr"] < 1e-2


def test_study_parallel_threads():
    study = Study(direction="minimize", seed=2)

    def obj(trial):
        x = trial.suggest_float("x", 0, 1)
        return x

    study.optimize(obj, n_trials=12, n_parallel=4)
    assert len(study.trials) == 12
    assert all(t.state == "COMPLETE" for t in study.trials)


def test_study_failures_caught():
    study = Study(direction="minimize", seed=3)
    calls = []

    def obj(trial):
        x = trial.suggest_float("x", 0, 1)
        calls.append(x)
        if len(calls) % 2:
            raise RuntimeError("boom")
        return x

    study.optimize(obj, n_trials=6)
    states = {t.state for t in study.trials}
    assert "FAIL" in states and "COMPLETE" in states
    assert study.best_value >= 0


def test_create_study_fallback():
    s = create_study("minimize", use_optuna=False)
    assert isinstance(s, Study)


# ---------------- pycocotools-parity rows (VERDICT r1 #8) ----------------

def test_greedy_match_prefers_regular_gt_falls_back_to_ignored():
    from uwcv_tpu.eval.coco_eval import _greedy_match

    iou = np.array([[0.6, 0.9]])
    matched, matched_ig = _greedy_match(iou, np.array([False, True]))
    # thr 0.50 (t=0): regular gt (IoU .6) preferred over ignored (IoU .9)
    assert matched[0, 0] and not matched_ig[0, 0]
    # thr 0.75 (t=5): regular fails, falls back to the ignored gt
    assert matched[5, 0] and matched_ig[5, 0]
    # thr 0.95 (t=9): neither reaches
    assert not matched[9, 0]


def test_area_ranges_and_recall_rows():
    """Hand-computed fixture: 2 gt (small area 100, large area 22500),
    2 exact TP preds + 1 medium-area FP."""
    ev = COCOEvaluator(num_classes=1, iou_type="bbox")
    gt = _gt([[0, 0, 10, 10], [0, 0, 150, 150]], [0, 0])
    pred = _pred([[0, 0, 10, 10], [0, 0, 150, 150], [300, 300, 340, 340]],
                 [0.9, 0.8, 0.7], [0, 0, 0])
    ev.add_image(pred, gt)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    # small range: large gt ignored; its matched pred dropped (not FP);
    # the medium-area unmatched FP dropped too
    assert res["AP_small"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP_large"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP_medium"] == -1.0     # no medium gt (pycocotools -1)
    assert res["AR@1"] == pytest.approx(0.5, abs=1e-6)   # top-1 covers 1/2 gt
    assert res["AR@10"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR@100"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR_small"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR_large"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR_medium"] == -1.0
