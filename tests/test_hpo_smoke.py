"""End-to-end HPO smoke: one short trial through the real Trainer on the
virtual CPU mesh (deterministic seed → stable compile-cache keys)."""

import os

import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles; excluded from the fast default

from uwcv_tpu.config import Config


def test_run_reference_hpo_smoke(tmp_path):
    from uwcv_tpu.data.catalog import DatasetCatalog, register_superannotate
    from uwcv_tpu.data.synthetic import generate_dataset
    from uwcv_tpu.hpo.study import run_reference_hpo

    root = str(tmp_path / "data")
    paths = generate_dataset(root, num_train=2, num_test=1, num_inference=0,
                             image_size=(96, 96), seed=1)

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_train = 64
    cfg.model.rpn_post_nms_topk_train = 32
    cfg.model.rpn_batch_size_per_image = 16
    cfg.model.rpn_pre_nms_topk_test = 64
    cfg.model.rpn_post_nms_topk_test = 32
    cfg.model.nms_candidates_test = 64
    cfg.model.detections_per_image = 8
    cfg.input.train_size = (96, 96)
    cfg.input.max_gt_instances = 8
    cfg.input.pad_size_test = (96, 96)
    cfg.input.test_short_edge = 96
    cfg.input.test_max_size = 96
    cfg.solver.ims_per_batch = 1
    cfg.output_dir = str(tmp_path / "out")
    cfg.data.train_dataset = "_hpo_smoke"
    cfg.data.test_dataset = "_hpo_smoke_test"
    cfg.data.classes_csv = paths["classes_csv"]

    DatasetCatalog.remove("_hpo_smoke")
    DatasetCatalog.remove("_hpo_smoke_test")
    register_superannotate("_hpo_smoke", paths["Train"],
                           classes_csv=paths["classes_csv"])
    register_superannotate("_hpo_smoke_test", paths["Test"],
                           classes_csv=paths["classes_csv"])

    result = run_reference_hpo(cfg, n_trials=1, max_iter=2, n_parallel=1,
                               seed=0)
    assert result["n_trials"] == 1
    assert result["trials"][0]["state"] == "COMPLETE", result
    assert "base_lr" in result["best_params"]
    # the objective is model quality (val segm mAP), not training loss
    assert result["objective"] == "segm_mAP"
    assert 0.0 <= result["best_value"] <= 1.0
    DatasetCatalog.remove("_hpo_smoke")
    DatasetCatalog.remove("_hpo_smoke_test")
