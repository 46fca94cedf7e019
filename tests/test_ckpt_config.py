"""Checkpoint ↔ config coupling: the Trainer persists output_dir/config.json
(the reference's Detectron2 DefaultTrainer writes OUTPUT_DIR/config.yaml the
same way, via trainer construction at nn_train.py:211) and every checkpoint
consumer (load_predictor, bench.py) adopts its MODEL section so the rebuilt
graph matches the trained params — a checkpoint trained with 5 anchor aspect
ratios cannot load into the default 3-ratio model."""

import json
import os

import pytest

from uwcv_tpu.config import Config


def _five_ar_cfg(out_dir: str) -> Config:
    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.anchor_aspect_ratios = (0.1, 0.5, 1.0, 2.0, 10.0)
    cfg.model.roi_batch_size_per_image = 8
    cfg.model.detections_per_image = 10
    cfg.model.rpn_post_nms_topk_test = 1000  # pre-r4-tuning default
    cfg.input.pad_size_test = (128, 128)
    cfg.input.test_short_edge = 128
    cfg.input.test_max_size = 128
    cfg.output_dir = out_dir
    return cfg


def test_trainer_writes_config_json(tmp_path):
    from uwcv_tpu.engine.trainer import Trainer

    cfg = _five_ar_cfg(str(tmp_path / "out"))
    Trainer(cfg)  # __init__ persists the config; no init_state needed
    p = os.path.join(cfg.output_dir, "config.json")
    assert os.path.exists(p)
    with open(p) as f:
        saved = json.load(f)
    assert saved["model"]["depth"] == 26
    assert saved["model"]["anchor_aspect_ratios"] == [0.1, 0.5, 1.0, 2.0, 10.0]
    # round-trip through from_dict restores tuples
    m = Config.from_dict({"model": saved["model"]}).model
    assert m.anchor_aspect_ratios == (0.1, 0.5, 1.0, 2.0, 10.0)


def test_adopt_checkpoint_model_cfg(tmp_path):
    from uwcv_tpu.engine.predictor import adopt_checkpoint_model_cfg
    from uwcv_tpu.engine.trainer import Trainer

    out = str(tmp_path / "out")
    Trainer(_five_ar_cfg(out))
    ckpt = os.path.join(out, "model_final")  # parent holds config.json
    os.makedirs(ckpt, exist_ok=True)

    # a fresh process with the default 3-AR config + an explicit
    # inference-time override
    cfg = Config()
    cfg.model.roi_score_thresh_test = 0.33
    assert adopt_checkpoint_model_cfg(cfg, ckpt)
    # params-defining fields come from the checkpoint...
    assert cfg.model.anchor_aspect_ratios == (0.1, 0.5, 1.0, 2.0, 10.0)
    assert cfg.model.depth == 26
    # ...but the caller's deliberate non-default override survives
    assert cfg.model.roi_score_thresh_test == 0.33
    # ...and runtime/inference-budget knobs are NEVER adopted: the saved
    # detections_per_image=10 / rpn_post_nms_topk_test=1000 must not undo
    # the process's (workload-tuned) defaults
    assert cfg.model.detections_per_image == Config().model.detections_per_image
    assert cfg.model.rpn_post_nms_topk_test == \
        Config().model.rpn_post_nms_topk_test

    # an explicit caller value for a runtime knob still wins
    cfg_rt = Config()
    cfg_rt.model.detections_per_image = 25
    assert adopt_checkpoint_model_cfg(cfg_rt, ckpt)
    assert cfg_rt.model.detections_per_image == 25

    # no config.json anywhere → untouched, returns False
    cfg2 = Config()
    bare = str(tmp_path / "bare" / "model_final")
    os.makedirs(bare)
    assert not adopt_checkpoint_model_cfg(cfg2, bare)
    assert cfg2.model.anchor_aspect_ratios == Config().model.anchor_aspect_ratios

    # some OTHER tool's config.json (no "model" section) inside the ckpt
    # dir must not shadow the Trainer-written parent config
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump({"tool": "export-metadata"}, f)
    cfg3 = Config()
    assert adopt_checkpoint_model_cfg(cfg3, ckpt)
    assert cfg3.model.anchor_aspect_ratios == (0.1, 0.5, 1.0, 2.0, 10.0)

    # the ckpt-dir config (written atomically with the params by
    # Trainer.save_checkpoint(final=True)) WINS over a staler parent
    # config.json — a model_final from an earlier run can't be mispaired
    # with a newer run's init-time parent config
    inner = Config()
    inner.model.depth = 50
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        f.write(inner.dumps())
    cfg_inner = Config()
    assert adopt_checkpoint_model_cfg(cfg_inner, ckpt)
    assert cfg_inner.model.depth == 50
    assert cfg_inner.model.anchor_aspect_ratios == (0.5, 1.0, 2.0)
    os.remove(os.path.join(ckpt, "config.json"))


def test_trainer_does_not_mutate_caller_cfg(tmp_path):
    """Trainer deep-copies: its multi-device pooler flip (or any internal
    edit) must not leak into the caller's cfg, which quality_run/hpo reuse
    to build the eval Predictor."""
    from uwcv_tpu.engine.trainer import Trainer

    cfg = _five_ar_cfg(str(tmp_path / "out"))
    assert cfg.model.pooler_pallas
    tr = Trainer(cfg)
    assert tr.cfg is not cfg
    tr.cfg.model.depth = 50
    assert cfg.model.depth == 26


def test_prepare_bench_model_adopts_and_falls_back(tmp_path, monkeypatch):
    """The shared UWCV_BENCH_* helper (utils/experiment.py): checkpoint
    model-config adoption + trained-weight load with random fallback —
    the logic bench.py/perf_breakdown/serve_latency previously tripled."""
    import jax

    from uwcv_tpu.engine.checkpoint import save_params
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params
    from uwcv_tpu.utils.experiment import prepare_bench_model

    out = str(tmp_path / "out")
    cfg_train = _five_ar_cfg(out)
    Trainer(cfg_train)  # writes config.json
    params = init_params(MaskRCNN(cfg_train.model), jax.random.key(0))
    ckpt = save_params(out, params)

    env = {"UWCV_BENCH_DEPTH": "26", "UWCV_BENCH_WEIGHTS": ckpt}
    cfg, model, params2, info = prepare_bench_model(env=env)
    assert cfg.model.anchor_aspect_ratios == (0.1, 0.5, 1.0, 2.0, 10.0)
    assert info["weights"].startswith("trained(")
    assert info["ckpt_config"].endswith("config.json")

    # depth re-pinned after adoption: asking for depth 50 against a
    # depth-26 checkpoint must fail the load and record the fallback, not
    # silently benchmark a mislabeled graph
    env50 = {"UWCV_BENCH_DEPTH": "50", "UWCV_BENCH_WEIGHTS": ckpt}
    cfg50, _, _, info50 = prepare_bench_model(env=env50)
    assert cfg50.model.depth == 50
    assert info50["weights"].startswith("random")

    # overrides win over the adopted checkpoint config
    env_ov = dict(env, UWCV_BENCH_OVERRIDES="model.detections_per_image=7")
    cfg_ov, _, _, _ = prepare_bench_model(env=env_ov)
    assert cfg_ov.model.detections_per_image == 7

    # no weights dir → random init, no adoption
    env_none = {"UWCV_BENCH_DEPTH": "26",
                "UWCV_BENCH_WEIGHTS": str(tmp_path / "nope")}
    cfg_n, _, _, info_n = prepare_bench_model(env=env_none)
    assert info_n["weights"] == "random"
    assert cfg_n.model.anchor_aspect_ratios == Config().model.anchor_aspect_ratios


@pytest.mark.slow
def test_load_predictor_adopts_checkpoint_config(tmp_path):
    """End-to-end: save a 5-AR depth-26 model, load it through
    load_predictor with a default cfg, run one image."""
    import jax
    import numpy as np

    from uwcv_tpu.engine.checkpoint import save_params
    from uwcv_tpu.engine.predictor import load_predictor
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    out = str(tmp_path / "out")
    cfg_train = _five_ar_cfg(out)
    Trainer(cfg_train)  # writes config.json
    params = init_params(MaskRCNN(cfg_train.model), jax.random.key(0))
    ckpt = save_params(out, params)

    cfg = Config()  # default 3-AR graph — must be corrected by adoption
    cfg.input.pad_size_test = (128, 128)
    cfg.input.test_short_edge = 128
    cfg.input.test_max_size = 128
    predictor = load_predictor(cfg, weights=ckpt)
    assert predictor.cfg.model.anchor_aspect_ratios == (
        0.1, 0.5, 1.0, 2.0, 10.0)
    img = np.random.default_rng(0).integers(
        0, 255, (96, 128, 3)).astype(np.uint8)
    inst = predictor(img)
    assert inst.boxes.shape[-1] == 4
