"""Warm-start transfer A/B: fine-tune from a trained checkpoint vs from
scratch at a fixed small budget (VERDICT r4 missing #1 / next #5).

The reference's actual workflow initializes from COCO zoo weights before
fine-tuning (/root/reference/nn_train.py:200 ``model_zoo.get_checkpoint_url``
→ cfg.MODEL.WEIGHTS, consumed by resume_or_load at nn_train.py:212).  No
zoo download exists in this zero-egress image, so the transfer arc is
exercised with the nearest available analog: warm-start from a committed-
recipe uwcv checkpoint (trained on synthetic dataset seed A) and fine-tune
on a FRESH synthetic dataset (different seed → different layouts), vs the
identical budget from random init.  Both arms share the loader seed, LR,
and budget; the delta isolates the value of the weights-loading arc
(``Trainer.resume_or_load(resume=False)`` → ``cfg.weights``) end-to-end
through training, which round 4 had only parity-tested on the predictor
side.

Usage: python tools/warmstart_ab.py   (repo root, chip attached; needs
       output/quality_r50/model_final from tools/quality_run.py)
Env: UWCV_WS_ITERS (600), UWCV_WS_LR (2.75e-3), UWCV_WS_SEED (99),
     UWCV_WS_WEIGHTS (checkpoint path), UWCV_WS_OUT (json path).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = int(os.environ.get("UWCV_WS_ITERS", "600"))
LR = float(os.environ.get("UWCV_WS_LR", "2.75e-3"))
DATA_SEED = int(os.environ.get("UWCV_WS_SEED", "99"))
WEIGHTS = os.environ.get(
    "UWCV_WS_WEIGHTS",
    os.path.join(REPO, "output", "quality_r50", "model_final"))
OUT = os.environ.get("UWCV_WS_OUT", os.path.join(REPO, "WARMSTART_r05.json"))
ROOT = os.environ.get(
    "UWCV_WS_ROOT", os.path.join(REPO, "output", "ws_dataset"))

T0 = time.time()


def log(msg: str) -> None:
    print(f"[ws +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _arm(name: str, cfg_src, train_dicts, test_dicts, weights: str):
    import copy

    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.eval.coco_eval import evaluate_split

    cfg = copy.deepcopy(cfg_src)
    cfg.weights = weights
    cfg.output_dir = os.path.join(REPO, "output", f"ws_{name}")
    trainer = Trainer(cfg)
    trainer.init_state()
    # the reference arc: resume=False loads cfg.weights when set
    # (nn_train.py:212); empty weights → fresh init
    trainer.resume_or_load(resume=False)
    loader = TrainLoader(train_dicts, cfg, seed=cfg.solver.seed)
    dd = loader.device_dataset(trainer.mesh)
    t = time.time()
    if dd is not None:
        trainer.fit(loader.index_batches(), log_fn=log, device_dataset=dd)
    else:
        loader.start()
        try:
            trainer.fit(iter(loader), log_fn=log)
        finally:
            loader.stop()
    train_s = time.time() - t
    log(f"{name}: {ITERS} iters in {train_s:.1f}s; evaluating")
    ecfg = copy.deepcopy(cfg)
    ecfg.model.roi_score_thresh_test = 0.05
    results = evaluate_split(ecfg, test_dicts, params=trainer.state.params)
    row = {
        "arm": name, "weights": weights or "random init",
        "iters": ITERS, "lr": LR, "train_wall_s": round(train_s, 1),
        "bbox_AP": round(results["bbox"]["AP"], 4),
        "segm_AP": round(results["segm"]["AP"], 4),
        "segm_AP50": round(results["segm"]["AP50"], 4),
        "per_class_segm": {k: round(v, 4)
                           for k, v in results["segm"].items()
                           if k.startswith("AP_class")},
    }
    log(f"{name}: segm AP {row['segm_AP']} / bbox {row['bbox_AP']}")
    return row


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax

    log(f"devices: {jax.devices()}")

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.data.synthetic import generate_dataset

    if not os.path.isdir(WEIGHTS):
        log(f"ERROR: no checkpoint at {WEIGHTS} — run tools/quality_run.py "
            f"first (the r4 recipe in QUALITY.md)")
        return 1

    # FRESH dataset: different seed → different instance layouts, same
    # class structure (the transfer setting)
    if not os.path.isdir(os.path.join(ROOT, "Train")):
        generate_dataset(ROOT, num_train=48, num_test=16, num_inference=0,
                         image_size=(512, 512), seed=DATA_SEED)
    train_dicts = get_superannotate_dicts(os.path.join(ROOT, "Train"))
    test_dicts = get_superannotate_dicts(os.path.join(ROOT, "Test"))
    log(f"transfer dataset (seed {DATA_SEED}): {len(train_dicts)} train / "
        f"{len(test_dicts)} test")

    cfg = Config()
    cfg.model.depth = 50
    # mirror the checkpoint's training-time model config so its params fit
    # the graph (the r4 recipe's 5-AR anchors / roi_batch 64)
    ckpt_cfg = os.path.join(os.path.dirname(WEIGHTS), "config.json")
    if os.path.exists(ckpt_cfg):
        with open(ckpt_cfg) as f:
            saved = json.load(f)
        ars = saved.get("model", {}).get("anchor_aspect_ratios")
        if ars:
            cfg.model.anchor_aspect_ratios = tuple(ars)
        log(f"adopted checkpoint anchors: {cfg.model.anchor_aspect_ratios}")
    cfg.model.roi_batch_size_per_image = 64
    cfg.model.roi_fg_class_weights = (8.0, 1.0, 1.0, 1.0)
    cfg.model.rpn_fg_class_weights = (4.0, 1.0, 1.0, 1.0)
    cfg.model.class_loss_weights = (4.0, 1.0, 1.0, 1.0)
    cfg.input.rotation_prob = 0.5
    cfg.input.max_gt_instances = 16
    cfg.solver.ims_per_batch = 2
    cfg.solver.base_lr = LR
    cfg.solver.max_iter = ITERS
    cfg.solver.warmup_iters = min(100, ITERS // 4)
    cfg.solver.freeze_at = 0     # identical trainable sets in both arms:
    #                              the delta isolates INIT, nothing else
    cfg.solver.checkpoint_period = ITERS + 1   # no intermediate checkpoints
    cfg.solver.log_period = 100
    cfg.data.classes_csv = os.path.join(ROOT, "classes.csv")

    rows = [
        _arm("warm", cfg, train_dicts, test_dicts, WEIGHTS),
        _arm("cold", cfg, train_dicts, test_dicts, ""),
    ]
    delta = round(rows[0]["segm_AP"] - rows[1]["segm_AP"], 4)
    payload = {
        "task": "warm-start transfer A/B (zoo-init arc analog, "
                "nn_train.py:200,212)",
        "budget_iters": ITERS, "lr": LR, "data_seed": DATA_SEED,
        "arms": rows, "segm_AP_delta_warm_minus_cold": delta,
        "hardware": "TPU v5e (1 chip)",
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {OUT}: warm {rows[0]['segm_AP']} vs cold "
        f"{rows[1]['segm_AP']} (delta {delta:+})")
    print(json.dumps({"warm": rows[0]["segm_AP"],
                      "cold": rows[1]["segm_AP"], "delta": delta}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
