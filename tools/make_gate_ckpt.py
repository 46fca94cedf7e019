"""Train + commit the CI quality-gate reference checkpoint (VERDICT r4 #7).

The existing from-scratch CI gate (tests/test_quality_gate.py) trains on
the CI host and can only gate against noise-floor thresholds (segm ≥ 0.08)
because identical seeds vary ~1.7× across host microarchs.  This tool
removes the training from the gate: it trains a TINY model once on the
chip, evaluates it, and saves the weights as a small committed artifact
(assets/gate/gate_ckpt.npz, float16 — tiny depth-26 trunk + 64-channel FPN
+ 256-wide box head ≈ a few MB) plus the recorded score.  CI then only
EVALUATES: load npz → Predictor → held-out mAP ≥ 0.8 × recorded — a real
quality-regression gate (eval path, postprocessing, RLE, evaluator),
immune to from-scratch training noise.

Usage: python tools/make_gate_ckpt.py   (repo root, chip attached)
Env: UWCV_GATE_ITERS (1500), UWCV_GATE_LR (2.5e-3)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = int(os.environ.get("UWCV_GATE_ITERS", "1500"))
LR = float(os.environ.get("UWCV_GATE_LR", "2.5e-3"))
OUT_DIR = os.path.join(REPO, "assets", "gate")

T0 = time.time()


def log(msg: str) -> None:
    print(f"[gate +{time.time() - T0:7.1f}s] {msg}", flush=True)


def gate_config(root: str):
    """THE gate model/eval config — shared verbatim with the CI test so the
    committed npz always matches the graph it is loaded into."""
    from uwcv_tpu.config import Config

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.fpn_channels = 64
    cfg.model.box_fc_dim = 256
    # the fused Pallas pooler's VMEM layout assumes the production 256
    # FPN channels (Mosaic rejects the [w, wx*c] shape cast at c=64);
    # the tiny gate model pools through the XLA formulation everywhere
    cfg.model.pooler_pallas = False
    cfg.model.anchor_aspect_ratios = (0.1, 0.5, 1.0, 2.0, 10.0)
    cfg.model.roi_batch_size_per_image = 64
    cfg.model.roi_fg_class_weights = (8.0, 1.0, 1.0, 1.0)
    cfg.model.rpn_fg_class_weights = (4.0, 1.0, 1.0, 1.0)
    cfg.model.class_loss_weights = (4.0, 1.0, 1.0, 1.0)
    cfg.input.rotation_prob = 0.5
    cfg.input.train_size = (256, 256)
    cfg.input.test_short_edge = 256
    cfg.input.test_max_size = 256
    cfg.input.pad_size_test = (256, 256)
    cfg.input.max_gt_instances = 16
    cfg.solver.ims_per_batch = 8          # tiny shapes: fill the chip
    cfg.solver.base_lr = LR
    cfg.solver.max_iter = ITERS
    cfg.solver.warmup_iters = 100
    cfg.solver.freeze_at = 0
    cfg.solver.checkpoint_period = ITERS + 1
    cfg.solver.log_period = 100
    cfg.model.roi_score_thresh_test = 0.05
    cfg.data.classes_csv = os.path.join(root, "classes.csv")
    cfg.output_dir = os.path.join(REPO, "output", "gate_train")
    return cfg


def gate_dataset_root() -> str:
    """Deterministic 256² synthetic split (seed 21) regenerated identically
    on any host — the gate's eval data."""
    return os.path.join(REPO, "output", "gate_dataset")


def ensure_gate_dataset(root: str) -> None:
    from uwcv_tpu.data.synthetic import generate_dataset

    if not os.path.isdir(os.path.join(root, "Train")):
        generate_dataset(root, num_train=48, num_test=12, num_inference=0,
                         image_size=(256, 256), seed=21)


def main() -> int:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax

    log(f"devices: {jax.devices()}")

    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.checkpoint import save_params_npz
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.eval.coco_eval import evaluate_split

    root = gate_dataset_root()
    ensure_gate_dataset(root)
    train_dicts = get_superannotate_dicts(os.path.join(root, "Train"))
    test_dicts = get_superannotate_dicts(os.path.join(root, "Test"))
    log(f"dataset: {len(train_dicts)} train / {len(test_dicts)} test @256²")

    cfg = gate_config(root)
    trainer = Trainer(cfg)
    trainer.init_state()
    loader = TrainLoader(train_dicts, cfg, seed=0).start()
    t = time.time()
    try:
        trainer.fit(iter(loader), log_fn=log)
    finally:
        loader.stop()
    log(f"trained {ITERS} iters in {time.time() - t:.1f}s")

    results = evaluate_split(cfg, test_dicts, params=trainer.state.params)
    segm, bbox = results["segm"]["AP"], results["bbox"]["AP"]
    log(f"gate model: segm AP {segm:.4f} / bbox AP {bbox:.4f}")

    os.makedirs(OUT_DIR, exist_ok=True)
    npz = os.path.join(OUT_DIR, "gate_ckpt.npz")
    save_params_npz(npz, trainer.state.params)
    size_mb = os.path.getsize(npz) / 1e6
    meta = {
        "segm_AP": round(segm, 4), "bbox_AP": round(bbox, 4),
        "per_class_segm": {k: round(v, 4)
                           for k, v in results["segm"].items()
                           if k.startswith("AP_class")},
        "iters": ITERS, "lr": LR, "dataset_seed": 21,
        "trained_on": "TPU v5e", "npz_mb": round(size_mb, 1),
        "note": ("CI gate: evaluate-only; threshold 0.8x recorded — "
                 "tests/test_quality_gate.py::test_committed_gate_checkpoint"),
    }
    with open(os.path.join(OUT_DIR, "gate_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    log(f"wrote {npz} ({size_mb:.1f} MB) + gate_meta.json")
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
