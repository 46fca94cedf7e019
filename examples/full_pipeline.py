"""End-to-end pipeline example — the reference's backup_main.py monolith
(SURVEY.md §3.5) as a script: synthesize data → fine-tune → visualize →
batch inference + RLE CSV → measurement sweep → analytics + plots → mAP.

Run (CPU, tiny model):   python examples/full_pipeline.py --cpu --tiny
Run (TPU, R50):          python examples/full_pipeline.py
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./DATASET_demo")
    ap.add_argument("--output", default="./output_demo")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--tiny", action="store_true",
                    help="R26 trunk at 128px (fast smoke)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from uwcv_tpu.config import get_config
    from uwcv_tpu.data.catalog import DatasetCatalog, register_superannotate
    from uwcv_tpu.data.classes import ClassRegistry
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.synthetic import generate_dataset
    from uwcv_tpu.engine.batch_inference import (
        run_batch_inference,
        save_visualizations,
    )
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.engine.trainer import Trainer

    # 1. data (reference: hand-annotated SEM images; here: synthetic)
    paths = generate_dataset(args.root, num_train=6, num_test=2,
                             num_inference=3, image_size=(256, 256))
    cfg = get_config()
    cfg.output_dir = args.output
    cfg.data.classes_csv = paths["classes_csv"]
    cfg.data.inference_dir = paths["INFERENCE"]
    cfg.solver.max_iter = args.iters
    cfg.solver.checkpoint_period = 0
    if args.tiny:
        cfg.model.depth = 26
        cfg.model.dtype = "float32"
        cfg.model.rpn_pre_nms_topk_train = 200
        cfg.model.rpn_post_nms_topk_train = 100
        cfg.model.rpn_pre_nms_topk_test = 200
        cfg.model.rpn_post_nms_topk_test = 100
        cfg.model.detections_per_image = 20
        cfg.model.roi_score_thresh_test = 0.05
        cfg.input.train_size = (128, 128)
        cfg.input.pad_size_test = (128, 128)
        cfg.input.test_short_edge = 128
        cfg.input.test_max_size = 128

    register_superannotate("demo_train", paths["Train"],
                           classes_csv=paths["classes_csv"])
    dicts = DatasetCatalog.get("demo_train")

    # 2. fine-tune (nn_train.py flow)
    trainer = Trainer(cfg)
    trainer.init_state()
    loader = TrainLoader(dicts, cfg, seed=0).start()
    try:
        state = trainer.fit(iter(loader))
    finally:
        loader.stop()

    # 3. inference + RLE CSV + measurement sweep (nn_inference.py flow),
    #    single forward per image
    predictor = Predictor(cfg, state.params)
    registry = ClassRegistry.load(paths["classes_csv"])
    result = run_batch_inference(cfg, predictor, batch_size=2,
                                 registry=registry, with_plots=True)

    # 4. visual overlays (C12)
    save_visualizations(result["predictions"], registry,
                        os.path.join(cfg.output_dir, "viz"))

    print(json.dumps({
        "csv": result["csv"],
        "summary": result["report"].summary() if result["report"] else {},
        "output_dir": cfg.output_dir,
    }, indent=2))


if __name__ == "__main__":
    main()
