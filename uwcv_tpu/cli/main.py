"""uwcv CLI — replaces the reference's four entry scripts with subcommands.

    uwcv train    — fine-tune Mask R-CNN on a registered dataset (nn_train.py)
    uwcv infer    — folder inference → RLE CSV + measurements (nn_inference.py)
    uwcv measure  — measurement sweep only (second half of nn_inference.py)
    uwcv eval     — COCO mAP on a labeled dataset (the README's missing "metrics")
    uwcv hpo      — hyperparameter search with chip-parallel trials
    uwcv synth    — generate the synthetic demo dataset

Every config knob is a dotted override: ``uwcv train -o solver.max_iter=500``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

from uwcv_tpu.config import Config, get_config


def _apply_platform_env() -> None:
    """UWCV_PLATFORM override + persistent compile cache — called lazily by
    every jax-using subcommand (NOT at main(): `uwcv synth` and argparse
    error paths must not pay the multi-second jax import)."""
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("-o", "--override", action="append", default=[],
                   metavar="KEY=VALUE", help="config override (repeatable)")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--weights", default=None,
                   help="orbax checkpoint dir or torch .pth")


def _build_cfg(args) -> Config:
    cfg = get_config(args.override)
    if args.output_dir:
        cfg.output_dir = args.output_dir
    if getattr(args, "weights", None):
        cfg.weights = args.weights
    return cfg


def _load_dataset(cfg: Config, split: str, data_dir: Optional[str]):
    from uwcv_tpu.data.catalog import DatasetCatalog, register_superannotate

    name = (cfg.data.train_dataset if split == "Train"
            else cfg.data.test_dataset)
    root = data_dir or os.path.join(cfg.data.dataset_root, split)
    if name not in DatasetCatalog.list():
        register_superannotate(name, root, classes_csv=cfg.data.classes_csv)
    return DatasetCatalog.get(name)


def cmd_train(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.engine.trainer import Trainer

    dicts = _load_dataset(cfg, "Train", args.data_dir)
    print(f"train dataset: {len(dicts)} images, output: {cfg.output_dir}")
    trainer = Trainer(cfg)
    trainer.init_state()
    trainer.resume_or_load(resume=args.resume)
    loader = TrainLoader(dicts, cfg, seed=cfg.solver.seed)
    dd = loader.device_dataset(trainer.mesh)
    if dd is not None:
        # fine-tune-scale dataset staged in HBM: per-step H2D is one [B]
        # index vector (TrainLoader.device_dataset)
        trainer.fit(loader.index_batches(), device_dataset=dd)
    else:
        loader.start()
        try:
            trainer.fit(iter(loader))
        finally:
            loader.stop()
    print(f"done: {cfg.output_dir}/model_final")
    return 0


def cmd_infer(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.engine.batch_inference import (
        run_batch_inference,
        save_union_masks,
        save_visualizations,
    )
    from uwcv_tpu.engine.predictor import load_predictor
    from uwcv_tpu.data.classes import ClassRegistry

    if not cfg.weights:
        default = os.path.join(cfg.output_dir, "model_final")
        if os.path.isdir(default):
            cfg.weights = default
    predictor = load_predictor(cfg)
    registry = ClassRegistry.load(cfg.data.classes_csv)
    result = run_batch_inference(
        cfg, predictor, image_dir=args.image_dir,
        batch_size=args.batch_size, registry=registry,
        with_measurements=not args.no_measure, with_plots=args.plots)
    if args.visualize:
        save_visualizations(result["predictions"], registry,
                            os.path.join(cfg.output_dir, "viz"))
        # the reference's predicted_masks.jpg / Masks.jpg union dumps
        save_union_masks(result["predictions"],
                         os.path.join(cfg.output_dir, "viz"))
    print(f"wrote {result['csv']} ({result['num_images']} images)")
    return 0


def cmd_measure(args) -> int:
    _apply_platform_env()
    # identical flow but measurement-only (no RLE CSV consumers rely on it)
    args.no_measure = False
    args.plots = True
    return cmd_infer(args)


def cmd_eval(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.engine.predictor import load_predictor
    from uwcv_tpu.eval.coco_eval import evaluate_split

    dicts = _load_dataset(cfg, "Test", args.data_dir)
    if not cfg.weights:
        default = os.path.join(cfg.output_dir, "model_final")
        if os.path.isdir(default):
            cfg.weights = default
    predictor = load_predictor(cfg)
    results = evaluate_split(cfg, dicts, predictor=predictor)
    print(json.dumps(results, indent=2))
    path = os.path.join(cfg.output_dir, "coco_metrics.json")
    os.makedirs(cfg.output_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {path}")
    return 0


def cmd_hpo(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.hpo.study import run_reference_hpo

    best = run_reference_hpo(cfg, n_trials=args.trials,
                             data_dir=args.data_dir,
                             max_iter=args.trial_iters)
    print(json.dumps(best, indent=2, default=str))
    return 0


def cmd_export(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.engine.export import export_predictor
    from uwcv_tpu.engine.predictor import load_predictor

    if not cfg.weights:
        default = os.path.join(cfg.output_dir, "model_final")
        if os.path.isdir(default):
            cfg.weights = default
    predictor = load_predictor(cfg)
    path = export_predictor(predictor, args.path,
                            batch_size=args.batch_size)
    mb = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({mb:.1f} MB, batch {args.batch_size})")
    return 0


def cmd_serve(args) -> int:
    _apply_platform_env()
    cfg = _build_cfg(args)
    from uwcv_tpu.engine.predictor import Predictor, load_predictor
    from uwcv_tpu.engine.serve import serve_forever

    if args.artifact:
        predictor = Predictor.from_exported(cfg, args.artifact)
    else:
        if not cfg.weights:
            default = os.path.join(cfg.output_dir, "model_final")
            if os.path.isdir(default):
                cfg.weights = default
        predictor = load_predictor(cfg)
    n = serve_forever(cfg, predictor, args.watch_dir,
                      args.out_dir or os.path.join(cfg.output_dir, "served"),
                      batch_size=args.batch_size, poll_s=args.poll,
                      once=args.once)
    print(f"served {n} images")
    return 0


def cmd_synth(args) -> int:
    from uwcv_tpu.data.synthetic import generate_dataset

    paths = generate_dataset(args.root, num_train=args.train,
                             num_test=args.test, num_inference=args.infer,
                             image_size=(args.size, args.size))
    print(json.dumps(paths, indent=2))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="uwcv", description="TPU-native instance-segmentation framework")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="fine-tune on a dataset")
    _add_common(p)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("infer", help="batch inference over a folder")
    _add_common(p)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-measure", action="store_true")
    p.add_argument("--plots", action="store_true")
    p.add_argument("--visualize", action="store_true")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("measure", help="measurement sweep over a folder")
    _add_common(p)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--visualize", action="store_true")
    p.set_defaults(fn=cmd_measure)

    p = sub.add_parser("eval", help="COCO mAP on a labeled dataset")
    _add_common(p)
    p.add_argument("--data-dir", default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("hpo", help="hyperparameter search")
    _add_common(p)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--trial-iters", type=int, default=100)
    p.set_defaults(fn=cmd_hpo)

    p = sub.add_parser(
        "serve", help="watch a folder, serve inference results as JSON "
                      "(from weights or a StableHLO artifact)")
    _add_common(p)
    p.add_argument("--watch-dir", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--artifact", default=None,
                   help="serving artifact from `uwcv export`")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--poll", type=float, default=1.0)
    p.add_argument("--once", action="store_true",
                   help="drain the current backlog and exit")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "export", help="serialize the inference program (weights baked) "
                       "to a portable StableHLO artifact for serving")
    _add_common(p)
    p.add_argument("--path", default="./output/predictor.stablehlo")
    p.add_argument("--batch-size", type=int, default=8)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("synth", help="generate synthetic demo dataset")
    p.add_argument("--root", default="./DATASET")
    p.add_argument("--train", type=int, default=6)
    p.add_argument("--test", type=int, default=2)
    p.add_argument("--infer", type=int, default=2)
    p.add_argument("--size", type=int, default=256)
    p.set_defaults(fn=cmd_synth)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
