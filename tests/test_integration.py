"""End-to-end slice (SURVEY.md §7 step 4-5): synthetic dataset → short train
(loss decreases) → checkpoint → predictor → RLE CSV with the reference's
schema → measurement artifacts.  Runs on the virtual CPU mesh with a tiny
R26 model so the whole flow compiles in CI time."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles; excluded from the fast default

from uwcv_tpu.config import Config


def _tiny_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_train = 100
    cfg.model.rpn_post_nms_topk_train = 50
    cfg.model.rpn_pre_nms_topk_test = 100
    cfg.model.rpn_post_nms_topk_test = 50
    cfg.model.rpn_batch_size_per_image = 32
    cfg.model.roi_batch_size_per_image = 8
    cfg.model.detections_per_image = 10
    cfg.model.roi_score_thresh_test = 0.0
    cfg.input.train_size = (128, 128)
    cfg.input.pad_size_test = (128, 128)
    cfg.input.test_short_edge = 128
    cfg.input.test_max_size = 128
    cfg.input.max_gt_instances = 16
    cfg.solver.ims_per_batch = 2
    cfg.solver.base_lr = 1e-3
    cfg.solver.warmup_iters = 5
    cfg.solver.log_period = 5
    cfg.solver.checkpoint_period = 0
    cfg.output_dir = str(tmp_path / "output")
    return cfg


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from uwcv_tpu.data.synthetic import generate_dataset

    root = tmp_path_factory.mktemp("synth")
    generate_dataset(str(root), num_train=4, num_test=2, num_inference=2,
                     image_size=(128, 128), seed=3)
    return str(root)


def test_train_smoke_and_inference(tmp_path, synth_root):
    import jax

    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.batch_inference import run_batch_inference
    from uwcv_tpu.engine.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.parallel.mesh import build_mesh, shard_batch

    cfg = _tiny_cfg(tmp_path)
    cfg.data.inference_dir = os.path.join(synth_root, "INFERENCE")
    dicts = get_superannotate_dicts(os.path.join(synth_root, "Train"))
    assert len(dicts) == 4

    mesh = build_mesh(cfg.parallel)
    assert mesh.devices.size == 8  # virtual CPU mesh from conftest

    trainer = Trainer(cfg, mesh=mesh)
    trainer.init_state()

    # overfit one batch for 12 steps: total loss must drop
    loader = TrainLoader(dicts, cfg, seed=0, num_workers=1).start()
    batch = next(iter(loader))
    loader.stop()
    # batch of 2 → pad to 8 devices by tiling (divisibility for the mesh)
    batch = {k: np.concatenate([v] * 4) for k, v in batch.items()}

    state = trainer.state
    rng = jax.random.key(0)
    losses = []
    for i in range(12):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer._step_fn(
            state, shard_batch(batch, mesh), step_rng)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all(), losses
    assert min(losses[-3:]) < losses[0], losses

    # checkpoint round-trip
    path = save_checkpoint(cfg.output_dir, state, int(state.step))
    assert latest_checkpoint(cfg.output_dir) == path
    restored = load_checkpoint(path, state)
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(r0))

    # inference → RLE CSV with the reference schema (nn_inference.py:335-336)
    predictor = Predictor(cfg, state.params)
    result = run_batch_inference(cfg, predictor, batch_size=2,
                                 with_measurements=True, progress=lambda *_: None)
    assert result["num_images"] == 2
    df = pd.read_csv(result["csv"])
    assert list(df.columns) == ["ImageId", "EncodedPixels"]
    # measurement artifacts exist with the reference column set
    sd = pd.read_csv(os.path.join(cfg.output_dir, "ShapeDescriptor.csv"))
    assert list(sd.columns)[0] == "Class"
    assert "Feret Diameter" in sd.columns
    for kw in ("Scale", "WThick", "PThroat", "Pore"):
        assert os.path.exists(
            os.path.join(cfg.output_dir, f"Results{kw}_.csv"))
