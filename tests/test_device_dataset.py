"""Device-resident dataset path (round 5): HBM-staged dataset + on-device
batch gather must be numerically IDENTICAL to the streaming path, because
it exists to remove per-step sample H2D (and the remote client's measured
per-transfer host leak, PERF.md r5) — not to change training semantics.
"""

import numpy as np
import pytest

import jax

from uwcv_tpu.config import Config
from uwcv_tpu.data.loader import TrainLoader
from uwcv_tpu.data.synthetic import generate_dataset
from uwcv_tpu.data.superannotate import get_superannotate_dicts
from uwcv_tpu.engine.trainer import Trainer, make_train_step


def _tiny_cfg(out):
    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_train = 64
    cfg.model.rpn_post_nms_topk_train = 32
    cfg.model.rpn_batch_size_per_image = 16
    cfg.model.roi_batch_size_per_image = 8
    cfg.input.train_size = (64, 64)
    cfg.input.max_gt_instances = 8
    cfg.solver.ims_per_batch = 2
    cfg.solver.freeze_at = 0
    cfg.output_dir = out
    cfg.parallel.mesh_shape = (1, 1)
    return cfg


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dd_data")
    generate_dataset(str(root), num_train=4, num_test=0, num_inference=0,
                     image_size=(64, 64), seed=3)
    return get_superannotate_dicts(str(root / "Train"))


def test_device_dataset_shapes_and_budget(dataset, tmp_path):
    cfg = _tiny_cfg(str(tmp_path / "o"))
    loader = TrainLoader(dataset, cfg, seed=0)
    dd = loader.device_dataset()
    assert dd is not None
    assert dd["image"].shape[0] == len(dataset)
    assert dd["boxes"].shape[:2] == (len(dataset), loader.n_max)
    # over-budget → None (streaming fallback)
    assert loader.device_dataset(budget_mb=0) is None
    idx = next(loader.index_batches())
    assert idx.shape == (2,) and idx.dtype == np.int32
    assert set(int(i) for i in idx) <= set(range(len(dataset)))


def test_indexed_step_matches_streaming_step(dataset, tmp_path):
    """Same params, same gathered batch, same rng → identical loss whether
    the batch is gathered on device (indexed) or shipped from host."""
    cfg = _tiny_cfg(str(tmp_path / "o"))
    trainer = Trainer(cfg)
    trainer.init_state()
    loader = TrainLoader(dataset, cfg, seed=0)
    dd = loader.device_dataset(trainer.mesh)
    idx = np.array([0, 2], np.int32)

    idx_step = make_train_step(trainer.model, trainer.cfg, trainer.tx,
                               indexed=True)
    s1, m1 = idx_step(trainer.state, dd, jax.device_put(idx),
                      jax.random.key(7))

    host_batch = {k: np.asarray(v)[idx] for k, v in dd.items()}
    trainer2 = Trainer(cfg)
    trainer2.init_state()
    s2, m2 = trainer2._step_fn(trainer2.state, jax.device_put(host_batch),
                               jax.random.key(7))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)


def test_fit_device_resident_trains(dataset, tmp_path):
    """Trainer.fit over the indexed path runs end-to-end (metrics written,
    finite losses, checkpoints saved)."""
    import os

    cfg = _tiny_cfg(str(tmp_path / "o2"))
    cfg.solver.max_iter = 3
    cfg.solver.checkpoint_period = 0
    cfg.solver.log_period = 1
    trainer = Trainer(cfg)
    trainer.init_state()
    loader = TrainLoader(dataset, cfg, seed=0)
    dd = loader.device_dataset(trainer.mesh)
    state = trainer.fit(loader.index_batches(), device_dataset=dd,
                        log_fn=lambda *_: None)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(cfg.output_dir, "metrics.json"))
