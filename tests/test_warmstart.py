"""Importer→Trainer arc: cfg.weights loads INTO TRAINING (VERDICT r4 #5).

The reference's real workflow is zoo-weights → cfg.MODEL.WEIGHTS →
resume_or_load(resume=False) → fine-tune (/root/reference/nn_train.py:200,
212).  Round 4 parity-tested the torch importer on the PREDICTOR side only;
these tests close the training side: weights from (a) a torch .pth and
(b) an orbax checkpoint must flow through ``Trainer.resume_or_load(False)``
and then actually train (finite loss, loaded leaves move under SGD).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uwcv_tpu.config import Config  # noqa: E402
from uwcv_tpu.engine.trainer import Trainer  # noqa: E402


def _tiny_cfg(out_dir: str) -> Config:
    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_train = 64
    cfg.model.rpn_post_nms_topk_train = 32
    cfg.model.rpn_batch_size_per_image = 16
    cfg.model.roi_batch_size_per_image = 8
    cfg.input.train_size = (64, 64)
    cfg.input.max_gt_instances = 4
    cfg.solver.ims_per_batch = 1
    cfg.solver.base_lr = 0.01
    cfg.solver.warmup_iters = 1
    cfg.solver.freeze_at = 0
    cfg.output_dir = out_dir
    return cfg


def _tiny_batch():
    rng = np.random.default_rng(0)
    s, n = 64, 4
    masks = np.zeros((1, n, s, s), bool)
    masks[:, 0, 16:48, 16:48] = True
    return {
        "image": rng.integers(0, 255, (1, s, s, 3)).astype(np.uint8),
        "boxes": np.array([[[16.0, 16.0, 48.0, 48.0]] + [[0.0] * 4] * (n - 1)],
                          np.float32),
        "classes": np.zeros((1, n), np.int32),
        "valid": np.array([[True] + [False] * (n - 1)]),
        "masks_packed": np.packbits(masks, axis=-1),
    }


def _stem_kernel(params):
    return np.asarray(
        params["params"]["backbone"]["stem_conv"]["kernel"])


def test_torch_pth_warmstarts_training(tmp_path):
    """A (partial) torch .pth via cfg.weights: imported leaves land in the
    TRAIN state and move under SGD."""
    # stem conv + BN in torchvision names — the importer folds BN and maps
    # OIHW→HWIO; unmatched leaves keep their init (partial load)
    rng = np.random.default_rng(3)
    sd = {
        "stem.conv1.weight": torch.from_numpy(
            rng.normal(0, 0.05, (64, 3, 7, 7)).astype("f")),
        "stem.conv1.norm.weight": torch.from_numpy(
            np.ones(64, "f")),
        "stem.conv1.norm.bias": torch.from_numpy(
            np.zeros(64, "f")),
        "stem.conv1.norm.running_mean": torch.from_numpy(
            np.zeros(64, "f")),
        "stem.conv1.norm.running_var": torch.from_numpy(
            np.ones(64, "f")),
    }
    path = str(tmp_path / "zoo.pth")
    torch.save(sd, path)

    cfg = _tiny_cfg(str(tmp_path / "out"))
    cfg.weights = path
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=False)

    want = np.transpose(sd["stem.conv1.weight"].numpy(), (2, 3, 1, 0))
    got = _stem_kernel(trainer.state.params)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    batch = jax.device_put(_tiny_batch())
    state, metrics = trainer._step_fn(trainer.state, batch,
                                      jax.random.key(0))
    assert np.isfinite(float(metrics["total_loss"]))
    moved = _stem_kernel(state.params)
    assert not np.allclose(moved, want)   # SGD actually updates the import


def test_orbax_checkpoint_warmstarts_training(tmp_path):
    """An orbax model_final via cfg.weights (the uwcv→uwcv transfer arm of
    tools/warmstart_ab.py) warm-starts a FRESH Trainer."""
    import os

    cfg = _tiny_cfg(str(tmp_path / "a"))
    t1 = Trainer(cfg)
    t1.init_state()
    t1.save_checkpoint(final=True)   # writes output_dir/model_final (params)

    cfg2 = _tiny_cfg(str(tmp_path / "b"))
    cfg2.weights = os.path.join(cfg.output_dir, "model_final")
    t2 = Trainer(cfg2)
    t2.resume_or_load(resume=False)
    np.testing.assert_allclose(_stem_kernel(t2.state.params),
                               _stem_kernel(t1.state.params), rtol=0)

    batch = jax.device_put(_tiny_batch())
    state, metrics = t2._step_fn(t2.state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["total_loss"]))
