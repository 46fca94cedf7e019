"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §2c, §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uwcv_tpu.config import ParallelConfig
from uwcv_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    replicate,
    shard_batch,
)


def test_mesh_shape_default():
    mesh = build_mesh(ParallelConfig())
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_mesh_model_axis():
    mesh = build_mesh(ParallelConfig(mesh_shape=(-1, 2)))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_shard_batch_places_on_data_axis():
    mesh = build_mesh(ParallelConfig())
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec[0] == "data"
    # each device holds 1 row
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)


def test_replicated_params():
    mesh = build_mesh(ParallelConfig())
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_data_parallel_gradient_psum_semantics():
    """jit with sharded batch + replicated params must produce the same grads
    as the single-device computation over the full batch."""
    mesh = build_mesh(ParallelConfig())
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)),
                    jnp.float32)
    x = np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32)
    y = np.random.default_rng(2).normal(size=(8, 2)).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x), jnp.asarray(y))

    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    wr = replicate(w, mesh)
    g_sharded = jax.jit(jax.grad(loss))(wr, xs, ys)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_graft_dryrun_multichip():
    """The driver's multichip validation path must compile + run."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_predictor_sharded_matches_single_device():
    """Data-parallel inference: a Predictor over an 8-device mesh must give
    the same detections as single-device, with the batch really sharded."""
    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_test = 64
    cfg.model.rpn_post_nms_topk_test = 32
    cfg.model.nms_candidates_test = 64
    cfg.model.detections_per_image = 8
    cfg.input.pad_size_test = (96, 96)
    cfg.input.test_short_edge = 96
    cfg.input.test_max_size = 96

    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
              for _ in range(8)]

    single = Predictor(cfg, params)
    ref = single.predict_batch(images)

    mesh = build_mesh(ParallelConfig())
    assert mesh.devices.size == 8
    sharded = Predictor(cfg, params, mesh=mesh)
    # the device batch really lives sharded over the data axis
    dets, _, _, _, _ = sharded.predict_batch_device(images)
    spec = dets.boxes.sharding.spec
    assert spec and spec[0] == mesh.axis_names[0], spec
    got = sharded.predict_batch(images)

    for r, g in zip(ref, got):
        np.testing.assert_allclose(g.boxes, r.boxes, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(g.scores, r.scores, rtol=1e-4, atol=1e-4)
        assert (g.classes == r.classes).all()
        assert (g.valid == r.valid).all()


def test_spatial_sharding_backbone_matches_replicated():
    """Spatial (sp) parallelism: the conv trunk on images sharded
    (batch over data, HEIGHT over model) must equal the replicated run —
    XLA partitions the convs with halo exchanges automatically."""
    from uwcv_tpu.models.resnet import ResNet
    from uwcv_tpu.parallel.mesh import spatial_image_sharding

    mesh = build_mesh(ParallelConfig(mesh_shape=(2, 4)))
    assert mesh.devices.shape == (2, 4)

    model = ResNet(depth=26, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))

    ref = jax.jit(model.apply)(params, jnp.asarray(x))

    xs = jax.device_put(x, spatial_image_sharding(mesh))
    ps = replicate(params, mesh)
    got = jax.jit(model.apply)(ps, xs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
