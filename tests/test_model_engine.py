import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles; excluded from the fast default

import jax
import jax.numpy as jnp

from uwcv_tpu.config import Config, ModelConfig


def _tiny_model_cfg():
    return ModelConfig(
        depth=26, dtype="float32",
        rpn_pre_nms_topk_test=50, rpn_post_nms_topk_test=20,
        rpn_pre_nms_topk_train=50, rpn_post_nms_topk_train=20,
        rpn_batch_size_per_image=16, roi_batch_size_per_image=8,
        detections_per_image=5, roi_score_thresh_test=0.0)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    from uwcv_tpu.models.rcnn import MaskRCNN

    cfg = _tiny_model_cfg()
    model = MaskRCNN(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), imgs, method=MaskRCNN.inference)
    return cfg, model, params


def test_inference_shapes(tiny_model_and_params):
    from uwcv_tpu.models.rcnn import MaskRCNN

    cfg, model, params = tiny_model_and_params
    imgs = jnp.ones((2, 64, 64, 3), jnp.float32) * 127
    dets, masks = model.apply(params, imgs, method=MaskRCNN.inference)
    assert dets.boxes.shape == (2, 5, 4)
    assert dets.scores.shape == (2, 5)
    assert dets.classes.shape == (2, 5)
    assert masks.shape == (2, 5, 28, 28)
    b = np.asarray(dets.boxes)
    assert (b >= 0).all() and (b[..., [0, 2]] <= 64).all()
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_train_forward_losses(tiny_model_and_params):
    from uwcv_tpu.models.rcnn import MaskRCNN

    cfg, model, params = tiny_model_and_params
    imgs = jnp.ones((1, 64, 64, 3), jnp.float32) * 100
    n = 4
    gt_boxes = jnp.tile(jnp.array([[8., 8., 40., 40.]]), (1, n, 1))
    gt_classes = jnp.zeros((1, n), jnp.int32)
    gt_masks = jnp.zeros((1, n, 64, 64), bool).at[:, :, 10:38, 10:38].set(True)
    gt_valid = jnp.ones((1, n), bool).at[0, 2:].set(False)
    losses = model.apply(params, imgs, gt_boxes, gt_classes, gt_masks,
                         gt_valid, jax.random.key(0),
                         method=MaskRCNN.forward_train)
    assert set(losses) == {"rpn_cls", "rpn_loc", "cls", "box_reg", "mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
        assert float(v) >= 0, (k, v)


def test_trainable_mask_freezes_bn_and_stem(tiny_model_and_params):
    from uwcv_tpu.engine.trainer import _trainable_mask

    _, _, params = tiny_model_and_params
    mask = _trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    froze_bn = froze_stem = froze_res2 = trained_head = False
    for path, trainable in flat:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if "frozen_bn" in joined:
            assert not trainable, joined
            froze_bn = True
        elif "stem_" in joined:
            assert not trainable, joined
            froze_stem = True
        elif "res2_block" in joined:
            assert not trainable, joined
            froze_res2 = True
        if "cls_score" in joined:
            assert trainable
            trained_head = True
    assert froze_bn and froze_stem and froze_res2 and trained_head


def test_optimizer_respects_mask(tiny_model_and_params):
    import optax

    from uwcv_tpu.engine.trainer import make_optimizer

    cfg_m, model, params = tiny_model_and_params
    cfg = Config()
    cfg.model = cfg_m
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, u in flat:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if "frozen_bn" in joined or "stem_" in joined:
            assert float(jnp.abs(u).max()) == 0.0, joined
        if "cls_score" in joined and joined.endswith("kernel"):
            assert float(jnp.abs(u).max()) > 0.0, joined


def test_torch_weight_import(tmp_path, tiny_model_and_params):
    torch = pytest.importorskip("torch")
    from uwcv_tpu.engine.checkpoint import import_torch_weights

    cfg, model, params = tiny_model_and_params
    # synthetic torchvision-style state dict for the R26 trunk
    sd = {}
    rng = np.random.default_rng(0)

    def t(shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    sd["conv1.weight"] = t((64, 3, 7, 7))
    for nm in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{nm}"] = t((64,))
    channels = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    in_c = 64
    for stage, (mid, out) in enumerate(channels, start=1):
        pre = f"layer{stage}.0"
        sd[f"{pre}.conv1.weight"] = t((mid, in_c, 1, 1))
        sd[f"{pre}.conv2.weight"] = t((mid, mid, 3, 3))
        sd[f"{pre}.conv3.weight"] = t((out, mid, 1, 1))
        sd[f"{pre}.downsample.0.weight"] = t((out, in_c, 1, 1))
        for bn in ("bn1", "bn2", "bn3"):
            c = mid if bn != "bn3" else out
            for nm in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.{bn}.{nm}"] = t((c,))
        for nm in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{pre}.downsample.1.{nm}"] = t((out,))
        in_c = out
    path = tmp_path / "weights.pth"
    torch.save(sd, str(path))

    loaded = import_torch_weights(str(path), params, cfg)
    # conv kernel transposed correctly
    ours = loaded["params"]["backbone"]["stem_conv"]["kernel"]
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-6)
    # bn folded: scale = gamma/sqrt(var+eps)
    g = sd["bn1.weight"].numpy()
    v = sd["bn1.running_var"].numpy()
    mz = sd["bn1.running_mean"].numpy()
    b = sd["bn1.bias"].numpy()
    scale = np.asarray(loaded["params"]["backbone"]["stem_bn"]
                       ["frozen_bn_scale"])
    bias = np.asarray(loaded["params"]["backbone"]["stem_bn"]
                      ["frozen_bn_bias"])
    np.testing.assert_allclose(scale, g / np.sqrt(v + 1e-5), rtol=1e-5)
    np.testing.assert_allclose(bias, b - mz * scale, rtol=1e-4, atol=1e-5)
    # head params untouched (not in the torch dict)
    a = loaded["params"]["box_head"]["cls_score"]["kernel"]
    b2 = params["params"]["box_head"]["cls_score"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_import_torch_weights_no_match_raises(tmp_path, tiny_model_and_params):
    torch = pytest.importorskip("torch")
    from uwcv_tpu.engine.checkpoint import import_torch_weights

    cfg, _, params = tiny_model_and_params
    path = tmp_path / "bad.pth"
    torch.save({"unrelated.weight": torch.zeros(3)}, str(path))
    with pytest.raises(ValueError, match="no weights matched"):
        import_torch_weights(str(path), params, cfg)


def test_faster_rcnn_box_only(tmp_path):
    """mask_on=False (Faster R-CNN family): inference returns box-only
    detections (no mask program at all) and the train step omits the mask
    loss — the zoo-config sibling of the reference's Mask R-CNN."""
    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.mask_on = False
    cfg.model.rpn_pre_nms_topk_train = 64
    cfg.model.rpn_post_nms_topk_train = 32
    cfg.model.rpn_batch_size_per_image = 16
    cfg.model.roi_batch_size_per_image = 8
    cfg.model.rpn_pre_nms_topk_test = 64
    cfg.model.rpn_post_nms_topk_test = 32
    cfg.model.nms_candidates_test = 64
    cfg.model.detections_per_image = 8
    cfg.input.train_size = (64, 64)
    cfg.input.pad_size_test = (64, 64)
    cfg.input.test_short_edge = 64
    cfg.input.test_max_size = 64
    cfg.input.max_gt_instances = 4
    cfg.solver.ims_per_batch = 1
    cfg.output_dir = str(tmp_path)

    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    # no mask-head params exist at all
    assert "mask_head" not in params["params"]

    pred = Predictor(cfg, params)
    img = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    inst = pred(img)
    assert inst.masks is None
    assert inst.boxes.shape[-1] == 4

    trainer = Trainer(cfg)
    trainer.init_state()
    s, n = 64, cfg.input.max_gt_instances
    masks = np.zeros((1, n, s, s), bool)
    masks[:, 0, 16:48, 16:48] = True
    batch = {
        "image": np.zeros((1, s, s, 3), np.uint8),
        "boxes": np.tile(np.array([[16.0, 16.0, 48.0, 48.0]], np.float32),
                         (1, n, 1)),
        "classes": np.zeros((1, n), np.int32),
        "valid": np.tile(np.array([True] + [False] * (n - 1)), (1, 1)),
        "masks_packed": np.packbits(masks, axis=-1),
    }
    state, metrics = trainer._step_fn(trainer.state, batch, jax.random.key(0))
    jax.block_until_ready(metrics)
    assert "mask" not in metrics
    assert np.isfinite(float(metrics["total_loss"]))


def test_unit_scale_fast_path_matches_resample(tmp_path):
    """The predictor's lax.cond fast path (skip the antialiased resample when
    every scale is exactly 1.0 — engine/predictor.py::_run) must agree with
    the general resample branch: at scale 1 the bilinear antialias kernel is
    an identity, so detections from the two branches are identical."""
    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_test = 64
    cfg.model.rpn_post_nms_topk_test = 32
    cfg.model.detections_per_image = 8
    cfg.model.roi_score_thresh_test = 0.0
    cfg.input.pad_size_test = (64, 64)
    cfg.input.test_short_edge = 64
    cfg.input.test_max_size = 64
    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    pred = Predictor(cfg, params)

    img = np.random.default_rng(3).integers(
        0, 255, (64, 64, 2 + 1)).astype(np.uint8)
    batch = jnp.asarray(img[None])
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    # fast branch: all scales exactly 1 → pure cast
    fast = pred._jit_run(batch, jnp.ones((1,), jnp.float32), sizes)
    # general branch: a scale that is not exactly 1.0 but resamples to the
    # same pixel grid within float error (nextafter(1))
    eps_scale = jnp.full((1,), np.nextafter(np.float32(1.0), np.float32(2.0)),
                         jnp.float32)
    slow = pred._jit_run(batch, eps_scale, sizes)
    np.testing.assert_allclose(np.asarray(fast[0].scores),
                               np.asarray(slow[0].scores), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast[0].boxes),
                               np.asarray(slow[0].boxes), atol=0.1)


def test_stage_batch_host_canvas_clamps_to_pad():
    """Host canvas must clamp to the pad canvas whenever the content fits it
    (the pad need not be a 128-multiple — default pad_w=1344): an unclamped
    bucket128 host canvas would mismatch the clamped MODEL canvas on every
    batch, permanently disabling _run's unit-scale fast path and shipping
    dead zero columns.  Raw-shipped images LARGER than the pad must keep
    their bucketed true size (the device resample maps them into the model
    canvas)."""
    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    cfg = Config()
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.input.canvas_bucket = 128          # the clamp case under test is
    #                                        bucket128 > pad; default is 64
    cfg.input.pad_size_test = (192, 320)   # NOT 128-multiples
    cfg.input.test_short_edge = 190
    cfg.input.test_max_size = 400
    params = init_params(MaskRCNN(cfg.model), jax.random.key(0),
                         init_size=64)
    pred = Predictor(cfg, params)

    # content 190x300 <= pad, but bucket128 -> (256, 384) > pad: both the
    # host and the model canvas must clamp to the pad and AGREE
    img = np.zeros((190, 300, 3), np.uint8)
    (batch, scales, out_sizes, (mch, mcw)), _ = pred.stage_batch([img])
    assert batch.shape[1:3] == (192, 320)
    assert (mch, mcw) == (192, 320)
    assert float(np.asarray(scales)[0]) == 1.0  # fast path eligible

    # raw-shipped oversized image (host_resize off): host canvas keeps the
    # bucketed TRUE size past the pad; model canvas stays clamped
    cfg2 = Config()
    cfg2.model.depth = 26
    cfg2.model.dtype = "float32"
    cfg2.input.canvas_bucket = 128
    cfg2.input.pad_size_test = (192, 320)
    cfg2.input.test_short_edge = 190
    cfg2.input.test_max_size = 400
    cfg2.input.host_resize = False
    pred2 = Predictor(cfg2, params)
    big = np.zeros((400, 600, 3), np.uint8)
    (batch2, scales2, _, (mch2, mcw2)), _ = pred2.stage_batch([big])
    assert batch2.shape[1:3] == (512, 640)
    assert (mch2, mcw2) == (192, 320)
    assert float(np.asarray(scales2)[0]) < 1.0


def test_canvas_bucket_knob():
    """input.canvas_bucket (default 64 since r5) shrinks the adaptive host+model
    canvas toward the true content size: at bucket 64 the reference's
    800×1000 resized content runs at 832×1024 instead of 896×1024 (~7%
    fewer trunk/RPN/paste pixels, PERF.md r4).  Geometry must follow the
    knob, a bucket-64 program must run end-to-end, and invalid buckets
    (not a multiple of size_divisibility) must be rejected at
    construction."""
    import pytest

    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    def mk(bucket):
        cfg = Config()
        cfg.model.depth = 26
        cfg.model.dtype = "float32"
        cfg.input.pad_size_test = (256, 384)
        cfg.input.test_short_edge = 150
        cfg.input.test_max_size = 400
        cfg.input.canvas_bucket = bucket
        return cfg

    params = init_params(MaskRCNN(mk(128).model), jax.random.key(0),
                         init_size=64)
    img = np.random.default_rng(0).integers(
        0, 255, (150, 200, 3)).astype(np.uint8)

    # 150×200 content: bucket128 → (256, 256), bucket64 → tight (192, 256)
    pred128 = Predictor(mk(128), params)
    (batch, _, _, (mch, mcw)), _ = pred128.stage_batch([img])
    assert (mch, mcw) == (256, 256)
    assert batch.shape[1:3] == (256, 256)

    pred64 = Predictor(mk(64), params)
    (batch64, _, _, canvas64), _ = pred64.stage_batch([img])
    assert canvas64 == (192, 256)
    assert batch64.shape[1:3] == (192, 256)

    # the bucket-64 program runs end-to-end and yields well-formed results
    inst = pred64(img)
    assert inst.boxes.shape[-1] == 4

    with pytest.raises(ValueError, match="canvas_bucket"):
        Predictor(mk(48), params)   # not a multiple of size_divisibility=32


def test_train_forward_class_rebalance_knobs(tiny_model_and_params):
    """roi/rpn fg class weights + class loss weights: losses stay finite and
    the weighted cls loss actually shifts vs uniform (same rng)."""
    import dataclasses

    from uwcv_tpu.models.rcnn import MaskRCNN

    cfg, _, params = tiny_model_and_params
    imgs = jnp.ones((1, 64, 64, 3), jnp.float32) * 100
    n = 4
    gt_boxes = jnp.asarray(
        [[[8., 8., 40., 40.], [2., 28., 58., 34.],   # one thin 10:1 box
          [0., 0., 0., 0.], [0., 0., 0., 0.]]])
    gt_classes = jnp.asarray([[1, 0, 0, 0]], jnp.int32)
    gt_masks = jnp.zeros((1, n, 64, 64), bool).at[:, 0, 10:38, 10:38].set(
        True).at[:, 1, 28:34, 2:58].set(True)
    gt_valid = jnp.ones((1, n), bool).at[0, 2:].set(False)

    def run(mcfg):
        model = MaskRCNN(mcfg)
        return model.apply(params, imgs, gt_boxes, gt_classes, gt_masks,
                           gt_valid, jax.random.key(0),
                           method=MaskRCNN.forward_train)

    base = run(cfg)
    weighted = run(dataclasses.replace(
        cfg,
        roi_fg_class_weights=(8.0, 1.0, 1.0, 1.0),
        rpn_fg_class_weights=(4.0, 1.0, 1.0, 1.0),
        class_loss_weights=(4.0, 1.0, 1.0, 1.0)))
    for k, v in weighted.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, v)
    assert set(weighted) == set(base)
    # class-0 (the rare thin box) carries weight 4 → cls loss must move
    assert abs(float(weighted["cls"]) - float(base["cls"])) > 1e-6

    # a weight tuple shorter than num_classes would silently mis-weight via
    # JAX's out-of-bounds index clamping → must raise at model setup
    for knob in ("class_loss_weights", "roi_fg_class_weights",
                 "rpn_fg_class_weights"):
        bad = dataclasses.replace(cfg, **{knob: (2.0, 1.0, 1.0)})
        with pytest.raises(ValueError, match=knob):
            MaskRCNN(bad).apply(params, imgs, gt_boxes, gt_classes,
                                gt_masks, gt_valid, jax.random.key(0),
                                method=MaskRCNN.forward_train)


def test_trainable_mask_freeze_at_deep_stages(tiny_model_and_params):
    from uwcv_tpu.engine.trainer import _trainable_mask

    _, _, params = tiny_model_and_params
    mask4 = _trainable_mask(params, freeze_at=4)
    flat = jax.tree_util.tree_flatten_with_path(mask4)[0]
    saw = {2: False, 3: False, 4: False, 5: False}
    for path, trainable in flat:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        for stage in (2, 3, 4):
            if f"res{stage}_block" in joined:
                assert not trainable, joined
                saw[stage] = True
        if "res5_block" in joined and "frozen_bn" not in joined:
            assert trainable, joined
            saw[5] = True
    assert all(saw.values())
    with pytest.raises(ValueError):
        _trainable_mask(params, freeze_at=6)
