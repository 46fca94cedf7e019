"""Full-model numerical parity vs a hand-built torch oracle (VERDICT r1 #3,
SURVEY.md §4 "golden-model parity").

The round-1 test covered the ResNet stem + one bottleneck.  This one covers
every remaining import path in ``engine/checkpoint.py::full_model_mapping``
with a tiny torch Mask R-CNN built from scratch (no torchvision/detectron2
needed), saved under Detectron2 checkpoint names, imported through
``import_torch_weights``, and compared module-by-module through our Flax
modules:

- FPN laterals + outputs + nearest top-down + maxpool P6 (reference zoo
  config backbone, nn_inference.py:321 contract);
- RPN shared conv + objectness + anchor-deltas heads;
- box head fc1 (the error-prone CHW→HWC flatten permutation, ``linear_chw``),
  fc2, cls_score, bbox_pred — through final per-roi logits;
- mask head 4×conv + ConvTranspose ``deconv`` + predictor — through final
  per-roi mask logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from uwcv_tpu.config import ModelConfig
from uwcv_tpu.engine.checkpoint import import_torch_weights
from uwcv_tpu.models.fpn import FPN
from uwcv_tpu.models.heads import BoxHead, MaskHead
from uwcv_tpu.models.rpn import RPNHead

NUM_CLASSES = 3
C = 256  # fpn channels


def _conv(cin, cout, k, s=1, p=0, rng=None, bias=True):
    m = torch.nn.Conv2d(cin, cout, k, s, p, bias=bias)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(
            rng.normal(0, 0.05, m.weight.shape).astype("f")))
        if bias:
            m.bias.copy_(torch.from_numpy(
                rng.normal(0, 0.1, m.bias.shape).astype("f")))
    return m


def _linear(cin, cout, rng):
    m = torch.nn.Linear(cin, cout)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(
            rng.normal(0, 0.02, (cout, cin)).astype("f")))
        m.bias.copy_(torch.from_numpy(rng.normal(0, 0.1, cout).astype("f")))
    return m


class TorchOracle(torch.nn.Module):
    """D2-shaped FPN + RPN head + box head + mask head, D2 checkpoint names."""

    def __init__(self, rng, num_anchors):
        super().__init__()
        cins = {2: 256, 3: 512, 4: 1024, 5: 2048}
        for i in range(2, 6):
            setattr(self, f"lat{i}", _conv(cins[i], C, 1, rng=rng))
            setattr(self, f"out{i}", _conv(C, C, 3, 1, 1, rng=rng))
        self.rpn_conv = _conv(C, C, 3, 1, 1, rng=rng)
        self.rpn_obj = _conv(C, num_anchors, 1, rng=rng)
        self.rpn_deltas = _conv(C, num_anchors * 4, 1, rng=rng)
        self.fc1 = _linear(C * 7 * 7, 1024, rng)
        self.fc2 = _linear(1024, 1024, rng)
        self.cls_score = _linear(1024, NUM_CLASSES + 1, rng)
        self.bbox_pred = _linear(1024, NUM_CLASSES * 4, rng)
        for i in range(1, 5):
            setattr(self, f"mask_fcn{i}", _conv(C, C, 3, 1, 1, rng=rng))
        self.deconv = torch.nn.ConvTranspose2d(C, C, 2, 2)
        with torch.no_grad():
            self.deconv.weight.copy_(torch.from_numpy(
                rng.normal(0, 0.05, self.deconv.weight.shape).astype("f")))
            self.deconv.bias.copy_(torch.from_numpy(
                rng.normal(0, 0.1, C).astype("f")))
        self.mask_pred = _conv(C, NUM_CLASSES, 1, rng=rng)

    def fpn(self, feats):  # feats: {2..5: [B,C,H,W]}
        lat = {i: getattr(self, f"lat{i}")(feats[i]) for i in range(2, 6)}
        td = {5: lat[5]}
        for i in (4, 3, 2):
            up = torch.nn.functional.interpolate(td[i + 1], scale_factor=2,
                                                 mode="nearest")
            td[i] = lat[i] + up
        out = {i: getattr(self, f"out{i}")(td[i]) for i in range(2, 6)}
        out[6] = torch.nn.functional.max_pool2d(out[5], 1, 2)
        return out

    def rpn(self, p):
        h = torch.relu(self.rpn_conv(p))
        return self.rpn_obj(h), self.rpn_deltas(h)

    def box(self, pooled):  # [R,C,7,7]
        h = torch.relu(self.fc1(pooled.flatten(1)))
        h = torch.relu(self.fc2(h))
        return self.cls_score(h), self.bbox_pred(h)

    def mask(self, pooled):  # [R,C,14,14]
        h = pooled
        for i in range(1, 5):
            h = torch.relu(getattr(self, f"mask_fcn{i}")(h))
        h = torch.relu(self.deconv(h))
        return self.mask_pred(h)

    def d2_state_dict(self):
        sd = {}

        def put(prefix, m):
            sd[f"{prefix}.weight"] = m.weight
            if m.bias is not None:
                sd[f"{prefix}.bias"] = m.bias

        for i in range(2, 6):
            put(f"backbone.fpn_lateral{i}", getattr(self, f"lat{i}"))
            put(f"backbone.fpn_output{i}", getattr(self, f"out{i}"))
        put("proposal_generator.rpn_head.conv", self.rpn_conv)
        put("proposal_generator.rpn_head.objectness_logits", self.rpn_obj)
        put("proposal_generator.rpn_head.anchor_deltas", self.rpn_deltas)
        put("roi_heads.box_head.fc1", self.fc1)
        put("roi_heads.box_head.fc2", self.fc2)
        put("roi_heads.box_predictor.cls_score", self.cls_score)
        put("roi_heads.box_predictor.bbox_pred", self.bbox_pred)
        for i in range(1, 5):
            put(f"roi_heads.mask_head.mask_fcn{i}",
                getattr(self, f"mask_fcn{i}"))
        put("roi_heads.mask_head.deconv", self.deconv)
        put("roi_heads.mask_head.predictor", self.mask_pred)
        return {k: v.detach() for k, v in sd.items()}


@pytest.fixture(scope="module")
def oracle_and_params(tmp_path_factory):
    rng = np.random.default_rng(7)
    cfg = ModelConfig(depth=26, dtype="float32", num_classes=NUM_CLASSES)
    tm = TorchOracle(rng, cfg.num_anchors_per_cell)
    tm.eval()
    path = str(tmp_path_factory.mktemp("w") / "oracle.pth")
    torch.save(tm.d2_state_dict(), path)

    # init each flax module standalone (cheap — no backbone trace), then
    # import the torch weights through the full-model mapping
    key = jax.random.key(0)
    feats = {f"c{i}": jnp.zeros((1, 2 ** (7 - i), 2 ** (7 - i),
                                 {2: 256, 3: 512, 4: 1024, 5: 2048}[i]),
                                jnp.float32)
             for i in range(2, 6)}
    fpn = FPN(channels=C, dtype=jnp.float32)
    fpn_p = fpn.init(key, feats)
    plevels = {f"p{i}": jnp.zeros((1, 16, 16, C), jnp.float32)
               for i in range(2, 7)}
    rpn = RPNHead(num_anchors=cfg.num_anchors_per_cell, channels=C,
                  dtype=jnp.float32)
    rpn_p = rpn.init(key, plevels)
    box = BoxHead(num_classes=NUM_CLASSES, dtype=jnp.float32)
    box_p = box.init(key, jnp.zeros((2, 7, 7, C), jnp.float32))
    mask = MaskHead(num_classes=NUM_CLASSES, dtype=jnp.float32)
    mask_p = mask.init(key, jnp.zeros((2, 14, 14, C), jnp.float32))

    wrapped = {"params": {
        "fpn": fpn_p["params"], "rpn_head": rpn_p["params"],
        "box_head": box_p["params"], "mask_head": mask_p["params"]}}
    loaded = import_torch_weights(path, wrapped, cfg)

    def sub(name):
        return {"params": loaded["params"][name]}

    return tm, rng, {"fpn": (fpn, sub("fpn")), "rpn": (rpn, sub("rpn_head")),
                     "box": (box, sub("box_head")),
                     "mask": (mask, sub("mask_head"))}


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_fpn_parity(oracle_and_params):
    tm, rng, mods = oracle_and_params
    fpn, params = mods["fpn"]
    cins = {2: 256, 3: 512, 4: 1024, 5: 2048}
    feats_np = {i: rng.normal(0, 1, (1, cins[i], 2 ** (7 - i),
                                     2 ** (7 - i))).astype("f")
                for i in range(2, 6)}
    with torch.no_grad():
        theirs = tm.fpn({i: torch.from_numpy(v)
                         for i, v in feats_np.items()})
    ours = fpn.apply(params, {f"c{i}": jnp.asarray(
        v.transpose(0, 2, 3, 1)) for i, v in feats_np.items()})
    for i in range(2, 7):
        np.testing.assert_allclose(
            np.asarray(ours[f"p{i}"]), _nhwc(theirs[i]),
            rtol=1e-4, atol=1e-4, err_msg=f"p{i}")


def test_rpn_head_parity(oracle_and_params):
    tm, rng, mods = oracle_and_params
    rpn, params = mods["rpn"]
    p_np = {f"p{i}": rng.normal(0, 1, (1, C, 16, 16)).astype("f")
            for i in range(2, 7)}
    with torch.no_grad():
        t_obj, t_del = tm.rpn(torch.from_numpy(p_np["p2"]))
    obj, deltas = rpn.apply(params, {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in p_np.items()})
    np.testing.assert_allclose(np.asarray(obj["p2"]), _nhwc(t_obj),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas["p2"]), _nhwc(t_del),
                               rtol=1e-4, atol=1e-4)


def test_box_head_parity(oracle_and_params):
    """Final per-roi class logits + deltas — proves the fc1 ``linear_chw``
    CHW→HWC flatten permutation (checkpoint.py:195-201)."""
    tm, rng, mods = oracle_and_params
    box, params = mods["box"]
    pooled = rng.normal(0, 1, (5, C, 7, 7)).astype("f")
    with torch.no_grad():
        t_logits, t_deltas = tm.box(torch.from_numpy(pooled))
    logits, deltas = box.apply(params,
                               jnp.asarray(pooled.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(deltas), t_deltas.numpy().reshape(5, NUM_CLASSES, 4),
        rtol=1e-4, atol=1e-4)


def test_mask_head_parity(oracle_and_params):
    """Final per-roi mask logits — proves the ConvTranspose import layout."""
    tm, rng, mods = oracle_and_params
    mask, params = mods["mask"]
    pooled = rng.normal(0, 1, (3, C, 14, 14)).astype("f")
    with torch.no_grad():
        theirs = tm.mask(torch.from_numpy(pooled))
    ours = mask.apply(params, jnp.asarray(pooled.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=1e-4, atol=2e-4)
