"""Numerical parity of the imported trunk vs torch (SURVEY.md §4
"golden-model parity", scoped to what runs without torchvision/network):
a torch Conv+BN(eval) stem and bottleneck block, weights imported through
engine/checkpoint.py, must reproduce torch outputs through our Flax modules
to float tolerance.  This exercises every error-prone import step: OIHW→HWIO
transposition, BN folding, padding conventions, residual wiring.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from uwcv_tpu.config import ModelConfig
from uwcv_tpu.engine.checkpoint import import_torch_weights
from uwcv_tpu.models.resnet import ResNet


def _bn(c, rng):
    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, c).astype("f")))
        bn.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, c).astype("f")))
        bn.running_mean.copy_(
            torch.from_numpy(rng.normal(0, 0.5, c).astype("f")))
        bn.running_var.copy_(
            torch.from_numpy(rng.uniform(0.5, 2.0, c).astype("f")))
    bn.eval()
    return bn


class TorchStemBlock(torch.nn.Module):
    """stem (7x7/2 + BN + relu + 3x3/2 maxpool) + one bottleneck with
    projection — mirrors our R26 res2_block0."""

    def __init__(self, rng):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = _bn(64, rng)
        self.pool = torch.nn.MaxPool2d(3, 2, 1)
        # layer1.0
        self.l_conv1 = torch.nn.Conv2d(64, 64, 1, bias=False)
        self.l_bn1 = _bn(64, rng)
        self.l_conv2 = torch.nn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.l_bn2 = _bn(64, rng)
        self.l_conv3 = torch.nn.Conv2d(64, 256, 1, bias=False)
        self.l_bn3 = _bn(256, rng)
        self.d_conv = torch.nn.Conv2d(64, 256, 1, bias=False)
        self.d_bn = _bn(256, rng)
        for m in self.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.normal_(m.weight, 0, 0.05)

    def forward(self, x):
        x = self.pool(torch.relu(self.bn1(self.conv1(x))))
        idn = self.d_bn(self.d_conv(x))
        y = torch.relu(self.l_bn1(self.l_conv1(x)))
        y = torch.relu(self.l_bn2(self.l_conv2(y)))
        y = self.l_bn3(self.l_conv3(y))
        return torch.relu(y + idn), x

    def state_dict_tv_names(self):
        sd = {}
        sd["conv1.weight"] = self.conv1.weight
        for nm in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{nm}"] = getattr(self.bn1, nm)
        m = {"conv1": (self.l_conv1, self.l_bn1),
             "conv2": (self.l_conv2, self.l_bn2),
             "conv3": (self.l_conv3, self.l_bn3)}
        for name, (conv, bn) in m.items():
            sd[f"layer1.0.{name}.weight"] = conv.weight
            bn_name = name.replace("conv", "bn")
            for nm in ("weight", "bias", "running_mean", "running_var"):
                sd[f"layer1.0.{bn_name}.{nm}"] = getattr(bn, nm)
        sd["layer1.0.downsample.0.weight"] = self.d_conv.weight
        for nm in ("weight", "bias", "running_mean", "running_var"):
            sd[f"layer1.0.downsample.1.{nm}"] = getattr(self.d_bn, nm)
        return {k: v.detach() for k, v in sd.items()}


def test_stem_and_block_match_torch(tmp_path):
    rng = np.random.default_rng(0)
    tm = TorchStemBlock(rng)
    tm.eval()

    path = str(tmp_path / "w.pth")
    torch.save(tm.state_dict_tv_names(), path)

    cfg = ModelConfig(depth=26, dtype="float32")
    model = ResNet(depth=26, dtype=jnp.float32)
    x_np = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x_np))
    # importer keys off full-model paths ("backbone/...") — wrap accordingly
    wrapped = {"params": {"backbone": params["params"]}}
    loaded_w = import_torch_weights(path, wrapped, cfg)
    loaded = {"params": loaded_w["params"]["backbone"]}

    feats = model.apply(loaded, jnp.asarray(x_np))
    ours_c2 = np.asarray(feats["c2"])  # output of res2_block0 for R26

    with torch.no_grad():
        t_out, _ = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    theirs = t_out.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours_c2, theirs, rtol=1e-4, atol=1e-4)
