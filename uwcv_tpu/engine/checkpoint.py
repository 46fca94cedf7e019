"""Checkpointing (orbax) + torch ``.pth`` weight import (SURVEY.md N15).

The reference delegates to Detectron2's DetectionCheckpointer
(``resume_or_load`` nn_train.py:212, final artifact ``model_final.pth``
consumed by inference nn_inference.py:225).  Here:

- native checkpoints are orbax PyTree checkpoints of the full TrainState
  (params + optimizer + step) → exact resume;
- ``load_weights`` also accepts a torch ``.pth``/``.pkl`` state dict
  (Detectron2 or torchvision naming) and maps it onto our Flax tree,
  folding BatchNorm running stats into FrozenBN scale/bias and transposing
  conv (OIHW→HWIO) / linear (out,in→in,out) kernels.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uwcv_tpu.config import ModelConfig

_CKPT_RE = re.compile(r"ckpt_(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(output_dir: str, state, step: int,
                    name: Optional[str] = None) -> str:
    path = os.path.abspath(
        os.path.join(output_dir, name or f"ckpt_{step:07d}"))
    ckptr = _checkpointer()
    host_state = jax.tree_util.tree_map(np.asarray, state)
    ckptr.save(path, host_state, force=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for entry in os.listdir(output_dir):
        m = _CKPT_RE.match(entry)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(output_dir, entry), int(m.group(1))
    return os.path.abspath(best) if best else None


def load_checkpoint(path: str, target_state):
    """Restore a TrainState-shaped pytree saved by save_checkpoint."""
    ckptr = _checkpointer()
    host_target = jax.tree_util.tree_map(np.asarray, target_state)
    restored = ckptr.restore(os.path.abspath(path), item=host_target)
    return jax.tree_util.tree_map(jnp.asarray, restored)


def save_params(output_dir: str, params, name: str = "model_final") -> str:
    path = os.path.abspath(os.path.join(output_dir, name))
    _checkpointer().save(path, jax.tree_util.tree_map(np.asarray, params),
                         force=True)
    return path


def load_params(path: str, target_params):
    restored = _checkpointer().restore(
        os.path.abspath(path),
        item=jax.tree_util.tree_map(np.asarray, target_params))
    return jax.tree_util.tree_map(jnp.asarray, restored)


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def load_weights(path: str, target_params, cfg: ModelConfig):
    """Load weights from an orbax dir or a torch .pth/.pkl file."""
    if os.path.isdir(path):
        return load_params(path, target_params)
    return import_torch_weights(path, target_params, cfg)


def _torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    out = {}
    for k, v in payload.items():
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = np.asarray(v)
    return out


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5):
    """BN running stats → (scale, bias) for FrozenBN."""
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd.get(f"{prefix}.running_mean", np.zeros_like(gamma))
    var = sd.get(f"{prefix}.running_var", np.ones_like(gamma))
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv(sd, key):
    # torch OIHW → flax HWIO
    return np.transpose(sd[key], (2, 3, 1, 0)).astype(np.float32)


def _deconv(sd, key):
    # torch ConvTranspose2d IOHW → flax HWIO
    return np.transpose(sd[key], (2, 3, 0, 1)).astype(np.float32)


def _linear(sd, key):
    return np.transpose(sd[key]).astype(np.float32)


def torchvision_resnet_mapping(depth: int) -> Dict[str, tuple]:
    """Our flax param path → (torch key prefix, kind) for a torchvision or
    Detectron2-style ResNet trunk."""
    from uwcv_tpu.models.resnet import STAGE_BLOCKS

    mapping: Dict[str, tuple] = {
        "backbone/stem_conv": ("conv1", "conv"),
        "backbone/stem_bn": ("bn1", "bn"),
    }
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            ours = f"backbone/res{stage + 2}_block{b}"
            theirs = f"layer{stage + 1}.{b}"
            mapping[f"{ours}/conv1"] = (f"{theirs}.conv1", "conv")
            mapping[f"{ours}/bn1"] = (f"{theirs}.bn1", "bn")
            mapping[f"{ours}/conv2"] = (f"{theirs}.conv2", "conv")
            mapping[f"{ours}/bn2"] = (f"{theirs}.bn2", "bn")
            mapping[f"{ours}/conv3"] = (f"{theirs}.conv3", "conv")
            mapping[f"{ours}/bn3"] = (f"{theirs}.bn3", "bn")
            if b == 0:
                mapping[f"{ours}/shortcut_conv"] = (
                    f"{theirs}.downsample.0", "conv")
                mapping[f"{ours}/shortcut_bn"] = (
                    f"{theirs}.downsample.1", "bn")
    return mapping


def import_torch_weights(path: str, target_params, cfg: ModelConfig):
    """Map a torch state dict onto our param tree; unmatched leaves keep
    their initialized values (so partial backbones still load)."""
    sd = _torch_state_dict(path)
    # strip common prefixes (detectron2 "backbone.bottom_up.", torchvision
    # maskrcnn "backbone.body.")
    stripped = {}
    for k, v in sd.items():
        for pre in ("module.", "backbone.bottom_up.", "backbone.body."):
            if k.startswith(pre):
                k = k[len(pre):]
        stripped[k] = v
    sd = stripped

    mapping = torchvision_resnet_mapping(cfg.depth)

    flat = jax.tree_util.tree_flatten_with_path(target_params)
    leaves, treedef = flat
    new_leaves = []
    n_loaded = 0
    for path_keys, leaf in leaves:
        keys = [getattr(p, "key", str(p)) for p in path_keys]
        joined = "/".join(str(k) for k in keys)
        new = None
        for ours, (theirs, kind) in mapping.items():
            if ours in joined:
                if kind == "conv" and joined.endswith("kernel"):
                    if f"{theirs}.weight" in sd:
                        new = _conv(sd, f"{theirs}.weight")
                elif kind == "bn":
                    if f"{theirs}.weight" in sd:
                        scale, bias = _fold_bn(sd, theirs)
                        new = scale if joined.endswith("scale") else bias
                break
        if new is not None and new.shape == leaf.shape:
            new_leaves.append(jnp.asarray(new, leaf.dtype))
            n_loaded += 1
        else:
            new_leaves.append(leaf)
    result = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if n_loaded == 0:
        raise ValueError(
            f"no weights matched between {path} and the target params")
    return result
