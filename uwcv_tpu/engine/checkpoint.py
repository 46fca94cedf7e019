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


def save_params_npz(path: str, params, dtype=np.float16) -> str:
    """Params → single compressed .npz (leaves flattened by '/'-joined
    path, cast to ``dtype``).  The compact-artifact format behind the
    committed CI gate checkpoint (tools/make_gate_ckpt.py): orbax dirs are
    right for training/resume, a 1-file half-precision npz is right for
    small committed eval references."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path_keys)
        arrays[key] = np.asarray(leaf).astype(dtype)
    np.savez_compressed(path, **arrays)
    return path


def load_params_npz(path: str, target_params):
    """Inverse of save_params_npz: restore onto a target-shaped pytree
    (leaves cast back to the target dtypes)."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    leaves = []
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path_keys)
        if key not in data:
            raise KeyError(f"npz missing param leaf {key}")
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"npz leaf {key} shape {arr.shape} != target {leaf.shape}")
        leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])


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
    # torch ConvTranspose2d IOHW → flax HWIO.  torch computes the gradient
    # of conv (kernel spatially flipped w.r.t. lax.conv_transpose's
    # fractionally-strided conv), so flip H and W — verified to 0 ulp vs
    # torch in tests/test_torch_parity_full.py::test_mask_head_parity
    return np.ascontiguousarray(
        np.transpose(sd[key], (2, 3, 0, 1))[::-1, ::-1]).astype(np.float32)


def _linear(sd, key):
    return np.transpose(sd[key]).astype(np.float32)


def torchvision_resnet_mapping(depth: int) -> Dict[str, list]:
    """Our flax param path → candidate (torch key prefix, kind) list.

    Two naming schemes are recognized per module: torchvision
    (``layer1.0.conv1`` / ``bn1`` / ``downsample.{0,1}``) and Detectron2
    (``res2.0.conv1`` with BN at ``<conv>.norm``, ``shortcut``).  The first
    candidate whose keys exist in the state dict wins.
    """
    from uwcv_tpu.models.resnet import STAGE_BLOCKS

    mapping: Dict[str, list] = {
        "backbone/stem_conv": [("conv1", "conv"), ("stem.conv1", "conv")],
        "backbone/stem_bn": [("bn1", "bn"), ("stem.conv1.norm", "bn")],
    }
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            ours = f"backbone/res{stage + 2}_block{b}"
            tv = f"layer{stage + 1}.{b}"
            d2 = f"res{stage + 2}.{b}"
            for i in (1, 2, 3):
                mapping[f"{ours}/conv{i}"] = [
                    (f"{tv}.conv{i}", "conv"), (f"{d2}.conv{i}", "conv")]
                mapping[f"{ours}/bn{i}"] = [
                    (f"{tv}.bn{i}", "bn"), (f"{d2}.conv{i}.norm", "bn")]
            if b == 0:
                mapping[f"{ours}/shortcut_conv"] = [
                    (f"{tv}.downsample.0", "conv"), (f"{d2}.shortcut", "conv")]
                mapping[f"{ours}/shortcut_bn"] = [
                    (f"{tv}.downsample.1", "bn"), (f"{d2}.shortcut.norm", "bn")]
    return mapping


def full_model_mapping(depth: int) -> Dict[str, list]:
    """Trunk mapping + FPN/RPN/heads (Detectron2 checkpoint naming)."""
    mapping = torchvision_resnet_mapping(depth)
    for i in range(2, 6):
        mapping[f"fpn/lateral_c{i}"] = [
            (f"backbone.fpn_lateral{i}", "conv")]
        mapping[f"fpn/output_p{i}"] = [
            (f"backbone.fpn_output{i}", "conv")]
    mapping["rpn_head/rpn_conv"] = [
        ("proposal_generator.rpn_head.conv", "conv")]
    mapping["rpn_head/objectness"] = [
        ("proposal_generator.rpn_head.objectness_logits", "conv")]
    mapping["rpn_head/anchor_deltas"] = [
        ("proposal_generator.rpn_head.anchor_deltas", "conv")]
    # fc1 consumes the flattened 7x7x256 pool: torch flattens (C,H,W), we
    # flatten (H,W,C) → dedicated kind permutes the input axis
    mapping["box_head/fc1"] = [("roi_heads.box_head.fc1", "linear_chw")]
    mapping["box_head/fc2"] = [("roi_heads.box_head.fc2", "linear")]
    mapping["box_head/cls_score"] = [
        ("roi_heads.box_predictor.cls_score", "linear")]
    mapping["box_head/bbox_pred"] = [
        ("roi_heads.box_predictor.bbox_pred", "linear")]
    for i in range(1, 5):
        mapping[f"mask_head/mask_fcn{i}"] = [
            (f"roi_heads.mask_head.mask_fcn{i}", "conv")]
    mapping["mask_head/deconv"] = [("roi_heads.mask_head.deconv", "deconv")]
    mapping["mask_head/predictor"] = [
        ("roi_heads.mask_head.predictor", "conv")]
    return mapping


def _linear_chw(sd, key, pool: int = 7):
    """torch Linear over a CHW-flattened pooled feature → HWC-flattened."""
    wt = sd[key]                                     # [out, C*P*P]
    out_dim, in_dim = wt.shape
    c = in_dim // (pool * pool)
    w = wt.reshape(out_dim, c, pool, pool).transpose(0, 2, 3, 1)
    return w.reshape(out_dim, in_dim).T.astype(np.float32)


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

    mapping = full_model_mapping(cfg.depth)

    flat = jax.tree_util.tree_flatten_with_path(target_params)
    leaves, treedef = flat
    new_leaves = []
    n_loaded = 0
    for path_keys, leaf in leaves:
        keys = [getattr(p, "key", str(p)) for p in path_keys]
        joined = "/".join(str(k) for k in keys)
        is_kernel = joined.endswith("kernel")
        is_bias = joined.endswith("bias") and "frozen_bn" not in joined
        new = None
        for ours, candidates in mapping.items():
            if ours not in joined:
                continue
            for theirs, kind in candidates:
                if f"{theirs}.weight" not in sd:
                    continue
                if kind == "bn":
                    scale, bias = _fold_bn(sd, theirs)
                    new = scale if joined.endswith("scale") else bias
                elif is_kernel:
                    if kind == "conv":
                        new = _conv(sd, f"{theirs}.weight")
                    elif kind == "deconv":
                        new = _deconv(sd, f"{theirs}.weight")
                    elif kind == "linear":
                        new = _linear(sd, f"{theirs}.weight")
                    elif kind == "linear_chw":
                        new = _linear_chw(sd, f"{theirs}.weight")
                elif is_bias and f"{theirs}.bias" in sd:
                    new = sd[f"{theirs}.bias"].astype(np.float32)
                break
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
