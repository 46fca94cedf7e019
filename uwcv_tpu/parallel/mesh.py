"""Device mesh + sharding helpers (SURVEY.md §2c).

The reference is single-GPU; parallelism is this rebuild's own design:

- a 2-D ``(data, model)`` mesh over all local/global devices; the model axis
  is reserved (size 1 for R-CNN scale) so the same code path later admits
  tensor sharding without API change;
- batch pytrees are sharded on the data axis; params/opt state replicated;
- under jit, XLA emits the gradient ``psum`` over ICI automatically from the
  output shardings — no explicit collectives in model code;
- works identically on a real TPU slice and on the virtual 8-device CPU mesh
  used in CI (tests/conftest.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uwcv_tpu.config import ParallelConfig


def build_mesh(cfg: Optional[ParallelConfig] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    d, m = cfg.mesh_shape
    if d == -1:
        m = max(m, 1)
        d = len(devices) // m
    use = devices[: d * m]
    arr = np.array(use).reshape(d, m)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """[B,H,W,C] images: batch over the data axis AND height over the model
    axis — spatial parallelism for the conv trunk.

    Convolutions on spatially-sharded inputs are partitioned by XLA's SPMD
    pass with automatic halo exchanges over ICI; nothing in model code
    changes.  This is the scaling path for giant SEM micrographs whose
    activations exceed one chip's HBM (SURVEY.md §5 "long-context analog":
    the scale axis of this domain is image resolution).  Detection-head ops
    (top-k, NMS, gathers) prefer replicated spatial dims; XLA inserts the
    all-gather where the sharded trunk meets them."""
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree batch onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
