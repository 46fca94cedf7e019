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


def initialize_multi_host(cfg: Optional[ParallelConfig] = None) -> bool:
    """``jax.distributed.initialize`` wiring (SURVEY §2c comm backend).

    Call BEFORE any device query when ``cfg.multi_host`` is set; afterwards
    ``jax.devices()`` returns the global device set, so ``build_mesh``
    spans hosts and XLA routes collectives over ICI within a slice / DCN
    across slices.  Idempotent: a second call (or an already-initialized
    runtime) is a no-op.  Returns True when running multi-process.
    """
    cfg = cfg or ParallelConfig()
    if not cfg.multi_host:
        return jax.process_count() > 1
    import os

    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    pid = cfg.process_id if cfg.process_id >= 0 else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes > 1 or cfg.coordinator_address:
        # an explicit coordinator means no cluster auto-detection: jax
        # requires num_processes/process_id even for a 1-process cluster
        kwargs["num_processes"] = cfg.num_processes
        kwargs["process_id"] = pid
    kwargs["initialization_timeout"] = cfg.init_timeout_s
    kwargs["heartbeat_timeout_seconds"] = cfg.heartbeat_timeout_s
    kwargs["shutdown_timeout_seconds"] = cfg.shutdown_timeout_s
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def build_mesh(cfg: Optional[ParallelConfig] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    if devices is None and cfg.multi_host:
        initialize_multi_host(cfg)
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


def _mesh_is_multi_process(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat)


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree batch onto the mesh, batch-axis sharded.

    Single-process: plain ``device_put``.  Multi-host mesh: each process
    passes its LOCAL slice of the global batch (TrainLoader with
    process_index/process_count yields exactly that) and the global array is
    assembled from per-process shards without any cross-host data movement —
    per-host input sharding over DCN, SURVEY §2c."""
    sh = batch_sharding(mesh)
    if _mesh_is_multi_process(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree onto every device of the mesh.  On a multi-host
    mesh every process must hold identical host values (same-seed init /
    same checkpoint — both true here); each contributes its addressable
    replicas."""
    rep = replicated(mesh)
    if _mesh_is_multi_process(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
