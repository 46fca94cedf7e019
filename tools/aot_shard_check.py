"""Production-shape sharded AOT compile check (no execution).

``__graft_entry__.dryrun_multichip`` executes a REAL dp×sp train step, but at
toy scale (depth 26, 64²) — an SPMD layout or memory regression at the
production shape (R50, 1024×1344 canvas) would only surface on real
multi-chip hardware.  This tool closes that gap on the virtual 8-device CPU
mesh: it ``jit(...).lower(...).compile()``s — compile ONLY, never executes —

  1. the full dp×sp training step (augment → forward → losses → grads →
     masked SGD) at train shape 800², global batch 8, image height sharded
     over the model axis, and
  2. the sharded batch predictor program at the 1024×1344 test canvas,

then records XLA's own memory analysis (argument/output/temp/generated-code
bytes) per program in SHARDCHECK.json.  CPU-compiling pins the SPMD
partitioner's behavior (sharding propagation, halo exchanges, collective
insertion) — the same pass pipeline a TPU target runs.

Usage: python tools/aot_shard_check.py        (re-execs itself onto a CPU
                                               mesh; ~minutes of XLA compile)
Env: UWCV_AOT_DEVICES (default 8), UWCV_AOT_DEPTH (default 50).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEV = int(os.environ.get("UWCV_AOT_DEVICES", "8"))
DEPTH = int(os.environ.get("UWCV_AOT_DEPTH", "50"))


def _mem(compiled) -> dict:
    try:
        m = compiled.memory_analysis()
        return {
            "argument_bytes": int(getattr(m, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(m, "output_size_in_bytes", 0)),
            "temp_bytes": int(getattr(m, "temp_size_in_bytes", 0)),
            "generated_code_bytes": int(
                getattr(m, "generated_code_size_in_bytes", 0)),
        }
    except Exception as e:  # memory analysis is backend-best-effort
        return {"unavailable": str(e)}


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= N_DEV, jax.devices()

    from uwcv_tpu.config import Config
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.parallel.mesh import (
        batch_sharding,
        build_mesh,
        replicated,
        spatial_image_sharding,
    )

    t0 = time.time()
    report = {"n_devices": N_DEV, "depth": DEPTH, "programs": {}}

    # ---------------- dp×sp train step at production train shape ----------
    cfg = Config()
    cfg.model.depth = DEPTH
    cfg.model.dtype = "bfloat16"
    cfg.parallel.mesh_shape = (N_DEV // 2, 2)      # dp×sp like the dryrun
    cfg.solver.ims_per_batch = N_DEV // 2          # one image per data row
    cfg.input.train_size = (800, 800)              # reference train input
    cfg.input.pad_size_train = (800, 800)
    cfg.input.max_gt_instances = 100
    mesh = build_mesh(cfg.parallel)

    trainer = Trainer(cfg, mesh=mesh)
    trainer.init_state()

    b = cfg.solver.ims_per_batch
    s = cfg.input.train_size[0]
    n = cfg.input.max_gt_instances
    img_sh = spatial_image_sharding(mesh)
    bat_sh = batch_sharding(mesh)
    batch_shapes = {
        "image": jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8, sharding=img_sh),
        "boxes": jax.ShapeDtypeStruct((b, n, 4), jnp.float32, sharding=bat_sh),
        "classes": jax.ShapeDtypeStruct((b, n), jnp.int32, sharding=bat_sh),
        "valid": jax.ShapeDtypeStruct((b, n), jnp.bool_, sharding=bat_sh),
        "masks_packed": jax.ShapeDtypeStruct((b, n, s, s // 8), jnp.uint8,
                                             sharding=bat_sh),
    }
    rep = replicated(mesh)
    state_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
        trainer.state)
    key_shape = jax.ShapeDtypeStruct(
        jax.random.key(0).shape, jax.random.key(0).dtype, sharding=rep)

    print(f"[aot +{time.time() - t0:6.1f}s] lowering dp×sp train step "
          f"(R{DEPTH}, {s}², global batch {b}, mesh {dict(mesh.shape)})",
          flush=True)
    lowered = trainer._step_fn.lower(state_shapes, batch_shapes, key_shape)
    print(f"[aot +{time.time() - t0:6.1f}s] compiling train step", flush=True)
    compiled = lowered.compile()
    report["programs"]["train_dp_sp"] = {
        "mesh": dict(mesh.shape), "batch_global": b,
        "train_size": [s, s], **_mem(compiled),
    }
    print(f"[aot +{time.time() - t0:6.1f}s] train step compiled: "
          f"{report['programs']['train_dp_sp']}", flush=True)
    del compiled, lowered, trainer

    # ---------------- sharded predictor at the 1024×1344 test canvas ------
    from uwcv_tpu.engine.predictor import Predictor
    from uwcv_tpu.models.rcnn import MaskRCNN, init_params

    pcfg = Config()
    pcfg.model.depth = DEPTH
    pcfg.parallel.mesh_shape = (N_DEV, 1)          # pure-DP inference
    pmesh = build_mesh(pcfg.parallel)
    model = MaskRCNN(pcfg.model)
    params = init_params(model, jax.random.key(0))
    pred = Predictor(pcfg, params, mesh=pmesh)

    h, w = pcfg.input.pad_size_test
    bp = N_DEV
    imgs = jax.ShapeDtypeStruct((bp, h, w, 1), jnp.uint8,
                                sharding=pred._batch_sharding)
    scales = jax.ShapeDtypeStruct((bp,), jnp.float32,
                                  sharding=pred._batch_sharding)
    osizes = jax.ShapeDtypeStruct((bp, 2), jnp.int32,
                                  sharding=pred._batch_sharding)
    prep = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=jax.sharding.NamedSharding(
                pmesh, jax.sharding.PartitionSpec())), pred.params)
    print(f"[aot +{time.time() - t0:6.1f}s] lowering sharded predictor "
          f"({bp}×{h}×{w}, pure-DP {N_DEV} devices)", flush=True)
    plowered = pred._jit_p.lower(prep, imgs, scales, osizes,
                                 (h, w))
    print(f"[aot +{time.time() - t0:6.1f}s] compiling predictor", flush=True)
    pcompiled = plowered.compile()
    report["programs"]["predictor_dp"] = {
        "mesh": dict(pmesh.shape), "batch_global": bp,
        "canvas": [h, w], **_mem(pcompiled),
    }
    print(f"[aot +{time.time() - t0:6.1f}s] predictor compiled: "
          f"{report['programs']['predictor_dp']}", flush=True)

    report["wall_s"] = round(time.time() - t0, 1)
    out = os.path.join(REPO, "SHARDCHECK.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"ok": True, "wall_s": report["wall_s"],
                      "programs": list(report["programs"])}))
    return 0


if __name__ == "__main__":
    if os.environ.get("_UWCV_AOT_CHILD") != "1":
        env = dict(os.environ)
        env["_UWCV_AOT_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child: never touch the tunnel
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={N_DEV}")
        env["XLA_FLAGS"] = " ".join(flags)
        sys.exit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env).returncode)
    sys.exit(main())
