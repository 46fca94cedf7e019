"""Two-process multi-host dryrun: a REAL ``jax.distributed`` train step.

Proves the SURVEY §2c comm-backend row end-to-end without a pod: two OS
processes on localhost, each owning 4 virtual CPU devices, join one
``jax.distributed`` cluster (gloo CPU collectives), build ONE global 8-device
mesh, pull disjoint per-process batch slices through
``TrainLoader(process_index/process_count)``, assemble the global batch with
``jax.make_array_from_process_local_data`` (parallel/mesh.py shard_batch),
and run one jit-compiled training step.  Both processes must report the
identical finite loss — the scalar only agrees if the cross-process gradient
``psum`` actually ran over the distributed backend.

Usage:  python tools/multihost_dryrun.py            # parent: spawns 2 procs
        (writes MULTIHOST_DCN.json at the repo root on success)

The real-pod path differs only in transport (ICI/DCN instead of localhost
gloo) and device count — the wiring under test (initialize → global mesh →
per-process input sharding → global-array assembly → SPMD step) is
byte-identical, driven by ``parallel.multi_host`` config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
DEV_PER_PROC = 4


def child(pid: int, port: int, data_root: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from uwcv_tpu.config import Config
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.data.superannotate import get_superannotate_dicts
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.parallel.mesh import (
        build_mesh,
        initialize_multi_host,
        shard_batch,
    )

    cfg = Config()
    cfg.parallel.multi_host = True
    cfg.parallel.coordinator_address = f"localhost:{port}"
    cfg.parallel.num_processes = N_PROCS
    cfg.parallel.process_id = pid
    # contended-CI tolerance: on a busy 1-core host the tiny-model compile
    # can outlast the default 100 s heartbeat window, and the first process
    # to finish waits at the shutdown barrier while its peer still compiles
    mh_to = int(os.environ.get("UWCV_MH_TIMEOUT", "1800"))
    cfg.parallel.init_timeout_s = mh_to
    cfg.parallel.heartbeat_timeout_s = mh_to
    cfg.parallel.shutdown_timeout_s = mh_to

    multi = initialize_multi_host(cfg.parallel)
    assert multi, "expected a multi-process runtime"
    assert jax.process_count() == N_PROCS, jax.process_count()
    n_global = N_PROCS * DEV_PER_PROC
    assert jax.device_count() == n_global, jax.device_count()
    assert len(jax.local_devices()) == DEV_PER_PROC

    # tiny train config (mirrors __graft_entry__.dryrun_multichip): the
    # dryrun validates distributed wiring, not FLOPs
    cfg.model.depth = 26
    cfg.model.dtype = "float32"
    cfg.model.rpn_pre_nms_topk_train = 64
    cfg.model.rpn_post_nms_topk_train = 32
    cfg.model.rpn_batch_size_per_image = 16
    cfg.model.roi_batch_size_per_image = 8
    cfg.input.train_size = (64, 64)
    cfg.input.pad_size_train = (64, 64)
    cfg.input.max_gt_instances = 8
    cfg.solver.ims_per_batch = n_global        # GLOBAL batch, 1/device
    cfg.parallel.mesh_shape = (-1, 1)          # pure DP across both hosts
    cfg.data.classes_csv = os.path.join(data_root, "classes.csv")

    mesh = build_mesh(cfg.parallel)
    assert mesh.devices.size == n_global

    # per-process input sharding: disjoint slices of one global permutation
    dicts = get_superannotate_dicts(os.path.join(data_root, "Train"))
    loader = TrainLoader(dicts, cfg, seed=0, num_workers=1,
                         process_index=pid, process_count=N_PROCS).start()
    try:
        local = next(iter(loader))
        assert local["image"].shape[0] == n_global // N_PROCS, \
            local["image"].shape
        t0 = time.time()
        trainer = Trainer(cfg, mesh=mesh)
        trainer.init_state()
        sharded = shard_batch(local, mesh)    # global array from local shard
        leaf = jax.tree_util.tree_leaves(sharded)[0]
        assert leaf.shape[0] == n_global, leaf.shape
        assert leaf.sharding.spec[0] == mesh.axis_names[0]
        import jax.numpy as jnp

        state, metrics = trainer._step_fn(
            trainer.state, sharded, jax.random.key(0))
        total = float(metrics["total_loss"])
        print(f"MULTIHOST pid={pid} procs={jax.process_count()} "
              f"devices={jax.device_count()} loss={total:.6f} "
              f"step_wall={time.time() - t0:.1f}s", flush=True)
    finally:
        loader.stop()
    return 0


def parent() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    data_root = "/tmp/uwcv_multihost_ds"
    if not os.path.isdir(os.path.join(data_root, "Train")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child: never touch the tunnel
        subprocess.run(
            [sys.executable, "-c",
             "from uwcv_tpu.data.synthetic import generate_dataset;"
             f"generate_dataset({data_root!r}, num_train=8, num_test=2,"
             "num_inference=1, image_size=(64, 64), seed=11)"],
            check=True, env=env, cwd=REPO)

    procs = []
    for pid in range(N_PROCS):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # CPU-only child must never touch the TPU tunnel: the axon
        # sitecustomize registers its PJRT plugin whenever this var is set
        # and get_backend then blocks on a down tunnel even under cpu
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
        env["XLA_FLAGS"] = " ".join(flags)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(pid),
             str(port), data_root],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs, ok, losses = [], True, []
    deadline = time.monotonic() + int(os.environ.get("UWCV_MH_TIMEOUT",
                                                     "1800"))
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(
                timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            # a stalled child (e.g. coordination-service hang on a contended
            # host) must not orphan EITHER spinning process on the CI host's
            # single core — kill the whole set and report the failure
            for q in procs:
                if q.poll() is None:
                    q.kill()
            out, _ = p.communicate()
            out = (out or "") + "\n[parent] TIMEOUT: child killed"
            ok = False
        outs.append(out)
        ok &= p.returncode == 0
        for line in out.splitlines():
            if line.startswith(f"MULTIHOST pid={pid}"):
                losses.append(float(line.split("loss=")[1].split()[0]))
    same_loss = len(losses) == N_PROCS and all(
        abs(l - losses[0]) < 1e-6 for l in losses)
    payload = {
        "ok": bool(ok and same_loss),
        "n_processes": N_PROCS,
        "devices_per_process": DEV_PER_PROC,
        "losses": losses,
        "loss_agreement": same_loss,
        "tail": "\n".join("\n".join(o.strip().splitlines()[-3:])
                          for o in outs),
    }
    out_path = os.environ.get(
        "UWCV_MH_OUT", os.path.join(REPO, "MULTIHOST_DCN.json"))
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: payload[k] for k in
                      ("ok", "n_processes", "losses", "loss_agreement")}))
    if not payload["ok"]:
        for o in outs:
            print("---- child output ----")
            print(o[-3000:])
        return 1
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        sys.exit(child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]))
    sys.exit(parent())
