"""In-graph NMS formulation shootout on the current platform (PERF.md r3).

Per-level RPN NMS exposed a formulation question the standalone-call r2
measurement hid: the greedy Pallas kernel is SEQUENTIAL (N fori_loop steps
of O(N) VPU work — latency-bound at ~2-3 ms per problem regardless of
occupancy), while the XLA fixpoint is ~chain-depth (≈10-15) MXU matvecs.
Inside one compiled program running 40 NMS problems per batch (5 levels × 8
images), the fixpoint's parallelism wins; this tool measures all three
arrangements to keep that decision evidence-based.

Usage: python tools/nms_bench.py   (chip attached; ~2 min, small compiles)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)

    B, L, N = 8, 5, 1024
    rng = np.random.default_rng(0)
    ctr = rng.uniform(50, 950, (B, L, N, 2))
    wh = rng.uniform(20, 200, (B, L, N, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype("f")
    scores = -np.sort(-rng.uniform(0, 1, (B, L, N)).astype("f"), axis=-1)

    boxes_j = jnp.asarray(boxes)
    scores_j = jnp.asarray(scores)

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # force sync
        t = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t) / n * 1e3

    import uwcv_tpu.ops.nms as nms_mod

    # (1) per-level Pallas greedy kernel (current dispatch for n<=1024)
    @jax.jit
    def per_level(bx, sc):
        return jax.vmap(jax.vmap(
            lambda b, s: nms_mod.nms_mask(b, s, 0.7)))(bx, sc)

    # (2) per-level XLA fixpoint (kernel disabled)
    def fixpoint_mask(b, s):
        os.environ["UWCV_DISABLE_PALLAS"] = "1"
        try:
            return nms_mod.nms_mask(b, s, 0.7)
        finally:
            del os.environ["UWCV_DISABLE_PALLAS"]

    @jax.jit
    def per_level_xla(bx, sc):
        return jax.vmap(jax.vmap(
            lambda b, s: fixpoint_mask(b, s)))(bx, sc)

    # (3) concatenated level-offset fixpoint (round-2 arrangement, n=5N)
    @jax.jit
    def concat_xla(bx, sc):
        off = jnp.arange(L, dtype=jnp.float32)[None, :, None, None] * 4000.0
        bb = (bx + off).reshape(B, L * N, 4)
        ss = sc.reshape(B, L * N)
        return jax.vmap(lambda b, s: fixpoint_mask(b, s))(bb, ss)

    r = {}
    r["per_level_pallas_ms"] = timeit(per_level, boxes_j, scores_j)
    r["per_level_xla_fixpoint_ms"] = timeit(per_level_xla, boxes_j, scores_j)
    r["concat_xla_fixpoint_ms"] = timeit(concat_xla, boxes_j, scores_j)

    # agreement check (per-level arrangements must match exactly)
    k1 = np.asarray(per_level(boxes_j, scores_j))
    k2 = np.asarray(per_level_xla(boxes_j, scores_j))
    r["pallas_vs_xla_identical"] = bool((k1 == k2).all())

    for k, v in r.items():
        print(f"{k}: {v if isinstance(v, bool) else round(v, 2)}",
              flush=True)


if __name__ == "__main__":
    main()
