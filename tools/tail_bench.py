"""Microbench: the image-scale mask tail (paste→overlap→filter→pack).

Compares the unfused chain against paste_select_pack at several chunk sizes,
batch-32 production scale, on the current platform.  Timing uses a forced
4-byte host pull (axon block_until_ready returns early — see PERF.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from uwcv_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uwcv_tpu.data.augment import pack_bitmasks
    from uwcv_tpu.ops.mask_paste import paste_masks, paste_select_pack
    from uwcv_tpu.ops.morphology import remove_overlaps

    b = int(os.environ.get("UWCV_BENCH_BATCH", "32"))
    d, m, h, w = 100, 28, 1024, 1344
    rng = np.random.default_rng(0)
    probs = jnp.asarray(rng.uniform(0, 1, (b, d, m, m)), jnp.float32)
    x1 = rng.uniform(0, w - 300, (b, d))
    y1 = rng.uniform(0, h - 300, (b, d))
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(20, 280, (b, d)),
         y1 + rng.uniform(20, 280, (b, d))], axis=-1), jnp.float32)
    keep = jnp.asarray(rng.uniform(size=(b, d)) < 0.3)   # ~30 dets/img
    scores = jnp.asarray(rng.uniform(0.1, 1, (b, d)), jnp.float32)

    def unfused(probs, boxes, keep, scores):
        def one(p, bx, k, s):
            masks = paste_masks(p, bx, (h, w))
            order = jnp.argsort(-jnp.where(k, s, -jnp.inf), stable=True)
            masks = remove_overlaps(masks, order.astype(jnp.int32))
            k2 = k & (masks.sum(axis=(1, 2)) >= 2)
            return pack_bitmasks(masks & k2[:, None, None]), k2
        return jax.vmap(one)(probs, boxes, keep, scores)

    def fused(chunk):
        def f(probs, boxes, keep, scores):
            def one(p, bx, k, s):
                return paste_select_pack(p, bx, k, s, (h, w), min_pixels=2,
                                         chunk=chunk)
            return jax.vmap(one)(probs, boxes, keep, scores)
        return f

    from uwcv_tpu.utils.experiment import best_time

    def timeit(fn, label):
        jfn = jax.jit(fn)
        np.asarray(jfn(probs, boxes, keep, scores)[0][0, 0, 0, 0])  # compile
        best = best_time(
            lambda: np.asarray(jfn(probs, boxes, keep, scores)[0][0, 0, 0, 0]),
            n=4)
        print(f"{label:24s} {best * 1000:8.1f} ms/batch-{b}", flush=True)
        return best

    timeit(unfused, "unfused")
    for chunk in (10, 20, 25, 50, 100):
        timeit(fused(chunk), f"fused chunk={chunk}")


if __name__ == "__main__":
    main()
