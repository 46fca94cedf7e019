"""Host input pipeline: decode → resize → rasterize → pack → prefetch.

Replaces the reference's torch DataLoader with 2 worker processes
(nn_train.py:199, SURVEY.md N14) with a thread-pool prefetch pipeline feeding
device-resident batches:

  worker threads:  PIL decode → exact resize to train_size → polygon scale →
                   PIL rasterize GT masks → bit-pack (8× smaller H2D)
  main thread:     collate fixed-shape numpy batch → jax.device_put
  device (in the train step): unpack bits, augment, normalize

Everything leaving this module has a *static* shape: image
[B, S, S, 3] uint8, boxes [B, N, 4] f32, packed masks [B, N, S, S/8] uint8,
classes [B, N] i32, valid [B, N] bool — so the train step compiles exactly
once.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from uwcv_tpu.config import Config
from uwcv_tpu.data.rasterize import polygons_to_mask


def load_image_rgb(path: str) -> np.ndarray:
    """Decode any supported image (incl. .tif via PIL) to HWC uint8 RGB.

    SEM micrographs are commonly 16-bit grayscale TIFFs; PIL's
    ``convert("RGB")`` on I;16 modes CLIPS at 255 (mostly-white garbage).
    Scale 16→8 bit by /256 first — the same conversion the reference's
    ``cv2.imread`` default applies to 16-bit inputs (nn_inference.py:321
    reads with cv2)."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode in ("I;16", "I;16B", "I;16L", "I;16N"):
            arr = np.asarray(im, dtype=np.uint32)
            arr = np.right_shift(arr, 8).clip(0, 255).astype(np.uint8)
            im = Image.fromarray(arr)
        elif im.mode == "I":
            # 32-bit int container: usually 16-bit TIFF data, but can hold
            # true 32-bit or already-8-bit values — scale by observed range
            # instead of assuming 16 bits
            arr = np.asarray(im, dtype=np.int64).clip(0, None)
            peak = int(arr.max()) if arr.size else 0
            if peak > 65535:
                arr = arr * (255.0 / peak)
            elif peak > 255:
                arr = np.right_shift(arr, 8)
            im = Image.fromarray(arr.clip(0, 255).astype(np.uint8))
        im = im.convert("RGB")
        return np.asarray(im, dtype=np.uint8)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    from PIL import Image

    if img.shape[0] == out_h and img.shape[1] == out_w:
        return img
    return np.asarray(
        Image.fromarray(img).resize((out_w, out_h), Image.BILINEAR),
        dtype=np.uint8)


def prepare_train_sample(record: Dict, cfg: Config,
                         n_max: Optional[int] = None) -> Dict[str, np.ndarray]:
    """One dataset dict → fixed-shape numpy sample at train resolution.

    Mirrors the reference's Resize((800,800)) + annotation transform
    (nn_train.py:135, utils.transform_instance_annotations): boxes and
    polygons are scaled by (out/in) per axis, masks rasterized at the output
    resolution.  Empty-after-transform instances are dropped
    (filter_empty_instances, nn_train.py:154).

    ``n_max`` overrides the padded GT capacity (TrainLoader passes its
    dataset-tightened cap — see InputConfig.auto_gt_cap).
    """
    s_h, s_w = cfg.input.train_size
    img = load_image_rgb(record["file_name"])
    in_h, in_w = img.shape[:2]
    img = resize_image(img, s_h, s_w)
    sx, sy = s_w / in_w, s_h / in_h

    n_max = n_max if n_max is not None else cfg.input.max_gt_instances
    boxes = np.zeros((n_max, 4), np.float32)
    classes = np.zeros((n_max,), np.int32)
    valid = np.zeros((n_max,), bool)
    masks = np.zeros((n_max, s_h, s_w), bool)

    i = 0
    for ann in record.get("annotations", []):
        if i >= n_max:
            break
        if ann.get("iscrowd", 0):
            # Detectron2 DatasetMapper trains only on iscrowd==0 objects
            # (the reference inherits this at nn_train.py:150); crowd
            # regions are eval-side ignore-matches, never train targets
            continue
        bx = np.asarray(ann["bbox"], np.float64) * [sx, sy, sx, sy]
        # clip to the train canvas (D2 transform_instance_annotations clips
        # boxes to image bounds) — the SA parser can emit polygons slightly
        # past the border, and an unclipped box disagrees with the
        # canvas-clipped rasterized mask, teaching out-of-frame regression
        bx = np.clip(bx, [0, 0, 0, 0], [s_w, s_h, s_w, s_h])
        if bx[2] - bx[0] <= 1e-3 or bx[3] - bx[1] <= 1e-3:
            continue
        polys = [
            (np.asarray(p, np.float64).reshape(-1, 2) * [sx, sy]).reshape(-1)
            for p in ann["segmentation"]
        ]
        m = polygons_to_mask(polys, s_h, s_w)
        if not m.any():
            continue  # empty instance after transform
        boxes[i] = bx
        classes[i] = ann["category_id"]
        masks[i] = m
        valid[i] = True
        i += 1

    return {
        "image": img,  # uint8 HWC RGB — normalized on device
        "boxes": boxes,
        "classes": classes,
        "valid": valid,
        "masks_packed": np.packbits(masks, axis=-1),
        "num_instances": np.int32(i),
    }


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def _compact_sample(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Trim the padded mask rows for caching (only ``num_instances`` rows are
    non-zero; the rest re-pad for free at batch time)."""
    k = int(sample["num_instances"])
    out = dict(sample)
    # .copy(), NOT ascontiguousarray: a leading slice of a C-contiguous
    # array is already contiguous, so ascontiguousarray returns a VIEW that
    # keeps the full [n_max, H, W/8] buffer alive — the cache would retain
    # n_max/k more RAM than _cache_bytes accounts for
    out["masks_packed"] = sample["masks_packed"][:k].copy()
    return out


def _expand_sample(compact: Dict[str, np.ndarray],
                   n_max: int) -> Dict[str, np.ndarray]:
    mp = compact["masks_packed"]
    full = np.zeros((n_max,) + mp.shape[1:], mp.dtype)
    full[:mp.shape[0]] = mp
    out = dict(compact)
    out["masks_packed"] = full
    return out


def _sample_nbytes(sample: Dict[str, np.ndarray]) -> int:
    return sum(int(np.asarray(v).nbytes) for v in sample.values())


class TrainLoader:
    """Infinite shuffled loader with threaded decode workers.

    Yields host numpy batches; callers do jax.device_put / sharding (the
    engine owns placement so multi-host sharding stays in one spot).

    When ``cfg.data.cache_prepared`` is on (default), each record's prepared
    sample (decode → resize → rasterize → pack, all pre-augment and therefore
    deterministic — augmentation is on-device with a per-step key) is cached
    in RAM after first preparation, up to ``cfg.data.cache_prepared_mb``.
    Epoch 2+ then costs only collate + device_put.  See DataConfig for the
    measured rationale.
    """

    def __init__(self, dataset: List[Dict], cfg: Config, seed: int = 0,
                 num_workers: Optional[int] = None,
                 process_index: int = 0, process_count: int = 1):
        """``process_index``/``process_count``: multi-host input sharding
        (SURVEY §2c).  Every process seeds the same rng, draws the same
        global permutation, and takes the disjoint slice
        ``order[process_index::process_count]`` — so the union of all
        processes' streams is exactly one pass over the data per epoch, with
        no coordination traffic.  ``cfg.solver.ims_per_batch`` stays the
        GLOBAL batch; each process yields its ims_per_batch/process_count
        local slice (parallel/mesh.py shard_batch assembles the global
        array).  Defaults = single-process, unchanged behavior."""
        if not dataset:
            raise ValueError("empty dataset")
        if not 0 <= process_index < process_count:
            raise ValueError(f"process_index {process_index} not in "
                             f"[0, {process_count})")
        if len(dataset) < process_count:
            # order[pid::pcount] would be EMPTY for some process and its
            # _index_stream would spin forever without yielding — a silent
            # deadlock holding the index lock, not an error
            raise ValueError(
                f"dataset has {len(dataset)} samples < process_count "
                f"{process_count}: at least one sample per process is "
                f"required for multi-host input sharding")
        if process_count > 1 and cfg.solver.ims_per_batch % process_count:
            raise ValueError(
                f"global batch {cfg.solver.ims_per_batch} must divide by "
                f"process_count {process_count}")
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = cfg.solver.ims_per_batch // process_count
        self.process_index = process_index
        self.process_count = process_count
        # floor the EXPLICIT argument too: zero workers would deadlock
        # __iter__ on an empty queue with no error
        self.num_workers = max(1, num_workers if num_workers is not None
                               else cfg.data.num_workers)
        # dataset-tightened static GT capacity (InputConfig.auto_gt_cap):
        # observed max annotation count, rounded to 8, capped by the config
        # cap.  Annotation count is an upper bound on post-transform valid
        # instances (empty-after-transform ones are dropped), so no record
        # loses instances vs the config cap.  All multi-host processes scan
        # the same dataset → identical cap → identical compiled shapes.
        self.n_max = cfg.input.max_gt_instances
        if cfg.input.auto_gt_cap:
            observed = max(len(r.get("annotations", [])) for r in dataset)
            self.n_max = min(self.n_max, max(8, -(-observed // 8) * 8))
        self.rng = np.random.default_rng(seed)
        self._q: "queue.Queue" = queue.Queue(maxsize=cfg.data.prefetch_depth)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._cache_lock = threading.Lock()
        self._cache_bytes = 0
        self._cache_budget = (int(cfg.data.cache_prepared_mb) * (1 << 20)
                              if cfg.data.cache_prepared else 0)

    def _prepared(self, idx: int) -> Dict[str, np.ndarray]:
        """prepare_train_sample with the optional in-RAM cache."""
        if self._cache_budget <= 0:
            return prepare_train_sample(self.dataset[idx], self.cfg,
                                        n_max=self.n_max)
        with self._cache_lock:
            hit = self._cache.get(idx)
        if hit is not None:
            return _expand_sample(hit, self.n_max)
        sample = prepare_train_sample(self.dataset[idx], self.cfg,
                                      n_max=self.n_max)
        compact = _compact_sample(sample)
        nb = _sample_nbytes(compact)
        with self._cache_lock:
            # two workers may race to the same miss: deterministic sample,
            # insert-once accounting
            if idx not in self._cache \
                    and self._cache_bytes + nb <= self._cache_budget:
                self._cache[idx] = compact
                self._cache_bytes += nb
        return sample

    def _index_stream(self) -> Iterator[int]:
        while True:
            order = self.rng.permutation(len(self.dataset))
            for idx in order[self.process_index::self.process_count]:
                yield int(idx)

    # ---- device-resident dataset (fine-tune-scale datasets) ----

    def device_dataset(self, mesh=None, budget_mb: Optional[int] = None):
        """Prepare EVERY record once, stack, and stage in HBM — the
        TPU-first input path for fine-tune-scale datasets (the reference's
        whole regime is 10-100 images, nn_train.py:188).

        Returns the device-resident pytree {image [N,S,S,3] u8, boxes,
        classes, valid, masks_packed} (replicated over ``mesh`` when
        given), or None when the stacked arrays exceed the byte budget
        (``cfg.data.device_dataset_mb``) — callers fall back to the
        streaming path.

        Why this exists (PERF.md r5): with per-step streaming every
        training step ships ~6.5 MB host→device; on remote-attached chips
        that (a) saturates the 34 MB/s tunnel in parallel with compute —
        the measured 0.19 s/iter wall vs the 0.075 s device-resident step
        is mostly link — and (b) trips a host-side per-transfer leak in
        the remote client (~transferred bytes retained per device_put;
        measured 6.1 MB/iter, OOM at ~19k iters on a 128 GB host).  The
        64-image quality dataset is ~205 MB staged once; per-step H2D
        drops to one [B] int32 index vector.
        """
        budget = budget_mb if budget_mb is not None else getattr(
            self.cfg.data, "device_dataset_mb", 2048)
        if budget <= 0:
            return None
        samples = [self._prepared(i) for i in range(len(self.dataset))]
        keys = ("image", "boxes", "classes", "valid", "masks_packed")
        stacked = {k: np.stack([s[k] for s in samples]) for k in keys}
        nbytes = sum(v.nbytes for v in stacked.values())
        if nbytes > budget * (1 << 20):
            return None
        import jax

        if mesh is not None:
            # replicated over the mesh (1-device meshes included: HPO
            # device-group trials must stage on THEIR device, not device 0)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            return {k: jax.device_put(v, rep) for k, v in stacked.items()}
        return {k: jax.device_put(v) for k, v in stacked.items()}

    def index_batches(self) -> Iterator[np.ndarray]:
        """Infinite [batch_size] int32 index batches — the same epoch
        shuffle semantics as the streaming worker path (identical rng)."""
        stream = self._index_stream()
        while True:
            yield np.array([next(stream) for _ in range(self.batch_size)],
                           np.int32)

    def start(self) -> "TrainLoader":
        idx_stream = self._index_stream()
        idx_lock = threading.Lock()

        def worker():
            while not self._stop.is_set():
                samples = []
                with idx_lock:
                    idxs = [next(idx_stream) for _ in range(self.batch_size)]
                for i in idxs:
                    samples.append(self._prepared(i))
                batch = collate(samples)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        for _ in range(self.num_workers):
            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def __iter__(self):
        if not self._threads:
            self.start()
        while True:
            yield self._q.get()

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads.clear()
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except queue.Empty:
                break


def list_inference_images(directory: str,
                          exts: Sequence[str] = (".tif", ".tiff", ".png",
                                                 ".jpg", ".jpeg")) -> List[str]:
    """Image files in a folder, sorted (reference lists .tif only,
    nn_inference.py:309-311; we accept the common formats)."""
    import os

    out = [os.path.join(directory, f) for f in sorted(os.listdir(directory))
           if os.path.splitext(f)[1].lower() in exts]
    return out
