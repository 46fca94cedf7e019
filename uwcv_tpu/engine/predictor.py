"""Predictor: the reference's ``DefaultPredictor`` + batch driver rebuilt as
one compiled XLA program per static batch shape (SURVEY.md §3.2).

The entire per-image pipeline — dynamic-scale resize (N8), Mask R-CNN
forward (N1-N5), full-image mask paste, and mask cleanup morphology (N12) —
runs on device in a single jit; the host only decodes images and receives
final padded Instances.  This removes the reference's per-image device
round-trips of whole mask stacks (nn_inference.py:325-327) and its 3×
redundant forward per image in the measurement sweep (SURVEY.md §3.3).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uwcv_tpu.config import Config
from uwcv_tpu.data.augment import pack_bitmasks
from uwcv_tpu.data.loader import load_image_rgb
from uwcv_tpu.models.rcnn import MaskRCNN
from uwcv_tpu.ops.mask_paste import paste_masks, paste_select_pack
from uwcv_tpu.ops.morphology import clean_head_masks
from uwcv_tpu.structures.instances import Instances
from uwcv_tpu.utils.image import pad_to_canvas, shortest_edge_scale


class Predictor:
    """predictor = Predictor(cfg, params); instances = predictor(bgr_or_path)

    Call signature mirrors the reference (nn_inference.py:227,321) but
    returns our padded ``Instances``; ``predict_batch`` amortizes compilation
    over folders of images (nn_inference.py:319 loop).
    """

    def __init__(self, cfg: Config, params, mask_postprocess: bool = True,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — batches are sharded
        over its data axis (one image slice per chip, params replicated),
        so folder inference scales across a slice with zero model-code
        change; the batch size must then be a multiple of the data-axis
        size.  Default: single-chip."""
        self.cfg = cfg
        bkt = cfg.input.canvas_bucket
        if bkt <= 0 or bkt % cfg.input.size_divisibility:
            raise ValueError(
                f"input.canvas_bucket must be a positive multiple of "
                f"size_divisibility={cfg.input.size_divisibility}, got {bkt}")
        model_cfg = cfg.model
        pure_dp = (mesh is not None and mesh.devices.size > 1
                   and mesh.shape[mesh.axis_names[1]] == 1)
        if mesh is not None and mesh.devices.size > 1 and not pure_dp:
            # dp×sp (spatially sharded) inference keeps the
            # SPMD-partitionable XLA pooler: pallas_call has no partitioning
            # rule for a spatially sharded canvas, so XLA would all-gather
            # the sharded feature maps onto every chip.  Pure-DP meshes keep
            # the fused kernel via shard_map below.
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, pooler_pallas=False)
        self.model = MaskRCNN(model_cfg)
        self.mask_postprocess = mask_postprocess
        self.pad_h, self.pad_w = cfg.input.pad_size_test
        self.mesh = mesh
        # ONE jit-wiring block for all three execution modes (the former
        # three hand-kept copies drifted by construction): the modes differ
        # only in (a) how params/batches are placed and (b) what wraps _run.
        # Params ride as a jit ARGUMENT (not trace-time closure constants)
        # so ``set_params`` swaps weights with no retrace — HPO shares one
        # compiled predictor across trials (hpo/study.py).  Host canvas:
        # images are padded (not resized) before transfer, the device
        # applies the dynamic-scale resample.
        default_mc = tuple(cfg.input.pad_size_test)
        jit_kwargs = {}
        if mesh is not None:
            from uwcv_tpu.parallel.mesh import batch_sharding, replicate

            self.params = replicate(params, mesh)
            self._batch_sharding = batch_sharding(mesh)
        else:
            self.params = params
            self._batch_sharding = None

        if pure_dp:
            # PURE data parallelism: every op in _run is per-image
            # independent, so shard_map runs the complete single-chip
            # program — fused Pallas pooler included — on each chip's batch
            # slice with zero communication (VERDICT r2 missing #5: the jit
            # path dropped to the 3.8× slower XLA pooler because pallas_call
            # has no SPMD partitioning rule; shard_map sidesteps the rule by
            # never partitioning the kernel at all).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            data_spec = P(mesh.axis_names[0])

            def run_fn(p, im, sc, os, mc=default_mc):
                f = shard_map(
                    lambda p, im, sc, os: self._run(im, sc, os, params=p,
                                                    model_canvas=mc),
                    mesh=mesh,
                    in_specs=(P(), data_spec, data_spec, data_spec),
                    out_specs=data_spec, check_vma=False)
                return f(p, im, sc, os)
        else:
            def run_fn(p, im, sc, os, mc=default_mc):
                return self._run(im, sc, os, params=p, model_canvas=mc)

            if mesh is not None:
                # dp×sp: let GSPMD partition _run from the arg shardings
                jit_kwargs["in_shardings"] = (
                    None, self._batch_sharding, self._batch_sharding,
                    self._batch_sharding)

        jit_p = jax.jit(run_fn, static_argnums=(4,), **jit_kwargs)
        self._jit_p = jit_p
        self._jit_run = lambda im, sc, os, mc=default_mc: jit_p(
            self.params, im, sc, os, mc)

    def set_params(self, params) -> None:
        """Swap weights WITHOUT recompiling — params are a jit argument, so
        any pytree with identical avals reuses the compiled program.  HPO
        amortizes the minutes-long predictor compile across trials this way
        (same static shapes, different fine-tuned weights)."""
        if self.model is None:
            raise ValueError("exported-artifact predictors have weights "
                             "baked into the program; rebuild via export")
        if self.mesh is not None:
            from uwcv_tpu.parallel.mesh import replicate

            self.params = replicate(params, self.mesh)
        else:
            self.params = params

    @classmethod
    def from_exported(cls, cfg: Config, path: str) -> "Predictor":
        """Serve a ``jax.export``ed inference artifact (engine/export.py):
        same host API, but the device program — weights included — loads
        from disk with no model build, no retrace, no params.  Batches
        smaller than the exported batch size are padded in and sliced out;
        images must fit the exported canvas."""
        from uwcv_tpu.engine.export import load_exported

        self = cls.__new__(cls)
        self.cfg = cfg
        self.model = None
        self.params = None
        self.mask_postprocess = True   # baked into the exported program
        self.pad_h, self.pad_w = cfg.input.pad_size_test
        self.mesh = None
        self._batch_sharding = None
        self._jit_p = None
        self._jit_run, self.exported_batch, self.exported_canvas = \
            load_exported(path)
        return self

    # -------- device program --------

    def _run(self, images: jnp.ndarray, scales: jnp.ndarray,
             out_sizes: jnp.ndarray, params=None, model_canvas=None):
        """images [B,Hc,Wc,3|1] uint8 host-padded; scales [B]; out_sizes
        [B,2] (true resized h,w) → padded detections + full-size masks.
        1-channel inputs are the grayscale-transfer fast path (the host
        ships one channel for grayscale batches); re-broadcast to RGB.
        ``params`` overrides self.params (the shard_map path must pass
        params as an argument — closed-over tracers are not allowed).

        ``model_canvas`` (STATIC (h,w), default = the config pad canvas):
        the canvas the model actually runs at.  ``stage_batch`` sets it to
        the 128-bucketed max resized extent of the batch, so a folder of
        1024×1280 micrographs runs the trunk/RPN/paste at 832×1024 instead
        of the worst-case 1024×1344 — 38% fewer pixels through EVERY
        image-scale stage (the reference's DefaultPredictor also runs
        per-image exact sizes; static bucketing is the TPU-shaped version).
        Distinct canvases compile distinct programs, O(few) per folder."""
        cfg = self.cfg
        params = params if params is not None else self.params
        mch, mcw = model_canvas or (self.pad_h, self.pad_w)
        if images.shape[-1] == 1:
            images = jnp.broadcast_to(
                images, images.shape[:-1] + (3,))

        def resize_one(img, scale):
            from uwcv_tpu.utils.image import device_resize

            return device_resize(img, scale, mch, mcw)

        # mask out pad region (resample ringing beyond the true extent)
        yy = jnp.arange(mch)[None, :, None]
        xx = jnp.arange(mcw)[None, None, :]
        inside = ((yy < out_sizes[:, 0][:, None, None])
                  & (xx < out_sizes[:, 1][:, None, None]))
        if images.shape[:3] == (images.shape[0], mch, mcw):
            # Unit-scale fast path: with input.host_resize (the default) the
            # host already resampled every image, so scale==1 for the whole
            # batch in the common case and the antialiased bilinear resample
            # below is an identity costing ~7 ms/batch-of-8 on chip
            # (measured).  Branch at runtime on the traced scales — both
            # sides compile once, only the taken side executes.
            resized = jax.lax.cond(
                jnp.all(scales == 1.0),
                lambda im: im.astype(jnp.float32) * inside[..., None],
                lambda im: (jax.vmap(resize_one)(im, scales)
                            * inside[..., None]),
                images)
        else:
            resized = (jax.vmap(resize_one)(images, scales)
                       * inside[..., None])

        dets, mask_probs = self.model.apply(
            params, resized, method=MaskRCNN.inference)
        if mask_probs is None:  # box-only (Faster R-CNN config, mask_on=False)
            return dets, None, dets.valid

        def paste_one(det, probs, out_size):
            pp = cfg.postprocess
            # the image's TRUE resized extent inside the batch-shared model
            # canvas: pasted pixels beyond it are not image content and must
            # not count toward min-pixel filters or survive into the packed
            # masks (Detectron2's detector_postprocess crops the same way;
            # to_instances clips the boxes correspondingly)
            extent = ((jnp.arange(mch) < out_size[0])[:, None]
                      & (jnp.arange(mcw) < out_size[1])[None, :])
            if self.mask_postprocess:
                # topology cleanup at head resolution (see clean_head_masks
                # docstring for why this is the TPU-correct placement), then
                # the FUSED paste→overlap-claim→filter→pack scan: one pass
                # over image scale instead of four [D,H,W] materializations
                # (60.3 → measured ladder in PERF.md r4); bit-identical to
                # the unfused chain (test_ops_morphology_paste.py)
                cleaned, single = clean_head_masks(
                    probs, 0.5,
                    do_fill_holes=pp.fill_holes,
                    do_smooth=pp.smooth,
                    drop_fragmented=pp.drop_fragmented)
                keep = det.valid & single
                keep &= det.scores >= pp.score_floor
                pdt = jnp.dtype(pp.paste_dtype)
                if pp.paste_chunk > 0:
                    packed, keep = paste_select_pack(
                        cleaned.astype(jnp.float32), det.boxes, keep,
                        det.scores, (mch, mcw),
                        min_pixels=pp.min_mask_pixels,
                        do_remove_overlaps=pp.remove_overlaps,
                        chunk=pp.paste_chunk, dtype=pdt, extent=extent)
                else:
                    from uwcv_tpu.ops.morphology import remove_overlaps

                    masks = paste_masks(cleaned.astype(jnp.float32),
                                        det.boxes, (mch, mcw), dtype=pdt)
                    masks &= extent[None]
                    if pp.remove_overlaps:
                        order = jnp.argsort(
                            -jnp.where(keep, det.scores, -jnp.inf),
                            stable=True)
                        masks = remove_overlaps(masks,
                                                order.astype(jnp.int32))
                    keep &= masks.sum(axis=(1, 2)) >= pp.min_mask_pixels
                    packed = pack_bitmasks(masks & keep[:, None, None])
            else:
                masks = paste_masks(probs, det.boxes, (mch, mcw))
                masks &= det.valid[:, None, None] & extent[None]
                keep = det.valid
                packed = pack_bitmasks(masks)
            # bit-packed for the device→host hop: [D,H,W/8] uint8, an 8×
            # cut of what dominates D2H traffic
            return packed, keep

        packed, keep = jax.vmap(paste_one)(dets, mask_probs, out_sizes)
        return dets, packed, keep

    # -------- host API --------

    def _prepare(self, image_rgb: np.ndarray):
        """Returns (ship_image, device_scale, unmap_scale, out_size).

        ``device_scale`` feeds the on-device resample; ``unmap_scale`` maps
        predicted boxes back to original-image pixels (they differ when the
        resize already happened on the host).
        """
        h, w = image_rgb.shape[:2]
        scale = shortest_edge_scale(
            h, w, self.cfg.input.test_short_edge, self.cfg.input.test_max_size)
        # ensure the scaled image fits the static pad; shrink further if not
        scale = min(scale, self.pad_h / h, self.pad_w / w)
        out_h = min(int(round(h * scale)), self.pad_h)
        out_w = min(int(round(w * scale)), self.pad_w)
        if self.cfg.input.host_resize and scale < 1.0:
            # downscales only: host-resizing an UPscale would ship scale²
            # MORE bytes over the link this feature exists to relieve —
            # small images ship raw and upsample on device
            # resize on host (reference DefaultPredictor behavior) — ships
            # scale² fewer pixels over the host-device link, which is the
            # measured bottleneck on remote-attached TPUs (PERF.md)
            from PIL import Image

            im = Image.fromarray(image_rgb).resize(
                (out_w, out_h), Image.BILINEAR)
            return np.asarray(im), 1.0, scale, (out_h, out_w)
        # ship raw pixels at their true size (batch-max, bucketed);
        # scale_and_translate resamples into the static pad canvas and
        # fills 0 beyond the input extent — padding the host canvas to
        # pad/scale (round-1 design) shipped up to 2x more bytes for
        # identical output
        return image_rgb, scale, scale, (out_h, out_w)

    def stage_batch(self, images_rgb: Sequence[np.ndarray]):
        """Host-prep a batch and place it on device.

        Returns ``(device_ops, unmap)``: ``device_ops`` feeds ``_jit_run``
        directly; ``unmap = (unmap_scales, out_sizes)`` maps results back to
        original-image coordinates.  Split from ``predict_batch_device`` so
        callers can separate TRANSFER from COMPUTE — bench.py's
        device-resident mode stages once and times only the pipeline, which
        is the per-chip capability number a local-host deployment sees
        (the tunnel-attached bench is link-bound, PERF.md sink #1)."""
        prepped = [self._prepare(im) for im in images_rgb]
        ch = max(p[0].shape[0] for p in prepped)
        cw = max(p[0].shape[1] for p in prepped)
        # bucket host canvases (input.canvas_bucket, default 128) so folders
        # with drifting image sizes compile O(few) programs instead of one
        # per distinct max-size (extra canvas is zeros; per-image
        # scale/out_size are unchanged, so results are identical)
        from uwcv_tpu.utils.image import bucket_up

        bkt = self.cfg.input.canvas_bucket
        raw_h, raw_w = ch, cw
        ch, cw = bucket_up(ch, bkt), bucket_up(cw, bkt)
        # Clamp to the pad canvas whenever the CONTENT already fits it
        # (host_resize outputs always do, by _prepare's scale clamp): the
        # model canvas below is clamped the same way, and since the pad dims
        # need not be 128-multiples (default pad_w=1344), a host canvas
        # bucketed PAST the pad would mismatch the model canvas on every
        # batch — permanently disabling _run's unit-scale fast path and
        # shipping dead zero columns over the link.  Raw-shipped images
        # LARGER than the pad keep their bucketed true size (the device
        # resample maps them into the model canvas; the fast path can't
        # apply there anyway because scale < 1).
        if raw_h <= self.pad_h:
            ch = min(ch, self.pad_h)
        if raw_w <= self.pad_w:
            cw = min(cw, self.pad_w)
        batch = np.stack([pad_to_canvas(p[0], ch, cw) for p in prepped])
        if (self.cfg.input.grayscale_transfer and batch.shape[-1] == 3
                and all(np.array_equal(p[0][..., 0], p[0][..., 1])
                        and np.array_equal(p[0][..., 0], p[0][..., 2])
                        for p in prepped)):
            # grayscale batch (SEM norm): ship one channel, 3× fewer bytes
            # over the link; _run re-broadcasts to RGB on device
            batch = batch[..., :1]
        # scale relative to the common canvas stays per-image
        scales = np.asarray([p[1] for p in prepped], np.float32)
        out_sizes = np.asarray([p[3] for p in prepped], np.int32)

        if self._batch_sharding is not None:
            # batch-axis shards go straight to their chips (no hop via dev 0)
            put = lambda x: jax.device_put(x, self._batch_sharding)
        else:
            put = jnp.asarray
        # model canvas = bucketed max RESIZED extent of the batch: the
        # trunk/RPN/paste run at the content size, not the worst-case pad
        # canvas (38% fewer pixels for the reference's 1024×1280 inputs —
        # see _run's model_canvas doc); never exceeds the config pad canvas
        # (scales are pre-clamped to fit it in _prepare)
        mch = min(bucket_up(int(out_sizes[:, 0].max()), bkt), self.pad_h)
        mcw = min(bucket_up(int(out_sizes[:, 1].max()), bkt), self.pad_w)
        return ((put(batch), put(scales), put(out_sizes), (mch, mcw)),
                ([p[2] for p in prepped], [p[3] for p in prepped]))

    def predict_batch_device(self, images_rgb: Sequence[np.ndarray],
                             block: bool = True):
        """Run a batch, returning DEVICE-resident results (blocked until
        complete unless ``block=False``, which lets callers pipeline many
        batches — XLA overlaps batch i's compute with batch i+1's host prep
        and transfer — and sync once at the end):
        (Detections, packed_masks [B,D,H,W/8] uint8|None,
        keep [B,D] bool, scales [B], out_sizes [B,2]).

        This is the reference ``DefaultPredictor`` contract — it returns GPU
        tensors and the *caller* pays any host transfer
        (nn_inference.py:325-327 pulls explicitly).  On remote-attached TPUs
        the transfer can dwarf compute, so keeping results on device until
        needed is the performance-critical default for pipelines that chain
        device work.
        """
        device_ops, unmap = self.stage_batch(images_rgb)
        dets, masks_packed, keep = self._jit_run(*device_ops)
        if block:
            # sync via a tiny (3 KB) host pull: on remote-attached TPUs
            # block_until_ready can return before execution completes, which
            # would make timings dispatch-only
            np.asarray(dets.scores)
        return dets, masks_packed, keep, unmap[0], unmap[1]

    def predict_batch(self, images_rgb: Sequence[np.ndarray]) -> List[Instances]:
        """Run a batch and pull results to host; input images may have
        arbitrary (per-image) sizes.

        Host canvases are grouped to one static size per call (the max over
        the batch) so each distinct folder shape compiles once.
        """
        return self.to_instances(self.predict_batch_device(images_rgb))

    def to_instances(self, device_out) -> List[Instances]:
        """Pull a ``predict_batch_device`` result to host Instances.

        Split from dispatch so callers can software-pipeline: dispatch
        batch i+1 (async), then pull batch i while i+1 computes — the
        folder-inference driver does this (engine/batch_inference.py)."""
        dets, masks_packed, keep, scales_list, out_sizes_list = device_out

        # single host pull per field (every extra device op here is a
        # dispatch round-trip on remote-attached TPUs), then C-speed
        # unpack/slice per image
        boxes_np = np.asarray(dets.boxes)
        scores_np = np.asarray(dets.scores)
        classes_np = np.asarray(dets.classes)
        valid_np = np.asarray(dets.valid) & np.asarray(keep)
        # Pull ONLY the valid-slot prefix of the packed masks: detection
        # slots are score-sorted, so every valid row sits inside the first
        # max_k rows — on the 34 MB/s tunnel the full [B, D, H, W/8] pull
        # was the folder driver's single largest cost (5.7 MB/img at D=50,
        # 896×1024) while real scenes carry 10-16 instances.  The [:, :k]
        # slice executes on device; only k/D of the bytes cross the link.
        # Host-side the masks re-pad to the full capacity with calloc'd
        # zeros (invalid rows), preserving the padded-Instances contract
        # ([D, H, W] with a valid mask) for every consumer.
        masks_np = None
        max_k = 0
        if masks_packed is not None:
            d_cap = masks_packed.shape[1]
            nz = np.nonzero(valid_np)
            max_k = int(nz[1].max()) + 1 if len(nz[1]) else 1
            if max_k < d_cap:
                masks_np = np.asarray(masks_packed[:, :max_k])
            else:
                masks_np = np.asarray(masks_packed)
        results = []
        for i, (scale, (oh, ow)) in enumerate(
                zip(scales_list, out_sizes_list)):
            masks_i = None
            if masks_np is not None:
                prefix = np.unpackbits(masks_np[i], axis=-1).astype(bool)
                if prefix.shape[0] < boxes_np.shape[1]:
                    masks_i = np.zeros(
                        (boxes_np.shape[1],) + prefix.shape[1:], bool)
                    masks_i[:prefix.shape[0]] = prefix
                else:
                    masks_i = prefix
            # clip to the true content extent in the model frame, THEN unmap
            # to original-image coordinates (Detectron2 detector_postprocess
            # clips the same way: the shared model canvas can exceed this
            # image's resized content, so a border instance can regress past
            # the real image edge — and past where its extent-clipped mask
            # can follow)
            boxes_i = boxes_np[i].copy()
            boxes_i[:, 0::2] = boxes_i[:, 0::2].clip(0.0, float(ow))
            boxes_i[:, 1::2] = boxes_i[:, 1::2].clip(0.0, float(oh))
            boxes_i /= scale
            inst = Instances(
                boxes=boxes_i,
                scores=scores_np[i],
                classes=classes_np[i],
                valid=valid_np[i],
                masks=masks_i,
                image_size=(oh, ow),
            )
            results.append(inst)
        return results

    def __call__(self, image) -> Instances:
        """Single image — accepts an RGB ndarray or a file path."""
        if isinstance(image, str):
            image = load_image_rgb(image)
        return self.predict_batch([image])[0]


def load_predictor(cfg: Config, weights: Optional[str] = None) -> Predictor:
    """Build a predictor from cfg.weights (orbax dir or torch .pth) —
    the reference's cfg.MODEL.WEIGHTS = model_final.pth flow
    (nn_inference.py:225).

    When the checkpoint dir (or its parent, for .../output_dir/model_final)
    carries the Trainer-written config.json, the MODEL section is adopted
    first so the graph matches the trained params — e.g. a checkpoint
    trained with 5 anchor aspect ratios cannot load into the default
    3-ratio model.  Explicitly-set inference knobs survive because only
    cfg.model is replaced (score thresholds etc. live there too, so the
    caller's cfg.model overrides are re-applied on top via _model_diff).
    """
    from uwcv_tpu.engine.checkpoint import load_weights

    from uwcv_tpu.models.rcnn import init_params

    path = weights or cfg.weights
    if path and os.path.isdir(path):
        adopt_checkpoint_model_cfg(cfg, path)
    model = MaskRCNN(cfg.model)
    params = init_params(model, jax.random.key(0))
    if path:
        params = load_weights(path, params, cfg.model)
    return Predictor(cfg, params)


# Inference-budget / runtime-backend knobs are NEVER adopted from a
# checkpoint's saved config: they do not define the trained params, and the
# running process's (possibly newer, workload-tuned) defaults must rule —
# e.g. a checkpoint saved when rpn_post_nms_topk_test defaulted to 1000
# must not silently undo today's measured-mAP-neutral 300 (PERF.md r4).
# Explicit caller overrides of any of them still win, like every other
# non-default caller field.
# derived from ModelConfig field metadata (config.py::model_fields_by_scope)
# so adding a runtime knob is a one-spot change — the literal-set version
# went stale twice in round 4 before c1b0dfc
from uwcv_tpu.config import model_fields_by_scope as _scope_fields

_RUNTIME_MODEL_FIELDS = _scope_fields("runtime")


def adopt_checkpoint_model_cfg(cfg: Config, ckpt_dir: str) -> bool:
    """Adopt the MODEL section of the Trainer-written config.json found in
    ``ckpt_dir`` or its parent (for .../output_dir/model_final layouts),
    in place.  Returns True if one was adopted.

    The caller's non-default model fields win over the saved ones — they
    are deliberate inference-time overrides (e.g. roi_score_thresh_test) —
    but params-defining fields (depth, anchor aspect ratios, head dims)
    come from the checkpoint, which is the only way a 5-anchor-ratio
    checkpoint can load into a process whose default graph has 3.  Pure
    runtime knobs (``_RUNTIME_MODEL_FIELDS``) keep the process's values.
    """
    import json as _json

    for d in (ckpt_dir, os.path.dirname(os.path.normpath(ckpt_dir))):
        cfg_json = os.path.join(d, "config.json")
        if not os.path.exists(cfg_json):
            continue
        with open(cfg_json) as f:
            saved = _json.load(f)
        if "model" not in saved:
            # some OTHER tool's config.json (no model section) inside the
            # ckpt dir must not shadow the Trainer-written parent config
            continue
        default = type(cfg.model)()
        caller_diff = {
            k: getattr(cfg.model, k)
            for k in vars(cfg.model)
            if getattr(cfg.model, k) != getattr(default, k)
        }
        before = cfg.model
        cfg.model = Config.from_dict({"model": saved["model"]}).model
        for k in _RUNTIME_MODEL_FIELDS:
            setattr(cfg.model, k, getattr(before, k))
        for k, v in caller_diff.items():
            setattr(cfg.model, k, v)
        return True
    return False
