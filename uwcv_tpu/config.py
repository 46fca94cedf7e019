"""Configuration system.

The reference hard-codes every knob as a module-level constant inside its
entry scripts (paths at nn_train.py:166,188; thresholds at
nn_inference.py:188-189,226; solver at nn_train.py:201-206; measurement
calibration at nn_inference.py:409).  Here the same knob set becomes one
typed dataclass tree with dotted-path CLI overrides, so every reference
constant has a named, documented home.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    """Mask R-CNN architecture knobs (reference: Detectron2 model-zoo
    COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x.yaml, nn_train.py:196)."""

    # Backbone
    depth: int = 50                       # 50 or 101 (reference trains 101, benches R50)
    fpn_channels: int = 256
    # Box-head FC width (Detectron2 MODEL.ROI_BOX_HEAD.FC_DIM).  1024 is
    # the zoo default; small values shrink the dominant parameter block
    # (fc1 is fpn_channels·7·7·fc_dim) — used by the committed CI gate
    # checkpoint (tools/make_gate_ckpt.py)
    box_fc_dim: int = 1024
    num_classes: int = 4                  # nn_train.py:206
    mask_on: bool = True
    # Compute dtype for the conv trunk (MXU-friendly)
    dtype: str = "bfloat16"
    # Pixel normalization (Detectron2 R50/R101 caffe-style BGR means, std=1)
    pixel_mean: Tuple[float, float, float] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    input_format: str = "BGR"             # DefaultPredictor default

    # Anchors (Detectron2 FPN defaults)
    anchor_sizes: Tuple[Tuple[float, ...], ...] = (
        (32.0,), (64.0,), (128.0,), (256.0,), (512.0,))
    anchor_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_stride_levels: Tuple[int, ...] = (4, 8, 16, 32, 64)  # P2..P6

    # RPN
    rpn_pre_nms_topk_train: int = field(
        default=2000, metadata={"scope": "train"})    # per level
    rpn_pre_nms_topk_test: int = field(
        default=1000, metadata={"scope": "runtime"})
    # Use TPU-native approximate top-k (jax.lax.approx_max_k, the
    # PartialReduce-based op) for the per-level pre-NMS candidate selection
    # instead of a full sort-based top_k.  The p2 objectness map carries
    # H/4·W/4·A logits (~287k at the 896×1024 canvas with 5 anchor ratios) —
    # a full top-k there is sort-bound VPU work for 1000 survivors.
    # Measured on chip: +4.3% img/s @32 (119.5→124.7, PERF.md r4);
    # held-out mAP NEUTRAL on the R50 retrain checkpoint (segm 0.6486 vs
    # 0.6477) but a small real cost on the R101 headline checkpoint
    # (segm 0.6914 vs 0.6969, bbox 0.7703 vs 0.7816) — so, like the budget
    # knobs, A/B per deployed checkpoint (tools/topk_ab.py) before
    # enabling.  OFF by default = exact Detectron2 candidate selection.
    rpn_approx_topk: bool = field(
        default=False, metadata={"scope": "runtime"})
    rpn_approx_topk_recall: float = field(
        default=0.95, metadata={"scope": "runtime"})
    rpn_post_nms_topk_train: int = field(
        default=1000, metadata={"scope": "train"})
    # Detectron2's zoo default, kept as OUR default because smaller
    # budgets proved checkpoint-FRAGILE: 300 measured mAP-neutral on one
    # trained checkpoint (segm 0.6034 vs 0.6022, tools/topk_ab.py) but on
    # a same-recipe retrain it zeroed the thin scale-bar class and halved
    # class1 (segm 0.471@300 vs 0.648@1000; knee 300/400→class0 0.0,
    # 500→0.11, 700→full recovery — tools/eval_probe.py, QUALITY.md).
    # The cut is one GLOBAL top-k over per-level-NMS survivors, so a level
    # whose objectness calibrates low is silently starved.  Cutting this
    # is still the largest single inference win (~+15% img/s @32 at 300,
    # PERF.md r4) — tune it per DEPLOYED CHECKPOINT with tools/topk_ab.py
    # + per-class eval_probe.py, never from another checkpoint's A/B.
    rpn_post_nms_topk_test: int = field(
        default=1000, metadata={"scope": "runtime"})
    # Per-level minimum quota inside the cross-level post-NMS budget
    # (0 = off = pure Detectron2 global top-k).  With floor=m, each FPN
    # level's top-m NMS survivors are guaranteed slots before the rest of
    # the budget is filled by global objectness rank.  This removes the
    # budget cut's starvation mode measured in QUALITY.md: RPN objectness
    # calibrates differently per level and per checkpoint, so a global cut
    # can hand one level 45% of a 300 budget while the level carrying a
    # whole class drops from 33% to 16% (tools/proposal_budget_diag.py).
    # Applies at inference only (training keeps Detectron2 semantics —
    # sampling already class-balances there).
    rpn_post_nms_level_floor: int = field(
        default=0, metadata={"scope": "runtime"})
    rpn_nms_thresh: float = 0.7
    rpn_batch_size_per_image: int = field(
        default=256, metadata={"scope": "train"})
    rpn_positive_fraction: float = field(
        default=0.5, metadata={"scope": "train"})
    rpn_fg_iou_thresh: float = field(
        default=0.7, metadata={"scope": "train"})
    rpn_bg_iou_thresh: float = field(
        default=0.3, metadata={"scope": "train"})
    rpn_bbox_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    rpn_smooth_l1_beta: float = field(
        default=0.0, metadata={"scope": "train"})       # pure L1, Detectron2 default

    # ROI heads
    roi_batch_size_per_image: int = field(
        default=32, metadata={"scope": "train"})    # nn_train.py:205
    roi_positive_fraction: float = field(
        default=0.25, metadata={"scope": "train"})
    roi_fg_iou_thresh: float = field(
        default=0.5, metadata={"scope": "train"})
    roi_score_thresh_test: float = field(
        default=0.80, metadata={"scope": "runtime"})   # nn_inference.py:226 (0.45 in backup_main.py:247)
    roi_nms_thresh_test: float = field(
        default=0.5, metadata={"scope": "runtime"})
    # Static output-slot cap after per-class NMS.  Detectron2's default is
    # 100 (what the reference inherits untuned); every downstream stage —
    # mask head, paste, overlap removal, bit-pack — carries [B, D, ...]
    # shapes, so D scales the whole post-box tail.  polyHIPE micrographs
    # carry tens of instances: 100/50/32 measure IDENTICAL held-out mAP to
    # 4 decimals (segm 0.6022, tools/topk_ab.py sweep mode), while 50 runs
    # 124.6 → 143.4 img/s @32 device-resident on chip (+15%; 32 reaches
    # 150.9 but leaves less headroom for denser scenes — PERF.md r4).
    # Set 100 to mirror Detectron2 exactly.
    detections_per_image: int = field(
        default=50, metadata={"scope": "runtime"})
    # NMS candidate cap before the greedy loop: the R×C score matrix has
    # rpn_post_nms_topk·num_classes entries (4000 for the reference config);
    # only the top few hundred can survive, so a top_k prefilter bounds the
    # sequential suppression depth without changing results.
    nms_candidates_test: int = field(
        default=1024, metadata={"scope": "runtime"})
    roi_bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # --- class-rebalance knobs (rare-class fix; QUALITY.md scale-bar root
    # cause).  The reference's uniform sampling + unweighted losses starve
    # classes that appear as ~1 instance among ~8 (the scale bar trains to
    # AP 0.0 — QUALITY_r03.json); these knobs are the framework-level fix.
    # All default OFF (empty tuple = exact Detectron2 semantics).
    # Per-class relative weights for the ROI-head foreground subsample
    # (Gumbel-top-k weighted sampling without replacement, ops/matcher.py).
    roi_fg_class_weights: Tuple[float, ...] = field(
        default=(), metadata={"scope": "train"})
    # Same for the RPN positive-anchor subsample (anchors matched to a gt of
    # class c draw with weight w[c]; class-agnostic objectness still,
    # only the SAMPLING is rebalanced).
    rpn_fg_class_weights: Tuple[float, ...] = field(
        default=(), metadata={"scope": "train"})
    # Per-class weights for the box-head softmax CE (background fixed at
    # 1.0), torch CrossEntropyLoss(weight=...) semantics: weighted mean =
    # sum(w·ce)/sum(w).  Also scales the fg box-regression and mask BCE
    # terms per-roi.
    class_loss_weights: Tuple[float, ...] = field(
        default=(), metadata={"scope": "train"})
    # fused Pallas pooler kernel for inference (TPU only; the vmapped XLA
    # pooler is the fallback). Sharded (multi-chip mesh) predictors switch
    # this off: pallas_call has no SPMD partitioning rule, so XLA would
    # gather the sharded feature maps onto every chip.
    pooler_pallas: bool = field(
        default=True, metadata={"scope": "runtime"})
    pooler_resolution_box: int = 7
    pooler_resolution_mask: int = 14
    # RoIAlign window (cells) cut around each roi on its assigned FPN level
    # (ops/roi_align.py).  Eq.-1 level assignment keeps sqrt(area)/stride in
    # [14,28); rois whose max EXTENT exceeds (window-2) cells bump to a
    # coarser level (slight blur).  28 saves ~20% pooler DMA traffic vs the
    # original 32 (the pooler is DMA-bandwidth-bound, PERF.md) at the cost
    # of bumping elongated rois with extent in (26,30] cells one level
    # earlier.  NOTE: the oversized-roi ceiling is (window-2)*64 px — keep
    # test_max_size below it (see input.test_max_size).
    pooler_window: int = field(
        default=32, metadata={"scope": "runtime"})
    # compute the 7×7/2 stem conv as explicit im2col + one [147,64] matmul
    # (models/resnet.py StemConv).  MEASURED NEGATIVE on chip (PERF.md r4):
    # the 49-slice concat relayout costs far more than the thin-channel conv
    # saves (batch-32 device-resident 86 → 34 img/s), same verdict as the
    # MLPerf space-to-depth attempt — this XLA/libtpu handles the 3-channel
    # stem better than any explicit re-expression.  Kept as an exact,
    # tested option (test_backbone.py) for other XLA versions; default OFF.
    stem_im2col: bool = field(
        default=False, metadata={"scope": "runtime"})
    mask_head_resolution: int = 28        # deconv output
    # canonical FPN level assignment (FPN paper eq. 1)
    canonical_box_size: float = 224.0
    canonical_level: int = 4

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.anchor_aspect_ratios)


def model_fields_by_scope(scope: str) -> frozenset:
    """Names of ModelConfig fields tagged ``metadata={"scope": <scope>}`` —
    the single source for two derived classifications that used to be
    hand-maintained literal sets (and could silently go stale when a knob
    was added):

    - ``"train"``: train-only knobs that do NOT affect the inference graph
      or the parameter tree.  hpo/study.py shares ONE compiled predictor
      across trials that vary only these.
    - ``"runtime"``: inference-time execution/budget knobs that do NOT
      define params.  Checkpoint-config adoption
      (engine/predictor.py::adopt_checkpoint_model_cfg) never imports them,
      so a checkpoint saved before a budget was workload-tuned cannot undo
      the tuned default.

    Untagged fields define the params/graph (depth, anchors, head dims...)
    and are excluded from both sets.  When adding a ModelConfig knob, tag
    it here once — both consumers update automatically."""
    return frozenset(f.name for f in dataclasses.fields(ModelConfig)
                     if f.metadata.get("scope") == scope)


@dataclass
class InputConfig:
    """Image front-end (reference: Resize((800,800)) train nn_train.py:135;
    ResizeShortestEdge(800, max 1333) at test via DefaultPredictor)."""

    train_size: Tuple[int, int] = (800, 800)    # exact resize, nn_train.py:135
    test_short_edge: int = 800
    # NOTE: the pooler's oversized-roi level bump covers rois up to
    # (window-2)*64 ≈ 1920 px (virtual stride-64 level, ops/roi_align.py);
    # raising test_max_size past ~1900 lets image-wide rois (scale bars)
    # exceed that ceiling and silently window-truncate — widen the pooler
    # window alongside.
    test_max_size: int = 1333
    # resize on host before the device transfer (what the reference's
    # DefaultPredictor does: ResizeShortestEdge runs on CPU and the RESIZED
    # image ships to the accelerator — and it ships float32, we ship uint8).
    # Shipping the smaller resized image wins whenever the host→device link
    # is slower than host resize throughput (always true on remote-attached
    # TPUs: measured 34 MB/s tunnel vs ~1 GB/s/core PIL). False = ship raw
    # pixels and resample on device (round-1 design; best on local hosts
    # with weak CPUs).
    host_resize: bool = True
    # ship ONE channel when every image in the batch is grayscale (R==G==B —
    # the norm for SEM micrographs); the device re-broadcasts to RGB before
    # the model.  3× fewer bytes over the host-device link, bit-identical
    # results.
    grayscale_transfer: bool = True
    # static padded canvas (multiple of 128 for clean TPU tiling; >= max test dims)
    pad_size_train: Tuple[int, int] = (800, 800)
    pad_size_test: Tuple[int, int] = (1024, 1344)
    size_divisibility: int = 32
    # Adaptive-canvas bucket (px): host canvases and the per-batch model
    # canvas round up to multiples of this, so a folder of drifting image
    # sizes compiles O(few) programs.  Smaller buckets run the trunk/RPN/
    # paste closer to the true content size (64 saves ~7% of canvas pixels
    # on the reference's 1024×1280→800×1000 workload: 832×1024 vs 896×1024)
    # at the cost of more distinct compiled programs per folder; must be a
    # multiple of size_divisibility (p6 is stride 64, and buckets of 64+
    # keep every FPN level's halving exact).  Results are canvas-invariant
    # (detections are produced in content coordinates; pad region masked).
    # Default 64 since round 5: measured +4.8% img/s @32 on chip
    # (129.9 → 136.2) with held-out mAP invariant to ±0.0002 on the R50
    # checkpoint (segm 0.6436 vs 0.6438, bbox 0.693 vs 0.695); set 128 for
    # fewer distinct compiled programs on folders with drifting sizes.
    canvas_bucket: int = 64
    # augmentation knobs (nn_train.py:136-144)
    brightness_range: Tuple[float, float] = (0.8, 1.8)
    contrast_range: Tuple[float, float] = (0.6, 1.3)
    saturation_range: Tuple[float, float] = (0.8, 1.4)
    rotation_angles: Tuple[float, ...] = (90.0,)   # RandomRotation(angle=[90,90])
    # probability of applying the 90° rotation.  The reference's
    # RandomRotation(angle=[90,90]) fires on EVERY sample (nn_train.py:139),
    # which erases one orientation from the training distribution entirely —
    # a horizontal 20:1 scale bar then never exists at train time and its
    # class cannot score at test time (QUALITY.md; tools/scalebar_diag.py
    # measured the trained RPN ranking the bar anchor ~200k/256k).  0.5
    # keeps the augmentation's diversity AND both orientations; set 1.0 for
    # exact reference behavior.
    rotation_prob: float = 0.5
    lighting_scale: float = 0.7
    vflip_prob: float = 0.4                        # RandomFlip(prob=0.4, vertical)
    # per-image padded ground-truth capacity (static shape)
    max_gt_instances: int = 100
    # Tighten the static GT dimension to the DATASET's observed maximum
    # instance count (rounded up to a multiple of 8, capped by
    # max_gt_instances) — the static-shape analog of torch's dynamic
    # per-image instance lists.  Every [B, N_gt, ...] cost scales with the
    # padding: packed GT masks are 80 KB/instance/image at 800² over the
    # host→device link, and the anchor-matcher's IoU/assignment tensors are
    # [~250k anchors, N_gt] in HBM.  This workload carries 10-16 instances
    # — N=100 padding is ~6× wasted transfer and matcher traffic.  One scan
    # of annotation counts at loader init; identical results (the padded
    # rows were all-invalid).  Set False to compile at max_gt_instances
    # exactly (e.g. to pre-compile a serving-side cap).
    auto_gt_cap: bool = True


@dataclass
class SolverConfig:
    """Reference solver: nn_train.py:201-206."""

    ims_per_batch: int = 2          # global batch (nn_train.py:201)
    base_lr: float = 2.5e-4         # nn_train.py:203
    max_iter: int = 1000            # nn_train.py:202
    warmup_iters: int = 100         # Detectron2 default WARMUP_ITERS=1000 scaled; keep explicit
    warmup_factor: float = 1.0e-3
    steps: Tuple[int, ...] = ()     # STEPS=[] → constant LR after warmup (nn_train.py:204)
    gamma: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1.0e-4
    # Global-norm gradient clipping.  The reference leaves Detectron2's
    # clipping off; we default it on (10.0) — detection losses on padded
    # static batches can spike on pathological samples and clipping costs
    # nothing at this scale.  Set 0 to disable.
    clip_grad_norm: float = 10.0
    checkpoint_period: int = 500
    log_period: int = 20
    seed: int = 0
    # Backbone freeze depth (Detectron2 BACKBONE.FREEZE_AT): 2 freezes the
    # stem and res2 — correct for COCO-pretrained fine-tuning (the reference
    # path, nn_train.py:200).  Set 0 when training FROM SCRATCH: freezing a
    # randomly-initialized stem would train the whole network behind a fixed
    # random projection.
    freeze_at: int = 2


@dataclass
class DataConfig:
    """Dataset wiring (reference paths nn_train.py:166,188; nn_inference.py:309)."""

    train_dataset: str = "multiclass_Train"
    test_dataset: str = "multiclass_Test"
    dataset_root: str = "./DATASET"
    inference_dir: str = "./DATASET/INFERENCE"
    classes_csv: str = "./DATASET/classes.csv"   # columns className,red,green,blue
    num_workers: int = 2                          # nn_train.py:199
    prefetch_depth: int = 2
    image_ext: Tuple[str, ...] = (".tif", ".tiff", ".png", ".jpg", ".jpeg")
    # In-RAM cache of prepared train samples (decoded+resized image +
    # rasterized GT masks, pre-augment).  Augmentation runs ON DEVICE with a
    # per-step key (data/augment.py), so the prepared sample is a pure
    # function of the record — re-decoding and re-rasterizing it every epoch
    # is wasted host work.  The reference pays this same cost per epoch
    # through its torch DataLoader (nn_train.py:199 NUM_WORKERS=2), which is
    # invisible on a many-core host but BINDS training on small hosts: the
    # r4 quality runs measured 2.7 steps/s end-to-end vs ~10+ steps/s for
    # the compiled device step on a 1-vCPU bench host (PERF.md r4 train
    # section).  Masks are cached trimmed to the real instance count and
    # re-padded at batch time, so a 64-image split costs ~200 MB.
    cache_prepared: bool = True
    cache_prepared_mb: int = 2048   # stop inserting past this budget
    # Device-resident dataset budget (MB of HBM): fine-tune-scale datasets
    # are staged in HBM ONCE and each step gathers its batch on device from
    # a tiny [B] index vector — no per-step sample H2D (see
    # TrainLoader.device_dataset for the measured link/leak rationale).
    # 0 disables; datasets over budget fall back to the streaming path.
    device_dataset_mb: int = 2048


@dataclass
class PostprocessConfig:
    """Mask cleanup + filtering (nn_inference.py:188-189,265-306)."""

    score_floor: float = 0.5            # nn_inference.py:272-275 intent
    min_mask_pixels: int = 2            # min_crys_size, nn_inference.py:265
    # per-class score thresholds / min pixel counts (reference C9 `get_masks`,
    # nn_inference.py:188-219). The reference ships only 3 entries for 4
    # classes (nn_inference.py:188-189) — a bug; we extend to 4.  Off by
    # default like the reference (get_masks is never called in its main flow).
    use_class_filters: bool = False
    class_thresholds: Tuple[float, ...] = (0.18, 0.35, 0.58, 0.58)
    class_min_pixels: Tuple[int, ...] = (75, 150, 75, 75)
    fill_holes: bool = True
    smooth: bool = True                 # erosion(dilation(mask)) nn_inference.py:296-297
    remove_overlaps: bool = True
    drop_fragmented: bool = True        # multi-component masks zeroed nn_inference.py:299-306
    # image-scale tail strategy: 0 = the parallel unfused chain (paste →
    # remove_overlaps → filter → pack; best measured on this chip, PERF.md
    # r4); N>0 = the fused scan ops/mask_paste.py::paste_select_pack with
    # N detections per step (bit-identical output; lower peak HBM — the
    # choice is a speed/memory knob, bigger canvases may need the scan)
    paste_chunk: int = 0
    # dtype of the paste resample matmuls ([H,M]@[M,M]@[M,W] per det).
    # bfloat16 would run them at full MXU rate, but the A/B measured NO win
    # (122.8 vs 124.3 img/s @32 — the tail is bound by the boolean
    # overlap/pack traffic XLA already fuses, not matmul rate; PERF.md r4),
    # so the exact-f32 paste stays the default.
    paste_dtype: str = "float32"


@dataclass
class MeasureConfig:
    """Morphology measurement (nn_inference.py:339-459,500-585)."""

    min_contour_area: float = 100.0     # nn_inference.py:412
    pixels_per_metric: float = 0.85     # nn_inference.py:409
    moving_average_window: int = 3      # nn_inference.py:501
    histogram_bins: int = 10            # nn_inference.py:531-539
    descriptor_columns: Tuple[str, ...] = (
        "Feret Diameter", "Aspect Ratio", "Roundness", "Circularity",
        "Sphericity", "Length", "Width", "CircularED", "Chords",
    )                                    # nn_inference.py:569


@dataclass
class ParallelConfig:
    """Mesh / sharding (no counterpart in the single-GPU reference; §2c)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # (data, model) mesh shape; -1 = all available devices on the data axis
    mesh_shape: Tuple[int, int] = (-1, 1)
    # --- multi-host (DCN) scaffolding (SURVEY §2c comm-backend row) ---
    # True: call jax.distributed.initialize() before device queries, so
    # jax.devices() returns the GLOBAL device set of a pod slice and the mesh
    # spans hosts (collectives ride ICI within a slice, DCN across);
    # per-process input sharding comes from TrainLoader(process_index/count)
    # + parallel.mesh.shard_batch, which assembles global arrays from
    # process-local shards.
    multi_host: bool = False
    # "host:port" of process 0's coordinator; "" = infer from the cluster
    # environment (TPU pods auto-detect; explicit for CPU/localhost tests)
    coordinator_address: str = ""
    num_processes: int = 1
    process_id: int = -1          # -1: from JAX_PROCESS_ID env (or cluster)
    # coordination-service tolerances (seconds), forwarded to
    # jax.distributed.initialize.  Defaults match jax 0.9 (300/100/300);
    # raise them on slow/contended hosts where a compile can outlast a
    # heartbeat window or one process reaches the shutdown barrier while a
    # peer is still compiling (observed on a contended 1-core CI host).
    init_timeout_s: int = 300
    heartbeat_timeout_s: int = 100
    shutdown_timeout_s: int = 300


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    input: InputConfig = field(default_factory=InputConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    data: DataConfig = field(default_factory=DataConfig)
    postprocess: PostprocessConfig = field(default_factory=PostprocessConfig)
    measure: MeasureConfig = field(default_factory=MeasureConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    output_dir: str = "./output"
    weights: str = ""                   # checkpoint path or torch .pth to import

    # ---- dotted-path overrides: cfg.apply(["solver.base_lr=1e-3", ...]) ----
    def apply(self, overrides: Sequence[str]) -> "Config":
        for item in overrides:
            if "=" not in item:
                raise ValueError(f"override must be key=value, got {item!r}")
            key, raw = item.split("=", 1)
            node: Any = self
            parts = key.strip().split(".")
            for p in parts[:-1]:
                node = getattr(node, p)
            leaf = parts[-1]
            if not hasattr(node, leaf):
                raise AttributeError(f"no config field {key!r}")
            current = getattr(node, leaf)
            setattr(node, leaf, _coerce(raw, current))
        return self

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for fname, fval in d.items():
            cur = getattr(cfg, fname, None)
            if dataclasses.is_dataclass(cur) and isinstance(fval, dict):
                for k, v in fval.items():
                    cur_v = getattr(cur, k)
                    if isinstance(cur_v, tuple) and isinstance(v, list):
                        v = _retuple(v)
                    setattr(cur, k, v)
            else:
                setattr(cfg, fname, fval)
        return cfg


def _retuple(v):
    return tuple(_retuple(x) if isinstance(x, list) else x for x in v)


def _coerce(raw: str, current: Any) -> Any:
    raw = raw.strip()
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        if raw in ("()", "[]", ""):
            return ()
        parsed = json.loads(raw) if raw.startswith("[") else [
            x for x in raw.strip("()").split(",") if x]
        elem = current[0] if current else None
        if isinstance(elem, float):
            return tuple(float(x) for x in parsed)
        if isinstance(elem, int):
            return tuple(int(x) for x in parsed)
        return tuple(str(x).strip() for x in parsed)
    return raw


def get_config(overrides: Optional[Sequence[str]] = None) -> Config:
    cfg = Config()
    if overrides:
        cfg.apply(overrides)
    return cfg
