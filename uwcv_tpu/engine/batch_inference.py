"""Batch inference driver + measurement sweep (SURVEY.md §3.2-3.3, C11, C15).

The reference's nn_inference.py flow — folder of images → predictor → mask
cleanup → RLE CSV, then a per-class measurement sweep that re-runs inference
3× per image per class (12 forwards/image, SURVEY.md §3.3).  Here each image
is inferred ONCE; the same padded Instances feed RLE export, counting,
per-class measurement, and visualization.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from uwcv_tpu.config import Config
from uwcv_tpu.data.classes import ClassRegistry
from uwcv_tpu.data.loader import list_inference_images, load_image_rgb
from uwcv_tpu.engine.predictor import Predictor
from uwcv_tpu.measure.reports import MeasurementReport
from uwcv_tpu.measure.rle import rle_encoding
from uwcv_tpu.structures.instances import Instances


def resize_masks_to_original(inst_np: Dict[str, np.ndarray],
                             orig_hw: Tuple[int, int]) -> Dict[str, np.ndarray]:
    """Predicted masks live in the resized frame; the reference's artifacts
    (RLE CSV, contour measurements) are in original image pixels — nearest
    upsample back (host, cheap: bool gather)."""
    masks = inst_np.get("masks")
    if masks is None or len(masks) == 0:
        return inst_np
    mh, mw = masks.shape[1:]
    oh, ow = orig_hw
    if (mh, mw) == (oh, ow):
        return inst_np
    ys = np.clip((np.arange(oh) * mh / oh).astype(np.int64), 0, mh - 1)
    xs = np.clip((np.arange(ow) * mw / ow).astype(np.int64), 0, mw - 1)
    out = dict(inst_np)
    # one combined gather, not two chained fancy-index copies (the
    # intermediate [N, oh, mw] copy doubled host traffic on the 1-vCPU
    # folder-inference path)
    out["masks"] = masks[:, ys[:, None], xs[None, :]]
    return out


def apply_class_filters(
    inst_np: Dict[str, np.ndarray],
    thresholds: Sequence[float],
    min_pixels: Sequence[int],
) -> Dict[str, np.ndarray]:
    """Per-class score threshold + minimum mask size (reference C9
    ``get_masks``, nn_inference.py:204-219): instance kept if
    score ≥ thresholds[class] and mask pixel count ≥ min_pixels[class].
    Classes beyond the configured lists pass unfiltered."""
    classes = inst_np["classes"]
    keep = np.ones(len(classes), bool)
    thr = np.asarray(thresholds, float)
    mpx = np.asarray(min_pixels, float)
    in_range = classes < len(thr)
    keep[in_range] &= inst_np["scores"][in_range] >= thr[classes[in_range]]
    masks = inst_np.get("masks")
    if masks is not None and len(masks):
        sizes = masks.reshape(len(masks), -1).sum(axis=1)
        in_range_m = classes < len(mpx)
        keep[in_range_m] &= sizes[in_range_m] >= mpx[classes[in_range_m]]
    out = {k: (v[keep] if isinstance(v, np.ndarray) and len(v) == len(keep)
               else v) for k, v in inst_np.items()}
    return out


def run_batch_inference(
    cfg: Config,
    predictor: Predictor,
    image_dir: Optional[str] = None,
    batch_size: int = 8,
    csv_name: str = "R50_flip_.csv",
    registry: Optional[ClassRegistry] = None,
    with_measurements: bool = True,
    with_plots: bool = False,
    progress=print,
) -> Dict[str, object]:
    """Folder → predictions → ./output/<csv_name> RLE CSV (+ measurement
    artifacts).  Returns {"csv": path, "report": MeasurementReport,
    "num_images": int, "predictions": {path: instances_np}}.
    """
    image_dir = image_dir or cfg.data.inference_dir
    registry = registry or ClassRegistry.load(cfg.data.classes_csv)
    paths = list_inference_images(image_dir, cfg.data.image_ext)
    if not paths:
        raise FileNotFoundError(f"no images found under {image_dir}")
    os.makedirs(cfg.output_dir, exist_ok=True)

    report = MeasurementReport(registry, cfg.measure, cfg.output_dir)
    img_ids: List[str] = []
    encodings: List[str] = []
    predictions: Dict[str, Dict[str, np.ndarray]] = {}

    def consume(chunk, images, device_out) -> None:
        # zip() drops any tail padding: chunk/images keep their true length
        for path, img, inst in zip(chunk, images,
                                   predictor.to_instances(device_out)):
            inst_np = inst.to_numpy()
            inst_np = resize_masks_to_original(inst_np, img.shape[:2])
            if cfg.postprocess.use_class_filters:
                inst_np = apply_class_filters(
                    inst_np, cfg.postprocess.class_thresholds,
                    cfg.postprocess.class_min_pixels)
            predictions[path] = inst_np
            name = os.path.basename(path)
            masks = inst_np.get("masks")
            n = 0 if masks is None else len(masks)
            # one CSV row per instance mask (nn_inference.py:330-332)
            for i in range(n):
                rle = rle_encoding(masks[i])
                if rle:
                    img_ids.append(name)
                    encodings.append(" ".join(str(v) for v in rle))
            if with_measurements:
                report.add_image(inst_np)
            progress(f"{name}: {n} instances")

    # Software pipeline (vs the reference's strictly serial per-image loop,
    # nn_inference.py:319-336): a worker thread decodes batch i+1 while
    # batch i is dispatched WITHOUT blocking, and batch i-1's results are
    # pulled/postprocessed while i computes.  Decode, device compute, D2H,
    # and host RLE/measure all overlap — on remote-attached TPUs the mask
    # D2H alone is ~4 s/batch, fully hidden behind the next batch.
    from concurrent.futures import ThreadPoolExecutor

    chunks = [paths[s:s + batch_size]
              for s in range(0, len(paths), batch_size)]
    with ThreadPoolExecutor(max_workers=1) as pool:
        decode = lambda ch: [load_image_rgb(p) for p in ch]
        nxt = pool.submit(decode, chunks[0])
        pending = None
        for ci, chunk in enumerate(chunks):
            images = nxt.result()
            if ci + 1 < len(chunks):
                nxt = pool.submit(decode, chunks[ci + 1])
            run_images = images
            if predictor.mesh is not None and len(images) % \
                    predictor.mesh.shape[predictor.mesh.axis_names[0]]:
                # a sharded batch must tile the data axis: pad the tail
                # chunk by repeating the last image (consume() zips it away)
                d = predictor.mesh.shape[predictor.mesh.axis_names[0]]
                pad = -len(images) % d
                run_images = images + [images[-1]] * pad
            device_out = predictor.predict_batch_device(run_images,
                                                        block=False)
            if pending is not None:
                consume(*pending)
            pending = (chunk, images, device_out)
        consume(*pending)

    csv_path = os.path.join(cfg.output_dir, csv_name)
    pd.DataFrame({"ImageId": img_ids, "EncodedPixels": encodings}).to_csv(
        csv_path, index=False)

    out: Dict[str, object] = {
        "csv": csv_path,
        "num_images": len(paths),
        "predictions": predictions,
        "report": None,
    }
    if with_measurements:
        report.write_shape_descriptor_csv()
        report.write_results_csvs()
        if with_plots:
            report.write_distribution_plots()
        progress(f"class totals: {report.summary()}")
        out["report"] = report
    return out


def save_gt_visualizations(
    dataset_dicts: Sequence[Dict],
    registry: ClassRegistry,
    output_dir: str,
    max_images: int = 5,
    alpha: float = 0.4,
) -> List[str]:
    """Ground-truth overlays of dataset dicts (the reference's random-sample
    GT gallery, COLAB_PORT.py:167-174) — rasterizes the annotation polygons
    and blends class colors."""
    from PIL import Image

    from uwcv_tpu.data.rasterize import polygons_to_mask

    os.makedirs(output_dir, exist_ok=True)
    out_paths = []
    for rec in list(dataset_dicts)[:max_images]:
        img = load_image_rgb(rec["file_name"]).astype(np.float32)
        h, w = img.shape[:2]
        for ann in rec.get("annotations", []):
            color = np.asarray(
                registry.colors[int(ann["category_id"]) %
                                len(registry.colors)], np.float32)
            mask = polygons_to_mask(ann["segmentation"], h, w)
            img[mask] = (1 - alpha) * img[mask] + alpha * color
        name = os.path.splitext(os.path.basename(rec["file_name"]))[0]
        out = os.path.join(output_dir, f"{name}_gt.png")
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(out)
        out_paths.append(out)
    return out_paths


def save_visualizations(
    predictions: Dict[str, Dict[str, np.ndarray]],
    registry: ClassRegistry,
    output_dir: str,
    alpha: float = 0.45,
) -> List[str]:
    """Instance overlays (SURVEY.md C12 — the reference's Visualizer path,
    nn_inference.py:343-350).

    Blends per-class colors over the image, draws box outlines, and labels
    each instance "<class> <score>%" like Detectron2's
    draw_instance_predictions; pure numpy + PIL, no Detectron2.
    """
    from PIL import Image, ImageDraw

    os.makedirs(output_dir, exist_ok=True)
    out_paths = []
    for path, inst in predictions.items():
        img = load_image_rgb(path).astype(np.float32)
        masks = inst.get("masks")
        if masks is not None:
            for mask, cls in zip(masks, inst["classes"]):
                color = np.asarray(registry.colors[int(cls) %
                                                   len(registry.colors)],
                                   np.float32)
                img[mask] = (1 - alpha) * img[mask] + alpha * color
        for box, cls in zip(inst["boxes"], inst["classes"]):
            color = registry.colors[int(cls) % len(registry.colors)]
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            x1, x2 = np.clip([x1, x2], 0, img.shape[1] - 1)
            y1, y2 = np.clip([y1, y2], 0, img.shape[0] - 1)
            img[y1:y2 + 1, [x1, x2]] = color
            img[[y1, y2], x1:x2 + 1] = color
        pil = Image.fromarray(img.clip(0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(pil)
        scores = inst.get("scores")
        for i, (box, cls) in enumerate(zip(inst["boxes"], inst["classes"])):
            name = registry.names[int(cls) % len(registry.names)]
            label = (f"{name} {100 * float(scores[i]):.0f}%"
                     if scores is not None else name)
            x1, y1 = int(round(box[0])), int(round(box[1]))
            ty = max(y1 - 11, 0)
            tw = int(draw.textlength(label))
            draw.rectangle([x1, ty, x1 + tw + 2, ty + 11], fill=(0, 0, 0))
            draw.text((x1 + 1, ty), label, fill=(255, 255, 255))
        name = os.path.splitext(os.path.basename(path))[0] + "_pred.png"
        out = os.path.join(output_dir, name)
        pil.save(out)
        out_paths.append(out)
    return out_paths


def save_union_masks(
    predictions: Dict[str, Dict[str, np.ndarray]],
    output_dir: str,
    classes_of_interest: Optional[Sequence[int]] = None,
) -> List[str]:
    """Binary union-mask canvases — the reference's ``predicted_masks.jpg``
    / ``Masks.jpg`` dumps (nn_inference.py:394-405): a black image-sized
    canvas with 255 wherever any instance of the selected classes is
    predicted.  One ``<image>_masks.jpg`` per input (the reference
    overwrites one global file per image; per-image names keep all of
    them)."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    out_paths = []
    for path, inst in predictions.items():
        masks = inst.get("masks")
        if masks is None:
            continue
        classes = np.asarray(inst["classes"])
        sel = (np.isin(classes, np.asarray(list(classes_of_interest)))
               if classes_of_interest is not None
               else np.ones(len(classes), bool))
        if not (len(masks) and sel.any()):
            continue
        union = np.any(np.asarray(masks)[sel], axis=0)
        canvas = np.where(union[..., None], 255, 0).astype(np.uint8)
        canvas = np.repeat(canvas, 3, axis=-1)
        name = os.path.splitext(os.path.basename(path))[0] + "_masks.jpg"
        out = os.path.join(output_dir, name)
        Image.fromarray(canvas).save(out)
        out_paths.append(out)
    return out_paths
