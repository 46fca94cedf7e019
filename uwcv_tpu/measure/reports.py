"""Measurement sweep, analytics & reporting (SURVEY.md C13-C16, L5-L6).

Rebuilds the second half of nn_inference.py with the reference's artifacts —
per-class counts, window-3 moving averages, 10-bin histograms,
``ShapeDescriptor.csv``, ``Results<class>_.csv``, distribution plots — while
fixing the catalogued defects (SURVEY.md §2a): a single inference pass is
reused across counting/measureming/visualization (vs 3× forwards per image,
§3.3), accumulators reset per class (vs global bleed, nn_inference.py:463 vs
487), class ids compared correctly (vs the ==1..4 off-by-one), and the CSV
is keyed by the classes.csv registry (the README's declared-missing
feature).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from uwcv_tpu.config import MeasureConfig
from uwcv_tpu.data.classes import ClassRegistry
from uwcv_tpu.measure.descriptors import (
    DESCRIPTOR_NAMES,
    ShapeDescriptors,
    measure_mask,
)


def moving_average(values: Sequence[float], window: int = 3) -> List[float]:
    """Trailing moving average, emitted once ``window`` samples exist
    (nn_inference.py:500-529 semantics)."""
    out = []
    buf: List[float] = []
    for v in values:
        buf.append(float(v))
        if len(buf) >= window:
            out.append(float(np.mean(buf[-window:])))
    return out


@dataclass
class ClassMeasurements:
    """Accumulated descriptors for one class over a folder of images."""

    class_name: str
    keyword: str
    rows: List[List[float]] = field(default_factory=list)
    count: int = 0                       # instances counted (C13)

    def add(self, descriptors: Sequence[ShapeDescriptors]):
        for d in descriptors:
            self.rows.append(d.as_row())

    def dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows, columns=list(DESCRIPTOR_NAMES))

    def histograms(self, bins: int = 10) -> Dict[str, tuple]:
        df = self.dataframe()
        return {c: np.histogram(df[c].to_numpy(), bins=bins)
                for c in df.columns if len(df)}

    def moving_averages(self, window: int = 3) -> Dict[str, List[float]]:
        df = self.dataframe()
        return {c: moving_average(df[c].tolist(), window) for c in df.columns}


def measure_instances(
    instances_np: Dict[str, np.ndarray],
    class_id: int,
    cfg: MeasureConfig,
) -> List[ShapeDescriptors]:
    """Measure one image's predictions for one class.

    instances_np: output of Instances.to_numpy() — boxes/scores/classes/
    masks stripped of padding.  Selected instance masks are OR-ed into one
    canvas and measured (nn_inference.py:371-405 flow).
    """
    masks = instances_np.get("masks")
    if masks is None or len(masks) == 0:
        return []
    sel = instances_np["classes"] == class_id
    if not sel.any():
        return []
    canvas = np.any(masks[sel], axis=0)
    return measure_mask(canvas, cfg.pixels_per_metric, cfg.min_contour_area)


def count_instances(instances_np: Dict[str, np.ndarray],
                    num_classes: int) -> np.ndarray:
    """Per-class instance counts (C13 — with correct 0-based ids)."""
    counts = np.zeros(num_classes, np.int64)
    for c in instances_np["classes"]:
        if 0 <= c < num_classes:
            counts[c] += 1
    return counts


class MeasurementReport:
    """Drives the per-class sweep over pre-computed predictions and writes
    the reference's artifact set."""

    def __init__(self, registry: ClassRegistry, cfg: MeasureConfig,
                 output_dir: str = "./output"):
        self.registry = registry
        self.cfg = cfg
        self.output_dir = output_dir
        self.per_class = [
            ClassMeasurements(n, k)
            for n, k in zip(registry.names, registry.keywords)
        ]
        self.total_counts = np.zeros(registry.num_classes, np.int64)
        os.makedirs(output_dir, exist_ok=True)

    def add_image(self, instances_np: Dict[str, np.ndarray]) -> None:
        """One prediction (all classes) — single inference pass reused."""
        self.total_counts += count_instances(
            instances_np, self.registry.num_classes)
        for cid, cm in enumerate(self.per_class):
            descs = measure_instances(instances_np, cid, self.cfg)
            cm.add(descs)
            cm.count = int(self.total_counts[cid])

    # ---------- artifacts ----------

    def write_shape_descriptor_csv(self) -> str:
        """ShapeDescriptor.csv: all classes concatenated with a Class column
        (the reference re-reads this file to produce per-class Results CSVs,
        nn_inference.py:563-570)."""
        frames = []
        for cm in self.per_class:
            df = cm.dataframe()
            df.insert(0, "Class", cm.class_name)
            frames.append(df)
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(columns=["Class", *DESCRIPTOR_NAMES])
        path = os.path.join(self.output_dir, "ShapeDescriptor.csv")
        out.to_csv(path, index=False)
        return path

    def write_results_csvs(self) -> List[str]:
        """Results<keyword>_.csv per class (nn_inference.py:570 — keyed
        correctly by class instead of the stale ``keywds[k]`` index)."""
        paths = []
        for cm in self.per_class:
            path = os.path.join(self.output_dir, f"Results{cm.keyword}_.csv")
            cm.dataframe().to_csv(path, index=False)
            paths.append(path)
        return paths

    def summary(self) -> Dict[str, int]:
        """Console totals (nn_inference.py:541-558)."""
        return {cm.class_name: int(n)
                for cm, n in zip(self.per_class, self.total_counts)}

    def write_distribution_plots(self, columns: Optional[Sequence[str]] = None,
                                 kde: bool = True) -> List[str]:
        """Seaborn-style distribution plots (backup_main.py:600-613)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        try:
            import seaborn as sns
        except ImportError:  # pragma: no cover
            sns = None

        columns = list(columns or DESCRIPTOR_NAMES)
        paths = []
        for cm in self.per_class:
            df = cm.dataframe()
            if df.empty:
                continue
            for col in columns:
                fig, ax = plt.subplots(figsize=(5, 4))
                data = df[col].to_numpy()
                if sns is not None:
                    sns.histplot(data, kde=kde and len(df) > 1, ax=ax,
                                 bins=self.cfg.histogram_bins)
                else:
                    ax.hist(data, bins=self.cfg.histogram_bins)
                ax.set_xlabel(col)
                ax.set_title(f"{cm.class_name}: {col}")
                slug = col.replace(" ", "_")
                path = os.path.join(self.output_dir,
                                    f"dist_{cm.keyword}_{slug}.png")
                fig.savefig(path, dpi=100, bbox_inches="tight")
                plt.close(fig)
                paths.append(path)
        return paths
