"""Hyperparameter optimization with chip-parallel trials (SURVEY.md §2c).

The reference *declares* Optuna HPO but never implements it (README.md:5 "DO
OPTUNA OPTIMIZATION" banner nn_train.py:194) — BASELINE.json config #5 makes
it a build target: "Optuna HPO sweep (LR, anchor sizes, ROI batch) with
trials parallelized across TPU chips".

Optuna is not installed in this environment, so this module ships its own
engine with an optuna-shaped API (``create_study``, ``Trial.suggest_*``,
``study.optimize``) and uses real optuna transparently when available:

- sampler: random warmup then a TPE-style sampler (top-γ/bottom split,
  kernel-density ratio argmax over candidates) — the same algorithm family
  optuna defaults to;
- trial parallelism: ``jax.devices()`` is partitioned into ``n_parallel``
  groups; each trial's training runs on its own single-chip (or sub-mesh)
  ``jax.sharding.Mesh``, dispatched from a thread pool — XLA executes the
  per-device programs concurrently (8 single-chip trials on a v5e-8).
"""

from __future__ import annotations

import copy
import math
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - optional
    import optuna as _optuna
    HAS_OPTUNA = True
except ImportError:
    _optuna = None
    HAS_OPTUNA = False


# ---------------------------------------------------------------------------
# Native engine (optuna-shaped)
# ---------------------------------------------------------------------------

@dataclass
class _Distribution:
    kind: str                    # "float" | "int" | "categorical"
    low: float = 0.0
    high: float = 1.0
    log: bool = False
    choices: tuple = ()


@dataclass
class FrozenTrial:
    number: int
    params: Dict[str, Any] = field(default_factory=dict)
    value: Optional[float] = None
    state: str = "RUNNING"       # RUNNING | COMPLETE | PRUNED | FAIL


class Trial:
    def __init__(self, study: "Study", frozen: FrozenTrial):
        self._study = study
        self._frozen = frozen

    @property
    def number(self) -> int:
        return self._frozen.number

    @property
    def params(self) -> Dict[str, Any]:
        return dict(self._frozen.params)

    def suggest_float(self, name, low, high, log=False):
        d = _Distribution("float", low, high, log)
        v = self._study._sample(name, d)
        self._frozen.params[name] = v
        return v

    def suggest_int(self, name, low, high, log=False):
        d = _Distribution("int", low, high, log)
        v = int(round(self._study._sample(name, d)))
        v = int(np.clip(v, low, high))
        self._frozen.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        d = _Distribution("categorical", choices=tuple(choices))
        v = self._study._sample(name, d)
        self._frozen.params[name] = v
        return v


class Study:
    """Minimize or maximize an objective with TPE-lite sampling."""

    def __init__(self, direction: str = "minimize", seed: int = 0,
                 n_startup_trials: int = 5, gamma: float = 0.25):
        assert direction in ("minimize", "maximize")
        self.direction = direction
        self.trials: List[FrozenTrial] = []
        self._rng = np.random.default_rng(seed)
        self._n_startup = n_startup_trials
        self._gamma = gamma
        self._lock = threading.Lock()
        self._dists: Dict[str, _Distribution] = {}

    # ---- sampling ----

    def _completed(self) -> List[FrozenTrial]:
        return [t for t in self.trials if t.state == "COMPLETE"
                and t.value is not None and math.isfinite(t.value)]

    def _sample(self, name: str, d: _Distribution):
        with self._lock:
            self._dists[name] = d
            done = [t for t in self._completed() if name in t.params]
            if len(done) < self._n_startup:
                return self._random(d)
            return self._tpe(name, d, done)

    def _random(self, d: _Distribution):
        if d.kind == "categorical":
            return d.choices[int(self._rng.integers(len(d.choices)))]
        if d.log:
            return float(np.exp(self._rng.uniform(
                np.log(d.low), np.log(d.high))))
        return float(self._rng.uniform(d.low, d.high))

    def _tpe(self, name: str, d: _Distribution, done: List[FrozenTrial]):
        sign = 1.0 if self.direction == "minimize" else -1.0
        ranked = sorted(done, key=lambda t: sign * t.value)
        n_good = max(1, int(len(ranked) * self._gamma))
        good = [t.params[name] for t in ranked[:n_good]]
        bad = [t.params[name] for t in ranked[n_good:]] or good

        if d.kind == "categorical":
            # weight by smoothed frequency ratio
            idx = {c: i for i, c in enumerate(d.choices)}
            g = np.ones(len(d.choices))
            b = np.ones(len(d.choices))
            for v in good:
                g[idx[v]] += 1
            for v in bad:
                b[idx[v]] += 1
            probs = (g / g.sum()) / (b / b.sum())
            probs /= probs.sum()
            return d.choices[int(self._rng.choice(len(d.choices), p=probs))]

        def to_u(v):
            return math.log(v) if d.log else v

        lo, hi = to_u(d.low), to_u(d.high)
        width = max((hi - lo) / max(len(good), 1) , 1e-9)
        good_u = np.asarray([to_u(v) for v in good])
        bad_u = np.asarray([to_u(v) for v in bad])
        # candidates from the good KDE + uniform exploration
        cands = np.concatenate([
            self._rng.normal(self._rng.choice(good_u), width, 24),
            self._rng.uniform(lo, hi, 8)])
        cands = np.clip(cands, lo, hi)

        def kde(x, pts, bw):
            z = (x[:, None] - pts[None, :]) / bw
            return np.exp(-0.5 * z * z).sum(axis=1) / (len(pts) * bw) + 1e-12

        score = kde(cands, good_u, width) / kde(cands, bad_u,
                                                max((hi - lo) / max(len(bad), 1), 1e-9))
        best = float(cands[int(np.argmax(score))])
        return float(np.exp(best)) if d.log else best

    # ---- driving ----

    def ask(self) -> Trial:
        with self._lock:
            frozen = FrozenTrial(number=len(self.trials))
            self.trials.append(frozen)
        return Trial(self, frozen)

    def tell(self, trial: Trial, value: float, state: str = "COMPLETE"):
        with self._lock:
            trial._frozen.value = float(value)
            trial._frozen.state = state

    def optimize(self, objective: Callable[[Trial], float], n_trials: int,
                 n_parallel: int = 1, catch: bool = True):
        def run_one(_):
            t = self.ask()
            try:
                v = objective(t)
                self.tell(t, v)
            except Exception:
                if not catch:
                    raise
                t._frozen.state = "FAIL"

        if n_parallel <= 1:
            for i in range(n_trials):
                run_one(i)
        else:
            with ThreadPoolExecutor(max_workers=n_parallel) as pool:
                list(pool.map(run_one, range(n_trials)))
        return self

    @property
    def best_trial(self) -> FrozenTrial:
        done = self._completed()
        if not done:
            raise ValueError("no completed trials")
        sign = 1.0 if self.direction == "minimize" else -1.0
        return min(done, key=lambda t: sign * t.value)

    @property
    def best_params(self) -> Dict[str, Any]:
        return dict(self.best_trial.params)

    @property
    def best_value(self) -> float:
        return float(self.best_trial.value)


def create_study(direction: str = "minimize", seed: int = 0,
                 use_optuna: Optional[bool] = None):
    """optuna study when installed (and requested), else the native engine."""
    if (use_optuna is None and HAS_OPTUNA) or use_optuna:
        return _optuna.create_study(direction=direction)
    return Study(direction=direction, seed=seed)


# ---------------------------------------------------------------------------
# The reference sweep: LR, anchor sizes, ROI batch (BASELINE config #5)
# ---------------------------------------------------------------------------

def device_groups(n_parallel: int) -> List[list]:
    import jax

    devs = jax.devices()
    n_parallel = max(1, min(n_parallel, len(devs)))
    per = len(devs) // n_parallel
    return [devs[i * per:(i + 1) * per] for i in range(n_parallel)]


def run_reference_hpo(cfg, n_trials: int = 8, data_dir: Optional[str] = None,
                      max_iter: int = 100, n_parallel: Optional[int] = None,
                      seed: int = 0,
                      eval_max_images: Optional[int] = None,
                      space: str = "v1") -> Dict[str, Any]:
    """Search LR / anchor scale / ROI batch (BASELINE config #5, README ToDo
    "DO OPTUNA OPTIMIZATION").

    Objective: **val segm mAP** (maximized) on the Test split after a short
    fine-tune, scored by eval/coco_eval.py at score threshold 0.05 (the
    production 0.80 threshold kills recall and flattens the objective) —
    model quality, not training loss (loss is gameable by LR→0).  When no
    Test split exists the objective falls back to final training loss
    (minimized); the returned dict's ``objective`` field says which was used.

    Trials run one-per-device-group concurrently.  The eval predictor
    compile (minutes at production canvas through a remote link) is
    amortized: one compiled Predictor per (device group, inference-relevant
    model-config subset) — the cache key hashes every non-train-only
    ModelConfig field, so any searched knob that reaches the inference
    graph gets its own compile while train-only knobs (lr/roi_batch/class
    weights) share one — and later trials swap weights in with
    ``Predictor.set_params`` (no retrace).  ``eval_max_images`` caps the
    objective's eval cost (default None = the full split; callers opt into
    truncation explicitly — a silent cap makes trial scores noisier with no
    signature-level signal).
    """
    import os
    import queue

    import jax

    from uwcv_tpu.data.catalog import DatasetCatalog, register_superannotate
    from uwcv_tpu.data.loader import TrainLoader
    from uwcv_tpu.engine.trainer import Trainer
    from uwcv_tpu.parallel.mesh import build_mesh

    name = cfg.data.train_dataset
    if name not in DatasetCatalog.list():
        root = data_dir or os.path.join(cfg.data.dataset_root, "Train")
        register_superannotate(name, root, classes_csv=cfg.data.classes_csv)
    dicts = DatasetCatalog.get(name)

    # eval split for the mAP objective: registered test_dataset, else the
    # reference's DATASET/Test folder layout (nn_train.py Test split)
    eval_dicts = None
    try:
        ename = cfg.data.test_dataset
        if ename in DatasetCatalog.list():
            eval_dicts = DatasetCatalog.get(ename) or None
        else:
            troot = (os.path.join(os.path.dirname(
                os.path.abspath(data_dir).rstrip("/")), "Test")
                if data_dir else os.path.join(cfg.data.dataset_root, "Test"))
            if os.path.isdir(troot):
                register_superannotate(ename, troot,
                                       classes_csv=cfg.data.classes_csv)
                eval_dicts = DatasetCatalog.get(ename) or None
    except Exception:
        eval_dicts = None
    use_map = eval_dicts is not None

    groups = device_groups(n_parallel or len(jax.devices()))
    # blocking queue — a trial WAITS for a free device group instead of
    # silently double-booking group 0 (round-1 bug)
    group_queue: "queue.Queue[int]" = queue.Queue()
    for gid in range(len(groups)):
        group_queue.put(gid)

    # shared eval predictors keyed by (gid, inference-relevant model config):
    # train-only knobs (sampling batch sizes, matcher thresholds, class
    # weights) never reach the inference graph, so trials differing only in
    # those share one compiled predictor via set_params; any searched knob
    # that DOES alter the graph (anchors, score thresholds, detections cap)
    # changes the key automatically — no hand-picked field list to go stale.
    # derived from ModelConfig field metadata (config.py) — one tag per
    # knob instead of a second hand-maintained list that can go stale
    from uwcv_tpu.config import model_fields_by_scope

    _train_only = model_fields_by_scope("train")
    predictor_cache: Dict[tuple, Any] = {}
    cache_lock = threading.Lock()

    def _eval_predictor(gid: int, tcfg, params):
        import dataclasses as _dc
        import json as _json

        from uwcv_tpu.engine.predictor import Predictor

        ecfg = copy.deepcopy(tcfg)
        ecfg.model.roi_score_thresh_test = 0.05
        key = (gid, _json.dumps(
            {k: v for k, v in sorted(_dc.asdict(ecfg.model).items())
             if k not in _train_only}, default=str))
        with cache_lock:
            pred = predictor_cache.get(key)
        if pred is None:
            pred = Predictor(ecfg, params)
            with cache_lock:
                predictor_cache[key] = pred
        else:
            pred.set_params(params)
        return pred

    def objective(trial: Trial) -> float:
        tcfg = copy.deepcopy(cfg)
        if space == "v2":
            # round-4 space: search the class-imbalance/orientation knobs
            # that fixed the scale-bar class (QUALITY.md), around the
            # HPO_r03 winner.  Anchors/roi_batch come from cfg (the caller
            # pins the r4 recipe); all three searched knobs here are
            # train-only, so every trial shares ONE compiled predictor.
            lr = trial.suggest_float("base_lr", 5e-4, 8e-3, log=True)
            rot = trial.suggest_categorical(
                "rotation_prob", (0.25, 0.5, 0.75))
            barw = trial.suggest_categorical(
                "bar_weight", (2.0, 4.0, 8.0, 16.0))
            anchor_scale = 1.0
            roi_batch = tcfg.model.roi_batch_size_per_image
            tcfg.input.rotation_prob = float(rot)
            tcfg.model.roi_fg_class_weights = (barw, 1.0, 1.0, 1.0)
            tcfg.model.rpn_fg_class_weights = (barw / 2, 1.0, 1.0, 1.0)
            tcfg.model.class_loss_weights = (barw / 2, 1.0, 1.0, 1.0)
        else:
            lr = trial.suggest_float("base_lr", 1e-5, 1e-2, log=True)
            anchor_scale = trial.suggest_categorical(
                "anchor_scale", (0.5, 1.0, 2.0))
            roi_batch = trial.suggest_categorical("roi_batch", (16, 32, 64))
        tcfg.solver.base_lr = lr
        tcfg.solver.max_iter = max_iter
        # the trial's batch must tile its device group's data axis
        group_size = max(len(g) for g in groups)
        per = max(1, tcfg.solver.ims_per_batch)
        tcfg.solver.ims_per_batch = -(-per // group_size) * group_size
        tcfg.solver.checkpoint_period = 0
        tcfg.solver.log_period = max(max_iter // 2, 1)
        tcfg.model.roi_batch_size_per_image = int(roi_batch)
        tcfg.model.anchor_sizes = tuple(
            tuple(s * anchor_scale for s in level)
            for level in cfg.model.anchor_sizes)
        tcfg.output_dir = f"{cfg.output_dir}/hpo_trial{trial.number}"

        gid = group_queue.get()   # blocks until a device group frees up
        try:
            mesh = build_mesh(tcfg.parallel, devices=groups[gid])
            trainer = Trainer(tcfg, mesh=mesh)
            trainer.init_state(jax.random.key(seed + trial.number))
            loader = TrainLoader(dicts, tcfg, seed=seed + trial.number,
                                 num_workers=1)
            # device-resident dataset when it fits HBM: per-step H2D drops
            # to a [B] index vector — a 16×800-iter sweep would otherwise
            # ship ~80 GB through the link AND trip the remote client's
            # per-transfer host leak (TrainLoader.device_dataset)
            dd = loader.device_dataset(mesh)
            from uwcv_tpu.engine.trainer import make_train_step

            idx_step = (make_train_step(trainer.model, tcfg, trainer.tx,
                                        indexed=True)
                        if dd is not None else None)
            if dd is None:
                loader.start()
            losses = []
            try:
                state = trainer.state
                batch_iter = (loader.index_batches() if dd is not None
                              else iter(loader))
                rng = jax.random.key(1000 + trial.number)
                from uwcv_tpu.parallel.mesh import shard_batch

                for i in range(max_iter):
                    rng, step_rng = jax.random.split(rng)
                    if dd is not None:
                        from uwcv_tpu.parallel.mesh import batch_sharding

                        arr = np.asarray(next(batch_iter), np.int32)
                        idx = (jax.device_put(arr, batch_sharding(mesh))
                               if mesh.devices.size > 1
                               else jax.device_put(arr, groups[gid][0]))
                        state, metrics = idx_step(state, dd, idx, step_rng)
                    else:
                        batch = shard_batch(next(batch_iter), mesh)
                        state, metrics = trainer._step_fn(state, batch,
                                                          step_rng)
                    if i >= max_iter - 5:
                        losses.append(float(metrics["total_loss"]))
            finally:
                if dd is None:
                    loader.stop()
            if use_map:
                from uwcv_tpu.eval.coco_eval import evaluate_split

                params = jax.device_put(state.params, groups[gid][0])
                pred = _eval_predictor(gid, tcfg, params)
                if eval_max_images is not None \
                        and eval_max_images < len(eval_dicts):
                    print(f"[hpo] trial {trial.number}: eval capped at "
                          f"{eval_max_images}/{len(eval_dicts)} images",
                          flush=True)
                res = evaluate_split(tcfg, eval_dicts, predictor=pred,
                                     max_images=eval_max_images)
                v = res["segm"]["AP"]
                if not math.isfinite(v) or v < 0:   # -1 = undefined row
                    v = res["bbox"]["AP"]
                return v if math.isfinite(v) and v >= 0 else 0.0
            value = float(np.mean(losses)) if losses else float("inf")
            return value if math.isfinite(value) else 1e9
        finally:
            group_queue.put(gid)

    study = create_study("maximize" if use_map else "minimize", seed=seed,
                         use_optuna=False)
    study.optimize(objective, n_trials=n_trials, n_parallel=len(groups))
    return {"best_params": study.best_params, "best_value": study.best_value,
            "objective": "segm_mAP" if use_map else "final_loss",
            "n_trials": len(study.trials),
            "trials": [{"number": t.number, "value": t.value,
                        "params": t.params, "state": t.state}
                       for t in study.trials]}
