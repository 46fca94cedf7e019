"""Trainer: jit/pjit data-parallel fine-tuning (SURVEY.md L3/N6/N7, §2c).

Replaces the reference's ``CustomTrainer(cfg).train()`` (nn_train.py:211-213)
with an explicit, functional train loop:

- one compiled ``train_step`` (loss → grad → optax sgd+momentum with the
  Detectron2 warmup schedule), data-parallel over the mesh's ``data`` axis;
- FrozenBN params and frozen backbone stages are masked out of the optimizer
  (Detectron2 FrozenBatchNorm + FREEZE_AT semantics);
- host loop owns the input pipeline (data/loader.py), periodic logging
  (metrics.json lines like Detectron2's EventStorage), and orbax
  checkpointing with resume (reference's resume_or_load, nn_train.py:212).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uwcv_tpu.config import Config
from uwcv_tpu.data.augment import augment_batch, unpack_bitmasks
from uwcv_tpu.engine.lr_schedule import warmup_multistep
from uwcv_tpu.models.rcnn import MaskRCNN
from uwcv_tpu.parallel.mesh import build_mesh, replicate, shard_batch

LOSS_WEIGHTS = {"rpn_cls": 1.0, "rpn_loc": 1.0, "cls": 1.0,
                "box_reg": 1.0, "mask": 1.0}


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _trainable_mask(params, freeze_frozen_bn: bool = True,
                    freeze_at: int = 2) -> Any:
    """False for params the optimizer must not touch: FrozenBN affines and
    backbone stages below ``freeze_at`` (stem=1, res2=2 — Detectron2
    BACKBONE.FREEZE_AT default)."""

    if not 0 <= freeze_at <= 5:
        raise ValueError(
            f"freeze_at must be 0..5 (Detectron2 BACKBONE.FREEZE_AT: "
            f"1=stem, 2..5=through res2..res5), got {freeze_at}")

    def decide(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        if freeze_frozen_bn and "frozen_bn" in joined:
            return False
        if freeze_at >= 1 and "/stem_" in "/" + joined:
            return False
        # stages res2..res5 freeze through level freeze_at (models/resnet.py
        # names blocks res{stage}_block{i})
        for stage in (2, 3, 4, 5):
            if freeze_at >= stage and f"res{stage}_block" in joined:
                return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decide(path), params)


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    sched = warmup_multistep(cfg.solver)
    chain = [optax.trace(decay=cfg.solver.momentum)]
    if cfg.solver.clip_grad_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(cfg.solver.clip_grad_norm))
    if cfg.solver.weight_decay > 0:
        chain.insert(0, optax.add_decayed_weights(cfg.solver.weight_decay))
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)
    # multi_transform + set_to_zero, NOT optax.masked: masked() passes the
    # raw gradient through untouched for mask=False leaves, which would
    # *update* frozen params; set_to_zero hard-freezes them.
    mask = _trainable_mask(params, freeze_at=cfg.solver.freeze_at)
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_train_step(model: MaskRCNN, cfg: Config, tx, indexed: bool = False):
    """Compiled step: (state, device_batch, rng) → (state, metrics).

    ``indexed=True`` builds the device-resident-dataset variant:
    (state, dataset, idx, rng) → (state, metrics), where ``dataset`` is the
    whole staged dataset in HBM ([N, ...] per leaf, replicated over the
    mesh) and ``idx`` a [B] int32 vector — the batch is GATHERED on device,
    so the step's host→device traffic is the index vector alone (see
    TrainLoader.device_dataset for the measured rationale)."""

    train_size = cfg.input.train_size[1]

    def loss_fn(params, batch, rng):
        aug_rng, samp_rng = jax.random.split(rng)
        masks = unpack_bitmasks(batch["masks_packed"], train_size)
        aug = augment_batch(
            {"image": batch["image"].astype(jnp.float32),
             "boxes": batch["boxes"], "classes": batch["classes"],
             "valid": batch["valid"], "masks": masks},
            aug_rng, cfg.input)
        losses = model.apply(
            params, aug["image"], aug["boxes"], aug["classes"],
            aug["masks"], aug["valid"], samp_rng,
            method=MaskRCNN.forward_train)
        total = sum(LOSS_WEIGHTS.get(k, 1.0) * v for k, v in losses.items())
        return total, losses

    def _apply(state, batch, rng):
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(params, opt_state, state.step + 1), metrics

    if indexed:
        def train_step(state: TrainState, dataset, idx, rng):
            batch = jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), dataset)
            return _apply(state, batch, rng)
    else:
        def train_step(state: TrainState, batch, rng):
            return _apply(state, batch, rng)

    return jax.jit(train_step, donate_argnums=(0,))


class Trainer:
    """Host-side training driver."""

    def __init__(self, cfg: Config, model: Optional[MaskRCNN] = None,
                 mesh=None):
        import copy

        # own copy: the multi-device pooler flip below must not leak into
        # the CALLER's cfg (quality_run/hpo build their eval Predictor from
        # the same object, and the single-device eval path may validly keep
        # the Pallas pooler)
        cfg = copy.deepcopy(cfg)
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else build_mesh(cfg.parallel)
        if (model is None and self.mesh is not None
                and self.mesh.devices.size > 1 and cfg.model.pooler_pallas):
            # mirror the Predictor's multi-device guard (predictor.py:50-58):
            # pallas_call has no SPMD partitioning rule, so a sharded train
            # step through the fused pooler would either fail to lower or
            # silently all-gather full FPN maps onto every chip.  The XLA
            # pooler partitions cleanly; single-chip training keeps the
            # kernel.  (pooler_pallas is in predictor._RUNTIME_MODEL_FIELDS,
            # so the flip persisted into config.json is never adopted back.)
            import dataclasses

            cfg.model = dataclasses.replace(cfg.model, pooler_pallas=False)
        self.model = model or MaskRCNN(cfg.model)
        self.tx = None
        self.state: Optional[TrainState] = None
        self._step_fn = None
        os.makedirs(cfg.output_dir, exist_ok=True)
        # Persist the full config next to the checkpoints (Detectron2's
        # DefaultTrainer writes OUTPUT_DIR/config.yaml the same way,
        # /root/reference/nn_train.py:211 via trainer construction) so any
        # later consumer (bench.py, Predictor) can rebuild the *matching*
        # model — e.g. a checkpoint trained with 5 anchor aspect ratios
        # must not be loaded into a 3-ratio graph.
        with open(os.path.join(cfg.output_dir, "config.json"), "w") as f:
            f.write(cfg.dumps())

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        from uwcv_tpu.models.rcnn import init_params

        rng = rng if rng is not None else jax.random.key(self.cfg.solver.seed)
        params = init_params(self.model, rng)
        self.tx = make_optimizer(self.cfg, params)
        opt_state = self.tx.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        self.state = replicate(state, self.mesh)
        self._step_fn = make_train_step(self.model, self.cfg, self.tx)
        return self.state

    def load_params(self, params) -> None:
        """Install externally-built params (torch import / checkpoint)."""
        self.tx = make_optimizer(self.cfg, params)
        opt_state = self.tx.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        self.state = replicate(state, self.mesh)
        self._step_fn = make_train_step(self.model, self.cfg, self.tx)

    def fit(self, batch_iter: Iterator[Dict[str, np.ndarray]],
            max_iter: Optional[int] = None,
            log_fn=print, device_dataset=None) -> TrainState:
        """Run the training loop for max_iter steps (reference: 1000,
        nn_train.py:202).

        ``device_dataset``: HBM-staged dataset from
        ``TrainLoader.device_dataset()`` — then ``batch_iter`` must yield
        [B] int32 index vectors (``TrainLoader.index_batches()``) and each
        step gathers its batch on device.  None = classic streaming path
        (batch_iter yields host numpy batches)."""
        if self.state is None:
            self.init_state()
        indexed = device_dataset is not None
        if indexed:
            step_fn = make_train_step(self.model, self.cfg, self.tx,
                                      indexed=True)
        max_iter = max_iter or self.cfg.solver.max_iter
        rng = jax.random.key(self.cfg.solver.seed + 1)
        metrics_path = os.path.join(self.cfg.output_dir, "metrics.json")
        start_step = int(self.state.step)
        t0 = time.time()
        # TensorBoard event stream alongside metrics.json — the reference's
        # Colab workflow tails output/ with %tensorboard (SURVEY.md C17)
        from uwcv_tpu.utils.tb_writer import SummaryWriter

        tb = SummaryWriter(self.cfg.output_dir)
        try:
            # one-batch device prefetch: device_put is async, so batch i+1's
            # host→device upload overlaps step i's compute (on slow links —
            # remote-attached TPUs — the upload otherwise serializes with
            # every step; PERF.md measured it at ~55% of wall step time).
            # Guarded: a resumed-complete run (start_step >= max_iter) must
            # not consume (or StopIteration on) the iterator.
            def _put(x):
                if indexed:
                    # [B] int32 indices; shard over the data axis on meshes
                    # so each shard gathers its rows from the replicated
                    # dataset
                    arr = np.asarray(x, np.int32)
                    if self.mesh is not None and self.mesh.devices.size > 1:
                        from uwcv_tpu.parallel.mesh import batch_sharding

                        return jax.device_put(arr,
                                              batch_sharding(self.mesh))
                    return jax.device_put(arr)
                return shard_batch(x, self.mesh)

            pending = (_put(next(batch_iter))
                       if start_step < max_iter else None)
            with open(metrics_path, "a") as mf:
                for i in range(start_step, max_iter):
                    batch = pending
                    if i + 1 < max_iter:
                        pending = _put(next(batch_iter))
                    rng, step_rng = jax.random.split(rng)
                    if indexed:
                        self.state, metrics = step_fn(
                            self.state, device_dataset, batch, step_rng)
                    else:
                        self.state, metrics = self._step_fn(
                            self.state, batch, step_rng)
                    if (i + 1) % self.cfg.solver.log_period == 0 \
                            or i + 1 == max_iter:
                        m = {k: float(v) for k, v in metrics.items()}
                        m["iteration"] = i + 1
                        m["time_per_iter"] = (time.time() - t0) / max(
                            i + 1 - start_step, 1)
                        mf.write(json.dumps(m) + "\n")
                        mf.flush()
                        tb.add_scalars(i + 1, {f"train/{k}": v
                                               for k, v in m.items()
                                               if k != "iteration"})
                        log_fn(f"iter {i + 1}/{max_iter} "
                               + " ".join(f"{k}={v:.4f}"
                                          for k, v in m.items()
                                          if k != "iteration"))
                    if (self.cfg.solver.checkpoint_period > 0
                            and (i + 1) % self.cfg.solver.checkpoint_period
                            == 0):
                        self.save_checkpoint()
        finally:
            tb.close()
        self.save_checkpoint(final=True)
        return self.state

    def save_checkpoint(self, final: bool = False) -> str:
        from uwcv_tpu.engine.checkpoint import save_checkpoint, save_params

        step = int(self.state.step)
        path = save_checkpoint(self.cfg.output_dir, self.state, step)
        if final:
            # reference writes OUTPUT_DIR/model_final.pth (nn_train.py:213);
            # params-only — it is consumed by the Predictor (load_params),
            # not resumed from (ckpt_* holds the full TrainState for that)
            fpath = save_params(self.cfg.output_dir, self.state.params,
                                name="model_final")
            # pair the config ATOMICALLY with the params (orbax restores
            # fine around the extra file): adopt_checkpoint_model_cfg reads
            # ckpt_dir/config.json before the parent's, so a model_final
            # surviving from an earlier run can never be mispaired with a
            # NEWER output_dir/config.json written at a later Trainer init
            # (that mismatch made consumers fail the load and silently
            # measure random weights)
            with open(os.path.join(fpath, "config.json"), "w") as f:
                f.write(self.cfg.dumps())
        return path

    def resume_or_load(self, resume: bool = False) -> None:
        """Reference API (nn_train.py:212): resume=True continues from the
        latest checkpoint in output_dir; False loads cfg.weights if set,
        else fresh init."""
        from uwcv_tpu.engine.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
            load_weights,
        )

        if self.state is None:
            self.init_state()
        if resume:
            latest = latest_checkpoint(self.cfg.output_dir)
            if latest is not None:
                self.state = load_checkpoint(latest, self.state)
                self.state = replicate(self.state, self.mesh)
                return
        if self.cfg.weights:
            params = load_weights(self.cfg.weights, self.state.params,
                                  self.cfg.model)
            self.load_params(params)
