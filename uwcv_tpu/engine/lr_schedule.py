"""LR schedule — Detectron2 WarmupMultiStepLR semantics (SURVEY.md N7).

Reference solver: BASE_LR=2.5e-4, STEPS=[] → constant LR after linear warmup
(nn_train.py:203-204).  optax-native implementation.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from uwcv_tpu.config import SolverConfig


def warmup_multistep(cfg: SolverConfig):
    """step → lr.  Linear warmup from warmup_factor·base_lr to base_lr over
    warmup_iters, then ×gamma at each milestone in cfg.steps."""
    base = cfg.base_lr
    steps = jnp.asarray(sorted(cfg.steps), jnp.int32) if cfg.steps else None
    wf = cfg.warmup_factor
    wi = max(cfg.warmup_iters, 1)

    def schedule(count):
        t = jnp.minimum(count / wi, 1.0)
        warm = wf * (1.0 - t) + t
        lr = base * warm
        if steps is not None:
            decays = jnp.sum((count >= steps).astype(jnp.float32))
            lr = lr * (cfg.gamma ** decays)
        return lr

    return schedule
