"""Training utilities: optimizer/scheduler factories and metric recorder.

Parity with the reference factories (reference: pipeline/modules/
utils.py:15-133) expressed with optax: AdamW/Adam/SGD, identity/cosine/
warm-restart schedules, and the min/max/mean/best metric Recorder.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import optax


def build_schedule(sched_cfg, base_lr: float, steps_per_epoch: int,
                   num_epochs: int):
    """identity / cosine / cosine-restart (reference: pipeline/modules/
    utils.py:103-125, keyed the same way)."""
    kind = (sched_cfg.get("type", "identity") if sched_cfg else "identity")
    kwargs = dict(sched_cfg.get("kwargs", {})) if sched_cfg else {}
    total = max(steps_per_epoch * num_epochs, 1)
    kind = kind.lower()
    if kind in ("identity", "none", "constant"):
        return optax.constant_schedule(base_lr)
    if kind in ("cos", "cosine", "cosineannealinglr"):
        eta_min = float(kwargs.get("eta_min", 0.0))
        return optax.cosine_decay_schedule(base_lr, total,
                                           alpha=eta_min / max(base_lr, 1e-12))
    if kind in ("cosine_restart", "cosineannealingwarmrestarts"):
        t0 = int(kwargs.get("T_0", num_epochs)) * steps_per_epoch
        eta_min = float(kwargs.get("eta_min", 0.0))
        return optax.join_schedules(
            [optax.cosine_decay_schedule(base_lr, t0,
                                         alpha=eta_min / max(base_lr, 1e-12))
             for _ in range(max(total // t0, 1))],
            boundaries=[t0 * (i + 1) for i in range(max(total // t0, 1) - 1)])
    raise ValueError(f"unknown scheduler type: {kind}")


def build_optimizer(opt_cfg, schedule) -> optax.GradientTransformation:
    """adamw / adam / sgd (reference: pipeline/modules/utils.py:86-100)."""
    kind = opt_cfg.get("type", "adamw").lower()
    kwargs = dict(opt_cfg.get("kwargs", {}))
    kwargs.pop("lr", None)
    if kind == "adamw":
        wd = float(kwargs.pop("weight_decay", 1e-2))
        return optax.adamw(schedule, weight_decay=wd,
                           b1=kwargs.get("betas", (0.9, 0.999))[0],
                           b2=kwargs.get("betas", (0.9, 0.999))[1])
    if kind == "adam":
        return optax.adam(schedule)
    if kind == "sgd":
        return optax.sgd(schedule,
                         momentum=float(kwargs.get("momentum", 0.0)))
    raise ValueError(f"unknown optimizer type: {kind}")


class Recorder:
    """Metric aggregation with min/max/mean and running-best reductions
    (reference: pipeline/modules/utils.py:15-83)."""

    def __init__(self):
        self._data: Dict[str, List[float]] = {}

    def add_dict(self, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self._data.setdefault(k, []).append(float(v))

    def add_item(self, key: str, value: float) -> None:
        self._data.setdefault(key, []).append(float(value))

    def mean(self, key: str) -> float:
        return float(np.mean(self._data[key]))

    def min(self, key: str) -> float:
        return float(np.min(self._data[key]))

    def max(self, key: str) -> float:
        return float(np.max(self._data[key]))

    def keys(self):
        return self._data.keys()

    def clear(self) -> None:
        self._data.clear()

    def summary(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self._data.items()}
