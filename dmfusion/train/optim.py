"""Optimizer + LR-schedule factories on optax.

Mirrors the reference factories (utils/utils.py:8-71): optimizers
ADAM/SGD/RMSprop and the eight scheduler variants, gated by
``schedule.if_scheduler``.  Torch schedulers step once per *epoch*
(solver/mainsolver.py:60), so every optax schedule here is expressed in
optimizer-update counts divided by ``steps_per_epoch``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Mapping

import optax


def make_schedule(cfg: Mapping[str, Any],
                  steps_per_epoch: int) -> Callable[[int], float] | None:
    sch = cfg["schedule"]
    if not sch.get("if_scheduler"):
        return None
    lr = float(sch["lr"])
    base_lr = float(sch["base_lr"])
    name = sch["scheduler"]
    epochs = int(cfg["epoch"])

    def per_epoch(fn):
        return lambda count: fn(count // steps_per_epoch)

    if name == "StepLR":
        gamma = base_lr / lr
        return per_epoch(lambda e: lr * gamma ** (e // 50))
    if name == "LinearLR":
        return per_epoch(
            lambda e: lr * (0.1 + 0.9 * min(e, 10) / 10))
    if name == "CosineAnnealingLR":
        return per_epoch(
            lambda e: base_lr + (lr - base_lr)
            * (1 + math.cos(math.pi * (e % 50) / 50)) / 2)
    if name == "CyclicLR":
        def cyclic(e):
            pos = e % 50
            if pos < 10:
                return base_lr + (lr - base_lr) * pos / 10
            return lr - (lr - base_lr) * (pos - 10) / 40
        return per_epoch(cyclic)
    if name == "OneCycleLR":
        def onecycle(e):
            pct = min(e / max(epochs, 1), 1.0)
            if pct < 0.5:
                return base_lr + (lr - base_lr) * (pct / 0.5)
            return lr - (lr - base_lr) * ((pct - 0.5) / 0.5)
        return per_epoch(onecycle)
    if name == "ConstantLR":
        factor = base_lr / lr
        return per_epoch(lambda e: lr * (factor if e < 10 else 1.0))
    if name == "ChainedScheduler":
        return per_epoch(
            lambda e: lr * (0.1 + 0.9 * min(e, 10) / 10) * 0.98 ** e)
    if name == "ExponentialLR":
        return per_epoch(lambda e: lr * 0.98 ** e)
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(cfg: Mapping[str, Any],
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sch = cfg["schedule"]
    lr_or_sched: Any = make_schedule(cfg, steps_per_epoch) or float(sch["lr"])
    opt_type = sch["optimizer"]
    if opt_type == "ADAM":
        return optax.adam(lr_or_sched)
    if opt_type == "SGD":
        return optax.sgd(lr_or_sched, momentum=float(sch.get("momentum", 0.9)))
    if opt_type == "RMSprop":
        return optax.rmsprop(lr_or_sched, decay=float(sch.get("alpha", 0.99)))
    raise ValueError(f"unknown optimizer {opt_type!r}")


def adam_beta(lr: float, b1: float = 0.5, b2: float = 0.999
              ) -> optax.GradientTransformation:
    """Adam with GAN betas (reference tostagesolver.py:73-82)."""
    return optax.adam(lr, b1=b1, b2=b2)
