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
        # torch closed form (T_max=50, eta_min=base_lr): the cosine
        # continues past T_max (period 100, mirroring back up) — no
        # restart/modulo (reference utils/utils.py:47-48).
        return per_epoch(
            lambda e: base_lr + (lr - base_lr)
            * (1 + math.cos(math.pi * e / 50)) / 2)
    if name == "CyclicLR":
        def cyclic(e):
            pos = e % 50
            if pos < 10:
                return base_lr + (lr - base_lr) * pos / 10
            return lr - (lr - base_lr) * (pos - 10) / 40
        return per_epoch(cyclic)
    if name == "OneCycleLR":
        # torch OneCycleLR(max_lr=lr, pct_start=0.5, total_steps=epoch,
        # div_factor=final_div_factor=lr/base_lr), default cos anneal
        # (reference utils/utils.py:53-57): initial = base_lr, peak at
        # step pct_start*total-1, min = base_lr^2/lr at total-1.
        min_lr = base_lr * base_lr / lr

        def anneal_cos(start, end, pct):
            return end + (start - end) / 2 * (1 + math.cos(math.pi * pct))

        up_end = 0.5 * epochs - 1
        dn_end = epochs - 1

        def onecycle(e):
            e = min(e, dn_end)
            if e <= up_end:
                return anneal_cos(base_lr, lr, e / max(up_end, 1e-12))
            return anneal_cos(lr, min_lr,
                              (e - up_end) / max(dn_end - up_end, 1e-12))
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
