"""Optimizer/schedule factory semantics (reference utils/utils.py:8-71)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from dmfusion.train.optim import make_optimizer, make_schedule


def _cfg(**sched):
    base = {"loss": "Criterion", "optimizer": "ADAM", "if_scheduler": 1,
            "scheduler": "ExponentialLR", "activate": "Relu",
            "lr": 1e-2, "base_lr": 1e-3, "momentum": 0.9, "alpha": 0.99}
    base.update(sched)
    return {"schedule": base, "epoch": 50}


def test_scheduler_off_returns_none():
    cfg = _cfg(if_scheduler=0)
    assert make_schedule(cfg, 10) is None


def test_exponential_per_epoch_steps():
    cfg = _cfg(scheduler="ExponentialLR")
    sched = make_schedule(cfg, steps_per_epoch=10)
    # Within one epoch (10 update steps) the lr is constant; epoch e
    # multiplies by 0.98 (torch ExponentialLR gamma=0.98).
    assert sched(0) == sched(9) == pytest.approx(1e-2)
    assert sched(10) == pytest.approx(1e-2 * 0.98)
    assert sched(25) == pytest.approx(1e-2 * 0.98 ** 2)


def test_cosine_annealing_range():
    cfg = _cfg(scheduler="CosineAnnealingLR")
    sched = make_schedule(cfg, 1)
    vals = [sched(e) for e in range(50)]
    assert vals[0] == pytest.approx(1e-2)
    assert min(vals) >= 1e-3 - 1e-9
    assert vals[25] < vals[0]


def test_cyclic_up_down():
    cfg = _cfg(scheduler="CyclicLR")
    sched = make_schedule(cfg, 1)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(10) == pytest.approx(1e-2)   # peak after 10 up-steps
    assert sched(30) < sched(10)              # descending over 40 steps


@pytest.mark.parametrize("name", ["StepLR", "LinearLR", "CosineAnnealingLR",
                                  "CyclicLR", "OneCycleLR", "ConstantLR",
                                  "ChainedScheduler", "ExponentialLR"])
def test_all_schedulers_positive(name):
    sched = make_schedule(_cfg(scheduler=name), 3)
    for step in (0, 7, 64, 149):
        v = sched(step)
        assert 0 < v <= 1e-2 + 1e-9, (name, step, v)


@pytest.mark.parametrize("opt", ["ADAM", "SGD", "RMSprop"])
def test_optimizer_factory_updates(opt):
    tx = make_optimizer({**_cfg(if_scheduler=0),
                         "schedule": {**_cfg()["schedule"],
                                      "optimizer": opt, "if_scheduler": 0}})
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(new["w"][0]) < 1.0  # descent direction


def _torch_scheduler(name, optimizer, lr, base_lr, epochs):
    import torch.optim.lr_scheduler as ls
    if name == "StepLR":
        return ls.StepLR(optimizer, step_size=50, gamma=base_lr / lr)
    if name == "LinearLR":
        return ls.LinearLR(optimizer, start_factor=0.1, end_factor=1,
                           total_iters=10)
    if name == "CosineAnnealingLR":
        return ls.CosineAnnealingLR(optimizer, 50, base_lr)
    if name == "CyclicLR":
        return ls.CyclicLR(optimizer, base_lr=base_lr, max_lr=lr,
                           step_size_up=10, step_size_down=40,
                           cycle_momentum=False)
    if name == "OneCycleLR":
        return ls.OneCycleLR(optimizer, max_lr=lr, pct_start=0.5,
                             total_steps=epochs, div_factor=lr / base_lr,
                             final_div_factor=lr / base_lr)
    if name == "ConstantLR":
        return ls.ConstantLR(optimizer, factor=base_lr / lr, total_iters=10)
    if name == "ChainedScheduler":
        return ls.ChainedScheduler([
            ls.LinearLR(optimizer, start_factor=0.1, end_factor=1,
                        total_iters=10),
            ls.ExponentialLR(optimizer, gamma=0.98)])
    if name == "ExponentialLR":
        return ls.ExponentialLR(optimizer=optimizer, gamma=0.98)
    raise ValueError(name)


@pytest.mark.parametrize("name", ["StepLR", "LinearLR", "CosineAnnealingLR",
                                  "CyclicLR", "OneCycleLR", "ConstantLR",
                                  "ChainedScheduler", "ExponentialLR"])
def test_scheduler_golden_vs_torch(name):
    """Per-epoch LR parity with the exact torch schedulers the reference
    factory builds (utils/utils.py:39-71), over 100 epochs (OneCycleLR:
    its torch total_steps, beyond which torch raises)."""
    import torch
    lr, base_lr, epochs = 1e-2, 1e-3, 50
    n = epochs if name == "OneCycleLR" else 100
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    tsched = _torch_scheduler(name, opt, lr, base_lr, epochs)
    golden = []
    for _ in range(n):
        golden.append(opt.param_groups[0]["lr"])
        tsched.step()
    sched = make_schedule(_cfg(scheduler=name, lr=lr, base_lr=base_lr), 1)
    ours = [sched(e) for e in range(n)]
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-12,
                               err_msg=name)


def test_unknown_raises():
    with pytest.raises(ValueError):
        make_schedule(_cfg(scheduler="Nope"), 1)
    bad = _cfg(if_scheduler=0)
    bad["schedule"]["optimizer"] = "Nope"
    with pytest.raises(ValueError):
        make_optimizer(bad)
