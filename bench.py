"""Benchmark: full-scene classification throughput (patches/sec/chip).

The north-star workload (BASELINE.md): the reference renders a
classification map by cropping one (16,16,4) MS + (64,64) PAN window per
pixel in Python and forwarding batches on CPU
(solver/mainsolver.py:155-201 + train/dataset.py:168-185).  For image6
that is ~4.2M patch forwards.

This bench builds an image6-geometry synthetic scene and measures:
  * baseline: a torch-CPU pipeline with the reference's per-sample
    window-crop dataset loop and an equivalent dual-branch conv net
    (the reference ships no model, so FLOP-equivalent is the fairest
    stand-in), and
  * dmfusion: the jitted scan over HBM-resident scene tensors on the
    available accelerator (1 TPU chip in the driver run).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PATCH = 16
WIDTH = 64          # flagship gmfnet width
CITY = "image6"
BASELINE_PATCHES = 1536       # torch-CPU sample size (it is slow)
BENCH_BATCH = 4096
BENCH_STEPS = 24              # timed batches on the accelerator
WARMUP_STEPS = 2


def build_cfg():
    from dmfusion.config import load_config
    return load_config(overrides={
        "data_city": CITY,
        "patch_size": PATCH,
        "model_width": WIDTH,
        "seed": 0,
        "precision": {"compute_dtype": "bfloat16", "param_dtype": "float32"},
    })


def torch_cpu_baseline(ms_pad: np.ndarray, pan_pad: np.ndarray,
                       n_patches: int) -> float:
    """Reference-style CPU pipeline: per-sample numpy window crops +
    torch conv forward, batch 300 (reference test_batchsize)."""
    import torch
    import torch.nn as nn
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    class DualNet(nn.Module):
        # FLOP-equivalent of the flagship gmfnet (same widths/strides).
        def __init__(self, w=WIDTH, ncls=12):
            super().__init__()
            self.ms = nn.Sequential(
                nn.Conv2d(4, w // 2, 3, padding=1), nn.ReLU(),
                nn.Conv2d(w // 2, w, 3, padding=1), nn.ReLU(),
                nn.Conv2d(w, w, 3, padding=1), nn.ReLU())
            self.pan = nn.Sequential(
                nn.Conv2d(1, w // 2, 3, 2, 1), nn.ReLU(),
                nn.Conv2d(w // 2, w, 3, 2, 1), nn.ReLU(),
                nn.Conv2d(w, w, 3, padding=1), nn.ReLU())
            self.trunk = nn.Sequential(
                nn.Conv2d(2 * w, 2 * w, 3, 2, 1), nn.ReLU(),
                nn.Conv2d(2 * w, 2 * w, 3, padding=1), nn.ReLU(),
                nn.Conv2d(2 * w, 4 * w, 3, 2, 1), nn.ReLU())
            self.head = nn.Linear(4 * w, ncls)

        def forward(self, m, p):
            f = torch.cat([self.ms(m), self.pan(p)], 1)
            f = self.trunk(f).mean((2, 3))
            return self.head(f)

    model = DualNet().eval()
    h = ms_pad.shape[0] - PATCH + 1
    w = ms_pad.shape[1] - PATCH + 1
    rng = np.random.default_rng(0)
    xs = rng.integers(0, h, n_patches)
    ys = rng.integers(0, w, n_patches)
    batch = 300  # reference test_batchsize (config.yml:33)

    t0 = time.perf_counter()
    with torch.no_grad():
        for start in range(0, n_patches, batch):
            bx, by = xs[start:start + batch], ys[start:start + batch]
            ms_list, pan_list = [], []
            for x, y in zip(bx, by):  # the reference's per-sample crop loop
                ms_list.append(torch.from_numpy(
                    ms_pad[x:x + PATCH, y:y + PATCH, :].transpose(2, 0, 1)))
                pan_list.append(torch.from_numpy(
                    pan_pad[4 * x:4 * x + 4 * PATCH,
                            4 * y:4 * y + 4 * PATCH][None]))
            m = torch.stack(ms_list).float()
            p = torch.stack(pan_list).float()
            out = model(m, p)
            out.argmax(1)
    dt = time.perf_counter() - t0
    return n_patches / dt


def main() -> None:
    t_start = time.time()
    cfg = build_cfg()

    import jax
    import jax.numpy as jnp
    from dmfusion.data import synthetic_scene
    from dmfusion.models import build_model
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import DualPrograms

    scene = synthetic_scene(cfg)
    ms_np = np.asarray(scene.ms, np.float32)
    pan_np = np.asarray(scene.pan, np.float32)

    baseline = torch_cpu_baseline(ms_np, pan_np, BASELINE_PATCHES)
    print(f"# torch-CPU baseline: {baseline:.1f} patches/s", file=sys.stderr)

    model = build_model(cfg, "gmfnet")
    prog = DualPrograms(model, make_optimizer(cfg, 1), cfg, scene.width,
                        scene.patch, mesh=None)
    params, _ = prog.init(jax.random.PRNGKey(0))

    n = scene.num_pixels
    rng = np.random.default_rng(0)

    # Timed program returns a scalar so timing forces the device round
    # trip — on tunneled backends block_until_ready can return early, so
    # only host materialization is a trustworthy fence.
    run = jax.jit(lambda p, s0, s1, ids: prog._predict(
        p, (s0, s1), ids).sum())

    def fresh_ids():
        ids = rng.integers(0, n, (BENCH_STEPS, BENCH_BATCH))
        out = jnp.asarray(ids, jnp.int32)
        int(out.sum())  # materialize input before the timer starts
        return out

    float(run(params, scene.ms, scene.pan, fresh_ids()))  # compile + warm
    times = []
    for _ in range(3):
        ids = fresh_ids()
        t0 = time.perf_counter()
        float(run(params, scene.ms, scene.pan, ids))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    throughput = (BENCH_STEPS * BENCH_BATCH) / dt
    print(f"# dmfusion: {throughput:.1f} patches/s on "
          f"{jax.devices()[0].platform} "
          f"(times {[f'{t * 1e3:.0f}ms' for t in times]}, "
          f"total bench {time.time() - t_start:.0f}s)", file=sys.stderr)

    print(json.dumps({
        "metric": "full_scene_inference_throughput",
        "value": round(throughput, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(throughput / baseline, 2),
    }))


if __name__ == "__main__":
    main()
