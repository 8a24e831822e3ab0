"""A/B: does UNROLLING the repeated-map scan restore Pallas-pool wins?

bench.py's flagship number times 8 full-scene dense passes inside ONE
jitted ``lax.scan`` (amortizing the tunnel's fixed ~33 ms per-call
dispatch).  Inside a scan body the fused Pallas pooling kernel loses
XLA's cross-iteration overlap (BENCH_NOTES.md: a custom call acts as a
scheduling barrier the rolled-loop scheduler cannot pipeline around),
so the scan variant has had to fall back to the ~23 ms XLA phase-SAT
pool even though the kernel runs the same pooling in ~4 ms single-shot.

``lax.scan(..., unroll=N)`` emits the bodies as straight-line code —
the scheduler can then interleave custom calls with neighboring
iterations' convs.  This times, at image6 geometry (w32, bf16):

  A. rolled scan-8, XLA pool        (current bench structure)
  B. unrolled scan-8, XLA pool
  C. unrolled scan-8, Pallas pool
  D. single-shot, Pallas pool       (dispatch-bound reference point)

Run on the TPU:  python tools/map_unroll_bench.py [city] [width]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dmfusion.config import load_config
from dmfusion.models import build_model
from dmfusion.train.optim import make_optimizer
from dmfusion.train.steps import DensePrograms

SCANS = 8


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image6"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    def make_prog(pallas_pool):
        cfg = load_config(overrides={
            "data_city": city, "model_name": "dense_fusion",
            "model_width": width, "seed": 0,
            "precision": {"compute_dtype": "bfloat16",
                          "param_dtype": "float32",
                          "pallas_pool": pallas_pool},
        })
        model = build_model(cfg)
        return cfg, DensePrograms(model, make_optimizer(cfg, 1), cfg,
                                  cfg["DATA_DICT"][city]["size"][1],
                                  cfg["patch_size"], None)

    cfg, prog_x = make_prog(0)
    _, prog_p = make_prog(1)
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]
    key = jax.random.PRNGKey(0)
    ms = jax.random.uniform(key, (h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.random.uniform(jax.random.fold_in(key, 1),
                             (4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                             jnp.float32)
    params, _ = prog_x.init(jax.random.PRNGKey(1))
    float(ms.sum())

    def many(prog, unroll):
        def fn(p, s0, s1):
            def body(csum, i):
                pm = prog.predict_map(p, (s0 + i, s1))
                return csum + pm.sum(), None
            r, _ = lax.scan(body, jnp.int32(0),
                            jnp.arange(1, SCANS + 1,
                                       dtype=s0.dtype) * 1e-6,
                            unroll=unroll)
            return r
        return jax.jit(fn)

    single = jax.jit(lambda p, s0, s1: prog_p.predict_map(
        p, (s0, s1)).sum())

    def timeit(label, fn, div):
        t0 = time.perf_counter()
        int(fn(params, ms, pan))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = 1e9
        for i in range(3):
            msi = ms + 1e-4 * i
            float(msi.sum())
            t0 = time.perf_counter()
            int(fn(params, msi, pan))
            best = min(best, (time.perf_counter() - t0) / div)
        px = h * w
        print(f"{label}: {best * 1e3:.1f} ms/pass "
              f"({px / best / 1e6:.1f}M px/s)", flush=True)
        return best

    a = timeit("A rolled-8  XLA pool   ", many(prog_x, 1), SCANS)
    b = timeit("B unroll-8  XLA pool   ", many(prog_x, SCANS), SCANS)
    c_ = timeit("C unroll-8  Pallas pool", many(prog_p, SCANS), SCANS)
    d = timeit("D single    Pallas pool", single, 1)
    print(f"best: {min(a, b, c_, d) * 1e3:.1f} ms/pass")


if __name__ == "__main__":
    main()
