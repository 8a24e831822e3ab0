"""Gather-only throughput: strip kernel vs production per-patch DMA.

The production Pallas gather is DMA-issue-rate bound at full-scene
batches (~135 ms / 98,304 dual anchors, BENCH_NOTES.md "gather
headroom").  The strip kernel (ops/pallas_strip_gather.py) fetches ONE
aligned slab per 128 consecutive raster anchors.  VERDICT r2 next #9:
>= 2x gather-only throughput at B=98k raster anchors, or a negative
finding.

Run on the TPU:  python tools/strip_gather_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dmfusion.config import load_config
from dmfusion.data import synthetic_scene

B = 98_304
STRIP = 128
SCANS = 8


def main() -> None:
    cfg = load_config(overrides={"data_city": "image6", "patch_size": 16,
                                 "seed": 0})
    scene = synthetic_scene(cfg)
    ps, width = scene.patch, scene.width
    rng = np.random.default_rng(0)

    from dmfusion.ops.pallas_gather import gather_dual_fast
    from dmfusion.ops.pallas_strip_gather import gather_dual_strips

    # -- production per-patch path (random anchors, as in round 2) -----
    ids = jnp.asarray(rng.integers(0, scene.num_pixels, (SCANS, B)),
                      jnp.int32)

    def prod_many(ms, pan, ids):
        def body(c, ids_b):
            m, p = gather_dual_fast(ms, pan, ids_b, width, ps)
            return c + m.sum() + p.sum(), None
        r, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return r

    run_prod = jax.jit(prod_many)

    # -- strip path (raster anchors on the S-grid) ---------------------
    n_strips = B // STRIP
    per_row = (width - ps + 1) // STRIP          # full strips per row
    rows_needed = -(-n_strips // per_row)
    xs0 = np.repeat(np.arange(rows_needed), per_row)[:n_strips]
    y0s0 = np.tile(np.arange(per_row) * STRIP, rows_needed)[:n_strips]
    xs_all = jnp.asarray(np.stack([xs0 + i for i in range(SCANS)]),
                         jnp.int32)
    y0s = jnp.asarray(y0s0, jnp.int32)

    def strip_many(ms, pan, xs_all, y0s):
        def body(c, xs):
            m, p = gather_dual_strips(ms, pan, xs, y0s, width, ps,
                                      strip=STRIP)
            return c + m.sum() + p.sum(), None
        r, _ = jax.lax.scan(body, jnp.float32(0), xs_all)
        return r

    run_strip = jax.jit(strip_many)

    def timed(fn, *args):
        float(fn(*args))            # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, (time.perf_counter() - t0) / SCANS)
        return best

    t_prod = timed(run_prod, scene.ms, scene.pan, ids)
    print(f"production per-patch DMA: {t_prod * 1e3:.1f} ms / {B} anchors "
          f"= {B / t_prod / 1e3:.0f}k anchors/s", flush=True)
    t_strip = timed(run_strip, scene.ms, scene.pan, xs_all, y0s)
    print(f"strip kernel (S={STRIP}):  {t_strip * 1e3:.1f} ms / {B} anchors "
          f"= {B / t_strip / 1e3:.0f}k anchors/s")
    print(f"speedup: {t_prod / t_strip:.2f}x")


if __name__ == "__main__":
    main()
