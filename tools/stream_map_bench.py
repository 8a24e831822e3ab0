"""Measure the SINGLE-CHIP streamed dense map at city scale.

Round-2's verdict gap: image9/image10 (6905x7300, ~50M px) had no
runnable full-scene dense path on one chip — the whole-scene s2d
intermediate tile-pads ~16x (a ~26 GB allocation, BENCH_NOTES.md
"image9 single-chip").  The streamed path (train/steps.py::
class_map_streamed) runs the exact multi-chip clamped-band geometry
*sequentially* inside one lax.scan, bounding intermediates to one band.

Run on the TPU:  python tools/stream_map_bench.py [city] [streams]
    [f32|bf16] [unroll] [pallas]
(streams 0 = the knob's auto resolution; unroll > 1 pipelines adjacent
bands — the round-3 unroll finding; pallas 1 forces the fused pool
kernel).  Synthetic scene generated on-device (no dataset needed;
geometry is what matters).
"""

import sys
import time

import jax
import jax.numpy as jnp

from dmfusion.config import load_config
from dmfusion.models import build_model
from dmfusion.train.optim import make_optimizer
from dmfusion.train.steps import DensePrograms


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image9"
    streams = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    dtype = jnp.bfloat16 if len(sys.argv) > 3 and sys.argv[3] == "bf16" \
        else jnp.float32

    unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    pallas = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    over = {"data_city": city, "model_name": "dense_fusion",
            "model_width": 32, "dense_stream_unroll": unroll,
            "precision": {"compute_dtype": "bfloat16",
                          "param_dtype": "float32",
                          "pallas_pool": pallas}}
    if streams:
        over["dense_streams"] = streams
    cfg = load_config(overrides=over)
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]

    key = jax.random.PRNGKey(0)
    ms = jax.random.uniform(key, (h + ps - 1, w + ps - 1, c), dtype)
    pan = jax.random.uniform(jax.random.fold_in(key, 1),
                             (4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                             dtype)
    float(ms.sum())

    model = build_model(cfg)
    prog = DensePrograms(model, make_optimizer(cfg, 1), cfg, w, ps, None)
    params, _ = prog.init(jax.random.PRNGKey(1))
    n_bands = prog._stream_bands(ms.shape[0], ms.shape[1])
    print(f"{city}: {h}x{w} = {h * w / 1e6:.1f}M px, "
          f"streams={n_bands or 'OFF (whole-scene)'}, scene dtype "
          f"{dtype.__name__}", flush=True)

    pm = jax.jit(lambda p, a, b: prog.predict_map(p, (a, b)))

    def run(i: int) -> float:
        ms_i = ms + jnp.asarray(1e-4, dtype) * jax.random.normal(
            jax.random.fold_in(key, 100 + i), ms.shape, dtype)
        float(ms_i.sum())   # materialize fresh input before the timer
        t0 = time.perf_counter()
        r = pm(params, ms_i, pan)
        s = int(r.astype(jnp.int32).sum())   # host fence (tunnel-safe)
        dt = time.perf_counter() - t0
        assert 0 <= s
        return dt

    t0 = time.perf_counter()
    run(99)
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    times = [run(i) for i in range(3)]
    best = min(times)
    print(f"map times: {[f'{t:.3f}s' for t in times]}")
    print(f"best {best * 1e3:.0f} ms  ->  {h * w / best / 1e6:.1f}M px/s "
          f"on one chip")


if __name__ == "__main__":
    main()
