"""Probe: do row-band-batched convs beat XLA's space-to-batch?

`tools/trunk_hlo_probe.py` shows every batch-1 whole-scene conv gets a
space-to-batch repack: a kLoop operand fusion + 130-260 MB `pad`
kernels per conv (the 1058-col axis is split into 8 chunks of 133+2
halo).  AOT census of a 2-conv chain: batch-1 moves 1.6 GB of `pad` +
1.3 GB of fusions for 0.5 GB of conv output; pre-banding rows into
batch=8 drops the pads to ZERO (fusions/copies remain).

This probe times a 4-conv relu chain (the trunk's shape) both ways on
the real chip, fresh input per iteration (that is what the model pays
— each map pass reads a new scene/activation):

  A  (1, 1008, 1058, 128)  whole-scene batch-1 (current model form)
  B  (8,  144, 1058, 128)  8 row-bands with 2*9-row halos as batch
                           (+14.3% redundant FLOPs)

Run on the TPU:  python tools/band_batch_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SCANS = 12
NCONV = 4
C = 128


def chain(x, ws):
    for k in range(NCONV):
        x = lax.conv_general_dilated(
            x, ws[k], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        if k < NCONV - 1:
            x = jnp.maximum(x, 0)
    return x


def scan_of():
    def run(x, ws):
        def body(csum, i):
            out = chain(x + i, ws)
            return csum + out.astype(jnp.float32).sum(), None
        r, _ = lax.scan(
            body, jnp.float32(0),
            jnp.arange(1, SCANS + 1, dtype=jnp.bfloat16) * jnp.bfloat16(1e-3),
            unroll=SCANS)
        return r
    return jax.jit(run)


def best_of(jfn, x, ws):
    float(jfn(x, ws))
    best = 1e9
    for i in range(3):
        x2 = x + jnp.bfloat16(1e-3 * (i + 1))
        float(x2.sum())
        t0 = time.perf_counter()
        float(jfn(x2, ws))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    h, w_ = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1008, 1058)
    nb = 8
    bh = h // nb + 18          # RECEPTIVE_RADIUS-style halo

    key = jax.random.PRNGKey(0)
    ws = (jax.random.normal(key, (NCONV, 3, 3, C, C), jnp.float32)
          / np.sqrt(9 * C)).astype(jnp.bfloat16)
    xa = jax.random.normal(jax.random.fold_in(key, 1),
                           (1, h, w_, C), jnp.float32).astype(jnp.bfloat16)
    xb = jax.random.normal(jax.random.fold_in(key, 2),
                           (nb, bh, w_, C), jnp.float32).astype(jnp.bfloat16)
    float(xa.sum()); float(xb.sum())

    calib = best_of(scan_of(),
                    jnp.zeros((1, 8, 8, C), jnp.bfloat16), ws)
    print(f"calibration (dispatch): {calib * 1e3:.1f} ms", flush=True)

    for label, x in (("A batch1 whole", xa), ("B batch8 bands", xb)):
        n_px = x.shape[0] * x.shape[1] * x.shape[2]
        flops = 2 * 9 * C * C * n_px * NCONV
        t0 = time.perf_counter()
        jfn = scan_of()
        best = best_of(jfn, x, ws)
        per = (best - calib) / SCANS
        print(f"{label}: {per * 1e3:.2f} ms/pass ({flops / per / 1e12:.1f} "
              f"TF/s, {n_px / 1e6:.2f} Mpx) [compile "
              f"{time.perf_counter() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
