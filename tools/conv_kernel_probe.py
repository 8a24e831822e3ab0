"""Probe: which Pallas 3x3-conv decomposition beats XLA's conv?

The dense map pass is trunk-dominated (features 27.3 ms of the 37.1 ms
map, trunk alone 24.6 — tools/features_probe.py) and the trunk is ~19 ms
of 3x3x128->128 convs running at ~40% MXU (3.9 ms per 314-GFLOP conv).
The round-2 Pallas conv prototype (9 sublane-shifted VMEM dots) reached
~90 TF/s — only ~10% over XLA — so it was dropped.  Before investing in
a fused-trunk kernel, this probe measures the candidate inner conv
structures standalone, same shapes as the image6 trunk:

  xla      lax.conv_general_dilated (the current trunk path)
  shift9   9 dots, each operand a (dy, dx)-shifted slab slice — the
           dx in {-1,0,+1} slices are UNALIGNED sublane reads (shuffles
           feeding the MXU); round-2 prototype recreation
  copy3    materialize the two dx-shifted copies once (2 shuffle passes)
           then 9 dots whose operands differ only by row offsets —
           row offsets are major-dim slices, layout-free
  cat384   the 3 dx copies written into one (rows, cols, 384) buffer
           (aligned 128-lane writes), then 3 dots with K=384 — fewer,
           deeper MXU contractions

All Pallas variants share the double-buffered HBM->VMEM slab DMA of
ops/pallas_pool.py and compute bi x njt output tiles from a slab with
+16-row/col halo canvas (8-aligned starts/extents per Mosaic).  Interior
numerics are checked against the XLA conv (bf16 tolerance).

Run on the TPU:  python tools/conv_kernel_probe.py [H W] [bi njt]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
SCANS = 24
HALO = 8          # canvas pad; conv needs 1, 8 keeps DMA starts aligned


def _dma_loop(kern_body):
    """Wrap a per-tile compute body with the double-buffered slab DMA."""

    def kernel(x_hbm, w_ref, out_ref, slab, sem, *extra, bi, njt):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nr = pl.num_programs(0)
        nc = pl.num_programs(1)

        def issue(slot, ii, jj):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * bi, bi + 2 * HALO),
                         pl.ds(jj * njt, njt + 2 * HALO), :],
                slab.at[slot], sem.at[slot])

        step = i * nc + j

        @pl.when(step == 0)
        def _():
            issue(0, i, j).start()

        nxt = step + 1

        @pl.when(nxt < nr * nc)
        def _():
            issue(nxt % 2, (nxt // nc), (nxt % nc)).start()

        issue(step % 2, i, j).wait()
        sl = slab[step % 2]                      # (bi+16, njt+16, C)
        kern_body(sl, w_ref, out_ref, *extra, bi=bi, njt=njt)

    return kernel


def _body_shift9(sl, w_ref, out_ref, *, bi, njt):
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = sl[HALO - 1 + dy:HALO - 1 + dy + bi,
                   HALO - 1 + dx:HALO - 1 + dx + njt, :]
            p = jax.lax.dot_general(
                a.reshape(bi * njt, C), w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    out_ref[...] = acc.reshape(bi, njt, C).astype(out_ref.dtype)


def _body_copy3(sl, w_ref, out_ref, h3, *, bi, njt):
    # Materialize the dx shifts ONCE via scratch stores (stores normalize
    # the shifted layouts), then feed the MXU 9 layout-clean operands
    # whose row offsets are free major-dim slices.
    rows = bi + 2
    for dx in range(3):
        h3[dx] = sl[HALO - 1:HALO - 1 + rows,
                    HALO - 1 + dx:HALO - 1 + dx + njt, :]
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = h3[dx, dy:dy + bi]
            p = jax.lax.dot_general(
                a.reshape(bi * njt, C), w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    out_ref[...] = acc.reshape(bi, njt, C).astype(out_ref.dtype)


def _body_cat384(sl, w_ref, out_ref, bbuf, *, bi, njt):
    rows = bi + 2
    for dx in range(3):
        bbuf[:, :, dx * C:(dx + 1) * C] = sl[
            HALO - 1:HALO - 1 + rows,
            HALO - 1 + dx:HALO - 1 + dx + njt, :]
    acc = None
    for dy in range(3):
        a = bbuf[dy:dy + bi]
        p = jax.lax.dot_general(
            a.reshape(bi * njt, 3 * C), w_ref[dy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    out_ref[...] = acc.reshape(bi, njt, C).astype(out_ref.dtype)


def make_conv(body, bi, njt, cat=False, scratch=None):
    kernel = functools.partial(_dma_loop(body), bi=bi, njt=njt)

    def conv(xpad, w, nr, nc):
        if cat:
            # wk[dy, dx*C + c, o] must equal w[dy, dx, c, o]: a row-major
            # reshape of (3, 3, C, C) over (dx, c) is exactly that.
            wk = w.reshape(3, 3 * C, C)
        else:
            wk = w
        return pl.pallas_call(
            kernel,
            grid=(nr, nc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bi, njt, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nr * bi, nc * njt, C),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, bi + 2 * HALO, njt + 2 * HALO, C),
                           jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ] + (scratch or []),
        )(xpad, wk)

    return conv


def main() -> None:
    h, w_ = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1008, 1058)
    bi, njt = (int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4 \
        else (32, 128)
    nr = -(-h // bi)
    nc = -(-w_ // njt)
    hp = nr * bi + 2 * HALO
    wp = nc * njt + 2 * HALO

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, w_, C), jnp.float32).astype(jnp.bfloat16)
    wgt = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                             jnp.float32) / np.sqrt(9 * C)).astype(
                                 jnp.bfloat16)
    xpad = jnp.zeros((hp, wp, C), jnp.bfloat16).at[
        HALO:HALO + h, HALO:HALO + w_].set(x)
    float(xpad.sum())

    def xla_conv(xx, w):
        return lax.conv_general_dilated(
            xx[None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)[0]

    variants = {
        "shift9": make_conv(_body_shift9, bi, njt),
        "copy3": make_conv(
            _body_copy3, bi, njt,
            scratch=[pltpu.VMEM((3, bi + 2, njt, C), jnp.bfloat16)]),
        "cat384": make_conv(
            _body_cat384, bi, njt, cat=True,
            scratch=[pltpu.VMEM((bi + 2, njt, 3 * C), jnp.bfloat16)]),
    }

    # numerics: interior must match XLA conv to bf16 tolerance
    ref = np.asarray(xla_conv(x, wgt), np.float32)
    for name, fn in variants.items():
        got = np.asarray(fn(xpad, wgt, nr, nc), np.float32)[:h, :w_]
        err = np.abs(got[1:-1, 1:-1] - ref[1:-1, 1:-1]).max()
        print(f"{name}: max interior |err| vs XLA = {err:.3e}", flush=True)
        assert err < 0.1, name

    flops_x = 2 * 9 * C * C * h * w_
    flops_k = 2 * 9 * C * C * (nr * bi) * (nc * njt)

    # Timing: SCANS iterations inside one jit; the loop body perturbs
    # only the 295 KB WEIGHTS per iteration (an input perturbation would
    # add an unfused whole-tensor pass that XLA can fuse into its conv
    # read but a custom call cannot — biased).  The fixed ~33 ms
    # dispatch cost is measured by an empty-body calibration scan and
    # subtracted (CLAUDE.md timing rules).
    def scan_of(fn_body):
        def run(xx, w):
            def bodyf(csum, i):
                out = fn_body(xx, w * (1 + i))
                return csum + out.astype(jnp.float32).sum(), None
            r, _ = lax.scan(
                bodyf, jnp.float32(0),
                jnp.arange(1, SCANS + 1,
                           dtype=jnp.bfloat16) * jnp.bfloat16(1e-3),
                unroll=SCANS)
            return r
        return jax.jit(run)

    def best_of(jfn, arg, w):
        float(jfn(arg, w))  # compile + warm
        best = 1e9
        for i in range(3):
            w2 = w * (1 + jnp.bfloat16(1e-3 * (i + 1)))
            float(w2.sum())
            t0 = time.perf_counter()
            float(jfn(arg, w2))
            best = min(best, time.perf_counter() - t0)
        return best

    calib = best_of(scan_of(lambda xx, w: w[:1, :1, :1]), x[:8, :8], wgt)
    print(f"calibration (dispatch): {calib * 1e3:.1f} ms total", flush=True)

    def timed(label, fn, arg, flops):
        t0 = time.perf_counter()
        jfn = scan_of(fn)
        best = best_of(jfn, arg, wgt)
        per = (best - calib) / SCANS
        print(f"{label}: {per * 1e3:.2f} ms/pass "
              f"({flops / per / 1e12:.1f} TF/s) "
              f"[total {best * 1e3:.0f} ms, compile "
              f"{time.perf_counter() - t0:.0f}s]", flush=True)
        return per

    timed("xla   ", xla_conv, x, flops_x)
    for name, fn in variants.items():
        timed(name, lambda xx, w, f=fn: f(xx, w, nr, nc), xpad, flops_k)


if __name__ == "__main__":
    main()
