"""Pallas TPU kernel: STRIP gather for raster-ordered anchors.

The production per-patch DMA gather (ops/pallas_gather.py) is
DMA-issue-rate bound: ~196k block DMAs per 98k-anchor call at ~1.45M
DMAs/s (BENCH_NOTES.md "gather headroom"), far from the HBM wall.  For
the *full-scene* workload the anchors are raster-ordered, so S
consecutive anchors in one scene row share one overlapping stripe of
the scene: ONE aligned DMA per strip covers all S windows — S=128 cuts
the DMA count ~128x and (because stride-1 windows overlap ~ps-fold) the
fetched bytes ~10x below the output size itself.

Extraction from the strip slab needs no per-anchor FLOPs:

  * lanes: with the strip start ``y0`` lane-aligned (strips are laid on
    a fixed S-grid, so y0 % S == 0), window ``s`` occupies lane groups
    ``[s, s+ps)`` of the (lanes//C, C) group view — ``ps`` static
    shifted slices of the group axis materialize every window at once
    (the same phase-group trick as the dense family's s2d layout);
  * rows: the block's row offset is only ``x % row_align`` — one tiny
    one-hot (ps, rows) selection matmul per strip (batched, MXU,
    HIGHEST precision so f32 scene values pass through exactly).

Result (measured, image6, 98k-anchor full-scene batches — see
BENCH_NOTES.md round-3 strip-gather section): the gather itself drops
from DMA-issue-bound to output-write-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_ALIGN = 128


def _row_align(dtype) -> int:
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _strip_copy_kernel(rows: int, lanes: int, group: int, row_align: int,
                       xs_ref, ys_ref, scene_ref, out_ref, sems):
    """DMA ``group`` aligned strip slabs from the HBM scene:
    out[k] = scene[r0_k : r0_k+rows, c0_k : c0_k+lanes] where r0 is the
    row-aligned floor of the strip's anchor row and c0 the (already
    lane-aligned) strip start lane."""
    i = pl.program_id(0)

    def dma(k):
        x = xs_ref[i * group + k]
        c0 = ys_ref[i * group + k]
        r0 = pl.multiple_of((x // row_align) * row_align, row_align)
        c0 = pl.multiple_of(c0, _LANE_ALIGN)
        return pltpu.make_async_copy(
            scene_ref.at[pl.ds(r0, rows), pl.ds(c0, lanes)],
            out_ref.at[k],
            sems.at[k],
        )

    def start(k, _):
        dma(k).start()
        return 0

    jax.lax.fori_loop(0, group, start, 0, unroll=True)

    def wait(k, _):
        dma(k).wait()
        return 0

    jax.lax.fori_loop(0, group, wait, 0, unroll=True)


@functools.partial(
    jax.jit,
    static_argnames=("patch", "width", "strip", "stride", "group",
                     "interpret"))
def gather_strips_pallas(scene2d: jnp.ndarray, xs: jnp.ndarray,
                         y0s: jnp.ndarray, patch: int, width: int,
                         strip: int, stride: int = 1, group: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """(H, W*C) scene view + per-strip anchors -> windows for ``strip``
    anchors ``stride`` pixels apart per strip (stride 1 for MS raster
    anchors; 4 for the PAN modality, whose anchors advance 4 px per MS
    anchor).

    ``xs[k]``/``y0s[k]`` are the k-th strip's anchor row and FIRST
    anchor column; ``y0s * chans`` must be lane-aligned (lay strips on a
    fixed S-grid with S a multiple of ``_LANE_ALIGN // chans`` and the
    alignment is automatic).  Returns (n_strips, strip, patch, patch*C).
    """
    n = xs.shape[0]
    import math
    group = math.gcd(group, n)   # small strip counts degrade gracefully
    chans = scene2d.shape[1] // width
    row_align = _row_align(scene2d.dtype)
    rows = patch + row_align
    span = ((strip - 1) * stride + patch) * chans   # lanes actually needed
    lanes = -(-span // _LANE_ALIGN) * _LANE_ALIGN
    scene2d = jnp.pad(scene2d, ((0, rows), (0, lanes)))

    y0lane = (y0s * chans).astype(jnp.int32)

    slabs = pl.pallas_call(
        functools.partial(_strip_copy_kernel, rows, lanes, group,
                          row_align),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # xs, y0lane
            grid=(n // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (group, rows, lanes),
                lambda i, xs_ref, ys_ref: (i, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, rows, lanes), scene2d.dtype),
        interpret=interpret,
    )(xs.astype(jnp.int32), y0lane, scene2d)

    # Row extraction: one-hot (patch, rows) selection per strip (the
    # only dynamic offset left), batched on the MXU.  HIGHEST precision:
    # one-hot selection of f32 scene values must not round through bf16.
    dr = (xs % row_align).astype(jnp.int32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, patch, rows), 2)
    row_tgt = dr[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (n, patch, rows), 1)
    rsel = (row_ids == row_tgt).astype(slabs.dtype)
    picked = jax.lax.dot_general(
        rsel, slabs, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(slabs.dtype)
    # (n, patch, lanes)

    # Lane extraction: zero-FLOP phase-group slicing.  View lanes as
    # (lanes//C, C) pixel groups; window s covers groups
    # [s*stride, s*stride+patch) — ``patch`` static (strided) shifted
    # slices produce every window at once.
    groups = picked.reshape(n, patch, lanes // chans, chans)
    parts = [jax.lax.slice_in_dim(groups, g, g + (strip - 1) * stride + 1,
                                  stride, axis=2)
             for g in range(patch)]       # each (n, patch, strip, C)
    win = jnp.stack(parts, axis=3)        # (n, patch, strip, patch, C)
    win = win.transpose(0, 2, 1, 3, 4)    # (n, strip, patch, patch, C)
    return win.reshape(n, strip, patch, patch * chans)


@functools.partial(jax.jit,
                   static_argnames=("width", "patch", "strip", "interpret"))
def gather_dual_strips(ms: jnp.ndarray, pan: jnp.ndarray,
                       xs: jnp.ndarray, y0s: jnp.ndarray, width: int,
                       patch: int, strip: int = 128,
                       interpret: bool = False):
    """Dual-modality strip gather: per strip k, windows for the
    ``strip`` consecutive anchors (xs[k], y0s[k])..(xs[k], y0s[k]+S-1).
    Returns ((n*strip, ps, ps, C), (n*strip, 4ps, 4ps, 1)) in anchor
    raster order — bit-identical to gather_dual on the same anchors.
    ``strip`` must be a multiple of 32 so PAN strip starts stay
    lane-aligned (4*y0 % 128 == 0)."""
    n = xs.shape[0]
    c = ms.shape[-1]
    ms2d = ms.reshape(ms.shape[0], -1)
    pan3 = pan if pan.ndim == 3 else pan[..., None]
    pan2d = pan3.reshape(pan3.shape[0], -1)

    ms_w = gather_strips_pallas(ms2d, xs, y0s, patch, ms.shape[1], strip,
                                stride=1, interpret=interpret)
    pan_w = gather_strips_pallas(pan2d, 4 * xs, 4 * y0s, 4 * patch,
                                 pan3.shape[1], strip, stride=4,
                                 interpret=interpret)
    ms_p = ms_w.reshape(n * strip, patch, patch, c)
    pan_p = pan_w.reshape(n * strip, 4 * patch, 4 * patch, 1)
    return ms_p, pan_p
