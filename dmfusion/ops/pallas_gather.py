"""Pallas TPU kernel: batched patch-window gather via aligned HBM DMA.

XLA lowers ``vmap(dynamic_slice)`` to a serial gather that reaches ~1% of
HBM bandwidth on TPU (measured: 373 ms for 98k dual patches — 72% of
full-scene inference time).  This path streams the windows instead.

Mosaic constraint: HBM/VMEM refs carry an (8, 128) tile layout, so both
DMA slices *and* vector loads must start on 8-row / 128-lane boundaries —
while patch anchors are arbitrary pixels.  Strategy:

  1. (Pallas) per patch, DMA the smallest tile-*aligned* block covering
     the window — ``rows 8*(x//8) .. +ps+8``, ``lanes
     128*((y*C)//128) .. +ps*C+128`` — straight into the pipelined VMEM
     output block.  Pure data movement at DMA-engine bandwidth.
  2. (XLA) slice the exact (ps, ps*C) window out of each block with two
     batched one-hot selection matmuls (row pick then lane pick) built
     from ``iota`` comparisons.  The MXU has no alignment constraints;
     ~2 GFLOP per 4096-patch batch, noise next to the model.

The scene is viewed 2-D as (H, W*C) so a patch row is one contiguous
``ps*C`` lane segment; the wrapper pre-pads the scene so aligned blocks
stay in bounds and reshapes outputs to NHWC.

Measured end to end (v5e, image6 geometry, 98k dual patches/call):
373 ms (XLA gather) -> ~9 ms (this path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_ALIGN = 128


def _row_align(dtype) -> int:
    """Mosaic sublane tiling by element width: (8,128) f32, (16,128)
    bf16, (32,128) int8 — HBM slice offsets must hit these boundaries."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _extents(patch: int, chans: int, row_align: int) -> tuple[int, int]:
    # rows must cover patch + (row_align-1) start-misalignment AND be a
    # row_align multiple itself: Mosaic rejects HBM memref slices whose
    # sublane extent is off-tile (patch 47's PAN window hit this —
    # 188+8=196 rows is not a multiple of 8).
    rows = -(-(patch + row_align - 1) // row_align) * row_align
    win = patch * chans
    lanes = -(-(win + _LANE_ALIGN) // _LANE_ALIGN) * _LANE_ALIGN
    return rows, lanes


def _block_copy_kernel(patch: int, chans: int, group: int, row_align: int,
                       xs_ref, ys_ref, scene_ref, out_ref, sems):
    """DMA ``group`` aligned blocks from the HBM scene into the VMEM
    output block: out[k] = scene[r0_k : r0_k+rows, c0_k : c0_k+lanes]."""
    i = pl.program_id(0)
    rows, lanes = _extents(patch, chans, row_align)

    def dma(k):
        x = xs_ref[i * group + k]
        yc = ys_ref[i * group + k] * chans
        r0 = pl.multiple_of((x // row_align) * row_align, row_align)
        c0 = pl.multiple_of((yc // _LANE_ALIGN) * _LANE_ALIGN, _LANE_ALIGN)
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
    jax.jit, static_argnames=("patch", "width", "group", "interpret"))
def gather_windows_pallas(scene2d: jnp.ndarray, xs: jnp.ndarray,
                          ys: jnp.ndarray, patch: int, width: int, *,
                          group: int = 64,
                          interpret: bool = False) -> jnp.ndarray:
    """(H, W*C) scene view + (B,) x/y pixel anchors -> (B, patch, patch*C).

    ``width`` is the scene's pixel width (so ``chans = shape[1]//width``).
    B must be a multiple of ``group``.
    """
    b = xs.shape[0]
    chans = scene2d.shape[1] // width
    row_align = _row_align(scene2d.dtype)
    rows, lanes = _extents(patch, chans, row_align)
    # The output VMEM block is (group, rows, lanes) double-buffered;
    # Mosaic's scoped-vmem stack is ~16 MB.  Large windows (patch 47's
    # 188-row PAN slabs) blow it at group=64 (measured: 37.5 MB) — halve
    # the group until the block fits, keeping it a divisor of b.
    block = rows * lanes * jnp.dtype(scene2d.dtype).itemsize
    while group > 8 and 2 * group * block > 12_000_000:
        group //= 2
    assert b % group == 0, (b, group)
    win = patch * chans
    # Pad so every aligned block is in bounds (loop-invariant; XLA hoists
    # it out of the caller's scan).
    scene2d = jnp.pad(scene2d, ((0, rows), (0, lanes)))

    blocks = pl.pallas_call(
        functools.partial(_block_copy_kernel, patch, chans, group,
                          row_align),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # xs, ys
            grid=(b // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # scene in HBM
            out_specs=pl.BlockSpec(
                (group, rows, lanes),
                lambda i, xs_ref, ys_ref: (i, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, lanes), scene2d.dtype),
        interpret=interpret,
    )(xs, ys, scene2d)

    # Exact-window extraction as one-hot selection matmuls (MXU).
    dr = (xs % row_align).astype(jnp.int32)
    dc = ((ys * chans) % _LANE_ALIGN).astype(jnp.int32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, patch, rows), 2)
    row_tgt = dr[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (b, patch, rows), 1)
    rsel = (row_ids == row_tgt).astype(blocks.dtype)        # (b, patch, rows)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, lanes, win), 1)
    lane_tgt = dc[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (b, lanes, win), 2)
    csel = (lane_ids == lane_tgt).astype(blocks.dtype)      # (b, lanes, win)

    # HIGHEST precision: the default TPU matmul truncates inputs to bf16,
    # which would round the gathered pixel values; multi-pass f32 keeps
    # the one-hot selection numerically exact to f32 resolution.
    picked = jax.lax.dot_general(
        rsel, blocks, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                 # (b, patch, lanes)
    out = jax.lax.dot_general(
        picked, csel, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                 # (b, patch, win)
    return out.astype(scene2d.dtype)


@functools.partial(jax.jit, static_argnames=("width", "patch", "interpret"))
def gather_one_fast(img: jnp.ndarray, ids: jnp.ndarray, width: int,
                    patch: int, *, interpret: bool = False) -> jnp.ndarray:
    """Accelerated single-image window gather: (B,) ids ->
    (B, patch, patch, C).  B must be a multiple of 64."""
    x = ids // width
    y = ids % width
    img3 = img if img.ndim == 3 else img[..., None]
    c = img3.shape[-1]
    out = gather_windows_pallas(img3.reshape(img3.shape[0], -1), x, y,
                                patch, img3.shape[1], interpret=interpret)
    return out.reshape(ids.shape[0], patch, patch, c)


@functools.partial(jax.jit, static_argnames=("width", "patch", "interpret"))
def gather_quad_fast(ms, pan_ms, ms_gan, pan_gan, ids, width: int,
                     patch: int, *, interpret: bool = False):
    """Accelerated 4-stream MS-geometry gather (dataset_qua_dqtl role)."""
    return tuple(gather_one_fast(img, ids, width, patch,
                                 interpret=interpret)
                 for img in (ms, pan_ms, ms_gan, pan_gan))


@functools.partial(jax.jit, static_argnames=("width", "patch", "interpret"))
def gather_tri_fast(ms, pan, mspan, ids, width: int, patch: int, *,
                    interpret: bool = False):
    """Accelerated 3-stream gather (dataset_tri role): MS window + PAN +
    MSPAN windows at 4x geometry."""
    # NOTE keyword-only tail: this call once passed ``interpret``
    # positionally into gather_dual_fast's ``group`` slot — group=False
    # div-crashed on TPU while group=True silently degraded interpret
    # (CPU test) runs to per-patch DMA, so no test caught it.
    ms_p, pan_p = gather_dual_fast(ms, pan, ids, width, patch,
                                   interpret=interpret)
    x = ids // width
    y = ids % width
    mspan3 = mspan if mspan.ndim == 3 else mspan[..., None]
    mspan_p = gather_windows_pallas(
        mspan3.reshape(mspan3.shape[0], -1), 4 * x, 4 * y, 4 * patch,
        mspan3.shape[1], interpret=interpret)
    mspan_p = mspan_p.reshape(ids.shape[0], 4 * patch, 4 * patch,
                              mspan3.shape[-1])
    return ms_p, pan_p, mspan_p


@functools.partial(jax.jit,
                   static_argnames=("width", "patch", "group", "interpret"))
def gather_dual_fast(ms: jnp.ndarray, pan: jnp.ndarray, ids: jnp.ndarray,
                     width: int, patch: int, *, group: int = 64,
                     interpret: bool = False
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in accelerated version of
    :func:`dmfusion.data.patches.gather_dual` (same contract).

    ``ids`` length must be a multiple of ``group``; use gather_dual
    otherwise.
    """
    x = ids // width
    y = ids % width
    c = ms.shape[-1]
    ms2d = ms.reshape(ms.shape[0], -1)
    pan3 = pan if pan.ndim == 3 else pan[..., None]
    pc = pan3.shape[-1]
    pan2d = pan3.reshape(pan3.shape[0], -1)

    ms_p = gather_windows_pallas(ms2d, x, y, patch, ms.shape[1],
                                 group=group, interpret=interpret)
    ms_p = ms_p.reshape(ids.shape[0], patch, patch, c)
    pan_p = gather_windows_pallas(pan2d, 4 * x, 4 * y, 4 * patch,
                                  pan3.shape[1], group=group,
                                  interpret=interpret)
    pan_p = pan_p.reshape(ids.shape[0], 4 * patch, 4 * patch, pc)
    return ms_p, pan_p


def gather_dual_sharded(ms, pan, ids, width: int, patch: int, mesh,
                        interpret: bool = False):
    """SPMD version: anchors shard over the mesh 'data' axis, the scene
    replicates, and each device runs the Pallas DMA gather on its local
    shard — the multi-chip full-scene inference path (the scene-pixel
    axis is this workload's "sequence" dimension; SURVEY.md §2.3).

    Per-shard anchor counts are padded up to a multiple of the DMA group
    (64) so the kernel always pipelines full groups — round 1 silently
    degraded odd shard sizes to per-patch DMA (group=1) instead.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _shard_map
        shard_map = functools.partial(_shard_map, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map
        shard_map = functools.partial(_shard_map, check_rep=False)

    data = mesh.shape["data"]
    b = ids.shape[0]
    group = 64
    per_shard = -(-(b // data) // group) * group
    pad = per_shard * data - b
    ids_padded = jnp.concatenate([ids, jnp.broadcast_to(ids[:1], (pad,))]) \
        if pad else ids

    def local(ms_l, pan_l, ids_l):
        return gather_dual_fast(ms_l, pan_l, ids_l, width, patch,
                                group=group, interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P("data")),
                   out_specs=(P("data"), P("data")))
    ms_p, pan_p = fn(ms, pan, ids_padded)
    return (ms_p[:b], pan_p[:b]) if pad else (ms_p, pan_p)
