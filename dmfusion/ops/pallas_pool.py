"""Fused Pallas window-pooling kernel for the dense family.

Computes the s2d-2 phase-layout window-mean map
(models/dense_fusion.py::phase_pooled_s2d) in ONE pass over the feature
tensor: each grid step DMAs an overlapping (BI+ph, NJT+ph) feature slab
HBM->VMEM, builds the half-res window sums with ph shifted VMEM adds per
axis (f32), mixes the four pixel phases with block-diagonal selection
matmuls on the MXU, and writes one (BI, NJT) output tile.

Why: the XLA pipeline (chunked SAT cumsums -> corner combine -> four
shifted selection matmuls) materializes several scene-sized f32
intermediates in HBM and costs ~23 ms per image6 pass at the chip's
~130 GB/s unfused-pass rate; this kernel's HBM traffic is one feature
read + one pooled write (~550 MB bf16).

Overlapping slabs are fetched with a manual double-buffered DMA from an
`ANY`-space operand.  (A BlockSpec-only formulation — two shifted
tilings per axis — was also built and measured; identical performance
including the in-scan composition penalty, so the simpler manual-DMA
form stays.  See BENCH_NOTES.md.)

Forward-only: the dense training programs gather per-anchor SAT corners
instead (train/steps.py), so this kernel needs no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pool_shapes_supported(c4: int, patch: int) -> bool:
    """Whether the fused kernel's DMA slices are Mosaic-legal for this
    (channel, patch) combination.

    The slab copy slices ``njt + ph`` columns out of the HBM feature
    tensor, and Mosaic requires second-minor slice extents/starts to be
    8-aligned — so ``ph = patch // 2`` must be a multiple of 8 (patch
    a multiple of 16; the production dense patch is exactly 16).  The
    lane dim must also be tile-aligned (c4 a multiple of 128, i.e.
    model_width a multiple of 32).  Callers fall back to the XLA
    phase-SAT pipeline otherwise (measured Mosaic rejection at patch 8:
    "Slice shape along dimension 1 must be aligned to tiling (8), but
    is 12").
    """
    return patch % 16 == 0 and c4 % 128 == 0


def _mix_np(c4: int, patch: int):
    """Phase-selection matmul operands — the single source of truth
    lives next to the XLA pipeline this kernel must match
    (models/dense_fusion.py::phase_mix_matrices)."""
    from dmfusion.models.dense_fusion import phase_mix_matrices
    return phase_mix_matrices(c4, patch)


def _kernel(f_hbm, m0, m1, m2, m3, out_ref, slab, sem, *, bi, njt, ph,
            c4, dtype):
    mix_ref = (m0, m1, m2, m3)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nr = pl.num_programs(0)
    nc = pl.num_programs(1)

    def issue(slot, ii, jj):
        return pltpu.make_async_copy(
            f_hbm.at[pl.ds(ii * bi, bi + ph), pl.ds(jj * njt, njt + ph), :],
            slab.at[slot], sem.at[slot])

    # Double buffer: on the first step of a row stripe, start this tile
    # and the next; otherwise the previous step already started ours.
    step = i * nc + j

    @pl.when(step == 0)
    def _():
        issue(0, i, j).start()

    nxt = step + 1
    ii_n = nxt // nc
    jj_n = nxt % nc

    @pl.when(nxt < nr * nc)
    def _():
        issue(nxt % 2, ii_n, jj_n).start()

    issue(step % 2, i, j).wait()
    sl = slab[step % 2].astype(jnp.float32)     # (bi+ph, njt+ph, c4)

    # Column window sums: rs[r, jj] = sum_{k<ph} sl[r, jj+k]
    rs = sl[:, 0:njt + 1, :]
    for k in range(1, ph):
        rs = rs + sl[:, k:k + njt + 1, :]
    # Row window sums: t[ii, jj] = sum_{k<ph} rs[ii+k, jj]
    t = rs[0:bi + 1]
    for k in range(1, ph):
        t = t + rs[k:k + bi + 1]

    acc = None
    for (r, u, _m), mref in zip(_mix_np(c4, 2 * ph), mix_ref):
        bt = t[r:r + bi, u:u + njt].astype(dtype).reshape(bi * njt, c4)
        # Precision: Mosaic rejects an fp32-precision tpu.matmul with
        # bf16 operands ("Bad lhs type") — bf16 inputs + f32
        # preferred_element_type is already the exact native MXU mode.
        # For f32 operands the DEFAULT precision truncates inputs
        # (measured ~6e-4 abs on window means), so request HIGHEST.
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else None)
        p = jax.lax.dot_general(
            bt, mref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        acc = p if acc is None else acc + p
    out_ref[...] = acc.reshape(bi, njt, c4).astype(out_ref.dtype)


def phase_pool_fused(feats: jnp.ndarray, patch: int, ni: int, nj: int,
                     interpret: bool = False,
                     col_tile: int | None = None) -> jnp.ndarray:
    """(H2, W2, 4C) s2d features -> (ni, nj, 4C) s2d window-mean map.

    Bit-compatible with phase_pooled_s2d up to f32 summation order
    (shifted-add window sums here vs SAT differences there).  ``patch``
    must be even; 4C must be lane-aligned-friendly (multiple of 128
    recommended).  ``col_tile`` overrides the column-tile target (tests
    use a tiny value to exercise the multi-stripe path on small maps).
    """
    ph = patch // 2
    h2, w2, c4 = feats.shape
    bi = 8
    # Column tile: wide stripes keep the DMA count low and the pad waste
    # small, but the slab + f32 window-sum temporaries all scale with
    # njt * c4, so the target shrinks as channels grow (w=32/c4=128 ->
    # 352 cols ~ 10 MB VMEM; w=64/c4=256 would double it past the 16 MB
    # budget at the same tile).
    if col_tile is None:
        col_tile = max(32, _round_up(352 * 128 // c4, 8))
    ncols = max(1, -(-nj // col_tile))
    njt = _round_up(-(-nj // ncols), 8)
    nr = -(-ni // bi)
    rows_need = nr * bi + ph
    cols_need = (ncols - 1) * njt + njt + ph
    f = jnp.pad(feats, ((0, max(0, rows_need - h2)),
                        (0, max(0, cols_need - w2)), (0, 0)))
    mix = _mix_np(c4, patch)
    mix_args = [jnp.asarray(m, feats.dtype) for (_r, _u, m) in mix]

    kernel = functools.partial(_kernel, bi=bi, njt=njt, ph=ph, c4=c4,
                               dtype=feats.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nr, ncols),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((bi, njt, c4), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr * bi, ncols * njt, c4),
                                       feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bi + ph, njt + ph, c4), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(f, *mix_args)
    return out[:ni, :nj]
