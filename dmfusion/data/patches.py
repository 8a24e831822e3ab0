"""Vectorized patch-window extraction from HBM-resident scenes.

This is the framework's input pipeline: the reference crops one window
per sample in Python inside ``Dataset.__getitem__`` (train/dataset.py:
168-185) and pays a host->device copy per batch; here a whole batch of
windows is one batched ``dynamic_slice`` gather that XLA fuses with the
consuming model, and the data never leaves the device.

Layout is NHWC (TPU-native): channels innermost so each gathered patch
row is a contiguous HBM segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _window(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
            size: int) -> jnp.ndarray:
    c = img.shape[-1]
    return jax.lax.dynamic_slice(img, (x, y, jnp.zeros_like(x)), (size, size, c))


@functools.partial(jax.jit, static_argnames=("size",))
def gather_windows(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                   size: int) -> jnp.ndarray:
    """(H', W', C), (B,), (B,) -> (B, size, size, C) batched window gather."""
    return jax.vmap(_window, in_axes=(None, 0, 0, None))(img, xs, ys, size)


def ids_to_xy(ids: jnp.ndarray, width: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return ids // width, ids % width


@functools.partial(jax.jit, static_argnames=("width", "patch"))
def gather_dual(ms: jnp.ndarray, pan: jnp.ndarray, ids: jnp.ndarray,
                width: int, patch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Paired MS/PAN windows for flat anchor ids.

    Reference semantics (train/dataset.py:168-185): the PAN anchor is 4x
    the MS anchor and the PAN window edge is ``4 * patch``.

    Returns ``(B, ps, ps, C)`` and ``(B, 4ps, 4ps, 1)``.
    """
    x, y = ids_to_xy(ids, width)
    ms_p = gather_windows(ms, x, y, patch)
    pan3 = pan[..., None] if pan.ndim == 2 else pan
    pan_p = gather_windows(pan3, 4 * x, 4 * y, 4 * patch)
    return ms_p, pan_p


@functools.partial(jax.jit, static_argnames=("width", "patch"))
def gather_quad(ms: jnp.ndarray, pan_ms: jnp.ndarray, ms_gan: jnp.ndarray,
                pan_gan: jnp.ndarray, ids: jnp.ndarray, width: int,
                patch: int) -> tuple[jnp.ndarray, ...]:
    """Four aligned ``(B, ps, ps, C)`` streams at MS geometry for the
    two-stage (DQTL) classifier (reference dataset_qua_dqtl,
    train/dataset.py:191-224)."""
    x, y = ids_to_xy(ids, width)
    return tuple(gather_windows(img, x, y, patch)
                 for img in (ms, pan_ms, ms_gan, pan_gan))


@functools.partial(jax.jit, static_argnames=("width", "patch"))
def gather_one(img: jnp.ndarray, ids: jnp.ndarray, width: int,
               patch: int) -> jnp.ndarray:
    """Single-modality windows (reference dataset_one,
    train/dataset.py:133-155)."""
    x, y = ids_to_xy(ids, width)
    img3 = img[..., None] if img.ndim == 2 else img
    return gather_windows(img3, x, y, patch)


@functools.partial(jax.jit, static_argnames=("width", "patch"))
def gather_tri(ms: jnp.ndarray, pan: jnp.ndarray, mspan: jnp.ndarray,
               ids: jnp.ndarray, width: int, patch: int
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MS window + PAN window + IHS-fused MSPAN window (the MSPAN stream
    is at PAN geometry — reference dataset_tri, train/dataset.py:248-282).

    ``mspan`` is typically :func:`dmfusion.ops.ihs.ihs_transform` of the
    scene, padded like PAN.
    """
    x, y = ids_to_xy(ids, width)
    ms_p = gather_windows(ms, x, y, patch)
    pan3 = pan[..., None] if pan.ndim == 2 else pan
    mspan3 = mspan[..., None] if mspan.ndim == 2 else mspan
    pan_p = gather_windows(pan3, 4 * x, 4 * y, 4 * patch)
    mspan_p = gather_windows(mspan3, 4 * x, 4 * y, 4 * patch)
    return ms_p, pan_p, mspan_p


def batched_ids_np(ids, batch: int, fill_value: int = 0):
    """Host-side (numpy) variant of :func:`batched_ids`: returns
    ``(padded (steps, batch) np.ndarray, mask np.ndarray, n)`` without
    touching the device — callers that also need host-side label
    lookups (solvers/base.py::batches) index with the numpy array and
    push everything to the device exactly once."""
    import numpy as np
    ids = np.asarray(ids)
    n = ids.shape[0]
    steps = -(-n // batch)
    padded = np.full((steps * batch,), fill_value, dtype=ids.dtype)
    padded[:n] = ids
    mask = (np.arange(steps * batch) < n).reshape(steps, batch)
    return padded.reshape(steps, batch), mask, n


def batched_ids(ids, batch: int,
                fill_value: int = 0) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad ``ids`` to a multiple of ``batch`` and reshape to (steps, batch).

    Static shapes keep everything under one jit compile across epochs; the
    returned boolean mask marks real (non-padding) entries so metric
    accumulation can ignore the tail.

    Built host-side in numpy: on a remote-tunneled device each eager jnp
    op is its own dispatch, and this runs every epoch.
    """
    padded, mask, n = batched_ids_np(ids, batch, fill_value)
    return jnp.asarray(padded), jnp.asarray(mask), n
