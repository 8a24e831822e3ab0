"""On-device classification metrics: confusion matrix -> OA/AA/kappa.

Reference semantics preserved exactly:
  * the confusion matrix is indexed ``[pred][target]``
    (solver/mainsolver.py:139-141 accumulates
    ``matrix[pred[i]][target[i]] += 1`` in a per-sample Python loop —
    here it is one ``segment_sum`` on device),
  * per-class accuracy divides the diagonal by the *column* sum (true
    count per class) and **skips class 0** (background)
    (indicators/kappa.py:69-84),
  * Cohen's kappa is computed over the full matrix including class 0
    (indicators/kappa.py:10-22),
  * classification maps are a palette lookup per pixel
    (solver/mainsolver.py:186-201's double loop becomes one ``take``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray,
                     num_classes: int,
                     mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N,) preds + (N,) integer targets -> (C, C) matrix[pred][target]."""
    idx = pred.astype(jnp.int32) * num_classes + target.astype(jnp.int32)
    weights = jnp.ones_like(idx, dtype=jnp.float32)
    if mask is not None:
        weights = weights * mask.astype(jnp.float32)
    flat = jax.ops.segment_sum(weights, idx, num_segments=num_classes ** 2)
    return flat.reshape(num_classes, num_classes)


def kappa(matrix: jnp.ndarray | np.ndarray) -> float:
    """Cohen's kappa over the full matrix (incl. class 0), matching
    indicators/kappa.py:10-22."""
    m = np.asarray(matrix, dtype=np.float64)
    n = m.sum()
    po = np.trace(m) / n
    pe = (m.sum(axis=1) * m.sum(axis=0)).sum() / (n * n)
    return float((po - pe) / (1 - pe))


def aa_oa(matrix: jnp.ndarray | np.ndarray) -> list:
    """Return ``[aa, oa, kappa, per_class_rows]``.

    ``per_class_rows[i] = [overall, correct, accuracy]`` for class ``i+1``
    — class 0 (background) is excluded from AA/OA exactly as the
    reference does (indicators/kappa.py:74), while kappa still sees the
    full matrix.
    """
    m = np.asarray(matrix, dtype=np.float64)
    col = m.sum(axis=0)  # true count per class (matrix is [pred][target])
    rows = []
    correct = 0.0
    accs = []
    for i in range(1, m.shape[0]):
        acc = m[i, i] / col[i] if col[i] > 0 else 0.0
        rows.append([float(col[i]), float(m[i, i]), float(acc)])
        accs.append(acc)
        correct += m[i, i]
    aa = float(np.mean(accs)) if accs else 0.0
    total = col.sum()
    oa = float(correct / total) if total > 0 else 0.0
    return [aa, oa, kappa(m), rows]


def per_stream_results(matrices: list[np.ndarray]) -> list[list]:
    """OA/AA/kappa per stream — the capability behind the reference's
    ``indicator_SCLN`` (indicators/kappa.py:211-213): evaluate each of
    the 4 DQTL streams' confusion matrices independently."""
    return [aa_oa(m) for m in matrices]


@jax.jit
def render_class_map(labels: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(H, W) class ids + (C, 3) palette -> (H, W, 3) uint8 image.

    One vectorized take replaces the reference's O(H*W) Python paint loop
    (solver/mainsolver.py:186-201).
    """
    return jnp.take(palette.astype(jnp.uint8), labels.astype(jnp.int32), axis=0)
