"""HDF5 patch-cache IO.

The reference scaffolds an offline patch cache (``dataset_cut`` /
``save_h5`` / ``read_h5``, function/function.py:46-90) plus a
cache-backed dataset (``dataset_h5``, train/dataset.py:227-245) but
leaves both disabled (``use_h5`` raises, basesolver.py:45-46).  Here the
loop is closed: with ``use_h5`` the solver's ``dataloader`` writes the
repeat's train patches via :func:`save_patches`, and ``Solver.train``
reads them back and trains from the cached arrays
(train/steps.py::H5DualPrograms — row indexing, no window gather),
numerically identical to the on-the-fly path.  On TPU the on-the-fly
gather is faster than disk, so this exists for reference parity and
interchange, not the hot path.
"""

from __future__ import annotations

import numpy as np


def save_h5(filename: str, **arrays: np.ndarray) -> None:
    import h5py
    with h5py.File(filename, "w") as f:
        for key, value in arrays.items():
            f[key] = np.asarray(value)


def read_h5(filename: str) -> dict[str, np.ndarray]:
    import h5py
    out = {}
    with h5py.File(filename, "r") as f:
        for key in f.keys():
            out[key] = np.array(f[key])
    return out


def save_patches(filename: str, scene, ids: np.ndarray) -> None:
    """Materialize (ms, pan, label, xy) patch arrays for anchor ids —
    the working version of the reference's ``dataset_cut``."""
    import jax.numpy as jnp
    from dmfusion.data.patches import gather_dual
    ids = np.asarray(ids, np.int32)
    ms_p, pan_p = gather_dual(scene.ms, scene.pan, jnp.asarray(ids),
                              scene.width, scene.patch)
    x, y = scene.ids_to_xy(ids)
    save_h5(filename,
            ms=np.asarray(ms_p), pan=np.asarray(pan_p),
            label=scene.label.reshape(-1)[ids],
            xy=np.stack([x, y], axis=1))
