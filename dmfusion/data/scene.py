"""Scene IO, normalization, padding, and label bookkeeping — vectorized.

Reference semantics reproduced here:
  * global min-max normalization (``to_tensor``, function/function.py:120-124),
  * BORDER_REFLECT_101 padding of the *bottom/right only* by ``patch-1``
    (MS) / ``4*patch-1`` (PAN) (``data_padding``, function/function.py:99-117)
    — numpy/jnp ``mode='reflect'`` is exactly cv2's REFLECT_101,
  * pixel enumeration + labeled/unlabeled split, which the reference does
    with an O(H*W) Python loop (``split_data_old``,
    function/function.py:149-169) and here is one ``argsort`` over the
    label raster,
  * the explicit-mask 3-way split (``split_data``,
    function/function.py:172-194).

The whole scene is small enough to live in HBM (image6: MS 67 MB + PAN
270 MB in f32), so downstream stages treat it as a device-resident array
and extract patches with gathers (see patches.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Global (whole-array) min-max to [0, 1] (reference ``to_tensor``)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo)


#: Jitted :func:`minmax_normalize` for eager whole-scene call sites
#: (one remote compile instead of four per scene shape).
minmax_normalize_jit = jax.jit(minmax_normalize)


@functools.partial(jax.jit, static_argnames=("patch", "dtype"))
def prep_scene(x: jnp.ndarray, patch: int, dtype) -> jnp.ndarray:
    """normalize + reflect-pad + cast as ONE compiled program.

    Run eagerly, the chain (min, max, sub, div, pad, astype) costs ~6
    separate remote compiles PER SCENE SHAPE on the tunneled-TPU backend
    (which cannot reload cached executables) — minutes of pure compile
    wait at 50M-px scenes before training even starts.  One jit = one
    compile, bit-identical result."""
    return pad_scene(minmax_normalize(x), patch).astype(dtype)


def pad_scene(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Reflect-101 pad bottom/right by ``patch - 1`` on the two spatial dims.

    Matches reference ``data_padding`` (function/function.py:107-110): a
    pixel anchor (i, j) then always owns a full ``patch`` window.
    """
    pad = [(0, patch - 1), (0, patch - 1)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode="reflect")


def split_labels(label: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (labeled_ids, unlabeled_ids) as flat row-major pixel indices.

    Replaces the reference's per-pixel Python loop
    (function/function.py:149-169).  A flat id ``t`` decodes as
    ``x = t // W, y = t % W`` — the same (x, y, label) triplet order the
    reference's ``the_matrix`` carries.
    """
    flat = np.asarray(label).reshape(-1)
    labeled = np.flatnonzero(flat != 0).astype(np.int32)
    unlabeled = np.flatnonzero(flat == 0).astype(np.int32)
    return labeled, unlabeled


def split_labels_masked(train_mask: np.ndarray, test_mask: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Explicit-mask split (reference ``split_data``): train wins over test,
    everything else is unassigned.  Returns (unassigned, train, test) ids."""
    tr = np.asarray(train_mask).reshape(-1) != 0
    te = np.asarray(test_mask).reshape(-1) != 0
    train_ids = np.flatnonzero(tr).astype(np.int32)
    test_ids = np.flatnonzero(~tr & te).astype(np.int32)
    rest = np.flatnonzero(~tr & ~te).astype(np.int32)
    return rest, train_ids, test_ids


@dataclasses.dataclass
class Scene:
    """A device-resident dual-modal scene.

    ms   : (H + ps - 1, W + ps - 1, C)   normalized, padded
    pan  : (4H + 4ps - 1, 4W + 4ps - 1)  normalized, padded
    label: (H, W) uint8 host array (0 = unlabeled/background)
    """

    ms: jnp.ndarray
    pan: jnp.ndarray
    label: np.ndarray
    height: int
    width: int
    patch: int
    raw_ms: np.ndarray | None = None
    raw_pan: np.ndarray | None = None

    @property
    def num_pixels(self) -> int:
        return self.height * self.width

    def ids_to_xy(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return ids // self.width, ids % self.width


def _read_image(path: str) -> np.ndarray:
    """TIFF/PNG/npy reader without libtiff (absent in this image)."""
    if path.endswith(".npy"):
        return np.load(path)
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is not None:
            return img
    except ImportError:
        pass
    from PIL import Image
    return np.asarray(Image.open(path))


def _read_label(data_dir: str) -> np.ndarray:
    """label.npy, or materialize it from label.mat on first run
    (reference ``label_mat2np``, function/function.py:11-17: hdf5 matrix is
    transposed and cached)."""
    npy = os.path.join(data_dir, "label.npy")
    if os.path.exists(npy):
        return np.load(npy, allow_pickle=True)
    mat = os.path.join(data_dir, "label.mat")
    try:
        import h5py
        with h5py.File(mat, "r") as f:
            label = np.array(f["label"], dtype=np.uint8).T
    except OSError:  # pre-7.3 .mat
        import scipy.io
        label = np.asarray(scipy.io.loadmat(mat)["label"], dtype=np.uint8)
    np.save(npy, label)
    return label


def load_scene(cfg: Mapping[str, Any]) -> Scene:
    """Load (or synthesize) the configured city's scene, normalize + pad.

    ``data_address`` empty or missing on disk falls back to a seeded
    synthetic scene of the configured geometry so every pipeline stage is
    runnable without the (unpublished) satellite data.
    """
    data_dir = cfg.get("data_address", "")
    ps = cfg["patch_size"]
    if data_dir and os.path.isdir(data_dir):
        ms = _read_image(_find(data_dir, "ms4")).astype(np.float32)
        pan = _read_image(_find(data_dir, "pan")).astype(np.float32)
        label = _read_label(data_dir)
    else:
        return synthetic_scene(cfg)
    h, w = label.shape
    sdt = _scene_dtype(cfg)
    ms_n = prep_scene(jnp.asarray(ms), ps, sdt)
    pan_n = prep_scene(jnp.asarray(pan), 4 * ps, sdt)
    return Scene(ms=ms_n, pan=pan_n, label=label, height=h, width=w,
                 patch=ps, raw_ms=ms, raw_pan=pan)


def _scene_dtype(cfg: Mapping[str, Any]):
    """HBM scene storage dtype (``precision.scene_dtype``): float32 by
    default (bit-exact gathers for parity tests); bfloat16 halves scene
    HBM traffic for ~5% faster full-scene inference (BENCH_NOTES.md)."""
    return jnp.dtype(cfg.get("precision", {}).get("scene_dtype", "float32"))


def _find(data_dir: str, stem: str) -> str:
    for ext in (".tif", ".tiff", ".npy", ".png"):
        p = os.path.join(data_dir, stem + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no {stem}.(tif|npy|png) under {data_dir}")


def synthetic_scene(cfg: Mapping[str, Any], seed: int | None = None) -> Scene:
    """Seeded synthetic MS/PAN/label scene in the ``DATA_DICT`` geometry.

    Class regions are smooth blobs so that a classifier can genuinely
    learn them; PAN is a 4x upsampled luminance of MS plus noise, mimicking
    the real sensor relationship.  This substitutes for the reference's
    absent test data (SURVEY.md §4).
    """
    city = cfg["data_city"]
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ncls = len(cfg["DATA_DICT"][city]["color"])
    ps = cfg["patch_size"]
    rng = np.random.default_rng(cfg["seed"] if seed is None else seed)

    # Low-frequency fields -> argmax gives contiguous class regions.  The
    # grid is at least 8x8 so every class has a fighting chance to appear
    # even on tiny test scenes (a 2x2 grid leaves classes absent and lets
    # a classifier collapse to the majority class).
    gh, gw = max(h // 32, 8), max(w // 32, 8)
    fields = rng.standard_normal((ncls - 1, gh, gw)).astype(np.float32)
    reps = (-(-h // gh), -(-w // gw))
    up = np.repeat(np.repeat(fields, reps[0], axis=1), reps[1], axis=2)[:, :h, :w]
    label = (np.argmax(up, axis=0) + 1).astype(np.uint8)
    # Sparse unlabeled holes (class 0).
    label[rng.random((h, w)) < 0.3] = 0

    base = rng.standard_normal((ncls, c)).astype(np.float32)
    ms = base[np.argmax(up, axis=0) + 1] + 0.25 * rng.standard_normal(
        (h, w, c)).astype(np.float32)
    lum = ms.mean(-1)
    pan = np.repeat(np.repeat(lum, 4, axis=0), 4, axis=1)
    pan = pan + 0.25 * rng.standard_normal(pan.shape).astype(np.float32)

    sdt = _scene_dtype(cfg)
    ms_n = prep_scene(jnp.asarray(ms), ps, sdt)
    pan_n = prep_scene(jnp.asarray(pan), 4 * ps, sdt)
    return Scene(ms=ms_n, pan=pan_n, label=label, height=h, width=w,
                 patch=ps, raw_ms=ms, raw_pan=pan)
