"""Miscellaneous utilities carried over from the reference tree.

  * :func:`seed_everything` — the determinism knob
    (reference utils/utils.py:114-122); in jax, explicit PRNG keys make
    most of it moot, but python/numpy seeding still matters for splits,
  * :func:`data_show` — label-raster statistics print
    (function/function.py:127-133, without the Chinese-only formatting),
  * :func:`mutual_information` — the cross-modality MI metric from the
    reference's scratch analysis script (train/1.py:4-35), vectorized.
"""

from __future__ import annotations

import os
import random

import numpy as np


def parse_switch(value, name: str = "switch") -> str:
    """Normalize a tri-state config knob to 'on' / 'off' / 'auto'.

    One parser for every on/off/auto knob (``train.dense_remat``,
    ``precision.pallas_pool``, ...): YAML booleans (``False`` ->
    ``'false'``), 0/1, yes/no and on/off all map consistently, and
    unknown spellings fail loudly at config time instead of silently
    meaning "on" (a YAML ``dense_remat: false`` used to leave remat
    enabled because only 'off'/'0' were recognized).
    """
    v = str(value).strip().lower()
    if v in ("off", "0", "false", "no"):
        return "off"
    if v in ("on", "1", "true", "yes"):
        return "on"
    if v == "auto":
        return "auto"
    raise ValueError(
        f"{name}: unrecognized value {value!r} (use on/off/auto, "
        "1/0, true/false, or yes/no)")


def seed_everything(seed: int = 42) -> None:
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def data_show(label: np.ndarray) -> dict:
    """Print + return class histogram stats for a label raster."""
    values, counts = np.unique(label, return_counts=True)
    stats = {
        "classes": values.tolist(),
        "counts": counts.tolist(),
        "shape": list(label.shape),
        "num_labeled_classes": int(len(values) - (1 if 0 in values else 0)),
    }
    print(f"label classes {stats['classes']} counts {stats['counts']} "
          f"shape {stats['shape']} labeled classes "
          f"{stats['num_labeled_classes']}")
    return stats


def mutual_information(a: np.ndarray, b: np.ndarray, bins: int = 20) -> float:
    """Histogram mutual information between two equally-shaped images
    (reference train/1.py:4-35: joint 2-D histogram -> I(A;B))."""
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    joint, _, _ = np.histogram2d(a, b, bins=bins)
    pxy = joint / joint.sum()
    px = pxy.sum(axis=1, keepdims=True)
    py = pxy.sum(axis=0, keepdims=True)
    denom = px @ py
    mask = pxy > 0
    return float(np.sum(pxy[mask] * np.log(pxy[mask] / denom[mask])))
