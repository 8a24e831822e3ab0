"""Explicit-mask split path (``data_new: 1``) — the reference's exact,
deterministic train/test masks (basesolver.py:28-30,64-84)."""

import os

import numpy as np
import pytest

from dmfusion.config import load_config
from dmfusion.data.scene import synthetic_scene


@pytest.fixture()
def masked_dir(tmp_path):
    """A scene directory in the reference layout: ms4 + pan + label npy
    plus train.npy/test.npy mask rasters."""
    cfg = load_config(overrides={"data_city": "synth64", "patch_size": 8,
                                 "seed": 0})
    sc = synthetic_scene(cfg)
    d = tmp_path / "scene"
    d.mkdir()
    np.save(d / "ms4.npy", sc.raw_ms)
    np.save(d / "pan.npy", sc.raw_pan)
    np.save(d / "label.npy", sc.label)
    rng = np.random.default_rng(0)
    labeled = sc.label != 0
    coin = rng.random(sc.label.shape)
    train_mask = (labeled & (coin < 0.3)).astype(np.uint8) * sc.label
    test_mask = (labeled & (coin >= 0.3)).astype(np.uint8) * sc.label
    np.save(d / "train.npy", train_mask)
    np.save(d / "test.npy", test_mask)
    return str(d), train_mask, test_mask


def test_masked_split_solver(masked_dir, tmp_path):
    d, train_mask, test_mask = masked_dir
    from dmfusion.solvers import build_solver
    cfg = load_config(overrides={
        "data_city": "synth64", "data_new": 1, "data_address": d + "/",
        "patch_size": 8, "model_width": 8, "batchsize": 64,
        "test_batchsize": 64, "color_batchsize": 64, "epoch": 1, "time": 1,
        "verify_rate": 0.1, "seed": 0,
        "expo_result": str(tmp_path) + "/out/",
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    }, prepare=True)
    solver = build_solver(cfg)
    solver.dataloader()
    # Train ids exactly = the train-mask pixels (deterministic split).
    assert set(solver.split.train.tolist()) == \
        set(np.flatnonzero(train_mask.reshape(-1)).tolist())
    # Test + valid partition the test mask.
    test_set = set(solver.split.test.tolist())
    valid_set = set(solver.split.valid.tolist())
    want = set(np.flatnonzero(test_mask.reshape(-1)).tolist())
    assert test_set | valid_set == want
    assert not test_set & valid_set
    solver.run()
    assert solver.test_matrix.sum() == len(solver.split.test)


def test_scene_loads_from_npy_dir(masked_dir):
    d, _, _ = masked_dir
    from dmfusion.data.scene import load_scene
    cfg = load_config(overrides={"data_city": "synth64",
                                 "data_address": d + "/", "patch_size": 8})
    sc = load_scene(cfg)
    assert sc.label.shape == (64, 72)
    assert sc.ms.shape == (64 + 7, 72 + 7, 4)
