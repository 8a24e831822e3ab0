"""Visualization + partitioning utilities (headless file outputs)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dmfusion.parallel.mesh import get_mesh
from dmfusion.parallel.partition import param_partition_specs, shard_params
from dmfusion.report.viz import channel_grid, embedding_scatter, save_image_grid


def test_channel_grid(tmp_path, rng):
    p = str(tmp_path / "grid.png")
    channel_grid(rng.random((2, 16, 16, 8)).astype(np.float32), p)
    assert os.path.getsize(p) > 0


def test_embedding_scatter(tmp_path, rng):
    p = str(tmp_path / "emb.png")
    emb = rng.random((120, 12)).astype(np.float32)
    labels = rng.integers(1, 5, 120)
    embedding_scatter(emb, labels, p)
    assert os.path.getsize(p) > 0


def test_save_image_grid(tmp_path, rng):
    p = str(tmp_path / "imgs.png")
    save_image_grid(rng.random((6, 8, 8, 4)).astype(np.float32), p)
    assert os.path.getsize(p) > 0


def test_param_partition_tp():
    mesh = get_mesh({"mesh": {"data": 4, "model": 2}})
    params = {"dense": {"kernel": jnp.zeros((16, 8)),
                        "bias": jnp.zeros((8,))},
              "odd": {"kernel": jnp.zeros((16, 7))}}
    specs = param_partition_specs(params, mesh)
    assert specs["dense"]["kernel"][-1] == "model"
    assert tuple(specs["dense"]["bias"]) == ()  # 1-D replicates
    # Odd output dim (7 % 2 != 0) must replicate, not crash.
    assert tuple(specs["odd"]["kernel"]) == ()
    sharded = shard_params(params, mesh)
    assert len(sharded["dense"]["kernel"].sharding.device_set) == 8
