"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): jax is forced onto the host platform with 8 fake devices
so sharding/collective paths compile and execute in CI, per-test, with
no TPU attached.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    from dmfusion.config import load_config
    return load_config(overrides={
        "data_city": "synth64",
        "patch_size": 8,
        "batchsize": 32,
        "test_batchsize": 32,
        "color_batchsize": 32,
        "epoch": 2,
        "time": 1,
        "train_rate": 0.05,
        "verify_rate": 0.05,
        "seed": 0,
        "dqtl": {"pic_size": 32, "epochs": 1, "batch_size": 2},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    })


@pytest.fixture(scope="session")
def small_scene(small_cfg):
    from dmfusion.data import synthetic_scene
    return synthetic_scene(small_cfg)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
