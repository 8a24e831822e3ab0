"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): jax is forced onto the host platform with 8 fake devices
so sharding/collective paths compile and execute in CI, per-test, with
no TPU attached.
"""

import os

# Force the host platform even when a TPU plugin is wired into the
# interpreter via sitecustomize (which pre-imports jax and pins
# JAX_PLATFORMS, so env edits here would be too late — the config update
# below still wins as long as no backend has initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, \
    "test suite must run on the 8-device virtual CPU mesh"

jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compilation cache: this CI box has a single CPU core, so
# XLA compiles dominate test wall-clock; caching makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
