"""Dense whole-scene model family: e2e + consistency between the pooled
train path and the full-map inference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmfusion.config import load_config


@pytest.fixture(scope="module")
def dense_cfg(tmp_path_factory):
    out = tmp_path_factory.mktemp("dense")
    return load_config(overrides={
        "data_city": "synth64",
        "model_name": "dense_fusion",
        "patch_size": 8,
        "model_width": 16,
        "batchsize": 64,
        "test_batchsize": 64,
        "color_batchsize": 64,
        "epoch": 4,
        "time": 1,
        "train_rate": 0.1,
        "verify_rate": 0.05,
        "seed": 0,
        "expo_result": str(out) + "/",
        "color": {"index": 1, "supervised": 1, "unsupervised": 1},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    }, prepare=True)


@pytest.fixture(scope="module")
def dense_solver(dense_cfg):
    from dmfusion.solvers import build_solver
    s = build_solver(dense_cfg)
    s.run()
    return s


def test_dense_arity():
    from dmfusion.models.registry import model_arity
    assert model_arity("dense_fusion") == "dense"


def test_dense_trains_and_reports(dense_solver, dense_cfg):
    losses = dense_solver.records["Loss"]
    assert len(losses) == 4 and losses[-1] < losses[0]
    ncls = dense_cfg["Categories_Number"]
    m = dense_solver.test_matrix
    assert m.shape == (ncls, ncls)
    assert m.sum() == len(dense_solver.split.test)
    aa, oa, k, _ = dense_solver.last_result
    assert oa > 1.5 / (ncls - 1)


def test_dense_color_maps(dense_solver, dense_cfg):
    lab1, lab2 = dense_solver.color_maps
    h, w, _ = dense_cfg["DATA_DICT"]["synth64"]["size"]
    assert lab2.shape == (h, w)
    assert lab2.min() >= 0 and lab2.max() < dense_cfg["Categories_Number"]


def test_dense_pooled_head_consistency(dense_solver):
    """The training path (pooled rows -> head) and the inference path
    (full logits map) must agree exactly at every anchor."""
    prog = dense_solver.programs
    params = dense_solver.params
    args = dense_solver.scene_args
    logits_map = prog._logits_map(params, args)
    pooled = prog._pooled(params, args)
    d = pooled.shape[-1]
    ids = jnp.asarray([0, 5, 100, 999], jnp.int32)
    feats = pooled.reshape(-1, d)[ids]
    via_train_path = prog._head(params, feats)
    via_map = logits_map.reshape(-1, logits_map.shape[-1])[ids]
    np.testing.assert_allclose(np.asarray(via_train_path),
                               np.asarray(via_map), rtol=1e-5, atol=1e-6)


def test_dense_pool_matches_manual_window_mean(dense_solver):
    prog = dense_solver.programs
    params = dense_solver.params
    args = dense_solver.scene_args
    feats = prog.model.apply({"params": params}, args[0], args[1],
                             method=prog.model.features)
    pooled = prog._pooled(params, args)
    ps = dense_solver.scene.patch
    f = np.asarray(feats, np.float64)
    want = f[3:3 + ps, 7:7 + ps].mean(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(pooled[3, 7], np.float64), want,
                               rtol=1e-4, atol=1e-6)


def test_dense_sharded_map_matches(dense_solver):
    """Band-sharded dense inference over the 8-device mesh matches the
    single-pass map.  The halo covers the receptive field and norms are
    per-pixel, so the only permitted differences are argmax flips on
    float near-ties (the SAT cumsum accumulates in a different order per
    band); with fresh params agreement is exact, with trained logits a
    handful of ties may flip."""
    from dmfusion.parallel.mesh import get_mesh
    prog = dense_solver.programs
    params = dense_solver.params
    args = dense_solver.scene_args
    mesh = get_mesh(None)
    single = np.asarray(prog.predict_map(params, args))
    sharded = np.asarray(prog.predict_map_sharded(params, args, mesh))
    assert sharded.shape == single.shape
    agreement = (sharded == single).mean()
    assert agreement > 0.995, agreement


def test_dense_sharded_map_exact_with_fresh_params(dense_cfg):
    """Structural exactness check: with untrained params (no near-ties
    amplified by training) the sharded and single maps are identical —
    any halo/boundary bug would break this for every parameter set."""
    import jax
    from dmfusion.parallel.mesh import get_mesh
    from dmfusion.solvers import build_solver
    s = build_solver(dict(dense_cfg, time=1))
    s.dataloader()
    s.init_model()
    mesh = get_mesh(None)
    single = np.asarray(s.programs.predict_map(s.params, s.scene_args))
    sharded = np.asarray(
        s.programs.predict_map_sharded(s.params, s.scene_args, mesh))
    np.testing.assert_array_equal(sharded, single)
