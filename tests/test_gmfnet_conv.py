"""gmfnet_conv: shift-and-stitch scene route vs the window route.

The whole value of models/gmfnet_conv.py is the claim that its
convolutional full-scene map reproduces the per-anchor window forward
EXACTLY (VERDICT r4 weak #2's parity bar); these tests pin that claim
at every anchor phase, through the banded streaming path, and through
the solver's map-route test confusion.  A companion test documents WHY
the plain gmfnet cannot be served this way (per-window GroupNorm is
shift-variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmfusion.models.gmfnet_conv import Net, pool_grid


def _cfg(ncls=5, width=8):
    return {
        "Categories_Number": ncls,
        "model_width": width,
        "precision": {"compute_dtype": "float32",
                      "param_dtype": "float32"},
        "schedule": {"activate": "Relu"},
    }


def _scene(h, w, patch, seed=0):
    rng = np.random.default_rng(seed)
    ms = jnp.asarray(rng.standard_normal((h + patch - 1, w + patch - 1, 4)),
                     jnp.float32)
    pan = jnp.asarray(rng.standard_normal((4 * (h + patch - 1),
                                           4 * (w + patch - 1))),
                      jnp.float32)
    return ms, pan


def _window_logits(model, params, ms, pan, patch, h, w):
    """Reference evaluation: gather every anchor's window, run the
    ordinary batched window forward."""
    xs, ys = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    ms_w = jnp.stack([ms[x:x + patch, y:y + patch] for x, y in zip(xs, ys)])
    pan_w = jnp.stack([pan[4 * x:4 * x + 4 * patch,
                           4 * y:4 * y + 4 * patch, None]
                       for x, y in zip(xs, ys)])
    out = model.apply({"params": params}, ms_w, pan_w)
    return np.asarray(out).reshape(h, w, -1)


def test_pool_grid_validation():
    assert pool_grid(35) == 1
    assert pool_grid(39) == 2
    assert pool_grid(47) == 4
    for bad in (16, 36, 40, 31):
        with pytest.raises(ValueError, match="gmfnet_conv"):
            pool_grid(bad)


def test_window_scene_parity_all_phases():
    """Every anchor's scene-route logits equal its window forward —
    h=13/w=11 covers all 16 (x%4, y%4) phase combinations."""
    patch, h, w = 39, 13, 11
    cfg = _cfg()
    model = Net(cfg=cfg)
    ms, pan = _scene(h, w, patch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, patch, patch, 4)),
                        jnp.zeros((1, 4 * patch, 4 * patch, 1)))["params"]
    ref = _window_logits(model, params, ms, pan, patch, h, w)
    got = np.asarray(model.apply({"params": params}, ms, pan, patch,
                                 method=model.logits_map))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-5)

    cm = np.asarray(model.apply({"params": params}, ms, pan, patch,
                                method=model.class_map))
    assert cm.shape == (h, w)
    np.testing.assert_array_equal(cm, ref.argmax(-1))


def test_window_scene_parity_g4():
    """Same parity at the production patch size class (g=4 pooling
    grid, patch ≡ 47's chain) — run at patch 43 to keep CPU time low."""
    patch, h, w = 43, 6, 9
    cfg = _cfg(ncls=3, width=8)
    model = Net(cfg=cfg)
    ms, pan = _scene(h, w, patch, seed=3)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, patch, patch, 4)),
                        jnp.zeros((1, 4 * patch, 4 * patch, 1)))["params"]
    ref = _window_logits(model, params, ms, pan, patch, h, w)
    got = np.asarray(model.apply({"params": params}, ms, pan, patch,
                                 method=model.logits_map))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-5)


def test_streamed_class_map_matches_whole():
    """Banded streaming (clamped, phase-grid-aligned bands) returns the
    identical int map — including the bottom-clamped band and band
    starts at every offset mod 4."""
    from dmfusion.train.steps import ConvMapPrograms
    import optax
    patch, h, w = 35, 41, 9
    cfg = dict(_cfg(ncls=4, width=8), patch_size=patch,
               conv_streams="auto")
    model = Net(cfg=cfg)
    ms, pan = _scene(h, w, patch, seed=5)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, patch, patch, 4)),
                        jnp.zeros((1, 4 * patch, 4 * patch, 1)))["params"]
    prog = ConvMapPrograms(model, optax.sgd(1e-3), cfg, w, patch)
    whole = np.asarray(prog._whole_class_map(params, (ms, pan)))
    for n in (2, 3, 5):
        got = np.asarray(prog.class_map_streamed(params, (ms, pan), n))
        np.testing.assert_array_equal(got, whole), n


def test_map_route_test_confusion_is_exact():
    """ConvMapPrograms.test_confusion (map route) returns the same
    confusion matrix as the per-anchor eval route."""
    from dmfusion.train.steps import ConvMapPrograms, DualPrograms
    import optax
    patch, h, w = 35, 17, 13
    cfg = dict(_cfg(ncls=4, width=8), patch_size=patch,
               conv_streams="off")
    model = Net(cfg=cfg)
    ms, pan = _scene(h, w, patch, seed=7)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, patch, patch, 4)),
                        jnp.zeros((1, 4 * patch, 4 * patch, 1)))["params"]
    prog = ConvMapPrograms(model, optax.sgd(1e-3), cfg, w, patch)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.choice(h * w, size=(2, 32), replace=False),
                      jnp.int32)
    labels = jnp.asarray(rng.integers(1, 4, size=(2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), jnp.float32)
    got = np.asarray(prog.test_confusion(params, (ms, pan), ids, labels,
                                         mask))
    ref = np.asarray(DualPrograms.test_confusion(prog, params, (ms, pan),
                                                 ids, labels, mask))
    np.testing.assert_array_equal(got, ref)


def test_plain_gmfnet_is_not_shift_invariant():
    """Documents the obstruction (models/gmfnet_conv.py docstring): the
    default gmfnet's per-window GroupNorm computes statistics over each
    window, so the SAME scene pixels produce different activations
    depending on which window they sit in — no convolutional scene pass
    can reproduce its per-anchor logits.  gmfnet_conv exists because of
    exactly this."""
    from dmfusion.models.common import ConvBlock
    rng = np.random.default_rng(0)
    strip = jnp.asarray(rng.standard_normal((1, 16, 17, 4)), jnp.float32)
    blk = ConvBlock(8, 3, 1)
    params = blk.init(jax.random.PRNGKey(0), strip[:, :, :16])["params"]
    a = blk.apply({"params": params}, strip[:, :, :16])   # window at y=0
    b = blk.apply({"params": params}, strip[:, :, 1:])    # window at y=1
    # Interior columns see identical conv inputs; GroupNorm stats still
    # differ between the two windows, so the values do too.
    interior_a = np.asarray(a[:, :, 2:14])
    interior_b = np.asarray(b[:, :, 1:13])
    assert np.abs(interior_a - interior_b).max() > 1e-4


def test_map_export_roundtrip(tmp_path):
    """--map export of gmfnet_conv: the .dmx artifact's class_map
    matches the in-process conv route bit-for-bit and serves metrics
    through ScenePredictor."""
    import optax
    from dmfusion.config import load_config
    from dmfusion.data.scene import synthetic_scene
    from dmfusion.export import load_artifact, save_artifact
    from dmfusion.infer import ScenePredictor
    from dmfusion.models.registry import build_model
    from dmfusion.train.steps import ConvMapPrograms
    cfg = load_config(overrides={
        "data_city": "synth64",
        "model_name": "gmfnet_conv",
        "patch_size": 35,
        "model_width": 8,
        "seed": 0,
        "conv_streams": "off",
        "precision": {"compute_dtype": "float32",
                      "param_dtype": "float32"},
    })
    scene = synthetic_scene(cfg)
    model = build_model(cfg)
    prog = ConvMapPrograms(model, optax.sgd(1e-3), cfg, scene.width, 35)
    params, _ = prog.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "conv.dmx")
    manifest = save_artifact(path, cfg, params, platforms=("cpu",),
                             map_route=True)
    assert manifest["serving"] == "map"
    clf = load_artifact(path)
    assert clf.is_map
    served = np.asarray(clf.class_map(scene.ms, scene.pan))
    ref = np.asarray(prog.predict_map(params, (scene.ms, scene.pan)))
    np.testing.assert_array_equal(served, ref)
    with pytest.raises(ValueError, match="whole scenes"):
        clf.predict(jnp.zeros((1, 35, 35, 4)))
    sp = ScenePredictor(clf, scene)
    res = sp.evaluate()
    assert 0.0 <= res["oa"] <= 1.0 and res["pixels"] > 0


def test_solver_selects_convmap_programs(tmp_path):
    """Solver e2e: gmfnet_conv trains through the ordinary dual-arity
    machinery and the color phase renders via the map route."""
    from dmfusion.config import load_config
    from dmfusion.solvers import build_solver
    from dmfusion.train.steps import ConvMapPrograms
    cfg = load_config(overrides={
        "data_city": "synth64",
        "model_name": "gmfnet_conv",
        "patch_size": 35,
        "batchsize": 32,
        "test_batchsize": 32,
        "color_batchsize": 32,
        "epoch": 1,
        "time": 1,
        "train_rate": 0.05,
        "verify_rate": 0.05,
        "seed": 0,
        "model_width": 8,
        "expo_result": str(tmp_path) + "/",
        "color": {"index": 1, "supervised": 1, "unsupervised": 1},
        "precision": {"compute_dtype": "float32",
                      "param_dtype": "float32"},
        # Single-device run (the production single-chip shape): the
        # banded shard_map twin of the conv route is not built, so
        # under a mesh the solver keeps the per-anchor color path.
        "mesh": {"data": 1, "model": 1},
    }, prepare=True)
    solver = build_solver(cfg)
    solver.run()
    assert isinstance(solver.programs, ConvMapPrograms)
    assert solver.programs.supports_map
    m1, m2 = solver.color_maps
    assert m2.shape == (64, 72) and m2.max() >= 1
