"""Chunked eval/predict front doors must be bit-identical to the
monolithic single-call programs.

City-scale test sets (~35M anchors at image9) as ONE device execution
run for minutes and got the remote TPU worker killed mid-call (observed
twice, r4); `DualPrograms.eval_epoch`/`predict` therefore slice the
scan axis host-side into bounded device calls sharing one jit
signature.  Loss sums and confusion counts are additive across slices,
so results must match exactly (same per-batch programs, f32 adds of
disjoint partial sums).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _dual_setup(small_cfg, small_scene):
    from dmfusion.models import build_model
    from dmfusion.train.optim import make_optimizer
    from dmfusion.train.steps import DualPrograms

    cfg = dict(small_cfg)
    cfg["model_width"] = 8
    scene = small_scene
    model = build_model(cfg, "gmfnet")
    prog = DualPrograms(model, make_optimizer(cfg, 1), cfg, scene.width,
                        scene.patch)
    params, _ = prog.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    n = 10 * 16 - 5                       # force a padded final slice
    ids_flat = rng.integers(0, scene.width * scene.height, n,
                            dtype=np.int32)
    labels_flat = np.asarray(scene.label.reshape(-1))[ids_flat]
    pad = 10 * 16 - n
    ids = jnp.asarray(np.pad(ids_flat, (0, pad))).reshape(10, 16)
    labels = jnp.asarray(np.pad(labels_flat, (0, pad))).reshape(10, 16)
    mask = jnp.asarray(
        np.pad(np.ones(n, np.float32), (0, pad))).reshape(10, 16)
    return prog, params, (scene.ms, scene.pan), ids, labels, mask


def test_dual_chunked_eval_matches_monolithic(small_cfg, small_scene):
    prog, params, args, ids, labels, mask = _dual_setup(small_cfg,
                                                        small_scene)
    whole = prog._eval_epoch_jit(params, args, ids, labels, mask)
    prog.EVAL_CHUNK_ANCHORS = 3 * 16      # 3 batches/call; 10 -> 4 calls
    chunked = prog.eval_epoch(params, args, ids, labels, mask)
    np.testing.assert_allclose(float(chunked[0]), float(whole[0]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(chunked[1]),
                                  np.asarray(whole[1]))


def test_dual_chunked_predict_matches_monolithic(small_cfg, small_scene):
    prog, params, args, ids, _, _ = _dual_setup(small_cfg, small_scene)
    whole = prog._predict_jit(params, args, ids)
    prog.EVAL_CHUNK_ANCHORS = 4 * 16
    chunked = prog.predict(params, args, ids)
    assert chunked.shape == whole.shape
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(whole))


def test_eval_scan_anchors_knob(small_cfg, small_scene):
    """'off' -> one monolithic call; an integer -> that anchor bound;
    garbage -> a ValueError naming the knob."""
    import pytest
    prog, params, args, ids, labels, mask = _dual_setup(small_cfg,
                                                        small_scene)
    calls = []
    orig = prog._eval_epoch_jit
    prog._eval_epoch_jit = lambda *a: (calls.append(a[2].shape),
                                       orig(*a))[1]
    prog.cfg = dict(prog.cfg, eval_scan_anchors="off")
    prog.eval_epoch(params, args, ids, labels, mask)
    assert calls == [ids.shape]

    calls.clear()
    prog.cfg = dict(prog.cfg, eval_scan_anchors=2 * 16)  # 2 batches/call
    prog.eval_epoch(params, args, ids, labels, mask)
    assert calls == [(2, 16)] * 5

    prog.cfg = dict(prog.cfg, eval_scan_anchors="garbage")
    with pytest.raises(ValueError, match="eval_scan_anchors"):
        prog.eval_epoch(params, args, ids, labels, mask)


def test_small_eval_stays_single_call(small_cfg, small_scene):
    """Below the cap the front door must hand the arrays straight to the
    jitted program (no padding, no extra dispatches)."""
    prog, params, args, ids, labels, mask = _dual_setup(small_cfg,
                                                        small_scene)
    calls = []
    orig = prog._eval_epoch_jit

    def spy(*a):
        calls.append(a[2].shape)
        return orig(*a)

    prog._eval_epoch_jit = spy
    prog.eval_epoch(params, args, ids, labels, mask)
    assert calls == [ids.shape]
