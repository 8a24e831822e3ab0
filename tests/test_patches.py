"""Patch-gather parity with the reference's per-sample window crops
(train/dataset.py:168-185)."""

import jax.numpy as jnp
import numpy as np

from dmfusion.data.patches import batched_ids, gather_dual, gather_quad


def test_gather_dual_matches_reference_crops(small_scene, small_cfg):
    sc = small_scene
    ps = small_cfg["patch_size"]
    ms_np = np.asarray(sc.ms)
    pan_np = np.asarray(sc.pan)
    ids = np.array([0, 5, sc.width + 3, sc.num_pixels - 1], dtype=np.int32)
    ms_p, pan_p = gather_dual(sc.ms, sc.pan, jnp.asarray(ids), sc.width, ps)
    assert ms_p.shape == (4, ps, ps, 4)
    assert pan_p.shape == (4, 4 * ps, 4 * ps, 1)
    for k, t in enumerate(ids):
        x, y = int(t) // sc.width, int(t) % sc.width
        np.testing.assert_allclose(np.asarray(ms_p[k]),
                                   ms_np[x:x + ps, y:y + ps, :], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pan_p[k])[..., 0],
            pan_np[4 * x:4 * x + 4 * ps, 4 * y:4 * y + 4 * ps], rtol=1e-6)


def test_gather_quad_streams_aligned(small_scene, small_cfg):
    sc = small_scene
    ps = small_cfg["patch_size"]
    ids = jnp.asarray([1, 7], dtype=jnp.int32)
    streams = gather_quad(sc.ms, sc.ms, sc.ms, sc.ms, ids, sc.width, ps)
    assert len(streams) == 4
    for s in streams:
        assert s.shape == (2, ps, ps, 4)
    np.testing.assert_allclose(np.asarray(streams[0]),
                               np.asarray(streams[3]))


def test_batched_ids_padding():
    ids = jnp.arange(10, dtype=jnp.int32)
    chunks, mask, n = batched_ids(ids, 4)
    assert chunks.shape == (3, 4) and n == 10
    assert bool(mask[0].all()) and not bool(mask[2, 2])
    np.testing.assert_array_equal(np.asarray(chunks).reshape(-1)[:10],
                                  np.arange(10))
