"""Pallas DMA patch-gather parity vs the XLA reference gather
(interpret mode on the CPU mesh; the compiled path is validated on real
TPU by bench.py and was measured bit-exact)."""

import jax.numpy as jnp
import numpy as np

from dmfusion.data.patches import gather_dual
from dmfusion.ops.pallas_gather import _extents, gather_dual_fast, gather_windows_pallas


def test_extents_alignment():
    rows, lanes = _extents(16, 4, 8)
    assert rows == 24 and lanes % 128 == 0 and lanes >= 16 * 4 + 128
    rows, lanes = _extents(64, 1, 8)
    assert rows == 72 and lanes % 128 == 0
    # bf16 scenes tile (16, 128): blocks must cover 16-row misalignment.
    rows, _ = _extents(16, 4, 16)
    assert rows == 32


def test_gather_dual_fast_bf16_scene(small_scene, small_cfg):
    """precision.scene_dtype=bfloat16 path: the DMA blocks align to the
    (16, 128) bf16 tiling and gathered windows match the XLA gather on
    the same bf16 scene exactly."""
    sc = small_scene
    ps = small_cfg["patch_size"]
    ms16 = sc.ms.astype(jnp.bfloat16)
    pan16 = sc.pan.astype(jnp.bfloat16)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, sc.num_pixels, 64), jnp.int32)
    a_ms, a_pan = gather_dual(ms16, pan16, ids, sc.width, ps)
    b_ms, b_pan = gather_dual_fast(ms16, pan16, ids, sc.width, ps,
                                   interpret=True)
    assert b_ms.dtype == jnp.bfloat16 and b_pan.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(a_ms, np.float32), np.asarray(b_ms, np.float32))
    np.testing.assert_array_equal(
        np.asarray(a_pan, np.float32), np.asarray(b_pan, np.float32))


def test_gather_dual_fast_matches_xla(small_scene, small_cfg):
    sc = small_scene
    ps = small_cfg["patch_size"]
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, sc.num_pixels, 128), jnp.int32)
    a_ms, a_pan = gather_dual(sc.ms, sc.pan, ids, sc.width, ps)
    b_ms, b_pan = gather_dual_fast(sc.ms, sc.pan, ids, sc.width, ps,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(a_ms), np.asarray(b_ms),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a_pan), np.asarray(b_pan),
                               rtol=1e-6, atol=1e-7)


def test_gather_windows_pallas_edge_anchors(small_scene, small_cfg):
    # Anchors at the extreme corners exercise the aligned-block padding.
    sc = small_scene
    ps = small_cfg["patch_size"]
    last = sc.num_pixels - 1
    ids = jnp.asarray([0, last] + [1] * 62, jnp.int32)
    ms2d = sc.ms.reshape(sc.ms.shape[0], -1)
    xs, ys = ids // sc.width, ids % sc.width
    out = gather_windows_pallas(ms2d, xs, ys, ps, sc.ms.shape[1],
                                interpret=True)
    ms_np = np.asarray(sc.ms)
    for k, t in enumerate([0, last]):
        x, y = int(t) // sc.width, int(t) % sc.width
        want = ms_np[x:x + ps, y:y + ps, :].reshape(ps, -1)
        np.testing.assert_allclose(np.asarray(out[k]), want, rtol=1e-6)


def test_gather_dual_sharded_on_mesh(small_scene, small_cfg):
    """Pallas gather under shard_map on the 8-device CPU mesh: anchors
    shard over 'data', results match the XLA gather."""
    from dmfusion.ops.pallas_gather import gather_dual_sharded
    from dmfusion.parallel.mesh import get_mesh
    sc = small_scene
    ps = small_cfg["patch_size"]
    mesh = get_mesh(None)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, sc.num_pixels, 128), jnp.int32)
    a_ms, a_pan = gather_dual(sc.ms, sc.pan, ids, sc.width, ps)
    b_ms, b_pan = gather_dual_sharded(sc.ms, sc.pan, ids, sc.width, ps,
                                      mesh, interpret=True)
    assert len(b_ms.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(a_ms), np.asarray(b_ms),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a_pan), np.asarray(b_pan),
                               rtol=1e-6, atol=1e-7)


def test_gather_dual_sharded_odd_batch(small_scene, small_cfg):
    """Per-shard counts that are not group multiples are repadded to
    full 64-anchor DMA groups (round 1 silently fell back to group=1
    per-patch DMA); results still match the XLA gather exactly."""
    from dmfusion.ops.pallas_gather import gather_dual_sharded
    from dmfusion.parallel.mesh import get_mesh
    sc = small_scene
    ps = small_cfg["patch_size"]
    mesh = get_mesh(None)
    rng = np.random.default_rng(3)
    for n in (72, 104):  # 9 and 13 anchors per shard on 8 devices
        ids = jnp.asarray(rng.integers(0, sc.num_pixels, n), jnp.int32)
        a_ms, a_pan = gather_dual(sc.ms, sc.pan, ids, sc.width, ps)
        b_ms, b_pan = gather_dual_sharded(sc.ms, sc.pan, ids, sc.width,
                                          ps, mesh, interpret=True)
        assert b_ms.shape[0] == n
        np.testing.assert_array_equal(np.asarray(a_ms), np.asarray(b_ms))
        np.testing.assert_array_equal(np.asarray(a_pan), np.asarray(b_pan))

def test_gather_tri_fast_uses_full_dma_groups(small_scene, small_cfg,
                                              monkeypatch):
    """Regression: gather_tri_fast passed ``interpret`` POSITIONALLY into
    gather_dual_fast's ``group`` slot — group=False div-crashed on TPU
    (the only place interpret=False flows) while group=True silently
    degraded CPU interpret runs to per-patch DMA, so the parity tests
    never caught it.  Every inner gather must use the full 64-patch DMA
    group; the tail args are keyword-only now."""
    import dmfusion.ops.pallas_gather as pg
    sc = small_scene
    ps = small_cfg["patch_size"]
    seen = []
    real = pg.gather_windows_pallas

    def spy(*args, **kw):
        seen.append(kw.get("group", 64))
        return real(*args, **kw)

    monkeypatch.setattr(pg, "gather_windows_pallas", spy)
    ids = jnp.asarray(np.arange(64), jnp.int32)
    a = pg.gather_tri_fast(sc.ms, sc.pan, sc.pan, ids, sc.width, ps,
                           interpret=True)
    from dmfusion.data.patches import gather_tri
    b = gather_tri(sc.ms, sc.pan, sc.pan, ids, sc.width, ps)
    # >= 3 spy hits (MS + PAN via gather_dual_fast, plus the MSPAN
    # gather): if a trace-cache hit ever skips re-tracing the dual leg,
    # the dual-path entries vanish and this must fail loudly rather
    # than silently weakening to the MSPAN-only check.
    assert len(seen) >= 3 and all(g == 64 for g in seen)
    for got, want in zip(a, b):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
