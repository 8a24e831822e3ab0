"""Golden-value tests for scene normalization/padding/splits and the
IHS/resampling ops, checked against independent numpy re-derivations of
the reference formulas (function/function.py, image_convert/IHS.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmfusion.data.scene import (minmax_normalize, pad_scene, split_labels,
                                 split_labels_masked, synthetic_scene)
from dmfusion.ops.ihs import (block_mean, ihs_transform, pan2ms,
                              replicate_channels, unpooling)
from dmfusion.ops.image import scene_to_tiles, tiles_to_scene


def test_minmax_normalize(rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    got = np.asarray(minmax_normalize(jnp.asarray(x)))
    want = (x - x.min()) / (x.max() - x.min())
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.min() == 0.0 and got.max() == 1.0


def test_pad_scene_matches_cv2_reflect101(rng):
    cv2 = __import__("cv2")
    x = rng.standard_normal((6, 5, 3)).astype(np.float32)
    ps = 4
    got = np.asarray(pad_scene(jnp.asarray(x), ps))
    want = cv2.copyMakeBorder(x, 0, ps - 1, 0, ps - 1, cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # 2-D (PAN) case
    p = rng.standard_normal((8, 9)).astype(np.float32)
    got2 = np.asarray(pad_scene(jnp.asarray(p), ps))
    want2 = cv2.copyMakeBorder(p, 0, ps - 1, 0, ps - 1, cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_split_labels_row_major():
    label = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    labeled, unlabeled = split_labels(label)
    # Flat row-major ids: pixel (0,1)->1 and (1,0)->2 are labeled.
    np.testing.assert_array_equal(labeled, [1, 2])
    np.testing.assert_array_equal(unlabeled, [0, 3])


def test_split_labels_masked_priority():
    train = np.array([[1, 0], [0, 0]])
    test = np.array([[1, 1], [0, 0]])  # overlaps train at (0,0)
    rest, tr, te = split_labels_masked(train, test)
    np.testing.assert_array_equal(tr, [0])
    np.testing.assert_array_equal(te, [1])   # train wins the overlap
    np.testing.assert_array_equal(rest, [2, 3])


def test_block_mean(rng):
    x = rng.standard_normal((6, 8)).astype(np.float32)
    got = np.asarray(block_mean(jnp.asarray(x), 2))
    want = x.reshape(3, 2, 4, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pan2ms_phase_interleave(rng):
    # Reference IHS.py:14-19: p = blockmean(pan, 2); out[...,i] = p[i%2::2, i//2::2]
    h, w, c = 4, 6, 4
    pan = rng.standard_normal((4 * h, 4 * w)).astype(np.float32)
    got = np.asarray(pan2ms(jnp.asarray(pan), (h, w, c)))
    p = pan.reshape(2 * h, 2, 2 * w, 2).mean(axis=(1, 3))
    for i in range(c):
        np.testing.assert_allclose(got[:, :, i], p[i % 2::2, i // 2::2],
                                   rtol=1e-5, atol=1e-6)


def test_unpooling_structure():
    x = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2) + 1.0
    out = np.asarray(unpooling(x, 3, jax.random.PRNGKey(0)))
    assert out.shape == (6, 9, 2)
    # Each 3x3 block contains exactly its source value once, rest zeros.
    for i in range(2):
        for j in range(3):
            for ch in range(2):
                block = out[3 * i:3 * i + 3, 3 * j:3 * j + 3, ch]
                assert np.count_nonzero(block) == 1
                assert block.sum() == x[i, j, ch]


def test_ihs_transform_collapses_to_pan(rng):
    # Algebraic identity of the reference formula (IHS.py:40-54): the band
    # mean of (MS_up + delta) equals PAN exactly.
    ms = rng.random((4, 5, 4)).astype(np.float32)
    pan = rng.random((16, 20)).astype(np.float32)
    got = np.asarray(ihs_transform(jnp.asarray(ms), jnp.asarray(pan),
                                   jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, pan, atol=1e-5)


def test_replicate_channels():
    x = jnp.ones((2, 3)) * 5
    out = replicate_channels(x, 4)
    assert out.shape == (2, 3, 4)
    assert float(out.sum()) == 2 * 3 * 4 * 5


def test_tiles_roundtrip(rng):
    img = rng.standard_normal((10, 13, 4)).astype(np.float32)
    tiles, rows, cols = scene_to_tiles(img, 4)
    assert tiles.shape == (rows * cols, 4, 4, 4)
    back = tiles_to_scene(tiles, rows, cols, (10, 13))
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_synthetic_scene_shapes(small_cfg):
    sc = synthetic_scene(small_cfg)
    ps = small_cfg["patch_size"]
    h, w, c = small_cfg["DATA_DICT"]["synth64"]["size"]
    assert sc.ms.shape == (h + ps - 1, w + ps - 1, c)
    assert sc.pan.shape == (4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1)
    assert sc.label.shape == (h, w)
    ncls = len(small_cfg["DATA_DICT"]["synth64"]["color"])
    assert sc.label.max() < ncls and sc.label.min() == 0
    # Deterministic under the same seed.
    sc2 = synthetic_scene(small_cfg)
    np.testing.assert_array_equal(sc.label, sc2.label)


def test_load_scene_from_generated_tiff(tmp_path, rng):
    """Real-data ingestion round-trip (data/scene.py::_read_image): a
    generated uint16 GeoTIFF pair + label.npy loads into a normalized,
    padded Scene with the raw arrays preserved exactly."""
    import cv2
    from dmfusion.config import load_config
    from dmfusion.data.scene import load_scene
    h, w, c, ps = 16, 18, 4, 8
    ms = (rng.random((h, w, c)) * 65535).astype(np.uint16)
    pan = (rng.random((4 * h, 4 * w)) * 65535).astype(np.uint16)
    label = rng.integers(0, 5, (h, w)).astype(np.uint8)
    assert cv2.imwrite(str(tmp_path / "ms4.tif"), ms)
    assert cv2.imwrite(str(tmp_path / "pan.tif"), pan)
    np.save(tmp_path / "label.npy", label)
    cfg = load_config(overrides={"data_city": "synth64", "patch_size": ps,
                                 "data_address": str(tmp_path)})
    sc = load_scene(cfg)
    np.testing.assert_array_equal(sc.raw_ms, ms.astype(np.float32))
    np.testing.assert_array_equal(sc.raw_pan, pan.astype(np.float32))
    np.testing.assert_array_equal(sc.label, label)
    assert sc.ms.shape == (h + ps - 1, w + ps - 1, c)
    assert sc.pan.shape == (4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1)
    assert float(jnp.min(sc.ms)) >= 0.0 and float(jnp.max(sc.ms)) <= 1.0


def test_load_scene_label_from_mat(tmp_path, rng):
    """label.mat -> label.npy materialization (reference label_mat2np,
    function/function.py:11-17: hdf5 matrix transposed and cached)."""
    import h5py
    from dmfusion.config import load_config
    from dmfusion.data.scene import load_scene
    h, w, ps = 12, 14, 8
    ms = (rng.random((h, w, 4)) * 255).astype(np.uint16)
    pan = (rng.random((4 * h, 4 * w)) * 255).astype(np.uint16)
    label = rng.integers(0, 5, (h, w)).astype(np.uint8)
    np.save(tmp_path / "ms4.npy", ms)
    np.save(tmp_path / "pan.npy", pan)
    with h5py.File(tmp_path / "label.mat", "w") as f:
        f["label"] = label.T  # stored transposed, as the reference expects
    cfg = load_config(overrides={"data_city": "synth64", "patch_size": ps,
                                 "data_address": str(tmp_path)})
    sc = load_scene(cfg)
    np.testing.assert_array_equal(sc.label, label)
    assert (tmp_path / "label.npy").exists()  # cached for the next run


def test_discover_palette():
    from dmfusion.ops.image import discover_palette
    label = np.array([[0, 1], [2, 1]])
    gt = np.zeros((2, 2, 3), np.uint8)
    gt[0, 1] = [255, 0, 0]
    gt[1, 1] = [255, 0, 0]
    gt[1, 0] = [0, 255, 0]
    pal = discover_palette(label, gt, 3)
    assert pal == [[0, 0, 0], [255, 0, 0], [0, 255, 0]]


def test_read_tfw(tmp_path):
    from dmfusion.ops.image import read_tfw
    p = tmp_path / "scene.tfw"
    p.write_text("0.5\n0.0\n0.0\n-0.5\n1000.25\n2000.75\n")
    tfw = read_tfw(str(p))
    assert tfw["pixel_size_x"] == 0.5
    assert tfw["upper_left_y"] == 2000.75
