"""Strip gather (raster-anchor coalescing): exactness vs the per-anchor
gather.  The kernel runs in interpret mode on the CPU suite; the TPU
throughput measurement lives in tools/strip_gather_bench.py +
BENCH_NOTES.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("strip,xrow", [(32, 5), (64, 12)])
def test_strip_gather_matches_gather_dual(strip, xrow):
    from dmfusion.config import load_config
    from dmfusion.data import synthetic_scene
    from dmfusion.data.patches import gather_dual
    from dmfusion.ops.pallas_strip_gather import gather_dual_strips

    cfg = load_config(overrides={
        "data_city": "synthw", "patch_size": 8,
        "DATA_DICT": {"synthw": {
            "size": [48, 4 * strip, 4],
            "color": [[0, 0, 0], [255, 0, 0], [0, 255, 0]]}},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
        "seed": 1})
    scene = synthetic_scene(cfg)
    xs = jnp.asarray([xrow, xrow + 1], jnp.int32)
    y0s = jnp.asarray([0, strip], jnp.int32)     # on the strip grid
    ms_s, pan_s = gather_dual_strips(scene.ms, scene.pan, xs, y0s,
                                     scene.width, scene.patch,
                                     strip=strip, interpret=True)
    ids = jnp.concatenate([
        xs[0] * scene.width + y0s[0] + jnp.arange(strip),
        xs[1] * scene.width + y0s[1] + jnp.arange(strip)]).astype(jnp.int32)
    ms_r, pan_r = gather_dual(scene.ms, scene.pan, ids, scene.width,
                              scene.patch)
    np.testing.assert_array_equal(np.asarray(ms_s), np.asarray(ms_r))
    np.testing.assert_array_equal(np.asarray(pan_s), np.asarray(pan_r))
