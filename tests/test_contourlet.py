"""Structural/analytic tests of the contourlet decomposition
(reference semantics: train/dataset.py:10-130)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmfusion.ops.contourlet import (contourlet_decompose, contourlet_pyramid,
                                     dfb_dec, lp_dec, q_sampling)


def test_lp_dec_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    low, high = lp_dec(x)
    assert low.shape == (2, 8, 8, 3)
    assert high.shape == (2, 16, 16, 3)


def test_lp_dec_dc_response():
    # For a constant image the 9/7 LP: low captures (gain = sum of taps
    # squared ~ 1), and the highband is near zero (analysis/synthesis taps
    # are normalized so smooth(upsample(low)) reconstructs the DC).
    x = jnp.ones((1, 16, 16, 1))
    low, high = lp_dec(x)
    # Highband energy for DC input is far smaller than the signal.
    assert float(jnp.abs(high).mean()) < 0.25
    assert float(jnp.abs(low).mean()) > 0.5


def test_q_sampling_shape_and_identity_region(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    y = q_sampling(x, "q0", "down")
    assert y.shape == (1, 8, 8, 2)
    # Down followed by up is identity on the lattice interior for smooth
    # content; at minimum the operator must be finite and non-degenerate.
    z = q_sampling(y, "q0", "up")
    assert np.isfinite(np.asarray(z)).all()
    assert float(jnp.abs(z).sum()) > 0


def test_dfb_four_directional_subbands(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    sub = dfb_dec(x)
    assert sub.shape == (1, 8, 8, 8)  # 4 directions x 2 channels


def test_dfb_orientation_sensitivity():
    # The reference's DFB uses diamond filters (not modulated fans), so
    # h/v gratings split identically — but diagonal vs axis-aligned
    # content must land differently across the 4 subbands, and the
    # subbands must not be copies of each other.
    i = jnp.arange(32)
    axis = jnp.broadcast_to(jnp.sin(i * jnp.pi / 4)[:, None], (32, 32))
    diag = jnp.sin((i[:, None] + i[None, :]) * jnp.pi / 4)
    ea = np.asarray(jnp.mean(dfb_dec(axis[None, :, :, None]) ** 2,
                             axis=(0, 1, 2)))
    ed = np.asarray(jnp.mean(dfb_dec(diag[None, :, :, None]) ** 2,
                             axis=(0, 1, 2)))
    assert not np.allclose(ea / ea.sum(), ed / ed.sum(), atol=0.05)
    sub = dfb_dec(diag[None, :, :, None])
    assert not np.allclose(np.asarray(sub[..., 0]), np.asarray(sub[..., 1]))


def test_contourlet_decompose_api(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    low, sub = contourlet_decompose(x)
    assert low.shape == (2, 8, 8, 4)
    assert sub.shape == (2, 8, 8, 16)


def test_contourlet_pyramid_levels(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    lows, subs = contourlet_pyramid(x, levels=3)
    assert [l.shape[1] for l in lows] == [16, 8, 4]
    assert [s.shape[-1] for s in subs] == [4, 4, 4]


def test_contourlet_jit_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 1)).astype(np.float32))

    def f(img):
        low, sub = contourlet_decompose(img)
        return (low ** 2).sum() + (sub ** 2).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
