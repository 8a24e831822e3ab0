"""Contourlet decomposition: Laplacian pyramid + directional filter bank.

TPU-native re-implementation of the reference's in-repo ``CT_transform``
(train/dataset.py:10-130): a fixed-filter decomposition used by the
CT/ct_lstm model family.  Structure preserved:

  * LP stage with the standard 9/7 biorthogonal pyramid filters
    (9-tap analysis / 7-tap synthesis, separable outer products),
    reflect padding, decimate-by-2, zero-upsample, and
    ``high = img - smooth(upsampled_low)`` (dataset.py:58-71);
  * two-level DFB tree with the 5x5 diamond fan filters, quincunx
    resampling between levels (Q0 then Q1 lattices), center crop, giving
    4 directional subbands (dataset.py:98-115);
  * :func:`contourlet_decompose` returns (lowband, subbands)
    (dataset.py:117-130).

The quincunx resample reproduces torch ``affine_grid``/``grid_sample``
(align_corners=True, zero padding) semantics with
``jax.scipy.ndimage.map_coordinates`` (order=1).

Everything is depthwise ``lax.conv_general_dilated`` in NHWC — the convs
have fixed (non-learned) weights, so XLA folds them into constants and
fuses the surrounding arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 9/7 biorthogonal pyramid filter taps (public filter-bank constants).
_H9 = np.array([0.037828455506995, -0.023849465019380, -0.11062440441842,
                0.37740285561265, 0.85269867900940, 0.37740285561265,
                -0.11062440441842, -0.023849465019380, 0.037828455506995])
_G7 = np.array([-0.064538882628938, -0.040689417609558, 0.41809227322221,
                0.78848561640566, 0.41809227322221, -0.040689417609558,
                -0.064538882628938])

# Diamond/fan DFB analysis filters (5x5), standard contourlet toolbox values.
_H0 = np.array([[0, 0, -1, 0, 0],
                [0, -2, 4, -2, 0],
                [-1, 4, 28, 4, -1],
                [0, -2, 4, -2, 0],
                [0, 0, -1, 0, 0]], dtype=np.float64) / 32.0
_H1 = np.array([[0, 0, 0, 0, 0],
                [0, -1, 0, 0, 0],
                [-1, 4, -1, 0, 0],
                [0, -1, 0, 0, 0],
                [0, 0, 0, 0, 0]], dtype=np.float64) / 4.0


def _depthwise_conv(x: jnp.ndarray, kernel2d: np.ndarray) -> jnp.ndarray:
    """NHWC depthwise conv with one shared 2-D kernel, VALID padding."""
    c = x.shape[-1]
    kh, kw = kernel2d.shape
    k = jnp.asarray(kernel2d, x.dtype)
    # HWIO with feature_group_count=C: (kh, kw, 1, C)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


def lp_dec(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Laplacian pyramid analysis: (B,H,W,C) -> (low (B,H/2,W/2,C),
    high (B,H,W,C))."""
    h2d = np.outer(_H9, _H9)
    g2d = np.outer(_G7, _G7)
    low = _depthwise_conv(_reflect_pad(img, h2d.shape[0] // 2), h2d)
    low = low[:, ::2, ::2, :]
    up = jnp.zeros_like(img)
    up = up.at[:, ::2, ::2, :].set(low)
    smooth = _depthwise_conv(_reflect_pad(up, g2d.shape[0] // 2), g2d)
    return low, img - smooth


_Q_MATS = {
    ("q0", "down"): np.array([[1.0, -1.0, 0.0], [1.0, 1.0, 0.0]]),
    ("q1", "down"): np.array([[1.0, 1.0, 0.0], [-1.0, 1.0, 0.0]]),
    ("q0", "up"): np.array([[0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]]),
    ("q1", "up"): np.array([[0.5, -0.5, 0.0], [0.5, 0.5, 0.0]]),
}


def _grid_sample_affine(img: jnp.ndarray, theta: np.ndarray) -> jnp.ndarray:
    """torch affine_grid+grid_sample (align_corners=True, zeros padding)
    for a single constant 2x3 matrix, NHWC."""
    _, h, w, _ = img.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    yn, xn = jnp.meshgrid(ys, xs, indexing="ij")
    a, b_, tx = theta[0]
    c_, d, ty = theta[1]
    x_s = a * xn + b_ * yn + tx
    y_s = c_ * xn + d * yn + ty
    col = (x_s + 1.0) * (w - 1) / 2.0
    row = (y_s + 1.0) * (h - 1) / 2.0

    def sample_one(ch):  # ch: (H, W)
        return jax.scipy.ndimage.map_coordinates(
            ch, [row, col], order=1, mode="constant", cval=0.0)

    # vmap over batch then channels.
    return jax.vmap(lambda im: jax.vmap(sample_one, in_axes=2, out_axes=2)(im)
                    )(img)


def q_sampling(img: jnp.ndarray, q_mode: str = "q0",
               op_mode: str = "down") -> jnp.ndarray:
    """Quincunx resampling (reference dataset.py:73-96): reflect-pad to
    double size, affine resample by the quincunx lattice matrix, crop the
    center half."""
    _, h, w, _ = img.shape
    img = jnp.pad(img, ((0, 0), (h // 2, h // 2), (w // 2, w // 2), (0, 0)),
                  mode="reflect")
    out = _grid_sample_affine(img, _Q_MATS[(q_mode, op_mode)])
    _, hh, ww, _ = out.shape
    return out[:, hh // 4: 3 * hh // 4, ww // 4: 3 * ww // 4, :]


def dfb_dec(img: jnp.ndarray) -> jnp.ndarray:
    """Two-level directional filter bank -> 4 subbands stacked on channels,
    center-cropped to half size (reference dataset.py:98-115)."""
    _, h, w, _ = img.shape

    def fan(x, which):
        kern = _H0 if which == 0 else _H1
        return _depthwise_conv(_reflect_pad(x, 2), kern)

    y0 = q_sampling(fan(img, 0), "q0", "down")
    y1 = q_sampling(fan(img, 1), "q0", "down")
    y00 = q_sampling(fan(y0, 0), "q1", "down")
    y01 = q_sampling(fan(y0, 1), "q1", "down")
    y10 = q_sampling(fan(y1, 0), "q1", "down")
    y11 = q_sampling(fan(y1, 1), "q1", "down")
    out = jnp.concatenate([y00, y01, y10, y11], axis=-1)
    return out[:, h // 4: 3 * h // 4, w // 4: 3 * w // 4, :]


@jax.jit
def contourlet_decompose(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, C) -> (lowband (B, H/2, W/2, C),
    subbands (B, H/2, W/2, 4C))."""
    low, high = lp_dec(img)
    return low, dfb_dec(high)


@functools.partial(jax.jit, static_argnames=("levels",))
def contourlet_pyramid(img: jnp.ndarray, levels: int = 3
                       ) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """Repeated decomposition of the lowband (the reference's dataset_CT
    applies 3 levels to PAN, train/dataset.py:306-309)."""
    lows, subs = [], []
    x = img
    for _ in range(levels):
        low, sub = contourlet_decompose(x)
        lows.append(low)
        subs.append(sub)
        x = low
    return lows, subs
