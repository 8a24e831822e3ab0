"""IHS-style cross-modal resampling ops (reference image_convert/IHS.py).

Every op here replaces a Python pixel loop with a reshape/gather that XLA
lowers to trivially vectorized code:

  * :func:`block_mean` — mean-pool downsample (reference ``unsampling``,
    IHS.py:6-12, O(H*W) Python loop),
  * :func:`pan2ms` — PAN -> pseudo-MS by /2 block-mean then 2x2 *phase
    interleave* into 4 channels (IHS.py:14-19),
  * :func:`unpooling` — t-times upsample placing each value at a random
    position inside its t x t block (IHS.py:22-29).  The reference uses
    unseeded ``random.randint`` (nondeterministic); here the placement is
    driven by a JAX PRNG key — an intentional, documented divergence,
  * :func:`ihs_transform` — the classic IHS pansharpen feeding
    ``dataset_tri``'s MSPAN stream (IHS.py:40-54).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def block_mean(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(H, W) -> (H//scale, W//scale) mean over scale x scale blocks.

    Implemented as ``scale**2`` strided-slice adds, NOT the natural
    ``reshape(h//s, s, w//s, s).mean((1, 3))``: on TPU that reshape's
    output materializes with the (8, 128) tiling on its two minor dims
    ``(w//s, s)``, padding the size-``s`` minor dim 128/s x — at image6
    PAN scale (8004 x 8404) the s=2 intermediate is a 17.2 GB
    allocation (observed compile-OOM in the two-stage stage-1 prep).
    Strided slices keep every operand rank-2 and layout-compact."""
    h, w = img.shape[0] - img.shape[0] % scale, img.shape[1] - img.shape[1] % scale
    acc = None
    for i in range(scale):
        for j in range(scale):
            part = img[i:h:scale, j:w:scale]
            acc = part if acc is None else acc + part
    return acc / jnp.asarray(scale * scale, acc.dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def pan2ms(pan: jnp.ndarray, size: tuple[int, int, int]) -> jnp.ndarray:
    """PAN (4H, 4W) -> pseudo-MS (H, W, C) via /2 block-mean + phase
    interleave ``p[i % 2::2, i // 2::2]`` per channel (IHS.py:14-19).

    Jitted: eagerly this is ~12 ops = ~12 separate remote compiles per
    scene shape on the tunneled-TPU backend (see scene.prep_scene)."""
    h, w, c = size
    p = block_mean(pan, 2)
    chans = [p[i % 2::2, i // 2::2][:h, :w] for i in range(c)]
    return jnp.stack(chans, axis=-1)


def unpooling(img: jnp.ndarray, t: int, key: jax.Array) -> jnp.ndarray:
    """(H, W, C) -> (H*t, W*t, C); each value lands at a seeded-random
    offset inside its t x t block, the rest is zero (IHS.py:22-29).

    One scatter per output (no t*t one-hot blowup — matters at full-scene
    size where t=4 would cost 16x the scene in transient memory).
    """
    h, w, c = img.shape
    km, kn = jax.random.split(key)
    m = jax.random.randint(km, (h, w, c), 0, t)
    n = jax.random.randint(kn, (h, w, c), 0, t)
    rows = jnp.arange(h)[:, None, None] * t + m            # (h, w, c)
    cols = jnp.arange(w)[None, :, None] * t + n
    chan = jnp.broadcast_to(jnp.arange(c)[None, None, :], (h, w, c))
    out = jnp.zeros((h * t, w * t, c), img.dtype)
    return out.at[rows, cols, chan].set(img)


def replicate_channels(img: jnp.ndarray, n: int) -> jnp.ndarray:
    """(H, W) -> (H, W, n) channel replicate (reference ``raw_3copy``)."""
    return jnp.repeat(img[:, :, None], n, axis=2)


@jax.jit
def ihs_transform(ms: jnp.ndarray, pan: jnp.ndarray,
                  key: jax.Array) -> jnp.ndarray:
    """Classic IHS pansharpen (IHS.py:40-54): unpool MS to PAN geometry,
    I = channel mean, delta = PAN - I, add delta to every band, return the
    band mean.

    Note: algebraically the band mean of (MS_up + delta) collapses to PAN
    itself; the computation is kept faithful to the reference so the
    intermediate (per-band pansharpened) products remain available.
    """
    c = ms.shape[2]
    up = unpooling(ms, c, key)
    intensity = up.mean(axis=2)
    delta = pan - intensity
    result = up + replicate_channels(delta, c)
    return result.mean(axis=2)


@functools.partial(jax.jit, static_argnames=("scale",))
def upsample_nearest(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Deterministic nearest upsample companion to :func:`block_mean`."""
    return jnp.repeat(jnp.repeat(img, scale, axis=0), scale, axis=1)
