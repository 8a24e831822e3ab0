"""generator — CycleGAN-style image generator for stage 1.

Fills the ``model.generator`` role imported by the two-stage solver
(solver/tostagesolver.py:11,62-71: two instances gen_M / gen_P map a
noise image to a fake MS / fake pseudo-PAN tile).  Conv encoder, two
residual blocks, conv decoder, sigmoid output (scene tiles are min-max
normalized to [0, 1]).  Contract: ``Net(cfg)`` called as ``model(x)`` on
(B, pic, pic, C), returning the same shape.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import ConvBlock, ResBlock, activation_fn, dtypes


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("gan_width", 32))
        channels = x.shape[-1]
        x = x.astype(dtype)
        x = ConvBlock(w, 7, 1, act, dtype, pdtype)(x)
        x = ConvBlock(2 * w, 3, 2, act, dtype, pdtype)(x)
        x = ResBlock(2 * w, 1, act, dtype, pdtype)(x)
        x = ResBlock(2 * w, 1, act, dtype, pdtype)(x)
        # Decoder: nearest-upsample + conv (checkerboard-free).
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = ConvBlock(w, 3, 1, act, dtype, pdtype)(x)
        x = nn.Conv(channels, (7, 7), padding="SAME", dtype=jnp.float32,
                    param_dtype=pdtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))
