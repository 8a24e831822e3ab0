"""discriminator — PatchGAN discriminator for stage 1.

Fills the ``model.discriminator`` role (``Discriminator2``) the two-stage
solver imports (solver/tostagesolver.py:10,62-66: two instances disc_M /
disc_P score real vs. generated tiles).  Strided conv stack producing a
patchwise realness map; the MSE adversarial loss compares it against
ones/zeros maps (tostagesolver.py:102-111).  Contract: ``Net(cfg)``
called as ``model(x)`` on (B, pic, pic, C) -> (B, pic/8, pic/8, 1).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import ConvBlock, dtypes


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("gan_width", 32))
        act = nn.leaky_relu
        x = x.astype(dtype)
        x = ConvBlock(w, 4, 2, act, dtype, pdtype, norm=False)(x)
        x = ConvBlock(2 * w, 4, 2, act, dtype, pdtype)(x)
        x = ConvBlock(4 * w, 4, 2, act, dtype, pdtype)(x)
        x = nn.Conv(1, (4, 4), padding="SAME", dtype=jnp.float32,
                    param_dtype=pdtype)(x)
        return x.astype(jnp.float32)
