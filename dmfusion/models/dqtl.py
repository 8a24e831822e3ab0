"""dqtl — shared 4-stream encoder for the two-stage solver's stage 2.

The reference concatenates the four aligned streams (MS, pan2ms'd PAN,
GAN-MS, GAN-PAN) along the *batch* axis and runs one shared model
(solver/tostagesolver.py:271-275), training with the quadruplet-KL loss.
Contract: ``Net(cfg)`` called as ``model(x)`` on (4B, ps, ps, C) and
returning (4B, num_classes) logits.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import (ConvBlock, MLPHead, ResBlock,
                                    activation_fn, dtypes)


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("model_width", 64))
        x = x.astype(dtype)
        x = ConvBlock(w // 2, 3, 1, act, dtype, pdtype)(x)
        x = ResBlock(w, 1, act, dtype, pdtype)(x)
        x = ResBlock(2 * w, 2, act, dtype, pdtype)(x)
        x = ResBlock(2 * w, 1, act, dtype, pdtype)(x)
        return MLPHead(cfg["Categories_Number"], hidden=w, act=act,
                       dtype=dtype, param_dtype=pdtype)(x)
