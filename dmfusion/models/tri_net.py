"""tri_net — three-stream fusion (MS + PAN + IHS-fused MSPAN).

Covers the reference's tri-stream pathway: ``dataset_tri`` supplies an
extra IHS-pansharpened stream at PAN geometry (train/dataset.py:248-282,
produced by image_convert/IHS.py:40-54) consumed by the dead-ancestor
3-input train modes (train/train.py:22-53 mode 3).  Contract:
``Net(cfg)`` called as ``model(ms, pan, mspan)``.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import (ConvBlock, MLPHead, PanPyramid, ResBlock,
                                    activation_fn, dtypes)


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray,
                 mspan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("model_width", 64))
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)
        mspan = mspan.astype(dtype)

        h_ms = ResBlock(w, 1, act, dtype, pdtype)(
            ConvBlock(w // 2, 3, 1, act, dtype, pdtype)(ms))
        h_pan = ResBlock(w, 1, act, dtype, pdtype)(
            PanPyramid((w // 2, w), act, dtype, pdtype)(pan))
        h_mp = ResBlock(w, 1, act, dtype, pdtype)(
            PanPyramid((w // 2, w), act, dtype, pdtype)(mspan))

        stack = jnp.concatenate([h_ms, h_pan, h_mp], axis=-1)
        gate = nn.softmax(
            nn.Conv(3, (1, 1), dtype=dtype, param_dtype=pdtype,
                    name="stream_gate")(stack), axis=-1)
        fused = (gate[..., 0:1] * h_ms + gate[..., 1:2] * h_pan +
                 gate[..., 2:3] * h_mp)
        x = ResBlock(2 * w, 2, act, dtype, pdtype)(fused)
        x = ResBlock(4 * w, 2, act, dtype, pdtype)(x)
        return MLPHead(cfg["Categories_Number"], hidden=2 * w, act=act,
                       dtype=dtype, param_dtype=pdtype)(x)
