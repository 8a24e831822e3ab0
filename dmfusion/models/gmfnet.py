"""GMFNet — gated multimodal fusion network (the default model).

Fills the ``model.gmfnet`` role the reference config names but never
ships (config.yml:6; solver/mainsolver.py:31-34 imports it dynamically).
Interface contract from the reference solver: ``Net(args=cfg)`` called as
``model(ms, pan)`` on a (B, ps, ps, 4) MS window and the paired
(B, 4ps, 4ps, 1) PAN window, returning (B, C) logits
(solver/mainsolver.py:52).

Design (TPU-first): both branches are small conv pyramids that keep
spatial dims multiples of 8 as long as possible; the PAN branch strides
its 4x window down to MS resolution instead of pre-pooling; fusion is a
per-channel sigmoid gate z so that ``f = z * h_ms + (1 - z) * h_pan`` lets
the network arbitrate modality trust pixel-by-pixel.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import (ConvBlock, MLPHead, PanPyramid,
                                    PanSpaceToDepth, ResBlock,
                                    activation_fn, dtypes)
from dmfusion.models.registry import register


@register("gmfnet")
class Net(nn.Module):
    cfg: Mapping[str, Any]
    width: int = 64

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("model_width", self.width))
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)

        # MS branch: ps x ps x 4 -> ps x ps x w.
        h_ms = ConvBlock(w // 2, 3, 1, act, dtype, pdtype)(ms)
        h_ms = ResBlock(w, 1, act, dtype, pdtype)(h_ms)

        # PAN branch: 4ps x 4ps x 1 -> ps x ps x w.  Default is the 4x
        # space-to-depth variant (+8% end-to-end, BENCH_NOTES.md);
        # cfg 'gmfnet_pan: pyramid' selects the strided-conv pyramid.
        if str(cfg.get("gmfnet_pan", "s2d")) == "pyramid":
            h_pan = PanPyramid((w // 2, w), act, dtype, pdtype)(pan)
        else:
            h_pan = PanSpaceToDepth((w // 2, w), act, dtype, pdtype)(pan)
        h_pan = ResBlock(w, 1, act, dtype, pdtype)(h_pan)

        # Gated fusion at matched resolution.
        gate_in = jnp.concatenate([h_ms, h_pan], axis=-1)
        z = nn.Conv(w, (1, 1), dtype=dtype, param_dtype=pdtype,
                    name="fusion_gate")(gate_in)
        z = nn.sigmoid(z)
        fused = z * h_ms + (1.0 - z) * h_pan

        # Joint trunk: two downsampling residual stages.
        x = ResBlock(2 * w, 2, act, dtype, pdtype)(fused)
        x = ResBlock(2 * w, 1, act, dtype, pdtype)(x)
        x = ResBlock(4 * w, 2, act, dtype, pdtype)(x)

        return MLPHead(cfg["Categories_Number"], hidden=2 * w, act=act,
                       dtype=dtype, param_dtype=pdtype)(x)
