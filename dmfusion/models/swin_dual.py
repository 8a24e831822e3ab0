"""swin_T_dual — two independent Swin branches with late fusion.

Fills the ``swin_T_dual`` slot (config.yml:8): each modality gets its own
:class:`~dmfusion.models.swin.SwinEncoder`; pooled branch features are
fused by a gated sum (same gate idea as gmfnet) before the head.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import MLPHead, PanPyramid, activation_fn, dtypes
from dmfusion.models.swin import SwinEncoder


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        dim = int(cfg["trans"]["embed_dim"])
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)
        pan_grid = PanPyramid((dim // 2, dim), act, dtype, pdtype)(pan)
        f_ms = SwinEncoder(cfg, name="ms_encoder")(ms)
        f_pan = SwinEncoder(cfg, name="pan_encoder")(pan_grid)
        gate = nn.sigmoid(nn.Dense(f_ms.shape[-1], dtype=dtype,
                                   param_dtype=pdtype, name="gate")(
            jnp.concatenate([f_ms, f_pan], axis=-1)))
        fused = gate * f_ms + (1.0 - gate) * f_pan
        return MLPHead(cfg["Categories_Number"], hidden=dim, act=act,
                       dtype=dtype, param_dtype=pdtype)(fused)
