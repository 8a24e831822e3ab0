"""cross_net — bidirectional cross-attention fusion of MS and PAN tokens.

Fills the ``cross_net`` slot named in the reference config (config.yml:7,
module never shipped).  Conv stems embed each modality into a token grid
at MS resolution; a stack of cross-attention blocks lets each modality
query the other; fused tokens are mean-pooled into the classifier head.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.attention import CrossAttnBlock, SelfAttnBlock, patchify
from dmfusion.models.common import MLPHead, PanPyramid, activation_fn, dtypes


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        dim = int(cfg["trans"]["embed_dim"])
        heads = int(cfg["trans"]["num_head"])
        depth = int(cfg["trans"]["depth"])
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)

        # Token grids: MS at patch 2 (8x8 tokens for ps=16); PAN strided
        # down 4x first so both grids align.
        t_ms = patchify(ms, 2, dim, dtype, pdtype, "ms_embed")
        pan_feat = PanPyramid((dim // 2, dim), act, dtype, pdtype)(pan)
        b, h, w, d = pan_feat.shape
        t_pan = patchify(pan_feat, 2, dim, dtype, pdtype, "pan_embed")

        pos_ms = self.param("pos_ms", nn.initializers.normal(0.02),
                            (1, t_ms.shape[1], dim), pdtype)
        pos_pan = self.param("pos_pan", nn.initializers.normal(0.02),
                             (1, t_pan.shape[1], dim), pdtype)
        t_ms = t_ms + pos_ms.astype(dtype)
        t_pan = t_pan + pos_pan.astype(dtype)

        for i in range(depth):
            t_ms2 = CrossAttnBlock(dim, heads, act, dtype, pdtype,
                                   name=f"ms_from_pan_{i}")(t_ms, t_pan)
            t_pan2 = CrossAttnBlock(dim, heads, act, dtype, pdtype,
                                    name=f"pan_from_ms_{i}")(t_pan, t_ms)
            t_ms = SelfAttnBlock(dim, heads, act, dtype, pdtype,
                                 name=f"ms_self_{i}")(t_ms2)
            t_pan = SelfAttnBlock(dim, heads, act, dtype, pdtype,
                                  name=f"pan_self_{i}")(t_pan2)

        fused = jnp.concatenate([t_ms.mean(axis=1), t_pan.mean(axis=1)],
                                axis=-1)
        return MLPHead(cfg["Categories_Number"], hidden=dim, act=act,
                       dtype=dtype, param_dtype=pdtype)(fused)
