"""vision_transformer — dual-modality ViT.

Fills the ``vision_transformer`` slot (config.yml:8) using the
reference's ``trans:`` hyperparameter block (config.yml:66-73:
patch_size, embed_dim, depth, num_head).  MS tokens (per-pixel at
``trans.patch_size``) and PAN tokens (4x conv-pooled to MS resolution
first) are concatenated into one sequence with learned modality + 2-D
position embeddings; a standard pre-norm transformer encoder and a CLS
token produce the logits.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.attention import SelfAttnBlock, patchify
from dmfusion.models.common import MLPHead, PanPyramid, activation_fn, dtypes


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        tr = cfg["trans"]
        dim = int(tr["embed_dim"])
        heads = int(tr["num_head"])
        depth = int(tr["depth"])
        p = max(int(tr["patch_size"]), 1)
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)

        t_ms = patchify(ms, p, dim, dtype, pdtype, "ms_embed")
        pan_feat = PanPyramid((dim // 2, dim), act, dtype, pdtype)(pan)
        t_pan = patchify(pan_feat, p, dim, dtype, pdtype, "pan_embed")

        n_ms, n_pan = t_ms.shape[1], t_pan.shape[1]
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, n_ms + n_pan, dim), pdtype)
        mod = self.param("modality", nn.initializers.normal(0.02),
                         (2, dim), pdtype)
        tokens = jnp.concatenate([
            t_ms + mod[0].astype(dtype),
            t_pan + mod[1].astype(dtype),
        ], axis=1) + pos.astype(dtype)

        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, dim),
                         pdtype)
        cls = jnp.broadcast_to(cls.astype(dtype),
                               (tokens.shape[0], 1, dim))
        x = jnp.concatenate([cls, tokens], axis=1)
        for i in range(depth):
            x = SelfAttnBlock(dim, heads, act, dtype, pdtype,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=dtype, param_dtype=pdtype)(x)
        return MLPHead(cfg["Categories_Number"], hidden=0, act=act,
                       dtype=dtype, param_dtype=pdtype)(x[:, 0])
