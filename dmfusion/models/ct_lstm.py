"""ct_lstm — contourlet multiscale features + recurrent fusion.

Fills the ``ct_lstm`` slot (config.yml:7).  The reference's CT pathway
decomposes each patch on the fly in the dataset (train/dataset.py:285-324:
1 MS level, 3 cascaded PAN levels) and feeds subbands to a CNN+LSTM
(dead ancestor train/train.py:91-123 ``train_CT``).  Here the
decomposition (ops/contourlet.py) runs *inside* the jitted model, so it
fuses with the conv stack instead of running per-sample on host CPU.

Each pyramid level's (lowband, 4 directional subbands) is conv-embedded
and pooled to a fixed-size token; the multiscale token sequence
(coarse -> fine, MS level last) is consumed by an LSTM whose final state
feeds the classifier.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import ConvBlock, MLPHead, activation_fn, dtypes
from dmfusion.ops.contourlet import contourlet_decompose


class _LevelEmbed(nn.Module):
    dim: int
    act: Any
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, low: jnp.ndarray, sub: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([low, sub], axis=-1)
        x = ConvBlock(self.dim, 3, 1, self.act, self.dtype,
                      self.param_dtype)(x)
        x = ConvBlock(self.dim, 3, 2, self.act, self.dtype,
                      self.param_dtype)(x)
        return x.mean(axis=(1, 2))


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        dim = int(cfg.get("model_width", 64))
        ms32 = ms.astype(jnp.float32)     # filters are f32 constants
        pan32 = (pan if pan.ndim == 4 else pan[..., None]).astype(jnp.float32)

        # PAN cascade: 3 levels (64 -> 32 -> 16 -> 8 for ps=16).
        tokens = []
        x = pan32
        for lvl in range(3):
            low, sub = contourlet_decompose(x)
            tokens.append(_LevelEmbed(dim, act, dtype, pdtype,
                                      name=f"pan_level{lvl}")(
                low.astype(dtype), sub.astype(dtype)))
            x = low
        # MS: single level.
        low, sub = contourlet_decompose(ms32)
        tokens.append(_LevelEmbed(dim, act, dtype, pdtype, name="ms_level")(
            low.astype(dtype), sub.astype(dtype)))

        seq = jnp.stack(tokens, axis=1)  # (B, 4, dim)
        lstm = nn.RNN(nn.OptimizedLSTMCell(dim, dtype=dtype,
                                           param_dtype=pdtype), name="lstm")
        out = lstm(seq)
        return MLPHead(cfg["Categories_Number"], hidden=dim, act=act,
                       dtype=dtype, param_dtype=pdtype)(out[:, -1])
