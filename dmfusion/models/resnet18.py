"""Dual-branch ResNet-18-style fusion classifier.

Fills the ``resnet18`` slot of the reference model zoo (config.yml:7
names it; the module itself was never shipped).  Same ``Net(cfg)`` /
``model(ms, pan)`` contract as gmfnet.  The classic (2,2,2,2) basic-block
layout is kept but stage widths are scaled to the 16x16/64x64 patch
regime; both branches share the layout, fusion is a concat after global
pooling.  GroupNorm replaces BatchNorm (state-free jit; see common.py).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import (ConvBlock, MLPHead, ResBlock,
                                    activation_fn, dtypes)


class _Branch(nn.Module):
    cfg: Mapping[str, Any]
    widths: Sequence[int]
    stem_stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation_fn(self.cfg)
        dtype, pdtype = dtypes(self.cfg)
        x = ConvBlock(self.widths[0], 3, self.stem_stride, act, dtype,
                      pdtype)(x)
        for i, w in enumerate(self.widths):
            stride = 1 if i == 0 else 2
            x = ResBlock(w, stride, act, dtype, pdtype)(x)
            x = ResBlock(w, 1, act, dtype, pdtype)(x)
        return x.mean(axis=(1, 2))


class Net(nn.Module):
    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        base = int(cfg.get("model_width", 32))
        widths = (base, 2 * base, 4 * base, 8 * base)
        ms = ms.astype(dtype)
        pan = pan.astype(dtype)
        # PAN stem strides twice as hard to equalize token counts.
        f_ms = _Branch(cfg, widths, 1, name="ms_branch")(ms)
        f_pan = _Branch(cfg, widths, 2, name="pan_branch")(pan)
        fused = jnp.concatenate([f_ms, f_pan], axis=-1)
        return MLPHead(cfg["Categories_Number"], hidden=4 * base, act=act,
                       dtype=dtype, param_dtype=pdtype)(fused)
