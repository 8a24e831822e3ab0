"""swin_transformer — windowed-attention classifier on the fused patch.

Fills the ``swin_transformer`` slot (config.yml:8) driven by the
reference ``trans:`` block: ``window_size``, ``embed_dim``, ``depths``
and ``num_heads`` per stage (config.yml:66-73).  The PAN window is
conv-pooled 4x to MS resolution and concatenated channel-wise, then a
two-stage Swin encoder runs: window attention within ``window_size``
windows, alternating shifted windows (cyclic roll), and 2x2 patch
merging between stages.  Absolute position embeddings stand in for
relative-position bias tables (documented simplification — token grids
here are at most 16x16).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.attention import SelfAttnBlock
from dmfusion.models.common import MLPHead, PanPyramid, activation_fn, dtypes


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, b: int, h: int,
                   w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = min(self.window, h, w)
        shift = self.shift % ws
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = window_partition(y, ws)
        wins = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            param_dtype=self.param_dtype)(wins, wins)
        y = window_reverse(wins, ws, b, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y
        z = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        z = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        z = self.act(z)
        z = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        return x + z


class PatchMerge(nn.Module):
    dim_out: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return nn.Dense(self.dim_out, dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class SwinEncoder(nn.Module):
    """Stages of shifted-window blocks with patch merging in between."""

    cfg: Mapping[str, Any]

    @nn.compact
    def __call__(self, grid: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        tr = cfg["trans"]
        dim = int(tr["embed_dim"])
        ws = int(tr["window_size"])
        depths = [int(d) for d in tr["depths"]]
        heads = [int(nh) for nh in tr["num_heads"]]

        x = nn.Dense(dim, dtype=dtype, param_dtype=pdtype,
                     name="embed")(grid)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, x.shape[1], x.shape[2], dim), pdtype)
        x = x + pos.astype(dtype)
        for s, (depth, nh) in enumerate(zip(depths, heads)):
            for i in range(depth):
                x = SwinBlock(x.shape[-1], nh, ws, (i % 2) * (ws // 2), act,
                              dtype, pdtype, name=f"stage{s}_block{i}")(x)
            if s + 1 < len(depths) and x.shape[1] >= 2 and x.shape[2] >= 2:
                x = PatchMerge(2 * x.shape[-1], dtype, pdtype,
                               name=f"merge{s}")(x)
        x = nn.LayerNorm(dtype=dtype, param_dtype=pdtype)(x)
        return x.mean(axis=(1, 2))


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
        pan_feat = PanPyramid((dim // 2, dim // 2), act, dtype, pdtype)(pan)
        grid = jnp.concatenate([ms, pan_feat], axis=-1)
        feat = SwinEncoder(cfg, name="encoder")(grid)
        return MLPHead(cfg["Categories_Number"], hidden=dim, act=act,
                       dtype=dtype, param_dtype=pdtype)(feat)
