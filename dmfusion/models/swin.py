"""swin_transformer — windowed-attention classifier on the fused patch.

Fills the ``swin_transformer`` slot (config.yml:8) driven by the
reference ``trans:`` block: ``window_size``, ``embed_dim``, ``depths``
and ``num_heads`` per stage (config.yml:66-73).  The PAN window is
conv-pooled 4x to MS resolution and concatenated channel-wise, then a
two-stage Swin encoder runs: window attention with learned
relative-position bias within ``window_size`` windows, alternating
cyclic-shifted windows with cross-region attention masks, and 2x2 patch
merging between stages.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

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


def _relative_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]     # (2, N, N)
    rel = rel + (ws - 1)
    return rel[0] * (2 * ws - 1) + rel[1]


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask: -100 between tokens whose pre-shift
    regions differ (cyclic shift wraps non-adjacent content into the same
    window)."""
    img = np.zeros((h, w), np.int32)
    region = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = region
            region += 1
    img = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    img = img.reshape(-1, ws * ws)                    # (nW, N)
    diff = img[:, :, None] != img[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Multi-head attention within windows + learned relative-position
    bias, optionally masked for shifted windows."""

    dim: int
    heads: int
    window: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wins: jnp.ndarray,
                 mask: np.ndarray | None = None) -> jnp.ndarray:
        b_, n, _ = wins.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(wins)
        qkv = qkv.reshape(b_, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]              # (b_, heads, n, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype))
        table = self.param("rel_bias",
                           nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads),
                           self.param_dtype)
        idx = _relative_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.heads, n, n)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(b_, self.heads, n, n)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(out)


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
        mask = None
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(h, w, ws, shift)
        wins = window_partition(y, ws)
        wins = WindowAttention(self.dim, self.heads, ws, self.dtype,
                               self.param_dtype)(wins, mask)
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
