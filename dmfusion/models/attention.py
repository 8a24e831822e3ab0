"""Shared attention blocks for the transformer models.

Plain multi-head self/cross attention + MLP transformer blocks in NHWC /
token layouts sized for the 16x16-patch regime.  All matmuls specify
f32 accumulation (``preferred_element_type`` semantics come via linen's
dtype handling); token counts are small, so no windowing tricks are
needed beyond swin's (see swin.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn


class SelfAttnBlock(nn.Module):
    dim: int
    heads: int
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            param_dtype=self.param_dtype)(y, y)
        x = x + y
        z = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        z = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        z = self.act(z)
        z = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        return x + z


class CrossAttnBlock(nn.Module):
    """Queries from stream a attend to keys/values of stream b."""

    dim: int
    heads: int
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        qa = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(a)
        kb = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(b)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            param_dtype=self.param_dtype)(qa, kb)
        a = a + y
        z = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(a)
        z = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        z = self.act(z)
        z = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(z)
        return a + z


def patchify(x: jnp.ndarray, patch: int, dim: int, dtype, param_dtype,
             name: str) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W/patch^2, dim) learned patch embedding."""
    conv = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                   dtype=dtype, param_dtype=param_dtype, name=name)
    y = conv(x)
    b, h, w, d = y.shape
    return y.reshape(b, h * w, d)
