"""Shared building blocks for the model zoo.

All models are flax.linen modules in NHWC layout (TPU-native: channels
innermost feed the MXU's 128-lane minor dimension).  Normalization is
GroupNorm rather than BatchNorm: it is state-free, so the whole train
step stays a pure jitted function with no mutable batch-stats plumbing —
an intentional divergence from typical torch CNNs, noted per model.

Compute runs in ``cfg['precision']['compute_dtype']`` (bf16 by default —
TPU MXUs natively consume bf16 and need no loss scaling, replacing the
reference GAN path's ``torch.cuda.amp`` GradScaler machinery,
solver/tostagesolver.py:83-84) while parameters stay f32.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax.numpy as jnp
from flax import linen as nn


def activation_fn(cfg: Mapping[str, Any]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Config-selected nonlinearity (reference config.yml schedule.activate)."""
    name = str(cfg.get("schedule", {}).get("activate", "Relu")).lower()
    return {"relu": nn.relu, "gelu": nn.gelu, "silu": nn.silu,
            "tanh": nn.tanh, "leakyrelu": nn.leaky_relu}[name]


def dtypes(cfg: Mapping[str, Any]) -> tuple[jnp.dtype, jnp.dtype]:
    prec = cfg.get("precision", {})
    compute = jnp.dtype(prec.get("compute_dtype", "bfloat16"))
    param = jnp.dtype(prec.get("param_dtype", "float32"))
    return compute, param


class ConvBlock(nn.Module):
    """Conv -> GroupNorm -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: Callable = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if self.norm:
            groups = min(8, self.features)
            while self.features % groups:
                groups -= 1
            x = nn.GroupNorm(num_groups=groups, dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
        return self.act(x)


class ResBlock(nn.Module):
    """Two 3x3 convs with identity (or 1x1-projected) shortcut."""

    features: int
    stride: int = 1
    act: Callable = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sc = x
        y = ConvBlock(self.features, 3, self.stride, self.act, self.dtype,
                      self.param_dtype)(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype)(y)
        y = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype,
                         param_dtype=self.param_dtype)(y)
        if sc.shape[-1] != self.features or self.stride != 1:
            sc = nn.Conv(self.features, (1, 1),
                         strides=(self.stride, self.stride),
                         dtype=self.dtype, param_dtype=self.param_dtype)(sc)
        return self.act(y + sc)


class MLPHead(nn.Module):
    """Global-average-pool -> dense -> classifier logits (f32 out)."""

    num_classes: int
    hidden: int = 0
    act: Callable = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 4:
            x = x.mean(axis=(1, 2))
        if self.hidden:
            x = self.act(nn.Dense(self.hidden, dtype=self.dtype,
                                  param_dtype=self.param_dtype)(x))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=self.param_dtype)(x)
        return x.astype(jnp.float32)


class PanPyramid(nn.Module):
    """Strided conv pyramid reducing the 4x PAN window to MS resolution.

    4 x ps -> ps in two stride-2 stages; keeps all computation on the MXU
    rather than pre-pooling on the host.
    """

    features: Sequence[int] = (32, 64)
    act: Callable = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pan: jnp.ndarray) -> jnp.ndarray:
        x = pan
        for f in self.features:
            x = ConvBlock(f, 3, 2, self.act, self.dtype, self.param_dtype)(x)
        return x


class PanSpaceToDepth(nn.Module):
    """4x space-to-depth + stride-1 convs at MS resolution.

    Same role as :class:`PanPyramid` (fold the 4x PAN window down to the
    MS grid) but it never feeds a C=1 tensor to a strided conv — a
    single-channel NHWC input draws the TPU's (2, 128)-tiled layout,
    which pads the channel dim 256x.  Reshaping the 4x4 neighborhood
    into 16 channels first keeps every conv MXU-shaped; measured +8%
    end-to-end on the patchwise flagship (BENCH_NOTES.md round-1 leads).
    """

    features: Sequence[int] = (32, 64)
    act: Callable = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pan: jnp.ndarray) -> jnp.ndarray:
        b, h4, w4, c = pan.shape
        x = pan.reshape(b, h4 // 4, 4, w4 // 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h4 // 4, w4 // 4,
                                                  16 * c)
        for f in self.features:
            x = ConvBlock(f, 3, 1, self.act, self.dtype, self.param_dtype)(x)
        return x
