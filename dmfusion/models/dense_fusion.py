"""dense_fusion — whole-scene dense per-pixel fusion classifier.

The TPU-native flagship beyond the reference's design space: the
reference (and the parity models here) classify each pixel by cropping a
16x16/64x64 window and running a CNN per window — for full-scene maps
that is ~4.2M nearly-identical forwards (~800 TFLOP for image6).  This
model instead computes ONE dense feature map over the whole HBM-resident
scene (stride-1 convs at MS resolution, PAN folded down 4x), mean-pools
it over every ps x ps anchor window in a single VALID ``reduce_window``,
and applies a 1x1 head — every pixel's logits in one pass (~0.2 TFLOP,
a ~4000x FLOP reduction for full-scene inference).

Training uses the same dense program: features over the scene (gradient
checkpointed), pooled-feature rows gathered at the train anchors, head +
CE.  Train/eval/inference all share one code path, so dense training and
dense inference are exactly self-consistent (unlike converting a
patchwise CNN, whose padding/normalization semantics would change).

Receptive fields legitimately cross window boundaries here — this is a
scene-context model, an intentional capability *addition* documented in
ARCHITECTURE.md, not a replacement for the reference-parity patch
models.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import activation_fn, dtypes

ARITY = "dense"


class LocalConvBlock(nn.Module):
    """Conv -> channels-only LayerNorm -> activation.

    ConvNeXt-style per-pixel normalization instead of GroupNorm: the
    statistics have zero spatial extent, so dense features are exactly
    *local* — band-sharded inference (spatial parallelism with halo)
    reproduces the single-device features bit-identically (only the
    downstream window-pooling SAT rounds differently; see window_mean).
    """

    features: int
    kernel: int = 3
    act: Any = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return self.act(x)


class LocalResBlock(nn.Module):
    features: int
    act: Any = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sc = x
        y = LocalConvBlock(self.features, 3, self.act, self.dtype,
                           self.param_dtype)(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(y)
        if sc.shape[-1] != self.features:
            sc = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                         param_dtype=self.param_dtype)(sc)
        return self.act(y + sc)


# Receptive radius of features(): ms path = stem(1) + resblock(2) +
# trunk resblocks(2+2) = 7 rows of 3x3 convs -> radius 7.
RECEPTIVE_RADIUS = 7


def window_mean(feats: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(H', W', D) -> (H, W, D): mean over every patch x patch window via
    a summed-area table (two cumsums + four lookups).

    O(1) work per window instead of reduce_window's patch^2 adds, and —
    unlike ``lax.reduce_window`` — it linearizes under jax.checkpoint
    (jax 0.9 cannot reverse-differentiate reduce_window through remat).
    Accumulation in f32: a bf16 cumsum over thousands of rows would lose
    the window differences entirely.

    Banding note: under row-band sharding the band pass computes the SAT
    over its own rows, so window sums agree with the full pass
    *mathematically* but with a different f32 summation association —
    measured logits deltas are ~1e-6 (vs the 0.12-class errors of an
    actual boundary bug).  Row-local alternatives (unrolled adds,
    segment-anchored prefixes) were measured 45 ms slower per image6
    pass (+18%), so bit-identity across band counts was deliberately
    traded for speed; see BENCH_NOTES.md.
    """
    s = jnp.pad(feats.astype(jnp.float32), ((1, 0), (1, 0), (0, 0)))
    s = s.cumsum(axis=0).cumsum(axis=1)
    win = (s[patch:, patch:] - s[:-patch, patch:] - s[patch:, :-patch]
           + s[:-patch, :-patch])
    return (win / jnp.float32(patch * patch)).astype(feats.dtype)


def sat_window_sums(feats: jnp.ndarray, patch: int
                    ) -> tuple[jnp.ndarray, int]:
    """Flattened SAT + row stride for per-anchor window-sum gathers:
    win(x, y) = flat[(x+ps)*w1 + y+ps] - flat[x*w1 + y+ps]
              - flat[(x+ps)*w1 + y] + flat[x*w1 + y]."""
    s = jnp.pad(feats.astype(jnp.float32), ((1, 0), (1, 0), (0, 0)))
    s = s.cumsum(axis=0).cumsum(axis=1)
    return s.reshape(-1, s.shape[-1]), s.shape[1]


class Net(nn.Module):
    cfg: Mapping[str, Any]

    def setup(self):
        cfg = self.cfg
        act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        w = int(cfg.get("model_width", 32))
        self._dtype = dtype
        # Per-block rematerialization: whole-scene activations are
        # ~0.5 GB each at image6 scale, so the backward pass must
        # recompute per block instead of storing every intermediate
        # (unchecked, image6 dense training needs ~37 GB of HBM).
        CB = nn.remat(LocalConvBlock)
        RB = nn.remat(LocalResBlock)
        self.ms_stem = CB(w // 2, 3, act, dtype, pdtype, name="ms_stem")
        self.ms_block = RB(w, act, dtype, pdtype, name="ms_block")
        # PAN enters as 16-channel space-to-depth at MS resolution (a
        # scene-sized C=1 conv input draws a (2,128)-tiled layout that
        # pads 256x — 35 GB for image6's PAN — so channels-last must be
        # fed >= a handful of channels).
        self.pan_stem = CB(w, 3, act, dtype, pdtype, name="pan_stem")
        self.pan_block = RB(w, act, dtype, pdtype, name="pan_block")
        self.gate = nn.Conv(w, (1, 1), dtype=dtype, param_dtype=pdtype,
                            name="fusion_gate")
        self.trunk1 = RB(w, act, dtype, pdtype, name="trunk1")
        self.trunk2 = RB(w, act, dtype, pdtype, name="trunk2")
        self.head1 = nn.Dense(w, dtype=dtype, param_dtype=pdtype,
                              name="head1")
        self.head2 = nn.Dense(cfg["Categories_Number"], dtype=jnp.float32,
                              param_dtype=pdtype, name="head2")
        self._act = act

    def features(self, scene_ms: jnp.ndarray,
                 scene_pan: jnp.ndarray) -> jnp.ndarray:
        """(H', W', C) + (4H'', 4W'', 1) -> dense (H', W', D) features."""
        ms = scene_ms[None].astype(self._dtype)
        pan2d = scene_pan if scene_pan.ndim == 2 else scene_pan[..., 0]
        # Space-to-depth 4x: PAN pixels under MS pixel (x, y) become its
        # 16 channels, aligning the grids exactly.
        hm, wm = ms.shape[1], ms.shape[2]
        pan_s2d = pan2d[: 4 * hm, : 4 * wm].reshape(hm, 4, wm, 4)
        pan_s2d = pan_s2d.transpose(0, 2, 1, 3).reshape(1, hm, wm, 16)
        pan_s2d = pan_s2d.astype(self._dtype)
        h_ms = self.ms_block(self.ms_stem(ms))
        h_pan = self.pan_block(self.pan_stem(pan_s2d))
        z = nn.sigmoid(self.gate(jnp.concatenate([h_ms, h_pan], axis=-1)))
        fused = z * h_ms + (1.0 - z) * h_pan
        out = self.trunk2(self.trunk1(fused))
        return out[0]

    def pooled(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
               patch: int) -> jnp.ndarray:
        """Dense features mean-pooled over every ps x ps anchor window:
        -> (H, W, D) where entry (x, y) is the window-mean a patch model
        would global-pool."""
        return window_mean(self.features(scene_ms, scene_pan), patch)

    def head(self, pooled_feats: jnp.ndarray) -> jnp.ndarray:
        """(..., D) pooled features -> (..., num_classes) f32 logits."""
        x = self._act(self.head1(pooled_feats))
        return self.head2(x).astype(jnp.float32)

    def __call__(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                 patch: int) -> jnp.ndarray:
        """Full-scene logits map (H, W, num_classes)."""
        return self.head(self.pooled(scene_ms, scene_pan, patch))
