"""dense_fusion — whole-scene dense per-pixel fusion classifier.

The TPU-native flagship beyond the reference's design space: the
reference (and the parity models here) classify each pixel by cropping a
16x16/64x64 window and running a CNN per window — for full-scene maps
that is ~4.2M nearly-identical forwards (~800 TFLOP for image6).  This
model instead computes ONE dense feature map over the whole HBM-resident
scene (a half-resolution 4x-channel trunk — the MXU-lane-optimal layout,
see BENCH_NOTES.md — with both modalities space-to-depth-packed onto the
trunk grid, depth-to-space back plus a full-res refine conv), mean-pools
it over every ps x ps anchor window via a summed-area table, and applies
a 1x1 head — every pixel's logits in one pass (a ~4000x FLOP reduction
vs per-window forwards for full-scene inference).

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


# Receptive radius of features() in FULL-resolution rows: the half-res
# trunk (stem 1 + branch resblock 2 + trunk resblocks 2+2 = 7 half-res
# rows -> 14 full-res) + the full-res refine conv (1) = 15; 16 adds one
# row of margin for the s2d-2 phase.
RECEPTIVE_RADIUS = 16


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(H, W, C) -> (H/f, W/f, f*f*C); H, W must be multiples of f."""
    h, w, c = x.shape
    x = x.reshape(h // f, f, w // f, f, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    h, w, c = x.shape
    c0 = c // (f * f)
    x = x.reshape(h, w, f, f, c0).transpose(0, 2, 1, 3, 4)
    return x.reshape(h * f, w * f, c0)


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
        self._w = w
        # Per-block rematerialization: whole-scene activations are
        # ~0.5 GB each at image6 scale, so the backward pass must
        # recompute per block instead of storing every intermediate
        # (unchecked, image6 dense training needs ~37 GB of HBM).
        CB = nn.remat(LocalConvBlock)
        RB = nn.remat(LocalResBlock)
        # The trunk runs at HALF resolution with 4x channels (space-to-
        # depth 2x): a (H, W, 32) conv fills only a quarter of the TPU's
        # 128 lanes, while (H/2, W/2, 128) convs measured 79 TF/s vs
        # 2.9 TF/s — 16x the FLOPs in 0.58x the time (BENCH_NOTES.md).
        # Same bytes per pixel, so training memory is unchanged.
        self.ms_stem = CB(w, 3, act, dtype, pdtype, name="ms_stem")
        self.ms_block = RB(2 * w, act, dtype, pdtype, name="ms_block")
        # PAN enters as 64-channel space-to-depth-8 at trunk (half-MS)
        # resolution (a scene-sized C=1 conv input draws a (2,128)-tiled
        # layout that pads 256x — 35 GB for image6's PAN — so
        # channels-last must be fed many channels).
        self.pan_stem = CB(w, 3, act, dtype, pdtype, name="pan_stem")
        self.pan_block = RB(2 * w, act, dtype, pdtype, name="pan_block")
        self.gate = nn.Conv(2 * w, (1, 1), dtype=dtype, param_dtype=pdtype,
                            name="fusion_gate")
        self.trunk1 = RB(4 * w, act, dtype, pdtype, name="trunk1")
        self.trunk2 = RB(4 * w, act, dtype, pdtype, name="trunk2")
        # Full-resolution refine after depth-to-space: restores per-pixel
        # detail the 2x2 phase packing alone would leave implicit.
        self.refine = CB(w, 3, act, dtype, pdtype, name="refine")
        self.head1 = nn.Dense(w, dtype=dtype, param_dtype=pdtype,
                              name="head1")
        self.head2 = nn.Dense(cfg["Categories_Number"], dtype=jnp.float32,
                              param_dtype=pdtype, name="head2")
        self._act = act

    def features(self, scene_ms: jnp.ndarray,
                 scene_pan: jnp.ndarray) -> jnp.ndarray:
        """(H', W', C) + (4H'', 4W'', 1) -> dense (H', W', w) features.

        Odd heights/widths are zero-padded to even before the s2d-2
        packing; the pad sits at the tensor's own bottom/right edge, so
        full-scene and clamped-band passes pad at the same global rows
        and stay consistent (band interiors are even-length by
        construction — train/steps.py::_band_plan)."""
        ms = scene_ms.astype(self._dtype)
        pan2d = scene_pan if scene_pan.ndim == 2 else scene_pan[..., 0]
        hm, wm = ms.shape[0], ms.shape[1]
        hm2, wm2 = -(-hm // 2), -(-wm // 2)
        ms = jnp.pad(ms, ((0, 2 * hm2 - hm), (0, 2 * wm2 - wm), (0, 0)))
        pan = pan2d[: 4 * hm, : 4 * wm].astype(self._dtype)
        pan = jnp.pad(pan, ((0, 8 * hm2 - pan.shape[0]),
                            (0, 8 * wm2 - pan.shape[1])))[..., None]
        ms16 = space_to_depth(ms, 2)[None]       # (1, H/2, W/2, 4C)
        pan64 = space_to_depth(pan, 8)[None]     # (1, H/2, W/2, 64)
        h_ms = self.ms_block(self.ms_stem(ms16))
        h_pan = self.pan_block(self.pan_stem(pan64))
        z = nn.sigmoid(self.gate(jnp.concatenate([h_ms, h_pan], axis=-1)))
        fused = z * h_ms + (1.0 - z) * h_pan
        t = self.trunk2(self.trunk1(fused))[0]   # (H/2, W/2, 4w)
        full = depth_to_space(t, 2)[:hm, :wm]    # (H', W', w)
        return self.refine(full[None])[0]

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
