"""gmfnet_conv — shift-and-stitch-servable variant of the gmfnet topology.

Why this model exists (VERDICT r4 weak #2): the reference renders
full-scene classification maps by cropping one window per pixel and
running the patch CNN per window (/root/reference/solver/mainsolver.py:
155-201) — at image9 that is ~50M window forwards, and even with the
batched Pallas gather path the per-anchor route is output-write bound at
~120k anchors/s (~7 min per city map, BENCH_NOTES.md).  The per-window
compute is massively redundant: neighboring windows share almost all of
their pixels.  A *convolutional* evaluation computes every layer once
per scene position and reuses it across all overlapping windows — the
classical shift-and-stitch / atrous trick.

Why plain ``gmfnet`` cannot be served this way (measured, see
tests/test_gmfnet_conv.py::test_plain_gmfnet_is_not_shift_invariant):
its per-window ``SAME`` zero-padding and per-window GroupNorm statistics
make the window forward *shift-variant* — the value computed for a scene
position depends on which window it sits in, so no convolutional
program can reproduce its per-anchor logits.  Those are properties of
the window evaluation semantics, not of the topology.

``gmfnet_conv`` keeps gmfnet's topology — dual branch, sigmoid-gated
fusion, two stride-2 trunk resblocks, pooled MLP head — and changes
exactly the two semantics that break shift-invariance:

* every conv is VALID over a window gathered WITH its own margin
  (``patch_size`` = core 16 + 31 margin rows = 47), so window features
  are literal crops of scene features;
* normalization is scaled weight standardization (``WSConv`` — input-
  independent, the dense family's norm; models/dense_fusion.py), never
  activation statistics.

The scene route (``logits_map``) then reproduces the per-anchor window
forward EXACTLY: stride-2 convs run at stride 1 with the same weights
and their outputs phase-split into a batch axis (2 stages x 2 dims =
the 16 phase maps of classic shift-and-stitch), pooling is a g x g box
sum per phase map with the same summation association as the window
route, the head is applied per position, and the 16 per-phase logit
maps interleave back to full resolution.  tests/test_gmfnet_conv.py
pins window-vs-scene per-anchor parity.

Training/eval use the ordinary dual-arity window machinery unchanged
(train/steps.py::DualPrograms); only full-scene map rendering and
city-scale test confusions take the convolutional route
(train/steps.py::ConvMapPrograms).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from dmfusion.models.common import activation_fn, dtypes
from dmfusion.models.dense_fusion import (WSConv, _SQRT2, space_to_depth)
from dmfusion.models.registry import register

ARITY = "dual"
#: train/steps.py dispatches map rendering to ConvMapPrograms.
MAP_PROGRAMS = "convmap"

#: Extent lost by the two VALID branch stacks before fusion (both sides
#: combined): PAN branch = 4 convs x 2; the 3-conv MS branch is
#: center-cropped by 1/side to match.
PRE_MARGIN = 8

#: Extra zero rows/cols the scene route appends at the scene's
#: bottom/right so every phase map can be sliced to a uniform extent
#: (the <=4-row raggedness of two phase-split stages).  Entries computed
#: from these rows sit strictly beyond every anchor's read indices.
EDGE_SLACK = 8


def pool_grid(patch: int) -> int:
    """Final pooled grid g for a ``patch``-row window: the VALID chain
    patch -> -8 (branches) -> /2-2 (trunk1) -> -4 (trunk2) -> /2-2
    (trunk3) must land on an integer >= 1."""
    if patch % 4 != 3 or patch < 35:
        raise ValueError(
            f"gmfnet_conv needs patch_size ≡ 3 (mod 4) and >= 35 so its "
            f"VALID conv chain lands on an integer pooled grid "
            f"(core-16 default: 47); got {patch}")
    return (patch - 31) // 4


def _s2d4_batched(pan: jnp.ndarray) -> jnp.ndarray:
    """(B, 4S, 4S, C) -> (B, S, S, 16C), phase-major channel order —
    identical to dense_fusion.space_to_depth's (row-phase, col-phase, C)
    so window and scene routes see the same channel layout."""
    b, h4, w4, c = pan.shape
    x = pan.reshape(b, h4 // 4, 4, w4 // 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h4 // 4, w4 // 4,
                                                 16 * c)


def _split2(x: jnp.ndarray, n_r: int, n_c: int) -> jnp.ndarray:
    """Phase-split a batched map into its four stride-2 grids:
    (B, H, W, C) -> (4B, n_r, n_c, C) with
    out[4b + 2r + c, u, v] = x[b, r + 2u, c + 2v].

    Implemented as crop + reshape + one transpose (no strided slices —
    scene-scale strided slices draw pathological layouts, CLAUDE.md)."""
    b, h, w, c = x.shape
    if h < 2 * n_r or w < 2 * n_c:
        raise ValueError(f"phase split needs ({2*n_r}, {2*n_c}) rows/cols,"
                         f" have ({h}, {w})")
    x = x[:, :2 * n_r, :2 * n_c, :]
    x = x.reshape(b, n_r, 2, n_c, 2, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # (B, r, c, n_r, n_c, C)
    return x.reshape(b * 4, n_r, n_c, c)


def _box_sum(x: jnp.ndarray, g: int, axis: int) -> jnp.ndarray:
    """Sum of g consecutive entries along ``axis`` in f32, accumulated
    low-to-high — the ONE association both routes share, so pooled
    values agree exactly between window and scene evaluation.  Static
    ``lax.slice_in_dim`` shifts, NOT ``jnp.take`` — an index-array take
    lowers to a real gather whose scene-scale f32 operand copies OOM'd
    the image6 map (measured)."""
    import jax
    n = x.shape[axis] - g + 1
    acc = jax.lax.slice_in_dim(x, 0, n, axis=axis).astype(jnp.float32)
    for i in range(1, g):
        acc = acc + jax.lax.slice_in_dim(x, i, i + n, axis=axis)
    return acc


@register("gmfnet_conv")
class Net(nn.Module):
    cfg: Mapping[str, Any]
    width: int = 64

    def setup(self):
        cfg = self.cfg
        self._act = activation_fn(cfg)
        dtype, pdtype = dtypes(cfg)
        self._dtype = dtype
        w = int(cfg.get("model_width", self.width))
        self._w = w

        def ws(f, k, gain, name):
            return WSConv(f, k, gain, dtype, pdtype, padding="VALID",
                          name=name)

        # MS branch: conv + resblock (3 convs, -6 extent).
        self.ms_stem = ws(w // 2, 3, _SQRT2, "ms_stem")
        self.ms_c1 = ws(w, 3, _SQRT2, "ms_c1")
        self.ms_c2 = ws(w, 3, 1.0, "ms_c2")
        self.ms_sc = ws(w, 1, 1.0, "ms_sc")
        # PAN branch: s2d(4) + 2 convs + resblock (4 convs, -8 extent).
        self.pan_stem1 = ws(w // 2, 3, _SQRT2, "pan_stem1")
        self.pan_stem2 = ws(w, 3, _SQRT2, "pan_stem2")
        self.pan_c1 = ws(w, 3, _SQRT2, "pan_c1")
        self.pan_c2 = ws(w, 3, 1.0, "pan_c2")
        self.gate = nn.Conv(w, (1, 1), dtype=dtype, param_dtype=pdtype,
                            name="fusion_gate")
        # Trunk: stride-2 resblock -> resblock -> stride-2 resblock
        # (gmfnet's joint trunk, models/gmfnet.py:64-67).
        self.t1_c1 = ws(2 * w, 3, _SQRT2, "t1_c1")
        self.t1_c2 = ws(2 * w, 3, 1.0, "t1_c2")
        self.t1_sc = ws(2 * w, 1, 1.0, "t1_sc")
        self.t2_c1 = ws(2 * w, 3, _SQRT2, "t2_c1")
        self.t2_c2 = ws(2 * w, 3, 1.0, "t2_c2")
        self.t3_c1 = ws(4 * w, 3, _SQRT2, "t3_c1")
        self.t3_c2 = ws(4 * w, 3, 1.0, "t3_c2")
        self.t3_sc = ws(4 * w, 1, 1.0, "t3_sc")
        init = nn.initializers.constant(0.2)
        self.alpha_ms = self.param("alpha_ms", init, (), pdtype)
        self.alpha_pan = self.param("alpha_pan", init, (), pdtype)
        self.alpha1 = self.param("alpha1", init, (), pdtype)
        self.alpha2 = self.param("alpha2", init, (), pdtype)
        self.alpha3 = self.param("alpha3", init, (), pdtype)
        self.head1 = nn.Dense(2 * w, dtype=dtype, param_dtype=pdtype,
                              name="head1")
        self.head2 = nn.Dense(cfg["Categories_Number"], dtype=jnp.float32,
                              param_dtype=pdtype, name="head2")

    # -- shared stride-1 pieces (identical in both routes) -----------------
    def _resblock(self, c1, c2, sc_conv, alpha, x):
        y = c2(self._act(c1(x)))
        sc = x[:, 2:-2, 2:-2, :]
        if sc_conv is not None:
            sc = sc_conv(sc)
        return self._act(sc + alpha.astype(y.dtype) * y)

    def _fuse(self, ms: jnp.ndarray, pan16: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 4) + (B, S, S, 16) -> (B, S-8, S-8, w)."""
        h_ms = self._resblock(self.ms_c1, self.ms_c2, self.ms_sc,
                              self.alpha_ms, self._act(self.ms_stem(ms)))
        h_ms = h_ms[:, 1:-1, 1:-1, :]
        h_pan = self._act(self.pan_stem2(self._act(self.pan_stem1(pan16))))
        h_pan = self._resblock(self.pan_c1, self.pan_c2, None,
                               self.alpha_pan, h_pan)
        z = nn.sigmoid(self.gate(jnp.concatenate([h_ms, h_pan], axis=-1)))
        return z * h_ms + (1.0 - z) * h_pan

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.head2(self._act(self.head1(x))).astype(jnp.float32)

    # -- window route (training / per-anchor eval) -------------------------
    def _resblock_s2(self, c1, c2, sc_conv, alpha, x):
        """VALID stride-2 resblock: main = s2 conv + s1 conv; the
        shortcut samples the main path's input positions (in[3 + 2k])."""
        y = c2(self._act(c1(x, stride=2)))
        sc = x[:, 3::2, 3::2, :][:, :y.shape[1], :y.shape[2], :]
        if sc_conv is not None:
            sc = sc_conv(sc)
        return self._act(sc + alpha.astype(y.dtype) * y)

    def __call__(self, ms: jnp.ndarray, pan: jnp.ndarray) -> jnp.ndarray:
        s = ms.shape[1]
        g = pool_grid(s)
        ms = ms.astype(self._dtype)
        pan16 = _s2d4_batched(pan.astype(self._dtype))
        f = self._fuse(ms, pan16)
        t = self._resblock_s2(self.t1_c1, self.t1_c2, self.t1_sc,
                              self.alpha1, f)
        t = self._resblock(self.t2_c1, self.t2_c2, None, self.alpha2, t)
        t = self._resblock_s2(self.t3_c1, self.t3_c2, self.t3_sc,
                              self.alpha3, t)
        assert t.shape[1] == g and t.shape[2] == g, t.shape
        pooled = _box_sum(_box_sum(t, g, 1), g, 2) / jnp.float32(g * g)
        pooled = pooled.reshape(t.shape[0], -1).astype(self._dtype)
        return self._head(pooled)

    # -- scene route (shift-and-stitch full-scene maps) --------------------
    def _phase_logits(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                      patch: int):
        """All 16 per-phase quarter-res logit maps plus the anchor-grid
        geometry.  Entry [(2r2+r)%.., u] of phase map (r, c, r2, c2)
        holds the EXACT window-route logits of anchor
        (4u + 2r2 + r, 4v + 2c2 + c)."""
        g = pool_grid(patch)
        h = scene_ms.shape[0] - patch + 1      # anchor rows
        wcols = scene_ms.shape[1] - patch + 1
        # Uniform-extent slack: entries derived from these zero rows sit
        # beyond every anchor's read indices (see module docstring).
        ms = jnp.pad(scene_ms, ((0, EDGE_SLACK), (0, EDGE_SLACK), (0, 0)))
        pan2d = scene_pan if scene_pan.ndim == 2 else scene_pan[..., 0]
        pan2d = pan2d[:4 * scene_ms.shape[0], :4 * scene_ms.shape[1]]
        pan2d = jnp.pad(pan2d, ((0, 4 * EDGE_SLACK), (0, 4 * EDGE_SLACK)))
        # s2d BEFORE the compute-dtype cast (C=1 scene layout rule,
        # models/dense_fusion.py::features_s2d).
        pan16 = space_to_depth(pan2d[..., None], 4).astype(self._dtype)
        f = self._fuse(ms.astype(self._dtype)[None], pan16[None])

        # Needed per-phase extents, top-down from the anchor grid.
        nq_r, nq_c = (h - 1) // 4 + 1, (wcols - 1) // 4 + 1
        n2_r, n2_c = 2 * (nq_r + g + 1) + 2, 2 * (nq_c + g + 1) + 2
        n1_r, n1_c = n2_r + 6, n2_c + 6

        # trunk1 at stride 1, output phase-split to a batch of 4.
        gmap = self._act(self.t1_c1(f))
        g4 = _split2(gmap, n1_r, n1_c)
        y = self.t1_c2(g4)
        sc = self.t1_sc(_split2(f[:, 3:, 3:, :], n1_r - 2, n1_c - 2))
        t1 = self._act(sc + self.alpha1.astype(y.dtype) * y)
        t2 = self._resblock(self.t2_c1, self.t2_c2, None, self.alpha2, t1)

        # trunk3 at stride 1, each phase map splits again -> batch 16.
        g3 = self._act(self.t3_c1(t2))
        g16 = _split2(g3, nq_r + g + 1, nq_c + g + 1)
        y3 = self.t3_c2(g16)
        sc3 = self.t3_sc(_split2(t2[:, 3:, 3:, :], nq_r + g - 1,
                                 nq_c + g - 1))
        t3 = self._act(sc3 + self.alpha3.astype(y3.dtype) * y3)

        pooled = _box_sum(_box_sum(t3, g, 1), g, 2) / jnp.float32(g * g)
        pooled = pooled[:, :nq_r, :nq_c, :].astype(self._dtype)
        return self._head(pooled), (h, wcols, nq_r, nq_c)

    @staticmethod
    def _stitch(maps: jnp.ndarray, geom) -> jnp.ndarray:
        """(16, nq_r, nq_c, C) phase maps -> (h, w, C): anchor
        (4u + 2r2 + r, 4v + 2c2 + c) reads phase (r, c, r2, c2) at
        (u, v)."""
        h, wcols, nq_r, nq_c = geom
        c = maps.shape[-1]
        x = maps.reshape(2, 2, 2, 2, nq_r, nq_c, c)  # (r, c, r2, c2, u, v)
        x = x.transpose(4, 2, 0, 5, 3, 1, 6)         # (u, r2, r, v, c2, c)
        x = x.reshape(4 * nq_r, 4 * nq_c, c)
        return x[:h, :wcols]

    def logits_map(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                   patch: int) -> jnp.ndarray:
        """(H, W, num_classes) f32 logits for EVERY anchor in one
        convolutional pass — the reference color() product
        (solver/mainsolver.py:155-201) without per-anchor work."""
        maps, geom = self._phase_logits(scene_ms, scene_pan, patch)
        return self._stitch(maps, geom)

    def class_map(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                  patch: int) -> jnp.ndarray:
        """(H, W) int32 argmax map; the argmax runs on the quarter-res
        phase maps so the full-res lane-padded logits map never
        materializes (same rationale as dense_fusion.class_map)."""
        maps, geom = self._phase_logits(scene_ms, scene_pan, patch)
        am = jnp.argmax(maps, axis=-1).astype(jnp.int32)[..., None]
        return self._stitch(am, geom)[..., 0]
