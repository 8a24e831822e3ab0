"""dense_fusion — whole-scene dense per-pixel fusion classifier.

The TPU-native flagship beyond the reference's design space: the
reference (and the parity models here) classify each pixel by cropping a
16x16/64x64 window and running a CNN per window — for full-scene maps
that is ~4.2M nearly-identical forwards (~800 TFLOP for image6).  This
model instead computes ONE dense feature map over the whole HBM-resident
scene (a half-resolution 4x-channel trunk — the MXU-lane-optimal layout,
see BENCH_NOTES.md — with both modalities space-to-depth-packed onto the
trunk grid), mean-pools it over every ps x ps anchor window via a
summed-area table computed on the same half-res phase layout, and
applies a block-diagonal 1x1 head — every pixel's logits in one pass (a
~4000x FLOP reduction vs per-window forwards for full-scene inference),
with no full-resolution low-channel tensor anywhere in the map path
(32-channel full-res tensors pay a 4x lane-padding tax per pass).

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

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmfusion.models.common import activation_fn, dtypes

ARITY = "dense"


_SQRT2 = 1.4142135623730951


class WSConv(nn.Module):
    """Conv with scaled weight standardization (norm-free, NFNet-style).

    The kernel is standardized over (kh, kw, cin) and scaled by
    1/sqrt(fan_in) times a learnable per-output-channel gain, so
    activations keep ~unit variance WITHOUT any activation-space
    normalization layer.  Why: on TPU an activation norm between convs
    is an unfused VPU pass over the whole scene tensor (~130 GB/s
    effective — measured +7 ms per norm at image6 scale, with LayerNorm
    / RMSNorm / hand-rolled variants all equal), while standardizing the
    (3, 3, C, C) *kernel* costs microseconds and fuses away.  Being
    input-independent it also keeps dense features strictly local, so
    band-sharded passes reproduce single-device features bit-identically
    (the previous per-pixel LayerNorm only guaranteed per-pixel
    locality).
    """

    features: int
    kernel: int = 3
    act_gain: float = 1.0   # folds the nonlinearity's variance correction
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    stride: int = 1
    padding: str = "SAME"   # "VALID" for crop-consistent window semantics

    @nn.compact
    def __call__(self, x: jnp.ndarray, stride: int | None = None
                 ) -> jnp.ndarray:
        """``stride`` overrides the module default at call time — the
        parameters are stride-independent, which is what lets a
        shift-and-stitch scene route run a window model's stride-2 convs
        at stride 1 with the SAME weights (models/gmfnet_conv.py)."""
        st = self.stride if stride is None else stride
        kh = kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features), self.param_dtype)
        gain = self.param("gain", nn.initializers.ones_init(),
                          (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        mu = w.mean((0, 1, 2), keepdims=True)
        var = w.var((0, 1, 2), keepdims=True)
        fan_in = kh * kw * cin
        wn = (w - mu) * jax.lax.rsqrt(var * fan_in + 1e-8)
        wn = wn * (gain * self.act_gain)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wn.astype(self.dtype), (st, st),
            self.padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)


class LocalConvBlock(nn.Module):
    """WSConv -> activation (norm-free; see :class:`WSConv`).

    ``act_gain`` sqrt(2) pre-compensates ReLU's halving of variance the
    way NF-nets fold nonlinearity gains into the preceding conv.
    """

    features: int
    kernel: int = 3
    act: Any = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = WSConv(self.features, self.kernel, _SQRT2, self.dtype,
                   self.param_dtype)(x)
        return self.act(x)


class LocalResBlock(nn.Module):
    """Two WSConvs with a residual branch scaled by a learnable alpha
    (init 0.2, the NF-net residual-scaling recipe): variance along the
    skip chain grows ~sqrt(1 + alpha^2) per block instead of doubling,
    which is what the removed LayerNorms used to re-control."""

    features: int
    act: Any = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sc = x
        y = LocalConvBlock(self.features, 3, self.act, self.dtype,
                           self.param_dtype)(x)
        y = WSConv(self.features, 3, 1.0, self.dtype, self.param_dtype)(y)
        if sc.shape[-1] != self.features:
            sc = WSConv(self.features, 1, 1.0, self.dtype,
                        self.param_dtype)(sc)
        alpha = self.param("alpha", nn.initializers.constant(0.2), (),
                           self.param_dtype)
        return self.act(sc + alpha.astype(self.dtype) * y)


# Receptive radius of features() in FULL-resolution rows: the half-res
# stack (stem 1 + branch resblock 2 + trunk resblocks 2+2 + refine 1 =
# 8 half-res cells).  A full-res pixel r in row-phase a of cell i=r//2
# depends on cells [i-8, i+8], i.e. full-res rows [2i-16, 2i+17] which is
# within [r-17, r+17] for either phase; 18 rounds up to even so band
# starts stay on the s2d-2 phase grid.
RECEPTIVE_RADIUS = 18


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(H, W, C) -> (H/f, W/f, f*f*C); H, W must be multiples of f.

    Channel order is phase-major: [row-phase, col-phase, C].

    Implementation note: the column fold is a pure reshape (bitcast —
    (W, C) -> (W/f, f*C) preserves linear order), so the only real data
    movement is ONE row transpose whose operand keeps large minor dims.
    The naive 5-D reshape+transpose materializes an intermediate whose
    (f, C) minor dims XLA tile-pads catastrophically at scene scale
    (25.9 GB for image9's C=1 PAN — an OOM, not just a slowdown).
    """
    h, w, c = x.shape
    x = x.reshape(h, w // f, f * c)               # cols: bitcast
    x = x.reshape(h // f, f, w // f, f * c)        # rows split: bitcast
    x = x.transpose(0, 2, 1, 3)                    # the one real copy
    return x.reshape(h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same single-transpose,
    large-minor formulation)."""
    h, w, c = x.shape
    c0 = c // (f * f)
    x = x.reshape(h, w, f, f * c0)                 # row-phase split: bitcast
    x = x.transpose(0, 2, 1, 3)                    # (h, f, w, f*c0)
    x = x.reshape(h * f, w, f * c0)                # rows merge: bitcast
    return x.reshape(h * f, w * f, c0)             # cols: bitcast


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


def chunked_cumsum(x: jnp.ndarray, axis: int, chunk: int = 128
                   ) -> jnp.ndarray:
    """Inclusive f32 cumsum along ``axis`` of a rank-3 tensor via
    per-chunk lower-triangular matmuls plus an inter-chunk carry.

    XLA lowers ``cumsum`` on TPU to an O(log n)-pass decomposition that
    re-reads the whole tensor each pass — 35 ms for the two image6-scale
    SAT cumsums.  A lower-triangular (chunk, chunk) matmul computes all
    within-chunk prefix sums in ONE data pass on the MXU (the FLOPs are
    ~free), and the carry is a cumsum over the tiny per-chunk-totals
    tensor; measured ~6 ms for the same SAT.  Accumulation is f32 via
    ``preferred_element_type`` regardless of the input dtype.
    """
    n = x.shape[axis]
    nc = -(-n // chunk)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, nc * chunk - n)
    xp = jnp.pad(x, pad)
    tri = jnp.asarray(np.tril(np.ones((chunk, chunk), np.float32)), x.dtype)
    if axis == 0:
        xr = xp.reshape(nc, chunk, *xp.shape[1:])
        within = jnp.einsum("ij,njwc->niwc", tri, xr,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        totals = within[:, -1]                       # (nc, W, C)
        carry = jnp.cumsum(totals, axis=0) - totals  # exclusive
        out = within + carry[:, None]
        return out.reshape(nc * chunk, *xp.shape[1:])[:n]
    assert axis == 1
    xr = xp.reshape(xp.shape[0], nc, chunk, xp.shape[2])
    within = jnp.einsum("ij,hnjc->hnic", tri, xr,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    totals = within[:, :, -1]                        # (H, nc, C)
    carry = jnp.cumsum(totals, axis=1) - totals
    out = within + carry[:, :, None]
    return out.reshape(xp.shape[0], nc * chunk, xp.shape[2])[:, :n]


def phase_sat(feats_s2d: jnp.ndarray, extra: int = 0) -> jnp.ndarray:
    """Zero-padded 2-D summed-area table of the s2d-2 feature tensor in
    f32: (H2+1+extra, W2+1+extra, 4C), built with :func:`chunked_cumsum`
    on the 128-lane half-res layout.  ``extra`` appends zero rows/cols
    BEFORE the cumsums (they fuse into the first chunk matmul's read),
    so callers that need shifted slices one past the last rectangle
    avoid a whole-tensor guard-pad copy afterwards."""
    s = jnp.pad(feats_s2d, ((1, extra), (1, extra), (0, 0)))
    return chunked_cumsum(chunked_cumsum(s, 0), 1)


def phase_corner_sums(flat_sat: jnp.ndarray, w1: int, patch: int,
                      x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor ``patch x patch`` full-res window sums gathered from a
    flattened phase SAT (:func:`phase_sat` reshaped to (rows*w1, 4C)).

    The full-res window [x, x+patch) x [y, y+patch) decomposes per input
    phase (c, d) into a half-res rectangle of ``patch/2`` rows starting
    at ``x//2 + (x%2 & ~c)`` (likewise columns), so each anchor is 16
    gathered SAT rows combined per phase block -> (B, C).  Used by the
    dense training programs (train/steps.py::DensePrograms); the dense
    map path uses :func:`phase_pooled_s2d` instead.
    """
    ph = patch // 2
    c4 = flat_sat.shape[-1]
    c = c4 // 4
    i, a = x // 2, x % 2
    j, b = y // 2, y % 2
    total = None
    for cc in (0, 1):
        rs = i + (a & (1 - cc))
        for d in (0, 1):
            cs = j + (b & (1 - d))
            rect = (flat_sat[(rs + ph) * w1 + (cs + ph)]
                    - flat_sat[rs * w1 + (cs + ph)]
                    - flat_sat[(rs + ph) * w1 + cs]
                    + flat_sat[rs * w1 + cs])
            blk = rect[:, (cc * 2 + d) * c:(cc * 2 + d + 1) * c]
            total = blk if total is None else total + blk
    return total


@functools.lru_cache(maxsize=None)
def phase_mix_matrices(c4: int, patch: int):
    """The four (r, u, M) phase-selection matmul operands shared by the
    XLA pipeline (:func:`phase_pooled_s2d`) and the Pallas kernel
    (ops/pallas_pool.py).  For shift (r, u), M routes input phase block
    (c, d) to every output block (a, b) with a&~c == r and b&~d == u;
    each (input, output) block pair matches exactly one shift, and the
    1/patch^2 window-mean scale folds into M."""
    c = c4 // 4
    eye = np.eye(c, dtype=np.float32) / float(patch * patch)
    out = []
    for r in (0, 1):
        for u in (0, 1):
            m = np.zeros((c4, c4), np.float32)
            for ci in (0, 1):
                for d in (0, 1):
                    for a in (0, 1):
                        for b in (0, 1):
                            if (a & (1 - ci)) == r and (b & (1 - d)) == u:
                                m[(ci * 2 + d) * c:(ci * 2 + d + 1) * c,
                                  (a * 2 + b) * c:(a * 2 + b + 1) * c] \
                                    = eye
            out.append((r, u, m))
    return tuple(out)


def phase_pooled_s2d(feats_s2d: jnp.ndarray, patch: int, out_rows: int,
                     out_cols: int, use_pallas: bool | None = None
                     ) -> jnp.ndarray:
    """Window-mean map computed entirely on the s2d-2 phase grid.

    ``feats_s2d`` is the (H2, W2, 4C) space-to-depth-2 packing of a
    full-resolution (2*H2, 2*W2, C) feature map (channel blocks are the
    four pixel phases, phase-major).  Returns the (ni, nj, 4C) s2d-2
    packing of the full-resolution ``patch x patch`` window-mean map,
    equal to ``window_mean(depth_to_space(feats_s2d, 2), patch)`` up to
    f32 summation association.  ``patch`` must be even.

    Why: the equivalent full-res SAT runs on (H, W, C) tensors whose
    C=32 minor dim fills a quarter of the TPU's 128 lanes (XLA pads the
    lane dim 4x, so every cumsum pass moves 4x the bytes).  Here the two
    cumsums and all window arithmetic run on the 128-channel half-res
    layout instead.

    Math: the full-res window [x, x+patch) x [y, y+patch) with x = 2i+a
    contains, for input row-phase c, exactly ``patch/2`` half-res rows
    starting at ``i + (1 if a > c else 0)`` (and likewise for columns),
    so every output phase (a, b) is a sum of four phase-block rectangle
    sums with {0, 1} row/col offsets — all static slices of one half-res
    SAT.
    """
    ni = -(-out_rows // 2)
    nj = -(-out_cols // 2)
    from dmfusion.ops.pallas_pool import pool_shapes_supported
    if use_pallas is None:
        # Trace-time default-backend check; for AOT lowering to a
        # DIFFERENT target (tools/dense_aot_memcheck.py-style), pass
        # use_pallas explicitly so the compiled program matches the one
        # the real device runs.  Shape gate: the kernel's slab DMAs are
        # only Mosaic-legal for patch % 16 == 0 and lane-aligned c4
        # (pool_shapes_supported) — small-scene configs (synth64's
        # patch 8, width-16 models) take the XLA pipeline on TPU too.
        try:
            use_pallas = (jax.devices()[0].platform == "tpu"
                          and pool_shapes_supported(feats_s2d.shape[-1],
                                                    patch))
        except Exception:
            use_pallas = False
    elif use_pallas and not pool_shapes_supported(feats_s2d.shape[-1],
                                                  patch):
        raise ValueError(
            f"precision.pallas_pool: the fused kernel needs patch_size a "
            f"multiple of 16 and 4*model_width a multiple of 128 (got "
            f"patch={patch}, channels={feats_s2d.shape[-1]}); use "
            f"pallas_pool: auto (falls back to the XLA pipeline) for "
            f"this configuration")
    if use_pallas:
        # Fused Pallas kernel: one feature read + one pooled write
        # instead of the multi-pass SAT pipeline (ops/pallas_pool.py).
        from dmfusion.ops.pallas_pool import phase_pool_fused
        return phase_pool_fused(feats_s2d, patch, ni, nj)
    ph = patch // 2
    dt = feats_s2d.dtype
    # extra=1 guard row/col: the shift-1 slices read one row (col) past
    # the last real rectangle when out_rows (out_cols) is odd; the
    # appended zero input row makes that slot a valid (out-of-range)
    # rectangle sliced off downstream, without the whole-tensor f32
    # guard-pad copy a post-hoc jnp.pad costs.  t is cast to the compute
    # dtype ONCE here so the four shifted matmul reads move half the
    # bytes (window sums are already down to output precision).
    s = phase_sat(feats_s2d, extra=1)
    t = (s[ph:, ph:] - s[:-ph, ph:] - s[ph:, :-ph]
         + s[:-ph, :-ph]).astype(dt)
    # Phase mixing as FOUR shifted selection matmuls on the full
    # 4C-channel tensor.  Slicing t into per-phase C-channel groups
    # would reintroduce the lane-padded low-channel layout this function
    # exists to avoid (measured: 16 channel-group slices cost 46 ms per
    # image6 pass vs ~2 ms of block-diagonal MXU matmuls).
    # f32 accumulation across the four shifted parts (cast to dt once at
    # the end) — the SAME accumulation scheme as the Pallas kernel
    # (ops/pallas_pool.py), so the two pool backends agree to f32
    # summation order.  Mirroring the kernel's precision rule: bf16
    # operands + f32 preferred_element_type is already the native exact
    # MXU mode; f32 operands need HIGHEST or the default truncates
    # inputs to bf16 (~6e-4 abs on window means).
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    out = None
    for r, u, m in phase_mix_matrices(feats_s2d.shape[-1], patch):
        part = jax.lax.dot_general(
            t[r:r + ni, u:u + nj], jnp.asarray(m, dt),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out = part if out is None else out + part
    return out.astype(dt)


def phase_window_mean(feats_s2d: jnp.ndarray, patch: int, out_rows: int,
                      out_cols: int, use_pallas: bool | None = None
                      ) -> jnp.ndarray:
    """:func:`phase_pooled_s2d` unpacked to the full-res (out_rows,
    out_cols, C) window-mean map."""
    st = phase_pooled_s2d(feats_s2d, patch, out_rows, out_cols, use_pallas)
    return depth_to_space(st, 2)[:out_rows, :out_cols]


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
        # ~0.27 GB each at image6 scale, so memory-tight training (band
        # sharding, big scenes, wide trunks) must recompute per block
        # instead of storing every intermediate.  When everything fits,
        # storing is 40% faster (373 -> 222 ms/step at image6 w32) —
        # the solver resolves train.dense_remat "auto" accordingly
        # (solvers/main.py::_resolve_dense_remat).
        from dmfusion.utils.misc import parse_switch
        remat = parse_switch(cfg.get("train", {}).get("dense_remat", "on"),
                             "train.dense_remat")
        wrap = (lambda m: m) if remat == "off" else nn.remat
        CB = wrap(LocalConvBlock)
        RB = wrap(LocalResBlock)
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
        # Refine stays on the half-res 4x-channel grid: as a strided view
        # it is a full-res 3x3 conv with per-phase weights, and it keeps
        # the feature tensor 128-lane-aligned all the way into pooling
        # (the previous full-res w-channel refine paid the 4x lane-pad
        # tax on every pass — 13.6 ms for one conv at image6 scale).
        self.refine = CB(4 * w, 3, act, dtype, pdtype, name="refine")
        # Head weights as raw params: the dense map path applies them as
        # kron(I4, K) block-diagonal matmuls on the s2d-2 phase layout
        # (4w = 128 lanes); head() applies them per pooled row.
        ncls = cfg["Categories_Number"]
        self.h1_kernel = self.param("head1_kernel",
                                    nn.initializers.lecun_normal(),
                                    (w, w), pdtype)
        self.h1_bias = self.param("head1_bias", nn.initializers.zeros_init(),
                                  (w,), pdtype)
        self.h2_kernel = self.param("head2_kernel",
                                    nn.initializers.lecun_normal(),
                                    (w, ncls), pdtype)
        self.h2_bias = self.param("head2_bias", nn.initializers.zeros_init(),
                                  (ncls,), pdtype)
        self._act = act
        # precision.pallas_pool: 'on' FORCES the fused kernel (even for
        # AOT lowering from a non-TPU host — the caller promises a TPU
        # target), 'off' forces the XLA phase-SAT pipeline, 'auto'
        # (None) trace-time-detects the platform.  The solver resolves
        # 'auto' to 'off' under a mesh, where the kernel would run
        # inside shard_map — a combination only validated on the CPU
        # mesh in interpret terms (see BENCH_NOTES.md).
        from dmfusion.utils.misc import parse_switch
        pp = parse_switch(cfg.get("precision", {}).get("pallas_pool",
                                                       "auto"),
                          "precision.pallas_pool")
        self._pool_pallas = {"off": False, "on": True, "auto": None}[pp]

    def features_s2d(self, scene_ms: jnp.ndarray,
                     scene_pan: jnp.ndarray) -> jnp.ndarray:
        """(H', W', C) + (4H'', 4W'', 1) -> (ceil(H'/2), ceil(W'/2), 4w)
        s2d-2 packed dense features (the full-res (H', W', w) map lives
        in the four phase channel blocks).

        Odd heights/widths are zero-padded to even before the s2d-2
        packing; the pad sits at the tensor's own bottom/right edge, so
        full-scene and clamped-band passes pad at the same global rows
        and stay consistent (band interiors are even-length by
        construction — train/steps.py::_band_plan)."""
        # space_to_depth BEFORE the bf16 cast: with bf16's packed
        # (16,128) tiling XLA picks a padded layout for the transpose
        # intermediate (16x — a 25.9 GB OOM at image9 scale); in the
        # scene dtype the same transpose lays out compactly, and the
        # cast lands on the channels-rich output.
        ms = scene_ms
        pan2d = scene_pan if scene_pan.ndim == 2 else scene_pan[..., 0]
        hm, wm = ms.shape[0], ms.shape[1]
        hm2, wm2 = -(-hm // 2), -(-wm // 2)
        ms = jnp.pad(ms, ((0, 2 * hm2 - hm), (0, 2 * wm2 - wm), (0, 0)))
        pan = pan2d[: 4 * hm, : 4 * wm]
        pan = jnp.pad(pan, ((0, 8 * hm2 - pan.shape[0]),
                            (0, 8 * wm2 - pan.shape[1])))[..., None]
        # The barrier stops XLA's simplifier from hoisting the bf16
        # convert back above the transpose (it prefers transposing
        # fewer bytes, recreating the padded bf16 intermediate).
        ms16 = jax.lax.optimization_barrier(space_to_depth(ms, 2))
        pan64 = jax.lax.optimization_barrier(space_to_depth(pan, 8))
        ms16 = ms16.astype(self._dtype)[None]
        pan64 = pan64.astype(self._dtype)[None]
        h_ms = self.ms_block(self.ms_stem(ms16))
        h_pan = self.pan_block(self.pan_stem(pan64))
        z = nn.sigmoid(self.gate(jnp.concatenate([h_ms, h_pan], axis=-1)))
        fused = z * h_ms + (1.0 - z) * h_pan
        t = self.trunk2(self.trunk1(fused))      # (1, H/2, W/2, 4w)
        return self.refine(t)[0]

    def features(self, scene_ms: jnp.ndarray,
                 scene_pan: jnp.ndarray) -> jnp.ndarray:
        """Dense (H', W', w) full-res features (s2d features unpacked)."""
        f = self.features_s2d(scene_ms, scene_pan)
        return depth_to_space(f, 2)[: scene_ms.shape[0], : scene_ms.shape[1]]

    def pooled(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
               patch: int) -> jnp.ndarray:
        """Dense features mean-pooled over every ps x ps anchor window:
        -> (H, W, D) where entry (x, y) is the window-mean a patch model
        would global-pool."""
        hm, wm = scene_ms.shape[0], scene_ms.shape[1]
        if patch % 2:   # odd windows can't phase-split; full-res SAT
            return window_mean(self.features(scene_ms, scene_pan), patch)
        return phase_window_mean(self.features_s2d(scene_ms, scene_pan),
                                 patch, hm - patch + 1, wm - patch + 1,
                                 self._pool_pallas)

    def head(self, pooled_feats: jnp.ndarray) -> jnp.ndarray:
        """(..., D) pooled features -> (..., num_classes) f32 logits.

        Both head matmuls run with compute-dtype operands and f32
        accumulation — the SAME numerics as the s2d map path's
        block-diagonal matmuls, so training (this path) and eval/color
        (``__call__``/``class_map``) see one classifier, on every
        backend.  (On TPU an f32-operand matmul at default precision
        truncates to bf16 internally anyway; making the cast explicit
        also keeps CPU runs consistent.)
        """
        x = (pooled_feats.astype(self._dtype)
             @ self.h1_kernel.astype(self._dtype)
             + self.h1_bias.astype(self._dtype))
        x = self._act(x)
        return jax.lax.dot_general(
            x, self.h2_kernel.astype(self._dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + self.h2_bias.astype(jnp.float32)

    def _logits_s2d(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                    patch: int) -> jnp.ndarray:
        """Even-patch pooled-head pipeline on the s2d-2 phase layout:
        -> (ni, nj, 4*ncls) f32 logits (phase-major channel blocks).

        The head weights apply as kron(I4, K) block-diagonal matmuls
        over the 4w-channel (128-lane) pooled map; adding the off-block
        zero terms is FP-exact, so this matches ``head(pooled(...))`` up
        to summation order."""
        hm, wm = scene_ms.shape[0], scene_ms.shape[1]
        out_r, out_c = hm - patch + 1, wm - patch + 1
        st = phase_pooled_s2d(self.features_s2d(scene_ms, scene_pan),
                              patch, out_r, out_c,
                              self._pool_pallas)      # (ni, nj, 4w)
        eye = jnp.eye(4, dtype=self._dtype)
        x = (st.astype(self._dtype)
             @ jnp.kron(eye, self.h1_kernel.astype(self._dtype))
             + jnp.tile(self.h1_bias.astype(self._dtype), 4))
        x = self._act(x)
        # compute-dtype inputs + f32 accumulate/output: no f32
        # materialization of the (ni, nj, 4w) activation just to feed
        # the classifier matmul.
        return jax.lax.dot_general(
            x, jnp.kron(eye, self.h2_kernel.astype(self._dtype)),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jnp.tile(self.h2_bias.astype(jnp.float32), 4)

    def __call__(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                 patch: int) -> jnp.ndarray:
        """Full-scene logits map (H, W, num_classes): the whole tail
        (pooling + head) runs on the s2d-2 phase layout and only the
        final (H, W, ncls) logits are unpacked."""
        if patch % 2:
            return self.head(self.pooled(scene_ms, scene_pan, patch))
        out_r = scene_ms.shape[0] - patch + 1
        out_c = scene_ms.shape[1] - patch + 1
        logits_s2d = self._logits_s2d(scene_ms, scene_pan, patch)
        return depth_to_space(logits_s2d, 2)[:out_r, :out_c]

    def class_map(self, scene_ms: jnp.ndarray, scene_pan: jnp.ndarray,
                  patch: int) -> jnp.ndarray:
        """(H, W) int32 argmax class map.

        Equivalent to ``argmax(__call__(...), -1)`` but the argmax runs
        per phase block in s2d space, so the full-resolution f32 logits
        map — whose ncls-channel minor dim XLA lane-pads ~10x — is never
        materialized (measured 17 ms of the image6 map pass).
        """
        if patch % 2:
            return jnp.argmax(self(scene_ms, scene_pan, patch),
                              axis=-1).astype(jnp.int32)
        out_r = scene_ms.shape[0] - patch + 1
        out_c = scene_ms.shape[1] - patch + 1
        logits_s2d = self._logits_s2d(scene_ms, scene_pan, patch)
        ncls = logits_s2d.shape[-1] // 4
        am = jnp.stack(
            [jnp.argmax(logits_s2d[..., k * ncls:(k + 1) * ncls], axis=-1)
             for k in range(4)], axis=-1).astype(jnp.int32)
        return depth_to_space(am, 2)[:out_r, :out_c, 0]
