"""Branch-packing A/B: can the two low-channel branch conv chains run
as ONE block-diagonal chain?

dense_fusion's branch section runs two parallel conv chains over the
same (H2, W2) grid at 16..64 channels — widths that fill a fraction of
the TPU's 128 lanes, so every pass moves padded bytes (BENCH_NOTES.md
half-res finding).  Because both branches share the spatial shape, the
whole section can instead run as one chain on the channel-concatenated
tensor with BLOCK-DIAGONAL kernels: out-block o reads only its own
in-block, the off-blocks are exact zeros (bf16/f32 products with 0.0
are exact, so numerics are bit-identical), and the gate's concat
becomes free because the packed activation IS [h_ms | h_pan].

The packed chain pays 2x the nominal FLOPs (each conv contracts over
both in-blocks) but halves the number of lane-padded passes:
9 conv passes (2 stems, 2x[CB + conv2 + 1x1 shortcut], gate) -> 5.

Measured the flagship way: SCANS unrolled iterations inside one jit,
fresh perturbed inputs per timed call, host-materialization fence.

Run:  python tools/branch_pack_probe.py [city] [width]
CPU exactness check:  JAX_PLATFORMS=cpu python tools/branch_pack_probe.py check
"""

import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

SCANS = 24
SQRT2 = 1.4142135623730951


def _std(w, gain, act_gain):
    mu = w.mean((0, 1, 2), keepdims=True)
    var = w.var((0, 1, 2), keepdims=True)
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    return (w - mu) * lax.rsqrt(var * fan_in + 1e-8) * (gain * act_gain)


def conv(x, wn, b, dt):
    y = lax.conv_general_dilated(
        x.astype(dt), wn.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    return y + b.astype(dt)


def make_params(key, cin, w, pdt=jnp.float32):
    """One branch's params: stem (cin->w), resblock (w->2w)."""
    ks = jax.random.split(key, 8)
    he = jax.nn.initializers.he_normal()
    p = {
        "stem_k": he(ks[0], (3, 3, cin, w), pdt),
        "stem_g": jnp.ones((w,), pdt), "stem_b": jnp.zeros((w,), pdt),
        "c1_k": he(ks[1], (3, 3, w, 2 * w), pdt),
        "c1_g": jnp.ones((2 * w,), pdt), "c1_b": jnp.zeros((2 * w,), pdt),
        "c2_k": he(ks[2], (3, 3, 2 * w, 2 * w), pdt),
        "c2_g": jnp.ones((2 * w,), pdt), "c2_b": jnp.zeros((2 * w,), pdt),
        "sc_k": he(ks[3], (1, 1, w, 2 * w), pdt),
        "sc_g": jnp.ones((2 * w,), pdt), "sc_b": jnp.zeros((2 * w,), pdt),
        "alpha": jnp.float32(0.2),
    }
    return p


def branch_fwd(p, x, dt):
    """stem CB + resblock, exactly dense_fusion's LocalConvBlock/ResBlock."""
    h = jax.nn.relu(conv(x, _std(p["stem_k"], p["stem_g"], SQRT2),
                         p["stem_b"], dt))
    y = jax.nn.relu(conv(h, _std(p["c1_k"], p["c1_g"], SQRT2),
                         p["c1_b"], dt))
    y = conv(y, _std(p["c2_k"], p["c2_g"], 1.0), p["c2_b"], dt)
    sc = conv(h, _std(p["sc_k"], p["sc_g"], 1.0), p["sc_b"], dt)
    return jax.nn.relu(sc + p["alpha"].astype(dt) * y)


def unpacked(pm, pp, gk, gb, ms16, pan64, dt):
    h_ms = branch_fwd(pm, ms16, dt)
    h_pan = branch_fwd(pp, pan64, dt)
    z = jax.nn.sigmoid(conv(jnp.concatenate([h_ms, h_pan], -1), gk, gb, dt))
    return z * h_ms + (1.0 - z) * h_pan


def _blockdiag(ka, kb):
    """(kh,kw,ia,oa) + (kh,kw,ib,ob) -> (kh,kw,ia+ib,oa+ob) block-diag."""
    kh, kw, ia, oa = ka.shape
    _, _, ib, ob = kb.shape
    top = jnp.concatenate([ka, jnp.zeros((kh, kw, ia, ob), ka.dtype)], -1)
    bot = jnp.concatenate([jnp.zeros((kh, kw, ib, oa), kb.dtype), kb], -1)
    return jnp.concatenate([top, bot], 2)


def packed(pm, pp, gk, gb, ms16, pan64, dt):
    # standardize PER BRANCH (matches unpacked bit-for-bit), then pack
    def pk(name, gain_scale):
        return _blockdiag(_std(pm[name + "_k"], pm[name + "_g"], gain_scale),
                          _std(pp[name + "_k"], pp[name + "_g"], gain_scale))

    def pb(name):
        return jnp.concatenate([pm[name + "_b"], pp[name + "_b"]])

    w = pm["stem_k"].shape[-1]
    x = jnp.concatenate([ms16, pan64], -1)
    h = jax.nn.relu(conv(x, pk("stem", SQRT2), pb("stem"), dt))
    y = jax.nn.relu(conv(h, pk("c1", SQRT2), pb("c1"), dt))
    y = conv(y, pk("c2", 1.0), pb("c2"), dt)
    sc = conv(h, pk("sc", 1.0), pb("sc"), dt)
    alpha = jnp.concatenate([
        jnp.full((2 * w,), pm["alpha"], dt),
        jnp.full((2 * w,), pp["alpha"], dt)])
    hcat = jax.nn.relu(sc + alpha * y)          # [h_ms | h_pan]
    z = jax.nn.sigmoid(conv(hcat, gk, gb, dt))  # concat is free
    return z * hcat[..., :2 * w] + (1.0 - z) * hcat[..., 2 * w:]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        jax.config.update("jax_platforms", "cpu")
        w = 8
        key = jax.random.PRNGKey(0)
        pm = make_params(jax.random.fold_in(key, 1), 4 * 4, w)
        pp = make_params(jax.random.fold_in(key, 2), 64, w)
        gk = jax.nn.initializers.lecun_normal()(
            jax.random.fold_in(key, 3), (1, 1, 4 * w, 2 * w), jnp.float32)
        gb = jnp.zeros((2 * w,), jnp.float32)
        ms16 = jax.random.uniform(jax.random.fold_in(key, 4), (1, 40, 48, 16))
        pan64 = jax.random.uniform(jax.random.fold_in(key, 5), (1, 40, 48, 64))
        for dt in (jnp.float32, jnp.bfloat16):
            a = unpacked(pm, pp, gk, gb, ms16, pan64, dt)
            b = packed(pm, pp, gk, gb, ms16, pan64, dt)
            same = bool(jnp.array_equal(a, b))
            print(f"{dt.__name__}: bit-identical={same} "
                  f"maxdiff={float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()):.3e}")
        return

    city = sys.argv[1] if len(sys.argv) > 1 else "image6"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from dmfusion.config import load_config
    cfg = load_config(overrides={"data_city": city})
    h, w_, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]
    h2 = (h + ps - 1 + 1) // 2
    w2 = (w_ + ps - 1 + 1) // 2
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    pm = make_params(jax.random.fold_in(key, 1), 4 * c, width)
    pp = make_params(jax.random.fold_in(key, 2), 64, width)
    gk = jax.nn.initializers.lecun_normal()(
        jax.random.fold_in(key, 3), (1, 1, 4 * width, 2 * width), jnp.float32)
    gb = jnp.zeros((2 * width,), jnp.float32)
    ms16 = jax.random.uniform(jax.random.fold_in(key, 4),
                              (1, h2, w2, 4 * c), dt)
    pan64 = jax.random.uniform(jax.random.fold_in(key, 5),
                               (1, h2, w2, 64), dt)

    def scan_n(fn):
        def f(pm, pp, a, b):
            def body(csum, i):
                out = fn(pm, pp, gk, gb, a + i, b, dt)
                return csum + out.sum(), None
            r, _ = lax.scan(body, jnp.bfloat16(0),
                            jnp.arange(1, SCANS + 1, dtype=dt) * dt(1e-6),
                            unroll=SCANS)
            return r
        return jax.jit(f)

    def timeit(label, jf):
        t0 = time.perf_counter()
        float(jf(pm, pp, ms16, pan64))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = 1e9
        for i in range(3):
            a2 = ms16 + dt(1e-4 * (i + 1))
            float(a2.sum())
            t0 = time.perf_counter()
            float(jf(pm, pp, a2, pan64))
            best = min(best, time.perf_counter() - t0)
        return best

    # Empty-body calibration scan: same scan/jit/fence structure, no
    # conv work — subtracted so the fixed ~33 ms dispatch does not
    # inflate the per-pass numbers (CLAUDE.md timing rule).
    cal = timeit("calibration (empty body)",
                 scan_n(lambda *a: a[4][:1, :1, :1, :1]))
    for label, fn in (("unpacked (9 conv passes)", unpacked),
                      ("packed block-diag (5 passes)", packed)):
        best = timeit(label, scan_n(fn))
        print(f"{label}: {(best - cal) * 1e3 / SCANS:.2f} ms/pass "
              f"(raw {best * 1e3 / SCANS:.2f})", flush=True)


if __name__ == "__main__":
    main()
