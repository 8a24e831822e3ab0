"""Where do the ~35 ms of dense features_s2d go?  Branch vs trunk probe.

The dense map pass is now features-dominated (the unroll finding hides
pooling/head behind neighboring passes' convs — BENCH_NOTES.md round
3).  features_s2d splits into:

  * BRANCHES: s2d packing + casts + ms_stem/ms_block and
    pan_stem/pan_block — convs with 16..64-channel operands, which XLA
    lane-pads 2-8x (a 64-channel pass moves the same padded bytes as a
    128-channel one, for 1/4 the FLOPs),
  * TRUNK: gate + trunk1 + trunk2 + refine — all on the 128-lane grid.

Each part is timed the way the flagship bench times the whole pass:
SCANS unrolled iterations inside one jit, fresh perturbed inputs per
timed call, host-materialization fence, minus nothing (the fixed ~33 ms
dispatch amortizes over the scan).

Run on the TPU:  python tools/features_probe.py [city] [width]
"""

import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pre-imports jax with the TPU plugin, so the env var
    # alone is too late — force the platform the supported way.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dmfusion.config import load_config
from dmfusion.models import build_model

SCANS = 8


def main() -> None:
    city = sys.argv[1] if len(sys.argv) > 1 else "image6"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = load_config(overrides={
        "data_city": city, "model_name": "dense_fusion",
        "model_width": width, "seed": 0,
        "precision": {"compute_dtype": "bfloat16",
                      "param_dtype": "float32"},
    })
    model = build_model(cfg)
    h, w, c = cfg["DATA_DICT"][city]["size"]
    ps = cfg["patch_size"]
    key = jax.random.PRNGKey(0)
    ms = jax.random.uniform(key, (h + ps - 1, w + ps - 1, c), jnp.float32)
    pan = jax.random.uniform(jax.random.fold_in(key, 1),
                             (4 * (h + ps - 1), 4 * (w + ps - 1)),
                             jnp.float32)
    # init via features_s2d: this probe never pools, and tracing
    # __call__ would pull in the Pallas pool kernel on TPU.
    params = model.init(jax.random.PRNGKey(1), ms, pan,
                        method="features_s2d")["params"]

    h2 = (ms.shape[0] + 1) // 2
    w2 = (ms.shape[1] + 1) // 2
    hb = jax.random.normal(key, (1, h2, w2, 2 * width), jnp.bfloat16)

    def full_feats(mdl, s0, s1):
        return mdl.features_s2d(s0, s1)

    def branches(mdl, s0, s1):
        # the exact branch section of features_s2d (incl. s2d + casts)
        from dmfusion.models.dense_fusion import space_to_depth
        pan2d = s1 if s1.ndim == 2 else s1[..., 0]
        hm, wm = s0.shape[0], s0.shape[1]
        hm2, wm2 = -(-hm // 2), -(-wm // 2)
        s0 = jnp.pad(s0, ((0, 2 * hm2 - hm), (0, 2 * wm2 - wm), (0, 0)))
        p = pan2d[: 4 * hm, : 4 * wm]
        p = jnp.pad(p, ((0, 8 * hm2 - p.shape[0]),
                        (0, 8 * wm2 - p.shape[1])))[..., None]
        ms16 = lax.optimization_barrier(space_to_depth(s0, 2))
        pan64 = lax.optimization_barrier(space_to_depth(p, 8))
        ms16 = ms16.astype(mdl._dtype)[None]
        pan64 = pan64.astype(mdl._dtype)[None]
        h_ms = mdl.ms_block(mdl.ms_stem(ms16))
        h_pan = mdl.pan_block(mdl.pan_stem(pan64))
        return h_ms + h_pan

    def trunk(mdl, a, b):
        import flax.linen as nn
        z = nn.sigmoid(mdl.gate(jnp.concatenate([a, b], axis=-1)))
        fused = z * a + (1.0 - z) * b
        return mdl.refine(mdl.trunk2(mdl.trunk1(fused)))[0]

    def scan8(method, x0, x1):
        def fn(p, a, b):
            def body(csum, i):
                out = model.apply({"params": p}, a + i, b, method=method)
                return csum + out.sum(), None
            r, _ = lax.scan(body, jnp.bfloat16(0),
                            jnp.arange(1, SCANS + 1, dtype=x0.dtype) * 1e-6,
                            unroll=SCANS)
            return r
        return jax.jit(fn), (params, x0, x1)

    def timeit(label, fn, args, perturb):
        t0 = time.perf_counter()
        float(fn(*args))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = 1e9
        for i in range(3):
            a2 = perturb(args, i)
            t0 = time.perf_counter()
            float(fn(*a2))
            best = min(best, (time.perf_counter() - t0) / SCANS)
        print(f"{label}: {best * 1e3:.2f} ms/pass", flush=True)
        return best

    def fresh_scene(args, i):
        p, a, b = args
        a2 = a + jnp.float32(1e-4 * (i + 1))
        float(a2.sum())
        return p, a2, b

    def fresh_half(args, i):
        p, a, b = args
        a2 = a + jnp.bfloat16(1e-4 * (i + 1))
        float(a2.sum())
        return p, a2, b

    fn, args = scan8(full_feats, ms, pan)
    t_full = timeit("features_s2d (full)", fn, args, fresh_scene)
    fn, args = scan8(branches, ms, pan)
    t_br = timeit("branches (s2d+stems+blocks)", fn, args, fresh_scene)
    fn, args = scan8(trunk, hb, hb)
    t_tr = timeit("trunk (gate+t1+t2+refine)", fn, args, fresh_half)
    print(f"full {t_full * 1e3:.2f} = branches {t_br * 1e3:.2f} "
          f"+ trunk {t_tr * 1e3:.2f} "
          f"(sum {1e3 * (t_br + t_tr):.2f}; overlap/residue "
          f"{1e3 * (t_full - t_br - t_tr):+.2f})")


if __name__ == "__main__":
    main()
