"""A/B: per-anchor gather route vs the shift-and-stitch conv map route
for gmfnet_conv (VERDICT r4 weak #2 / next #2).

Measures, on the current backend (TPU unless --cpu):
  * map route: full-scene class map wall (banded per ``conv_streams``),
  * per-anchor route: anchors/s on a bounded subset (the full per-anchor
    map at image9 is ~7 min — BENCH_NOTES "image9 PATCHWISE"), then the
    extrapolated full-map wall,
  * parity: exact agreement between the map's entries and the window
    route's per-anchor argmax on a random anchor subset.

Usage: python tools/convmap_ab.py [city] [width] [patch]
       python tools/convmap_ab.py image9 64 47
       python tools/convmap_ab.py image6 64 47 --cpu
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("city", nargs="?", default="image6")
    ap.add_argument("width", nargs="?", type=int, default=64)
    ap.add_argument("patch", nargs="?", type=int, default=47)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="float32 compute: both routes should agree "
                         "(bit-level) — the on-chip exactness check; "
                         "bf16 runs show ~0.4% argmax flips at "
                         "near-tie anchors")
    ap.add_argument("--anchors", type=int, default=98_304,
                    help="per-anchor route sample size (must be 0 mod "
                         "batch)")
    ap.add_argument("--parity-anchors", type=int, default=32_768)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--bands", default=None,
                    help="override conv_streams (band count for the "
                         "map route)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dmfusion.config import load_config
    from dmfusion.data.scene import synthetic_scene
    from dmfusion.train.steps import ConvMapPrograms

    overrides = {
        "data_city": args.city,
        "model_name": "gmfnet_conv",
        "model_width": args.width,
        "patch_size": args.patch,
        "seed": 0,
    }
    if args.f32:
        overrides["precision"] = {"compute_dtype": "float32"}
    if args.bands is not None:
        overrides["conv_streams"] = args.bands
    cfg = load_config(overrides=overrides)
    scene = synthetic_scene(cfg)
    h, w = scene.height, scene.width
    cells = h * w
    print(f"[ab] {args.city}: {h}x{w} = {cells/1e6:.1f}M anchors, "
          f"patch {args.patch}, width {args.width}, "
          f"platform {jax.devices()[0].platform}", flush=True)

    from dmfusion.models.registry import build_model
    model = build_model(cfg)
    prog = ConvMapPrograms(model, optax.sgd(1e-3), cfg, w, args.patch)
    params, _ = prog.init(jax.random.PRNGKey(0))
    scene_args = (scene.ms, scene.pan)

    # ---- map route ----
    pm = prog.predict_map_jitted()
    t0 = time.time()
    cm = pm(params, scene_args)
    cs = int(jnp.asarray(cm, jnp.int32).sum())   # materialize (tunnel rule)
    compile_wall = time.time() - t0
    walls = []
    for _ in range(3):
        t0 = time.time()
        cm = pm(params, scene_args)
        cs = int(jnp.asarray(cm, jnp.int32).sum())
        walls.append(time.time() - t0)
    map_wall = min(walls)
    n_bands = prog._conv_streams(scene_args)
    print(f"[ab] map route: {map_wall*1e3:.0f} ms "
          f"({cells/map_wall/1e6:.1f}M anchors/s, bands={n_bands}, "
          f"first-call {compile_wall:.1f}s incl. compile, "
          f"checksum {cs})", flush=True)

    # ---- per-anchor route (bounded sample, steady-state rate) ----
    rng = np.random.default_rng(0)
    n = (args.anchors // args.batch) * args.batch
    ids = rng.integers(0, cells, size=n).astype(np.int32)
    ids_b = jnp.asarray(ids.reshape(-1, args.batch))
    # One jit signature: warm up with the SAME shape (a second scan
    # length would cost a second multi-minute remote compile).
    warm = prog._predict_jit(params, scene_args, ids_b)
    int(jnp.asarray(warm, jnp.int32).sum())
    t0 = time.time()
    preds = prog._predict_jit(params, scene_args, ids_b)
    ps = int(jnp.asarray(preds, jnp.int32).sum())
    anchor_wall = time.time() - t0
    rate = n / anchor_wall
    print(f"[ab] per-anchor route: {rate/1e3:.1f}k anchors/s over {n} "
          f"({anchor_wall:.2f} s; extrapolated full map "
          f"{cells/rate:.0f} s) [checksum {ps}]", flush=True)

    # ---- parity ----
    np_cm = np.asarray(cm)
    m = min(args.parity_anchors, n)
    sample = ids[:m]
    map_preds = np_cm.reshape(-1)[sample]
    anchor_preds = np.asarray(preds).reshape(-1)[:m]
    agree = float((map_preds == anchor_preds).mean())
    print(f"[ab] parity: {agree*100:.4f}% argmax agreement over {m} "
          f"anchors", flush=True)

    speedup = (cells / rate) / map_wall
    print(f"[ab] RESULT map={map_wall*1e3:.0f}ms "
          f"anchor_extrapolated={cells/rate:.0f}s speedup={speedup:.0f}x "
          f"agreement={agree:.6f}")


if __name__ == "__main__":
    main()
