"""Serving-side scene inference from a ``.dmx`` artifact.

`dmfusion/export.py` packages a trained classifier as one portable file;
this module is the consumer: it runs that artifact over a city scene —
patch-window extraction, bucketed batching, the arity's decision rule,
OA/AA/kappa against the scene labels, and palette class-map rendering —
WITHOUT the solver stack.  Together they close the deployment loop the
reference lacks entirely (its evaluation lives inside the training
process, solver/mainsolver.py:317-441).

TPU-serving detail that shapes the API: the artifact's batch dimension
is exported symbolically, but XLA still specializes one executable per
concrete shape, and on TPU each new shape is a fresh (expensive)
compile.  ``ScenePredictor`` therefore pads every anchor chunk to ONE
fixed ``bucket`` size, so an arbitrarily shaped workload costs exactly
one program compile.

Console script: ``dmfusion-infer`` (see ``main``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

_SUPPORTED_ARITIES = ("dual", "single", "tri", "quad", "dense")


class ScenePredictor:
    """Per-anchor scene classification through a loaded ``.dmx`` artifact.

    Window semantics match training exactly (``data/patches.py``): the
    MS anchor (x, y) owns a ``ps`` window, the PAN anchor (4x, 4y) a
    ``4*ps`` window; the tri arity adds the seeded IHS MSPAN stream the
    solver builds (solvers/main.py::_make_scene_args).
    """

    def __init__(self, clf, scene, *, bucket: int = 4096,
                 seed: int | None = None, gan_dir: str | None = None):
        # Default to the seed stamped at export time: tri-arity rebuilds
        # the IHS MSPAN stream with seed-keyed unpooling randomness, so a
        # mismatched seed silently degrades predictions (ADVICE r4 — the
        # CLI already defaulted from the manifest; the API now does too).
        if seed is None:
            seed = int(clf.manifest.get("seed", 0) or 0)
        arity = clf.manifest["arity"]
        if arity not in _SUPPORTED_ARITIES:
            raise ValueError(
                f"arity {arity!r} artifacts cannot run standalone scene "
                f"inference")
        if arity == "quad" and gan_dir is None:
            raise ValueError(
                "quad (DQTL) artifacts need the stage-1 GAN scene "
                "artifacts: pass gan_dir / --gan-weights pointing at the "
                "dir holding msgan.npy + pangan.npy (written by the "
                "two-stage solver's stage 1, solvers/twostage.py), or "
                "run the two-stage solver directly")
        if int(clf.manifest["patch_size"]) != int(scene.patch):
            raise ValueError(
                f"scene was padded for patch_size={scene.patch} but the "
                f"artifact expects {clf.manifest['patch_size']}")
        if clf.is_map:
            # Map programs are compiled for ONE scene geometry.
            want = clf.manifest.get("scene_shape")
            have = [scene.height, scene.width, int(scene.ms.shape[-1])]
            if want is not None and list(map(int, want)) != have:
                raise ValueError(
                    f"dense artifact was exported for scene geometry "
                    f"{want} but this scene is {have} — wrong city?")
        self._dense_map_cache: np.ndarray | None = None
        self.clf = clf
        self.scene = scene
        self.arity = arity
        self.bucket = int(bucket)
        # Scenes may be stored bf16 (precision.scene_dtype); the gathered
        # windows are cast to the exported program's f32 signature in
        # ``_gather`` (exact: bf16 -> f32 is value-preserving) rather
        # than pre-casting the whole scene, which would double HBM at
        # 50M-px city scale.
        self._scene_args = self._make_scene_args(seed, gan_dir)

    def _make_scene_args(self, seed: int, gan_dir: str | None) -> tuple:
        import jax
        import jax.numpy as jnp

        s = self.scene
        if self.arity in ("dual", "dense"):
            return (s.ms, s.pan)
        if self.arity == "single":
            return (s.ms,)
        if self.arity == "quad":
            return self._quad_streams(gan_dir)
        # tri: the IHS-fused MSPAN stream at PAN geometry, same seed
        # convention as the training solver (solvers/main.py:323-331).
        from dmfusion.data.scene import prep_scene
        from dmfusion.ops.ihs import ihs_transform
        mspan = ihs_transform(jnp.asarray(s.raw_ms, jnp.float32),
                              jnp.asarray(s.raw_pan, jnp.float32),
                              jax.random.PRNGKey(seed))
        mspan = prep_scene(mspan, 4 * s.patch, mspan.dtype)
        return (s.ms, s.pan, mspan)

    def _quad_streams(self, gan_dir: str) -> tuple:
        """The DQTL 4 streams at MS geometry, built exactly like stage 2
        of the two-stage solver (solvers/twostage.py::train_stage2_setup):
        (raw MS, pan2ms(PAN), GAN fake-MS, GAN fake-PAN), each
        normalize+pad+f32 via ``prep_scene``."""
        import jax.numpy as jnp

        from dmfusion.data.scene import prep_scene
        from dmfusion.ops.ihs import pan2ms

        s = self.scene
        size = (s.height, s.width, s.raw_ms.shape[-1])
        gan = {}
        for name in ("msgan.npy", "pangan.npy"):
            path = os.path.join(gan_dir, name)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path}: stage-1 GAN artifact missing (produced by "
                    f"the two-stage solver's stage 1)")
            arr = np.load(path)
            if tuple(arr.shape) != size:
                raise ValueError(
                    f"{path} has shape {tuple(arr.shape)} but this scene "
                    f"needs {size} — artifacts from a different city?")
            gan[name] = arr
        pms = pan2ms(jnp.asarray(s.raw_pan), size)

        def prep(arr):
            return prep_scene(jnp.asarray(np.asarray(arr, np.float32)),
                              s.patch, jnp.float32)

        return (prep(s.raw_ms), prep(pms),
                prep(gan["msgan.npy"]), prep(gan["pangan.npy"]))

    def _use_fast(self) -> bool:
        # Same routing as training (train/steps.py::_use_fast): on TPU,
        # vmap(dynamic_slice) gathers run at ~1% HBM BW — the Pallas
        # aligned-block DMA kernel wins ~3x at serving bucket sizes.
        from dmfusion.train.steps import _on_tpu
        return _on_tpu() and self.bucket >= 1024 and self.bucket % 64 == 0

    def _gather(self, ids_b):
        import jax.numpy as jnp

        w, ps = self.scene.width, self.scene.patch
        if self._use_fast():
            from dmfusion.ops.pallas_gather import (gather_dual_fast,
                                                    gather_one_fast,
                                                    gather_quad_fast,
                                                    gather_tri_fast)
            if self.arity == "dual":
                out = gather_dual_fast(*self._scene_args, ids_b, w, ps)
            elif self.arity == "single":
                out = (gather_one_fast(self._scene_args[0], ids_b, w, ps),)
            elif self.arity == "quad":
                out = gather_quad_fast(*self._scene_args, ids_b, w, ps)
            else:
                out = gather_tri_fast(*self._scene_args, ids_b, w, ps)
        else:
            from dmfusion.data.patches import (gather_dual, gather_one,
                                               gather_quad, gather_tri)
            if self.arity == "dual":
                out = gather_dual(*self._scene_args, ids_b, w, ps)
            elif self.arity == "single":
                out = (gather_one(self._scene_args[0], ids_b, w, ps),)
            elif self.arity == "quad":
                out = gather_quad(*self._scene_args, ids_b, w, ps)
            else:
                out = gather_tri(*self._scene_args, ids_b, w, ps)
        if self.arity == "quad":
            # The quad model consumes the 4 streams concatenated along
            # batch (tostagesolver.py:271); clf.predict's logit-sum rule
            # splits rows back by // 4.
            out = (jnp.concatenate(out, axis=0),)
        return tuple(x.astype(jnp.float32) for x in out)

    def _dense_map(self) -> np.ndarray:
        """Map artifacts (dense family, or a --map export of
        gmfnet_conv): the whole-scene (H, W) class map from ONE program
        call (the flagship serving product — streamed in row bands
        inside the exported program for city-scale scenes).
        Computed once and cached; every anchor query indexes it."""
        if self._dense_map_cache is None:
            import jax.numpy as jnp
            dt = jnp.dtype(str(self.clf.manifest.get("scene_dtype",
                                                     "float32")))
            ms, pan = self._scene_args
            out = self.clf.class_map(ms.astype(dt), pan.astype(dt))
            self._dense_map_cache = np.asarray(
                out)[:self.scene.height, :self.scene.width]
        return self._dense_map_cache

    def predict_ids(self, ids: np.ndarray) -> np.ndarray:
        """Flat anchor ids -> predicted class id per anchor (class ids
        are raw label values: palette row indices, 0 = background)."""
        import jax.numpy as jnp

        ids = np.asarray(ids, np.int32)
        if self.clf.is_map:
            return np.asarray(self._dense_map(), np.int32).reshape(-1)[ids]
        n = ids.shape[0]
        out = np.empty((n,), np.int32)
        b = self.bucket
        for lo in range(0, n, b):
            chunk = ids[lo:lo + b]
            if chunk.shape[0] < b:  # pad to the one compiled bucket shape
                chunk = np.pad(chunk, (0, b - chunk.shape[0]))
            preds = self.clf.predict(*self._gather(jnp.asarray(chunk)))
            out[lo:lo + b] = np.asarray(preds)[:min(b, n - lo)]
        return out

    def class_map(self, ids: np.ndarray | None = None) -> np.ndarray:
        """(H, W) int32 class map over ``ids`` (default: every pixel);
        anchors not in ``ids`` stay class 0."""
        s = self.scene
        if ids is None:
            ids = np.arange(s.num_pixels, dtype=np.int32)
        label = np.zeros((s.height, s.width), np.int32)
        x, y = s.ids_to_xy(np.asarray(ids, np.int32))
        label[x, y] = self.predict_ids(ids)
        return label

    def evaluate(self, ids: np.ndarray | None = None) -> dict[str, Any]:
        """OA/AA/kappa over the scene's labeled pixels (or ``ids``),
        reference metric semantics (ops/metrics.py)."""
        from dmfusion.data.scene import split_labels
        from dmfusion.ops.metrics import aa_oa, confusion_matrix

        if ids is None:
            ids, _ = split_labels(self.scene.label)
        ids = np.asarray(ids, np.int32)
        targets = self.scene.label.reshape(-1)[ids].astype(np.int32)
        ncls = int(self.clf.manifest["categories"])
        if targets.size and int(targets.max()) >= ncls:
            raise ValueError(
                f"scene labels reach class {int(targets.max())} but the "
                f"artifact has {ncls} classes — wrong city?")
        preds = self.predict_ids(ids)
        conf = np.asarray(confusion_matrix(preds, targets, ncls))
        aa, oa, kap, _ = aa_oa(conf)
        return {"oa": oa, "aa": aa, "kappa": kap,
                "pixels": int(ids.shape[0]), "confusion": conf}


def main(argv: list[str] | None = None) -> None:
    """``dmfusion-infer``: classify a city scene with a ``.dmx`` artifact.

    Writes the all-pixels and labeled-only class maps (the reference's
    map2/map1, solver/mainsolver.py:155-201) and prints ONE JSON line
    with metrics + wall times.
    """
    import argparse

    ap = argparse.ArgumentParser(prog="dmfusion-infer")
    ap.add_argument("--artifact", required=True, help=".dmx file")
    ap.add_argument("--config", default=None)
    ap.add_argument("--city", default=None,
                    help="default: the artifact's data_city")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    ap.add_argument("--bucket", type=int, default=4096)
    ap.add_argument("--gan-weights", default=None, metavar="DIR",
                    help="stage-1 GAN artifacts dir (msgan.npy + "
                         "pangan.npy) — required for quad artifacts")
    ap.add_argument("--no-maps", action="store_true",
                    help="metrics only, skip map rendering")
    ap.add_argument("--out", default=None,
                    help="output dir (default: alongside the artifact)")
    args = ap.parse_args(argv)

    from dmfusion.cli import _nest, _parse_value
    from dmfusion.export import load_artifact, read_manifest

    # Resolve config + platform from the manifest ALONE, before the
    # program is deserialized: deserialization (or any import on the
    # way) may initialize the default backend, after which a cpu switch
    # is too late and inference silently dispatches to the TPU
    # (ADVICE r4; export.py's main applies the same ordering).
    manifest = read_manifest(args.artifact)
    overrides: dict[str, Any] = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = _parse_value(value)
    overrides = _nest(overrides)
    overrides["data_city"] = args.city or manifest["data_city"]
    overrides["patch_size"] = int(manifest["patch_size"])
    # Default to the training seed stamped at export time — synthetic
    # scenes are seed-derived, so a mismatched seed silently evaluates
    # against a DIFFERENT scene (caught during verify: OA 0.26 vs 0.39).
    if "seed" not in overrides and manifest.get("seed") is not None:
        overrides["seed"] = int(manifest["seed"])
    # And to the stamped scene storage dtype: bf16-scene runs gather
    # windows whose low bits differ from an f32 scene's (ADVICE r4).
    if manifest.get("scene_dtype"):
        overrides.setdefault("precision", {}).setdefault(
            "scene_dtype", manifest["scene_dtype"])

    import jax

    from dmfusion.config import load_config
    cfg = load_config(args.config, overrides=overrides)
    if str(cfg.get("device", "")).lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            import warnings
            warnings.warn(
                "--set device=cpu was requested but a jax backend is "
                "already initialized; inference will run on "
                f"{jax.default_backend()}", stacklevel=1)

    clf = load_artifact(args.artifact)
    import jax.numpy as jnp

    from dmfusion.data.scene import load_scene, split_labels
    from dmfusion.ops.metrics import render_class_map

    t0 = time.time()
    scene = load_scene(cfg)
    pred = ScenePredictor(clf, scene, bucket=args.bucket,
                          seed=int(cfg.get("seed", 0)),
                          gan_dir=args.gan_weights)
    labeled, unlabeled = split_labels(scene.label)
    result: dict[str, Any] = {
        "artifact": args.artifact,
        "model": clf.manifest["model_name"],
        "city": cfg["data_city"],
        "pixels": int(scene.num_pixels),
    }
    metrics = pred.evaluate(labeled)
    metrics.pop("confusion")
    result.update(metrics)
    result["eval_s"] = round(time.time() - t0, 3)

    if not args.no_maps:
        t1 = time.time()
        out_dir = args.out or (os.path.dirname(
            os.path.abspath(args.artifact)) or ".")
        os.makedirs(out_dir, exist_ok=True)
        # The city palette when it matches the artifact's class count,
        # else the palette stamped into the manifest at export time.
        palette = cfg["DATA_DICT"][cfg["data_city"]]["color"]
        if len(palette) != int(clf.manifest["categories"]):
            palette = clf.manifest["palette"]
        pal = jnp.asarray(np.asarray(palette, np.uint8))
        full = pred.class_map()
        sup = np.zeros_like(full)
        x, y = scene.ids_to_xy(labeled)
        sup[x, y] = full[x, y]
        from PIL import Image
        stem = os.path.splitext(os.path.basename(args.artifact))[0]
        paths = []
        for tag, lab in (("1", sup), ("2", full)):
            img = np.asarray(render_class_map(jnp.asarray(lab), pal))
            p = os.path.join(out_dir, f"{stem}_pic_{tag}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
        result["maps"] = paths
        result["map_s"] = round(time.time() - t1, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
