"""Serialized inference export — the serving/deployment artifact.

The reference stops at in-process evaluation and map rendering
(solver/mainsolver.py:317-441 ``test()``/``color()``); it has no way to
hand a trained classifier to a serving system without dragging the whole
training repo along.  This module closes that gap TPU-natively: a trained
model is packaged as ONE portable, versioned ``.dmx`` file containing

  * ``program.bin``  — the model's forward pass as a serialized
    ``jax.export`` StableHLO program, lowered for ``cpu`` AND ``tpu`` so
    the same artifact runs on a dev box and a serving chip.  The batch
    dimension is exported symbolically by default, so one artifact serves
    any batch size (XLA still specializes per concrete shape at run time,
    as it must on TPU).
  * ``params.msgpack`` — the trained parameters (same stamped format as
    ``train/checkpoint.py``, so the artifact refuses mismatched weights).
  * ``manifest.json`` — model name, input arity/specs, patch size, class
    count, palette, dtypes, format version.

Loading needs only ``jax`` + this file — no flax, no model zoo, no
config: ``load_artifact(path)`` returns a callable classifier.

Typical flow::

    cfg = load_config(overrides={"data_city": "image6"})
    params = load_checkpoint(best_path, template)
    save_artifact("image6_gmfnet.dmx", cfg, params)
    ...
    clf = load_artifact("image6_gmfnet.dmx")   # serving process
    labels = clf.predict(ms_windows, pan_windows)

Console script: ``dmfusion-export`` (see ``main``).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Mapping, Sequence

ARTIFACT_FORMAT = 1

# Input signature per model arity (registry.model_arity): shapes with a
# ``None`` leading dim take the (symbolic or fixed) batch size.  The quad
# program's "batch" axis carries the 4 DQTL streams concatenated
# (reference tostagesolver.py:271), so its effective row count is
# 4 * batch — the exported dim stays symbolic either way.
_ARITY_SPECS: dict[str, tuple[tuple[int | None, ...], ...]] = {
    "dual": ((None, "ps", "ps", 4), (None, "4ps", "4ps", 1)),
    "tri": ((None, "ps", "ps", 4), (None, "4ps", "4ps", 1),
            (None, "4ps", "4ps", 1)),
    "single": ((None, "ps", "ps", 4),),
    "quad": ((None, "ps", "ps", 4),),
}


def _dense_specs(cfg: Mapping[str, Any]) -> tuple[Any, ...]:
    """Whole-scene input specs for the dense family: the exported unit
    is the scene, not a patch batch.  Shapes are the city's padded
    scene geometry (data/scene.py::Scene — MS (H+ps-1, W+ps-1, C),
    PAN (4H+4ps-1, 4W+4ps-1)), dtype the training scene storage dtype
    (``precision.scene_dtype``)."""
    import jax
    import jax.numpy as jnp

    h, w, c = cfg["DATA_DICT"][cfg["data_city"]]["size"]
    ps = int(cfg["patch_size"])
    dt = jnp.dtype(str(cfg.get("precision", {}).get("scene_dtype",
                                                    "float32")))
    return (jax.ShapeDtypeStruct((h + ps - 1, w + ps - 1, c), dt),
            jax.ShapeDtypeStruct((4 * h + 4 * ps - 1, 4 * w + 4 * ps - 1),
                                 dt))


def _resolve_specs(arity: str, patch: int,
                   batch: int | None) -> tuple[Any, ...]:
    """Concrete ``ShapeDtypeStruct`` inputs for ``arity``; ``batch=None``
    exports a symbolic batch dimension ``b``."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if arity not in _ARITY_SPECS:
        raise ValueError(f"model arity {arity!r} has no export signature "
                         f"(known: {sorted(_ARITY_SPECS) + ['dense']})")
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    dims = {"ps": patch, "4ps": 4 * patch}
    specs = []
    for shape in _ARITY_SPECS[arity]:
        full = tuple(b if d is None else dims.get(d, d) for d in shape)
        specs.append(jax.ShapeDtypeStruct(full, jnp.float32))
    return tuple(specs)


def export_program(cfg: Mapping[str, Any], params: Any, *,
                   batch: int | None = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   map_route: bool = False):
    """Export the model's forward pass as a ``jax.export.Exported``.

    The program takes ``(params, *inputs)`` — parameters stay call
    arguments (not baked-in constants) so the artifact can be re-armed
    with retrained weights of the same tree without re-exporting.

    ``map_route=True`` exports a MAP_PROGRAMS model's (gmfnet_conv)
    shift-and-stitch whole-scene class map instead of the per-anchor
    forward — the dense-style serving unit (one call classifies every
    pixel) for the patchwise family.
    """
    import jax
    from jax import export as jexport

    from dmfusion.models import build_model

    model = build_model(cfg)
    from dmfusion.models.registry import model_arity, model_map_programs
    arity = model_arity(cfg["model_name"])
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)

    if map_route:
        if model_map_programs(cfg["model_name"]) != "convmap":
            raise ValueError(
                f"--map: model {cfg['model_name']!r} has no convolutional "
                "map route (only MAP_PROGRAMS models, e.g. gmfnet_conv; "
                "the dense family exports its map by default)")
        from dmfusion.train.optim import make_optimizer
        from dmfusion.train.steps import ConvMapPrograms
        h, w, _ = cfg["DATA_DICT"][cfg["data_city"]]["size"]
        prog = ConvMapPrograms(model, make_optimizer(cfg, 1), dict(cfg),
                               int(w), int(cfg["patch_size"]), None)
        specs = _dense_specs(cfg)

        def forward(params, ms, pan):
            return prog.predict_map(params, (ms, pan))

        exported = jexport.export(
            jax.jit(forward), platforms=list(platforms))(param_specs,
                                                         *specs)
        return exported, specs

    if arity == "dense":
        # The flagship's serving unit is the whole-scene class map
        # (DensePrograms.predict_map): one call classifies every pixel,
        # streamed in sequential row bands for city-scale scenes
        # (cfg ``dense_streams``/``dense_streams_infer`` — resolve/pin
        # the band count at export time, e.g. --set
        # dense_streams_infer=4 for the image9 autotuned pick).
        from dmfusion.train.optim import make_optimizer
        from dmfusion.train.steps import DensePrograms
        pcfg = dict(cfg)
        if "cpu" in platforms:
            # The fused Pallas pool is a TPU Mosaic kernel — it cannot
            # lower for the cpu platform.  The XLA phase-mix pool is
            # bit-identical (tests/test_dense.py); city-scale streamed
            # maps run pool-off anyway (BENCH_NOTES round 3).
            pcfg["precision"] = dict(pcfg.get("precision", {}),
                                     pallas_pool=0)
        h, w, _ = pcfg["DATA_DICT"][pcfg["data_city"]]["size"]
        prog = DensePrograms(model, make_optimizer(pcfg, 1), pcfg,
                             int(w), int(pcfg["patch_size"]), None)
        specs = _dense_specs(pcfg)

        def forward(params, ms, pan):
            return prog.predict_map(params, (ms, pan))

        exported = jexport.export(
            jax.jit(forward), platforms=list(platforms))(param_specs,
                                                         *specs)
        return exported, specs

    specs = _resolve_specs(arity, int(cfg["patch_size"]), batch)

    def forward(params, *inputs):
        return model.apply({"params": params}, *inputs)

    exported = jexport.export(jax.jit(forward),
                              platforms=list(platforms))(param_specs, *specs)
    return exported, specs


def _manifest(cfg: Mapping[str, Any], exported, specs, *,
              batch: int | None) -> dict[str, Any]:
    import jax

    from dmfusion.models.registry import model_arity
    return {
        "format": ARTIFACT_FORMAT,
        "model_name": cfg["model_name"],
        "arity": model_arity(cfg["model_name"]),
        "patch_size": int(cfg["patch_size"]),
        "model_width": int(cfg.get("model_width", 0)),
        "categories": int(cfg["Categories_Number"]),
        "data_city": cfg.get("data_city"),
        "palette": cfg.get("DATA_DICT", {}).get(
            cfg.get("data_city", ""), {}).get("color"),
        "batch": "symbolic" if batch is None else int(batch),
        # Reproducibility stamps: the compute precision is baked into the
        # exported program; the seed lets a consumer regenerate the exact
        # synthetic scene (data/scene.py::synthetic_scene) the model was
        # trained against when no real data ships with the artifact.
        "seed": int(cfg.get("seed", 0)),
        "compute_dtype": str(cfg.get("precision", {}).get(
            "compute_dtype", "bfloat16")),
        # Scene storage dtype: gathered windows differ in low bits
        # between f32 and bf16 scenes, so serving must rebuild the
        # scene exactly as training stored it (ADVICE r4).
        "scene_dtype": str(cfg.get("precision", {}).get(
            "scene_dtype", "float32")),
        "platforms": list(exported.platforms),
        "input_shapes": [list(map(str, s.shape)) for s in specs],
        "jax_version": jax.__version__,
    }


def _dense_manifest_extras(cfg: Mapping[str, Any]) -> dict[str, Any]:
    """Dense artifacts classify one fixed scene geometry; stamp it plus
    the streaming band count baked into the exported program."""
    from dmfusion.train.steps import (resolve_dense_streams,
                                      resolve_dense_streams_infer)
    h, w, c = cfg["DATA_DICT"][cfg["data_city"]]["size"]
    ps = int(cfg["patch_size"])
    n_train = resolve_dense_streams(cfg.get("dense_streams", "auto"),
                                    h + ps - 1, w + ps - 1)
    bands = resolve_dense_streams_infer(
        cfg.get("dense_streams_infer", "auto"), n_train)
    return {"scene_shape": [int(h), int(w), int(c)],
            "dense_bands": int(bands)}


def save_artifact(path: str | os.PathLike, cfg: Mapping[str, Any],
                  params: Any, *, batch: int | None = None,
                  platforms: Sequence[str] = ("cpu", "tpu"),
                  map_route: bool = False) -> dict:
    """Export + package model/params/manifest into one ``.dmx`` zip."""
    from flax import serialization

    exported, specs = export_program(cfg, params, batch=batch,
                                     platforms=platforms,
                                     map_route=map_route)
    manifest = _manifest(cfg, exported, specs, batch=batch)
    if manifest["arity"] == "dense":
        manifest.update(_dense_manifest_extras(cfg))
        manifest["batch"] = "scene"
    elif map_route:
        from dmfusion.train.steps import resolve_conv_streams
        h, w, c = cfg["DATA_DICT"][cfg["data_city"]]["size"]
        ps = int(cfg["patch_size"])
        manifest["serving"] = "map"
        manifest["scene_shape"] = [int(h), int(w), int(c)]
        manifest["conv_bands"] = int(resolve_conv_streams(
            cfg.get("conv_streams", "auto"), h + ps - 1, w + ps - 1, ps,
            int(cfg.get("model_width", 64))))
        manifest["batch"] = "scene"
    params_payload = {
        "__meta__": {"format": ARTIFACT_FORMAT,
                     "model_name": manifest["model_name"],
                     "model_width": manifest["model_width"]},
        "tree": serialization.to_state_dict(_to_host(params)),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))
        zf.writestr("program.bin", exported.serialize())
        zf.writestr("params.msgpack",
                    serialization.to_bytes(params_payload))
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return manifest


def _to_host(tree):
    import jax
    import numpy as np
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree.map(np.asarray, tree)


class LoadedClassifier:
    """A deserialized ``.dmx`` artifact: manifest + params + program.

    ``logits(*inputs)`` runs the exported forward pass; ``predict``
    applies the arity's decision rule (plain argmax, or the DQTL
    logit-sum fusion over the first two streams —
    reference tostagesolver.py:337).
    """

    def __init__(self, exported, params, manifest: dict[str, Any]):
        self._exported = exported
        self.params = params
        self.manifest = manifest

    @property
    def is_map(self) -> bool:
        """True when the exported unit is the whole-scene class map
        (dense family, or a ``--map`` export of a MAP_PROGRAMS model)."""
        return (self.manifest["arity"] == "dense"
                or self.manifest.get("serving") == "map")

    def logits(self, *inputs):
        return self._exported.call(self.params, *inputs)

    def predict(self, *inputs):
        import jax.numpy as jnp
        if self.is_map:
            raise ValueError(
                "map artifacts classify whole scenes — call "
                "class_map(ms, pan) with the padded scene tensors")
        logits = self.logits(*inputs)
        if self.manifest["arity"] == "quad":
            b = inputs[0].shape[0] // 4
            logits = logits[:b] + logits[b:2 * b]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def class_map(self, ms, pan):
        """Map artifacts only: one call -> the (H, W) int32 class map
        for the whole scene (every pixel classified; the reference
        color() product, solver/mainsolver.py:155-201)."""
        if not self.is_map:
            raise ValueError(
                f"class_map is the whole-scene serving surface; this "
                f"artifact is per-anchor arity "
                f"{self.manifest['arity']!r} — use predict()")
        return self._exported.call(self.params, ms, pan)


def read_manifest(path: str | os.PathLike) -> dict[str, Any]:
    """Read only the manifest from a ``.dmx`` — no jax, no program
    deserialization.  Lets consumers resolve config/platform choices
    BEFORE anything can initialize a backend (ADVICE r4: `dmfusion-infer`
    used to deserialize the program first, so ``--set device=cpu`` could
    be applied too late)."""
    with zipfile.ZipFile(path) as zf:
        return json.loads(zf.read("manifest.json"))


def load_artifact(path: str | os.PathLike) -> LoadedClassifier:
    from flax import serialization
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read("manifest.json"))
        if manifest.get("format") != ARTIFACT_FORMAT:
            raise ValueError(
                f"{path}: artifact format {manifest.get('format')!r} is not "
                f"supported by this loader (expected {ARTIFACT_FORMAT})")
        exported = jexport.deserialize(zf.read("program.bin"))
        payload = serialization.msgpack_restore(zf.read("params.msgpack"))
    params = payload["tree"] if "tree" in payload else payload
    return LoadedClassifier(exported, params, manifest)


def main(argv: list[str] | None = None) -> None:
    """``dmfusion-export``: package a trained run as a serving artifact."""
    import argparse

    ap = argparse.ArgumentParser(prog="dmfusion-export")
    ap.add_argument("--config", default=None)
    ap.add_argument("--city", default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    ap.add_argument("--weights", default=None,
                    help="trained checkpoint (best/current msgpack); "
                         "omit only with --random-init")
    ap.add_argument("--random-init", action="store_true",
                    help="export freshly initialized params (smoke tests)")
    ap.add_argument("--batch", type=int, default=None,
                    help="fix the batch dim (default: symbolic)")
    ap.add_argument("--map", action="store_true", dest="map_route",
                    help="export the whole-scene conv map route of a "
                         "MAP_PROGRAMS model (gmfnet_conv) instead of "
                         "the per-anchor forward")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    if args.weights is None and not args.random_init:
        ap.error("--weights is required (or pass --random-init)")

    from dmfusion.cli import _nest, _parse_value
    overrides: dict[str, Any] = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = _parse_value(value)
    overrides = _nest(overrides)
    if args.city:
        overrides["data_city"] = args.city
    if args.model:
        overrides["model_name"] = args.model

    import jax

    from dmfusion.config import load_config
    from dmfusion.models import build_model
    from dmfusion.train.checkpoint import load_checkpoint

    cfg = load_config(args.config, overrides=overrides)
    if str(cfg.get("device", "")).lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    from dmfusion.models.registry import model_arity
    model = build_model(cfg)
    arity = model_arity(cfg["model_name"])
    ps = int(cfg["patch_size"])
    if arity == "dense":
        # Conv/head params are scene-size independent (DensePrograms.
        # init): a tiny dummy scene keeps init instant even for a
        # 50M-px city artifact.
        init_inputs = [jnp.zeros((2 * ps, 2 * ps, 4), jnp.float32),
                       jnp.zeros((8 * ps, 8 * ps, 1), jnp.float32), ps]
    else:
        init_inputs = [jnp.zeros(s.shape, s.dtype) for s in
                       _resolve_specs(arity, ps, batch=1)]
    params = model.init(jax.random.PRNGKey(int(cfg.get("seed", 0))),
                        *init_inputs)["params"]
    if args.weights is not None:
        # Same identity stamp the solvers write (solvers/main.py
        # ``_ckpt_meta``): refuse weights from a different model/width.
        params = load_checkpoint(
            args.weights, params,
            expect={"model": str(cfg["model_name"]),
                    "width": int(cfg.get("model_width", 0) or 0)},
            lenient=bool(cfg.get("train", {}).get("pretrained_lenient")))
    manifest = save_artifact(args.out, cfg, params, batch=args.batch,
                             platforms=args.platforms.split(","),
                             map_route=args.map_route)
    print(json.dumps({"out": args.out, **{k: manifest[k] for k in (
        "model_name", "arity", "patch_size", "categories", "platforms")}}))


if __name__ == "__main__":
    main()
