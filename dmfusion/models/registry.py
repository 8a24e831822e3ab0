"""Dynamic model registry.

The reference loads models by name with
``importlib.import_module('model.' + net_name)`` expecting a class
``Net`` (solver/mainsolver.py:31-34) — but ships no ``model/`` directory
at all (SURVEY.md §0).  Here the same dynamic-import contract is kept
(``dmfusion.models.<name>.Net``), every name the reference's config
mentions resolves to a concrete implementation, and external modules can
also register themselves via :func:`register`.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Mapping

_EXPLICIT: dict[str, Callable] = {}

# Names referenced by the upstream config (config.yml:6-8) mapped to our
# module files where the spelling differs.
_ALIASES = {
    "vision_transformer": "vit",
    "swin_transformer": "swin",
    "swin_t_dual": "swin_dual",
}


def register(name: str) -> Callable:
    def deco(cls):
        _EXPLICIT[name.lower()] = cls
        return cls
    return deco


def get_model_class(name: str):
    key = name.lower()
    if key in _EXPLICIT:
        return _EXPLICIT[key]
    module_name = _ALIASES.get(key, key)
    try:
        mod = importlib.import_module(f"dmfusion.models.{module_name}")
    except ImportError:
        # Fall back to a user-provided top-level module, mirroring the
        # reference's `model.<name>` convention.
        try:
            mod = importlib.import_module(f"model.{module_name}")
        except ImportError:
            raise ValueError(
                f"unknown model {name!r}: no dmfusion.models.{module_name} "
                f"or model.{module_name} module found; available: "
                f"{available_models()}") from None
    return mod.Net


def build_model(cfg: Mapping[str, Any], name: str | None = None):
    """Instantiate ``Net(cfg)`` for ``cfg['model_name']`` (or ``name``)."""
    cls = get_model_class(name or cfg["model_name"])
    return cls(cfg=dict(cfg))


# Model input contract: how the solver gathers and feeds patches.
#   dual  -> model(ms, pan)             (dataset_dual role)
#   tri   -> model(ms, pan, mspan)      (dataset_tri role, IHS stream)
#   quad  -> model(x4)                  (dataset_qua_dqtl role)
#   image -> model(img)                 (GAN tiles)
_ARITY = {
    "tri_net": "tri",
    "dqtl": "quad",
    "generator": "image",
    "discriminator": "image",
}


def model_arity(name: str) -> str:
    key = name.lower()
    if key in _ARITY:
        return _ARITY[key]
    module_name = _ALIASES.get(key, key)
    try:
        mod = importlib.import_module(f"dmfusion.models.{module_name}")
        return getattr(mod, "ARITY", "dual")
    except ImportError:
        return "dual"


def model_map_programs(name: str) -> str | None:
    """Optional map-route programs family a model module declares
    (``MAP_PROGRAMS``): "convmap" -> train/steps.py::ConvMapPrograms
    renders full-scene maps convolutionally (models/gmfnet_conv.py)."""
    key = name.lower()
    module_name = _ALIASES.get(key, key)
    try:
        mod = importlib.import_module(f"dmfusion.models.{module_name}")
        return getattr(mod, "MAP_PROGRAMS", None)
    except ImportError:
        return None


def available_models() -> list[str]:
    return sorted(set(list(_EXPLICIT) + [
        "gmfnet", "gmfnet_conv", "resnet18", "cross_net",
        "vision_transformer", "swin_transformer", "swin_t_dual",
        "ct_lstm", "dqtl", "tri_net", "dense_fusion", "generator",
        "discriminator",
    ]))
