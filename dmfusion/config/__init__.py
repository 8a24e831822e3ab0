"""YAML config loading, self-interpolation, and run-slot management.

The reference's most distinctive subsystem is a ``config.yml`` that is its
own Jinja2 template: placeholders like ``{{dc}}``/``{{tr}}``/``{{FN}}`` in
path strings are rendered from literal values in the *same* file
(reference utils/config.py:12-41, config.yml:9,16-23,28).  We keep that
surface — the same placeholder names work — but replace the fragile
double-load with one explicit interpolation pass, and we validate the
schema up front (including the ``dqtl`` section the reference forgot to
ship; see schema.py).

Run numbering: :func:`prepare_run` reproduces ``get_dump_config``
semantics (utils/config.py:43-93): auto-increment ``FILE_NUM`` until an
unused ``<model>__<N>_result.xlsx`` / ``_output/`` slot is found, and
optionally garbage-collect orphaned output dirs that have no result
workbook next to them.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Any, Mapping

import yaml

from dmfusion.config.schema import DATA_DICT, DEFAULTS, validate  # noqa: F401

_PLACEHOLDER = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def _interp_params(cfg: Mapping[str, Any]) -> dict[str, Any]:
    """The placeholder vocabulary the reference exposes (utils/config.py:21-36)."""
    city = cfg["data_city"]
    if city not in cfg["DATA_DICT"]:
        raise ValueError(f"unknown data_city {city!r}; known: "
                         f"{sorted(cfg['DATA_DICT'])}")
    return {
        "p2": str(Path(__file__).resolve().parents[2]),
        "dc": city,
        "num": len(cfg["DATA_DICT"][city]["color"]),
        "tr": cfg["train_rate"],
        "ep": cfg["epoch"],
        "bs": cfg["batchsize"],
        "mn": cfg["model_name"],
        "FN": cfg["FILE_NUM"],
        "ne": cfg["dqtl"]["num_epochs"],
        "ps": cfg["dqtl"]["pic_size"],
        "expo_result": cfg.get("expo_result", ""),
        "parameters": cfg.get("parameters", ""),
        "RESULT": cfg.get("RESULT", ""),
    }


def _interpolate(node: Any, params: Mapping[str, Any]) -> Any:
    if isinstance(node, str):
        def sub(m: re.Match) -> str:
            name = m.group(1)
            return str(params[name]) if name in params else m.group(0)
        return _PLACEHOLDER.sub(sub, node)
    if isinstance(node, dict):
        return {k: _interpolate(v, params) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, params) for v in node]
    return node


def render_config(cfg: Mapping[str, Any]) -> dict[str, Any]:
    """Resolve ``{{...}}`` placeholders in all string values, then
    validate.

    Interpolation must precede validation: reference-style configs carry
    placeholders in numeric fields (``Categories_Number: '{{num}}'``,
    config.yml:28) that coercion would otherwise choke on.  Two passes so
    that templates referencing other templated values
    (e.g. ``RESULT_excel: '{{RESULT}}/...'``, config.yml:22) resolve.
    """
    from dmfusion.config.schema import _deep_merge
    out = _deep_merge(DEFAULTS, dict(cfg))
    for _ in range(2):
        out = _interpolate(out, _interp_params(out))
    return validate(out)


def load_config(path: str | os.PathLike | None = None,
                overrides: Mapping[str, Any] | None = None,
                prepare: bool = False) -> dict[str, Any]:
    """Load a YAML config file (or pure defaults), render, optionally
    allocate a run slot."""
    raw: dict[str, Any] = {}
    if path is not None:
        with open(path, encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        from dmfusion.config.schema import _deep_merge
        raw = _deep_merge(raw, dict(overrides)) if raw else dict(overrides)
    cfg = render_config(raw)
    if prepare:
        cfg = prepare_run(cfg)
    return cfg


def prepare_run(cfg: dict[str, Any]) -> dict[str, Any]:
    """Allocate result paths with auto-incrementing run number.

    Mirrors reference ``get_dump_config`` (utils/config.py:43-93):
      * ensure the RESULT directory exists,
      * when training, advance FILE_NUM past every occupied slot,
      * with ``delete`` set, remove orphan ``_output`` dirs lacking a
        result workbook and reuse the freed slot,
      * finally create the output dir.
    """
    cfg = dict(cfg)
    result_dir = cfg.get("RESULT") or os.path.join(
        cfg["expo_result"],
        f"{cfg['data_city']}_tr{cfg['train_rate']}_ep{cfg['epoch']}_bs{cfg['batchsize']}",
    )
    if not result_dir.endswith(os.sep) and not result_dir.endswith("/"):
        result_dir += "/"
    os.makedirs(result_dir, exist_ok=True)

    def slot_paths(num: int) -> tuple[str, str]:
        stem = f"{cfg['model_name']}__{num}"
        return (os.path.join(result_dir, stem + "_result.xlsx"),
                os.path.join(result_dir, stem + "_output/"))

    filenum = 0
    if cfg["train"]["index"]:
        excel, outdir = slot_paths(filenum)
        while os.path.exists(excel) or os.path.exists(outdir):
            filenum += 1
            excel, outdir = slot_paths(filenum)
        if cfg["train"].get("resume"):
            # Resume must land in the slot holding the interrupted
            # run's checkpoints: reuse the newest UNFINISHED slot
            # (output dir exists but the result workbook was never
            # written — the run died before its report).  Without
            # this, a fresh process always advances to an empty slot
            # and train.resume can never find `curweights`.  Finished
            # runs (workbook present) are never resumed into.
            for num in range(filenum - 1, -1, -1):
                ex, od = slot_paths(num)
                if os.path.isdir(od) and not os.path.isfile(ex):
                    filenum = num
                    break
        elif cfg.get("delete"):
            # Scan downward for orphaned output dirs (no workbook) and GC
            # them; the lowest freed slot becomes this run's number.
            for num in range(filenum - 1, -1, -1):
                ex, od = slot_paths(num)
                if os.path.isdir(od) and not os.path.isfile(ex):
                    shutil.rmtree(od)
                    filenum = num
    else:
        filenum = int(cfg.get("FILE_NUM", 0))

    excel, outdir = slot_paths(filenum)
    cfg["FILE_NUM"] = filenum
    cfg["RESULT"] = result_dir
    cfg["RESULT_excel"] = excel
    cfg["RESULT_output"] = outdir
    if cfg["train"].get("save_best", True):
        os.makedirs(outdir, exist_ok=True)
    return cfg
