"""CLI driver — the ``python test.py`` equivalent (reference test.py:7-14).

Usage:
    python -m dmfusion.cli [--config config.yml] [--solver main|twostage]
                           [--model NAME] [--city CITY] [--set key=value ...]

Seeds, renders the config (allocating a result slot), builds the solver
and runs the repeat loop.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any


def _parse_value(text: str) -> Any:
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return text


def _nest(flat: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for key, value in flat.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="dmfusion")
    ap.add_argument("--config", default=None,
                    help="YAML config path (defaults to built-in schema)")
    ap.add_argument("--solver", default=None, choices=["main", "twostage"])
    ap.add_argument("--model", default=None, help="model_name override")
    ap.add_argument("--city", default=None, help="data_city override")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="dotted config overrides, e.g. schedule.lr=1e-4")
    args = ap.parse_args(argv)

    overrides: dict[str, Any] = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = _parse_value(value)
    overrides = _nest(overrides)
    if args.solver:
        overrides["solver"] = args.solver
    if args.model:
        overrides["model_name"] = args.model
    if args.city:
        overrides["data_city"] = args.city

    from dmfusion.config import load_config
    cfg = load_config(args.config, overrides=overrides, prepare=True)

    # Honor the device knob (reference cfg['device'], config.yml:29): an
    # explicit 'cpu' forces the host platform (useful for debugging even
    # when a TPU plugin pinned the default platform at interpreter
    # start); anything else keeps the environment's accelerator default —
    # TPU plugins register under varying platform names, so forcing 'tpu'
    # would break tunneled/plugin setups.
    if str(cfg.get("device", "")).lower() == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized

    # NaN sanitizer (SURVEY §5 race-detection/sanitizers row): the
    # jit-purity analog of cudnn determinism knobs.
    if cfg.get("debug", {}).get("nans"):
        import jax
        jax.config.update("jax_debug_nans", True)

    # Multi-host: must run before any backend touch so every process
    # joins the global device view (no-op single-process).
    from dmfusion.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(cfg)

    from dmfusion.solvers import build_solver
    solver = build_solver(cfg)
    solver.run()

    # Hard-exit once all work (checkpoints, reports, maps) is on disk:
    # remote-TPU plugin backends can leave non-daemon tunnel threads that
    # hang interpreter teardown indefinitely (observed: >10 min after the
    # last artifact was written).  Set DMFUSION_NO_HARD_EXIT=1 to opt out.
    if os.environ.get("DMFUSION_NO_HARD_EXIT") != "1":
        import sys
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
