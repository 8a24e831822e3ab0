from dmfusion.solvers.base import BaseSolver  # noqa: F401
from dmfusion.solvers.main import Solver  # noqa: F401


def build_solver(cfg):
    """Solver factory: ``cfg['solver']`` selects 'main' or 'twostage'
    (the reference switches by editing test.py:10-11)."""
    kind = str(cfg.get("solver", "main")).lower()
    if kind == "main":
        return Solver(cfg)
    if kind in ("twostage", "tostage", "dqtl"):
        from dmfusion.solvers.twostage import TwoStageSolver
        return TwoStageSolver(cfg)
    raise ValueError(f"unknown solver {kind!r}")
