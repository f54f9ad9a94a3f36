"""Shared CLI driver for the solver applications."""

from __future__ import annotations

import sys

from ..core.parameters import SimulationParameters
from ..solvers.base import GLSNavierStokesSolver


def run_app(dim: int, argv: list[str] | None = None,
            solver_cls=GLSNavierStokesSolver) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        prog = f"gls_navier_stokes_{dim}d"
        print(f"Usage: {prog} <parameter-file.prm>", file=sys.stderr)
        return 1
    prm = SimulationParameters.from_file(argv[0], dim=dim)
    solver = solver_cls(prm)
    solver.solve()
    return 0
