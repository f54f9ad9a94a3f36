"""2D grad-div Taylor-Hood application (reference:
applications/gd_navier_stokes_2d — SURVEY.md §2.3).

Steady AND transient decks run through the solver's own orchestration
(``GDNavierStokesSolver.solve()``): BDF/SDIRK time loop, forces/torque
and KE/enstrophy tables, VTU/PVD output, checkpoint/restart.
"""

from .common import run_app
from ..solvers.gd import GDNavierStokesSolver


def main(argv=None) -> int:
    return run_app(2, argv, solver_cls=GDNavierStokesSolver)


if __name__ == "__main__":
    raise SystemExit(main())
