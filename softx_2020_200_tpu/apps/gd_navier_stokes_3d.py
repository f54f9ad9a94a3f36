"""3D grad-div Taylor-Hood application (reference:
applications/gd_navier_stokes_3d — SURVEY.md §2.3)."""

from .common import run_app
from ..solvers.gd import GDNavierStokesSolver


def main(argv=None) -> int:
    return run_app(3, argv, solver_cls=GDNavierStokesSolver)


if __name__ == "__main__":
    raise SystemExit(main())
