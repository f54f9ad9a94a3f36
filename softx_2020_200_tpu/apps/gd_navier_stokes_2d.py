"""2D grad-div Taylor-Hood application (reference:
applications/gd_navier_stokes_2d — SURVEY.md §2.3)."""

from .common import run_app
from ..solvers.gd import GDNavierStokesSolver


class _GDDriver(GDNavierStokesSolver):
    def solve(self):
        x, res = self.solve_steady()
        if self.exact is not None:
            ev, ep = self.l2_errors(x)
            prec = self.prm.simulation_control.log_precision
            print(f"L2 error velocity : {ev:.{prec}e}  "
                  f"L2 error pressure: {ep:.{prec}e}")
        return x


def main(argv=None) -> int:
    return run_app(2, argv, solver_cls=_GDDriver)


if __name__ == "__main__":
    raise SystemExit(main())
