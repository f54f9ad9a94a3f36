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
        self.write_output(x)
        return x

    def write_output(self, x):
        """VTU field output on the velocity space (pressure interpolated
        from the Qk space onto the Q(k+1) nodes for visualization)."""
        import os
        import numpy as np
        import jax.numpy as jnp
        from ..utils.vtu import write_vtu, subcell_connectivity
        sc = self.prm.simulation_control
        if sc.output_frequency <= 0:
            return
        op = self.op
        v, p = op.split(x)
        # interpolate pressure to the velocity nodes: evaluate the Qk
        # pressure basis at the Q(k+1) node positions inside each element
        Bp_at_vn, _, _ = op.space_p.basis.tabulate(op.space_v.basis.nodes)
        pe = np.asarray(p)[op.space_p.elem_nodes]           # [E, nnp]
        p_at_vn = np.einsum("nk,ek->en", Bp_at_vn, pe)      # [E, nnv]
        p_nodes = np.zeros(op.Nv)
        counts = np.zeros(op.Nv)
        np.add.at(p_nodes, op.space_v.elem_nodes.reshape(-1),
                  p_at_vn.reshape(-1))
        np.add.at(counts, op.space_v.elem_nodes.reshape(-1), 1.0)
        p_nodes /= np.maximum(counts, 1.0)
        cells = subcell_connectivity(op.space_v.elem_nodes,
                                     op.space_v.degree, self.dim)
        name = f"{sc.output_name}.{self.control.iteration:05d}.vtu"
        write_vtu(os.path.join(sc.output_path, name),
                  op.space_v.nodes, cells,
                  {"velocity": np.asarray(v), "pressure": p_nodes})


def main(argv=None) -> int:
    return run_app(2, argv, solver_cls=_GDDriver)


if __name__ == "__main__":
    raise SystemExit(main())
