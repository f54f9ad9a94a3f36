"""Slip boundary conditions + CFL-adaptive time stepping
(reference: BoundaryType::slip, SimulationControl dt adaptation —
SURVEY.md §2.1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver


def test_slip_walls_give_plug_flow():
    """Uniform inflow + slip side walls: the exact solution is plug flow
    u=(1,0) with constant pressure (no wall friction)."""
    deck = """
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 3
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 1
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = 1
    end
  end
  subsection bc 2
    set id = 2
    set type = slip
  end
  subsection bc 3
    set id = 3
    set type = slip
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = 1; 0; 0
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-5
  set minimum residual = 1e-12
end
"""
    prm = SimulationParameters.from_text(deck, dim=2)
    s = GLSNavierStokesSolver(prm)
    # slip on y-walls constrains ONLY the v component
    mask = np.asarray(s.bh.mask)
    wall_nodes = s.space.boundary_nodes[2]
    assert mask[wall_nodes, 1].all()          # normal (v) constrained
    interior_wall = [n for n in wall_nodes
                     if n not in set(s.space.boundary_nodes[0])
                     and n not in set(s.space.boundary_nodes[1])]
    assert not mask[interior_wall, 0].any()   # tangential (u) free
    u, res = s.solve_steady(verbose=False)
    ev, ep = s.l2_errors(u)
    assert ev < 1e-9, f"plug-flow error {ev}"


def test_cfl_adaptive_dt_grows():
    """With 'set adapt = true' the step size ramps up toward max cfl."""
    from tests.test_mms_convergence import TRANSIENT_MMS_DECK
    text = TRANSIENT_MMS_DECK.format(method="bdf1", dt=0.005, tend=0.2,
                                     refine=2)
    text += """
subsection timer
  set type = end
end
"""
    prm = SimulationParameters.from_text(text, dim=2)
    prm.simulation_control.adapt = True
    prm.simulation_control.max_cfl = 2.0
    prm.simulation_control.adaptative_time_step_scaling = 1.2
    s = GLSNavierStokesSolver(prm)
    dts = []
    s.run_transient(on_step=lambda sv, u, t: dts.append(sv.control.dt),
                    verbose=False)
    assert len(dts) >= 3
    # the final step is clipped to land exactly on time end -> use max
    assert max(dts) > dts[0] * 1.3, f"dt did not grow: {dts}"
    # CFL stays bounded by max cfl (within one growth factor)
    assert s.control.cfl <= 2.0 * 1.2 + 1e-6


ROTATION_SLIP_DECK = """
subsection simulation control
  set method = steady
  set output frequency = 0
end
subsection physical properties
  set kinematic viscosity = 1.0
end
subsection FEM
  set velocity order = 2
  set pressure order = 2
end
subsection mesh
  set type = dealii
  set grid type = hyper_shell
  set grid arguments = 0, 0 : 0.25 : 1 : 12 : true
  set initial refinement = {refine}
end
subsection boundary conditions
  set number = 2
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = -y
    end
    subsection v
      set Function expression = x
    end
  end
  subsection bc 1
    set id = 1
    set type = slip
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = -y*(1+1/(x*x+y*y))/17; x*(1+1/(x*x+y*y))/17; (0.5*(x*x+y*y) + log(x*x+y*y) - 0.5/(x*x+y*y))/289
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
  set max iterations = 10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-6
  set minimum residual = 1e-13
end
subsection test
  set enable = true
end
"""


@pytest.mark.slow
def test_rotated_slip_annulus():
    """Slip on the CURVED outer circle (rotated nodal-normal frames;
    the axis-aligned mask path cannot express this — it was a known gap
    in docs/INVENTORY.md).

    Exact solution for inner rotation u_theta(1/4) = 1/4 with slip +
    zero tangential pseudo-traction (the Laplacian-form natural BC:
    du_theta/dr = 0 at r = 1): u_theta = (r + 1/r)/17, with
    p' = u_theta^2 / r balancing the centripetal convection."""
    errs = []
    for refine in (1, 2):
        prm = SimulationParameters.from_text(
            ROTATION_SLIP_DECK.format(refine=refine), dim=2)
        s = GLSNavierStokesSolver(prm)
        assert s.bh.n_slip > 0, "rotated slip frames should be active"
        # nodal normals on the circle are radial
        ids = np.asarray(s.bh.slip_nodes)
        nrm = np.asarray(s.bh.slip_normals)
        radial = s.space.nodes[ids]
        radial = radial / np.linalg.norm(radial, axis=1, keepdims=True)
        align = np.abs(np.einsum("sd,sd->s", nrm, radial))
        assert align.min() > 0.999, align.min()
        u, res = s.solve_steady(verbose=False)
        ev, ep = s.l2_errors(u)
        errs.append(ev)
        # no normal flux through the slip wall
        un = np.einsum("sd,sd->s", np.asarray(u)[ids, :2], nrm)
        assert np.abs(un).max() < 1e-8
    assert errs[0] < 5e-3, f"rotated-slip annulus error {errs}"
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.0, f"rotated-slip convergence rate {rate} ({errs})"


def test_multi_axis_slip_resolves_to_masks():
    """One boundary id covering walls with DIFFERENT normals (y+- and
    z+- of a 3D channel, the config-#5 sphere deck's id 2) must resolve
    per-face-axis into plain Dirichlet mask entries, NOT the rotated
    frame path: the mask is what the GMG coarse levels and the sharded
    SPMD step consume — the rotated fallback left such walls
    unconstrained there (round-4 diagnosis, scripts/diag_sphere_gmg.py,
    sharded-vs-single Cd 0.9124 vs 0.9045 in VERDICT r3)."""
    deck = """
subsection simulation control
  set method = steady
end
subsection mesh
  set type = dealii
  set grid type = channel_with_sphere
  set grid arguments = 20.0, 5.0 : 5.0, 0.0, 0.0 : 0.5
  set initial refinement = 0
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 1
    end
  end
  subsection bc 1
    set id = 1
    set type = outlet
  end
  subsection bc 2
    set id = 2
    set type = slip
  end
  subsection bc 3
    set id = 3
    set type = noslip
  end
end
subsection test
  set enable = true
end
"""
    prm = SimulationParameters.from_text(deck, dim=3)
    s = GLSNavierStokesSolver(prm)
    assert s.bh.n_slip == 0, "axis-aligned multi-axis slip must be masked"
    m = s.bh.mask_np
    nodes = np.asarray(s.space.nodes)
    wy = np.abs(np.abs(nodes[:, 1]) - 5.0) < 1e-9
    wz = np.abs(np.abs(nodes[:, 2]) - 5.0) < 1e-9
    assert m[wy, 1].all(), "v must be constrained on the y walls"
    assert m[wz, 2].all(), "w must be constrained on the z walls"
    # tangential components stay free away from inlet/outlet/edges
    interior_y = wy & ~wz & (nodes[:, 0] > 1e-9) \
        & (nodes[:, 0] < 20 - 1e-9)
    assert not m[interior_y, 0].any(), "u must stay free on the y walls"
    assert not m[interior_y, 2].any(), "w must stay free on the y walls"


def test_ptc_matches_newton_on_steady_flow():
    """pseudo_transient (PTC/SER) must reach the same steady solution
    as plain Newton on a convective steady case."""
    deck = """
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 3
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 1
    end
  end
  subsection bc 1
    set id = 1
    set type = outlet
  end
  subsection bc 2
    set id = 2
    set type = slip
  end
  subsection bc 3
    set id = 3
    set type = slip
  end
end
subsection non-linear solver
  set tolerance = 1e-10
  set verbosity = quiet
  set solver = {solver}
end
subsection linear solver
  set relative residual = 1e-6
  set minimum residual = 1e-13
end
subsection test
  set enable = true
end
"""
    prm_n = SimulationParameters.from_text(
        deck.format(solver="newton"), dim=2)
    sn = GLSNavierStokesSolver(prm_n)
    un, _ = sn.solve_steady(verbose=False)

    prm_p = SimulationParameters.from_text(
        deck.format(solver="pseudo_transient"), dim=2)
    sp = GLSNavierStokesSolver(prm_p)
    res = sp.solve_steady_ptc(sp.initial_condition(), verbose=False)
    import numpy as _np
    h = _np.asarray(res.res_history)
    h = h[_np.isfinite(h)]
    assert h[-1] < 1e-10, f"PTC did not converge: {h[-5:]}"
    assert _np.abs(_np.asarray(un) - _np.asarray(res.u)).max() < 1e-8
