"""Steady GLS solver functional tests.

TPU-native analogue of the reference's applications_tests golden decks
(SURVEY.md §4): small meshes, exact/manufactured solutions, checks on
Newton convergence and L2 errors.
"""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

BASE = """
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = {nu}
end
subsection FEM
  set velocity order = {order}
  set pressure order = {order}
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = {refine}
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
  set max iterations = 12
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-13
  set preconditioner = {precond}
end
{extra}
"""

COUETTE_BCS = """
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = y
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = y
    end
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = 1
    end
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = y; 0; 0
  end
end
"""

POISEUILLE_BCS = """
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = noslip
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = 4*y*(1-y); 0; -8*{nu}*x
  end
end
"""


def make_solver(nu=0.1, order=1, refine=3, precond="block_jacobi", extra=""):
    deck = BASE.format(nu=nu, order=order, refine=refine, precond=precond,
                       extra=extra)
    prm = SimulationParameters.from_text(deck, dim=2)
    return GLSNavierStokesSolver(prm)


def test_couette_exact_q1():
    """Linear shear flow is in the Q1 space: machine-precision solve."""
    s = make_solver(extra=COUETTE_BCS)
    u, res = s.solve_steady()
    ev, ep = s.l2_errors(u)
    assert int(res.n_iterations) <= 6
    assert ev < 1e-9
    assert ep < 1e-8


def test_poiseuille_exact_q2():
    """Parabolic velocity + linear pressure in the Q2-Q2 space."""
    nu = 0.05
    s = make_solver(nu=nu, order=2, refine=2,
                    extra=POISEUILLE_BCS.format(nu=nu))
    u, res = s.solve_steady()
    ev, ep = s.l2_errors(u)
    assert ev < 1e-8
    assert ep < 1e-7


def test_poiseuille_q1_converges_spatially():
    """Q1 interpolation error halves at ~2nd order under refinement."""
    nu = 0.1
    errs = []
    for r in (2, 3):
        s = make_solver(nu=nu, order=1, refine=r,
                        extra=POISEUILLE_BCS.format(nu=nu))
        u, _ = s.solve_steady()
        ev, ep = s.l2_errors(u)
        errs.append(ev)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, f"velocity convergence rate {rate}"


@pytest.mark.parametrize("precond", ["jacobi", "block_jacobi",
                                     "additive_schwarz"])
def test_preconditioners_all_converge(precond):
    s = make_solver(precond=precond, extra=COUETTE_BCS)
    u, res = s.solve_steady()
    ev, _ = s.l2_errors(u)
    assert ev < 1e-8


def test_block_jacobi_no_worse_than_jacobi():
    s1 = make_solver(precond="jacobi", extra=COUETTE_BCS)
    _, r1 = s1.solve_steady()
    s2 = make_solver(precond="block_jacobi", extra=COUETTE_BCS)
    _, r2 = s2.solve_steady()
    assert int(r2.linear_iters) <= int(r1.linear_iters)


def test_lid_driven_cavity_coarse():
    """Cavity Re=100 on a coarse mesh: sanity physics (vortex direction,
    velocity bounds) — the full Ghia comparison runs in the benchmark
    suite (BASELINE.md config #1)."""
    extra = """
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = noslip
  end
  subsection bc 1
    set id = 1
    set type = noslip
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = 1
    end
  end
end
"""
    s = make_solver(nu=0.01, refine=4, extra=extra)
    u, res = s.solve_steady()
    un = np.asarray(u)
    # no blowup; interior velocities bounded by lid speed
    interior_max = np.abs(un[:, :2]).max()
    assert interior_max <= 1.0 + 1e-6
    # center-ish node: u should be negative (return flow below the lid)
    nodes = s.space.nodes
    center = np.argmin(np.linalg.norm(nodes - [0.5, 0.45], axis=1))
    assert un[center, 0] < 0.0
    assert int(res.n_iterations) < 12
