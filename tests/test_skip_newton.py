"""Skip-Newton (frozen-preconditioner) tests — reference
SkipNewtonNonLinearSolver (SURVEY.md §2.1)."""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver


def cavity_prm(solver, skip=3):
    deck = f"""
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = 0.01
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 4
end
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
subsection non-linear solver
  set verbosity = quiet
  set solver = {solver}
  set skip iterations = {skip}
  set tolerance = 1e-8
  set max iterations = 15
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set preconditioner = block_jacobi
end
"""
    return SimulationParameters.from_text(deck, dim=2)


def test_skip_newton_converges_to_same_solution():
    s1 = GLSNavierStokesSolver(cavity_prm("newton"))
    u1, r1 = s1.solve_steady(verbose=False)
    s2 = GLSNavierStokesSolver(cavity_prm("skip_newton", skip=3))
    u2, r2 = s2.solve_steady(verbose=False)
    # both converge below tolerance to the same flow
    assert float(r1.res_history[int(r1.n_iterations)]) < 1e-8
    assert float(r2.res_history[int(r2.n_iterations)]) < 1e-8
    a, b = np.asarray(u1), np.asarray(u2)
    err_v = np.abs(a[:, :2] - b[:, :2]).max()
    assert err_v < 1e-6, f"skip-newton velocity drifted: {err_v}"
    # pressure agrees up to the (arbitrary) enclosed-flow gauge constant
    dp = (a[:, 2] - a[:, 2].mean()) - (b[:, 2] - b[:, 2].mean())
    assert np.abs(dp).max() < 1e-5
    # the frozen preconditioner may cost extra Krylov iterations but the
    # Newton path (exact J.v) must not fall apart
    assert int(r2.n_iterations) <= int(r1.n_iterations) + 3
