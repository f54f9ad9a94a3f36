"""3D Taylor-Green vortex smoke/physics test (BASELINE config #4).

Small mesh, few steps: fully-periodic 3D transient path, KE decay
direction, dissipation-rate consistency:  dE/dt ~ -eps with
eps = nu <grad u : grad u> (exact for periodic NS).
"""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
from softx_2020_200_tpu.solvers import postprocessing as post

pytestmark = pytest.mark.slow  # physics tier: run with -m slow / full suite


def tgv_deck(n=8, dt=0.05, tend=0.2, nu=0.01):
    L = 2 * np.pi
    return f"""
subsection simulation control
  set method = bdf2
  set time step = {dt}
  set time end = {tend}
  set output frequency = 0
end
subsection physical properties
  set kinematic viscosity = {nu}
end
subsection mesh
  set type = dealii
  set grid type = subdivided_hyper_rectangle
  set grid arguments = {n}, {n}, {n} : 0, 0, 0 : {L}, {L}, {L} : true
end
subsection boundary conditions
  set number = 3
  subsection bc 0
    set id = 0
    set type = periodic
    set periodic_id = 1
    set periodic_direction = 0
  end
  subsection bc 1
    set id = 2
    set type = periodic
    set periodic_id = 3
    set periodic_direction = 1
  end
  subsection bc 2
    set id = 4
    set type = periodic
    set periodic_id = 5
    set periodic_direction = 2
  end
end
subsection initial conditions
  set type = nodal
  subsection uvwp
    set Function expression = sin(x)*cos(y)*cos(z); -cos(x)*sin(y)*cos(z); 0; 0.0625*(cos(2*x)+cos(2*y))*(cos(2*z)+2)
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-8
  set max iterations = 8
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-10
end
"""


def test_tgv3d_periodic_short_run():
    prm = SimulationParameters.from_text(tgv_deck(n=12), dim=3)
    s = GLSNavierStokesSolver(prm)
    # fully periodic: no Dirichlet dofs at all
    assert not bool(np.asarray(s.bh.mask).any())
    u0 = s.initial_condition()
    ke0 = float(post.kinetic_energy(s.op, u0))
    # TGV initial mean KE = 1/8; the Q1 interpolant on 12 cells per
    # period carries a noticeable interpolation deficit
    assert ke0 == pytest.approx(0.125, rel=0.15)

    kes, eps = [], []

    def on_step(solver, u, t):
        kes.append(float(post.kinetic_energy(solver.op, u)))
        eps.append(float(post.ke_dissipation_rate(solver.op, u)))

    u = s.run_transient(u0=u0, on_step=on_step, verbose=False)
    assert np.isfinite(np.asarray(u)).all()
    kes = np.array([ke0] + kes)
    # energy decays monotonically at these parameters
    assert np.all(np.diff(kes) < 0)
    # dissipation consistency: dE/dt ~ -eps within discretization slop
    dt = 0.05
    dEdt = (kes[2:] - kes[1:-1]) / dt
    rel = np.abs(dEdt + np.array(eps[1:])) / np.abs(eps[1:])
    assert rel.max() < 0.25, f"dissipation mismatch {rel}"
