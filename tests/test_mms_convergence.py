"""MMS spatial and temporal convergence tests (BASELINE config #2,
reference §3.5 call stack: uniform-refine cycles + L2 error tables).

Spatial: steady Kovasznay-style manufactured solution on the unit square
with autodiff-derived forcing; expected L2 orders ~ k+1 for velocity.
Temporal: 2D Taylor-Green decay (exact NS solution, no forcing) stepped
with BDF1/BDF2; expected orders ~ 1 / 2.
Also the Taylor-Couette exact solution on the curved annulus (manifold +
function BCs on curved boundaries).
"""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

pytestmark = pytest.mark.slow  # physics tier: run with -m slow / full suite

MMS_DECK = """
subsection simulation control
  set method = steady
  set number mesh adapt = {cycles}
end
subsection physical properties
  set kinematic viscosity = 1.0
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
subsection mesh adaptation
  set type = uniform
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
  subsection bc 2
    set id = 2
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
end
subsection source term
  set enable = true
  subsection xyz
    set Function expression = mms
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = sin(pi*x)^2 * sin(2*pi*y); -sin(2*pi*x) * sin(pi*y)^2; x^4 - y^4
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-11
  set max iterations = 12
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-5
  set minimum residual = 1e-13
end
"""


def run_mms_cycles(order, refine, cycles):
    prm = SimulationParameters.from_text(
        MMS_DECK.format(order=order, refine=refine, cycles=cycles), dim=2)
    s = GLSNavierStokesSolver(prm)
    s.solve()
    return s.tables["L2"]


def orders_from_table(tab, key):
    errs = np.array([row[key] for row in tab])
    return np.log2(errs[:-1] / errs[1:])


def test_mms_spatial_order_q1():
    tab = run_mms_cycles(order=1, refine=3, cycles=2)
    rates = orders_from_table(tab, "error_velocity")
    # Q1 velocity: L2 order ~ 2
    assert rates[-1] > 1.8, f"Q1 velocity rates {rates}"


def test_mms_spatial_order_q2():
    tab = run_mms_cycles(order=2, refine=2, cycles=2)
    rates = orders_from_table(tab, "error_velocity")
    # Q2 velocity: L2 order ~ 3
    assert rates[-1] > 2.7, f"Q2 velocity rates {rates}"
    prates = orders_from_table(tab, "error_pressure")
    assert prates[-1] > 1.7, f"Q2 pressure rates {prates}"


# ---------------------------------------------------------------- transient

# Space-exact manufactured solution (u in the Q2 space) so the measured
# L2 error is PURELY temporal: u = e^{-t} (y^2, 0), p = e^{-t} x,
# forcing derived by autodiff ('mms').
TRANSIENT_MMS_DECK = """
subsection simulation control
  set method = {method}
  set time step = {dt}
  set time end = {tend}
end
subsection physical properties
  set kinematic viscosity = 0.1
end
subsection FEM
  set velocity order = 2
  set pressure order = 2
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = {refine}
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 2
    set id = 2
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
end
subsection initial conditions
  set type = nodal
  subsection uvwp
    set Function expression = y*y; 0; x
  end
end
subsection source term
  set enable = true
  subsection xyz
    set Function expression = mms
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = exp(-t)*y*y; 0; exp(-t)*x
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-11
  set max iterations = 10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-5
  set minimum residual = 1e-13
end
"""


def transient_mms_error(method, dt, tend=0.5, refine=2,
                        history_from_exact=False):
    prm = SimulationParameters.from_text(
        TRANSIENT_MMS_DECK.format(method=method, dt=dt, tend=tend,
                                  refine=refine), dim=2)
    s = GLSNavierStokesSolver(prm)
    u = s.run_transient(verbose=False,
                        history_from_exact=history_from_exact)
    ev, ep = s.l2_errors(u, t=s.control.time)
    return ev


def test_bdf1_temporal_order():
    e1 = transient_mms_error("bdf1", 0.1)
    e2 = transient_mms_error("bdf1", 0.05)
    rate = np.log2(e1 / e2)
    assert 0.8 < rate < 1.3, f"BDF1 rate {rate} ({e1}, {e2})"


def test_bdf2_temporal_order():
    e1 = transient_mms_error("bdf2", 0.1)
    e2 = transient_mms_error("bdf2", 0.05)
    rate = np.log2(e1 / e2)
    # >= 2nd order required; superconvergence for this smooth solution ok
    assert 1.6 < rate < 3.6, f"BDF2 rate {rate} ({e1}, {e2})"


def test_bdf3_temporal_order_exact_history():
    e1 = transient_mms_error("bdf3", 0.1, history_from_exact=True)
    e2 = transient_mms_error("bdf3", 0.05, history_from_exact=True)
    rate = np.log2(e1 / e2)
    assert 2.5 < rate < 4.6, f"BDF3 rate {rate} ({e1}, {e2})"


# ------------------------------------------------------- Taylor-Couette

TC_DECK = """
subsection simulation control
  set method = steady
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
    set type = noslip
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = -(-(0.25*0.25/(1-0.25*0.25))*y + (0.25*0.25/(1-0.25*0.25))*y/(x*x+y*y)); (-(0.25*0.25/(1-0.25*0.25))*x + (0.25*0.25/(1-0.25*0.25))*x/(x*x+y*y)); 0.00222222222222*(x*x+y*y) - 0.00444444444444*log(x*x+y*y) - 0.00222222222222/(x*x+y*y)
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
  set max iterations = 10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-5
  set minimum residual = 1e-12
end
"""


def taylor_couette_exact_utheta(r, ri=0.25, ro=1.0, omega=1.0):
    # u_theta = A r + B / r with noslip outer, omega-rotating inner
    A = -omega * ri**2 / (ro**2 - ri**2)
    B = omega * ri**2 * ro**2 / (ro**2 - ri**2)
    return A * r + B / r


def test_taylor_couette_q2():
    """Rotating inner cylinder, fixed outer: exact u_theta = Ar + B/r.
    Exercises curved manifolds + function BCs on curved boundaries."""
    errs = []
    for refine in (1, 2):
        prm = SimulationParameters.from_text(
            TC_DECK.format(refine=refine), dim=2)
        s = GLSNavierStokesSolver(prm)
        u, res = s.solve_steady()
        ev, ep = s.l2_errors(u)
        errs.append(ev)
    rate = np.log2(errs[0] / errs[1])
    assert errs[1] < 2e-3
    assert rate > 2.3, f"Taylor-Couette Q2 rate {rate} ({errs})"
