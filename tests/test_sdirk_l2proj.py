"""SDIRK time stepping + L2-projection initial conditions
(reference: sdirk stage sequencing in iterate(), IC type L2projection —
SURVEY.md §2.1/§2.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

pytestmark = pytest.mark.slow  # physics tier: run with -m slow / full suite


def sdirk_error(method, dt, tend=0.5):
    from tests.test_mms_convergence import TRANSIENT_MMS_DECK
    text = TRANSIENT_MMS_DECK.format(method=method, dt=dt, tend=tend,
                                     refine=2)
    prm = SimulationParameters.from_text(text, dim=2)
    s = GLSNavierStokesSolver(prm)
    u = s.run_transient(verbose=False)
    ev, ep = s.l2_errors(u, t=s.control.time)
    return ev


def test_sdirk2_temporal_order():
    e1 = sdirk_error("sdirk2", 0.1)
    e2 = sdirk_error("sdirk2", 0.05)
    rate = np.log2(e1 / e2)
    assert 1.6 < rate < 3.6, f"SDIRK2 rate {rate} ({e1}, {e2})"
    # and it is accurate in absolute terms on the space-exact field
    assert e2 < 5e-4


def test_sdirk3_beats_sdirk2():
    e2 = sdirk_error("sdirk2", 0.1)
    e3 = sdirk_error("sdirk3", 0.1)
    assert e3 < 0.5 * e2, f"SDIRK3 {e3} should beat SDIRK2 {e2}"


def test_l2_projection_ic():
    """For a field NOT in the FE space the L2 projection differs from
    nodal interpolation and has a smaller L2 error."""
    deck = """
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 3
end
subsection initial conditions
  set type = {kind}
  subsection uvwp
    set Function expression = sin(2*pi*x)*sin(2*pi*y); 0; 0
  end
end
subsection analytical solution
  set enable = true
  set verbosity = quiet
  subsection uvwp
    set Function expression = sin(2*pi*x)*sin(2*pi*y); 0; 0
  end
end
"""
    errs = {}
    for kind in ("nodal", "L2projection"):
        prm = SimulationParameters.from_text(deck.format(kind=kind), dim=2)
        s = GLSNavierStokesSolver(prm)
        u0 = s.initial_condition()
        ev, ep = s.l2_errors(u0)
        errs[kind] = ev
    assert errs["L2projection"] < errs["nodal"]
    assert errs["L2projection"] < 0.05
