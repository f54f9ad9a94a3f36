"""Host-chunked Newton driver parity (solvers/base.py _newton_chunked).

Some TPU runtimes bound single-program wall time (the axon relay kills
device programs at ~60 s — scripts/probe_tpu_fault.py); the chunked
driver runs one device program per Newton iteration.  These tests pin
that it computes the SAME solve as the fused lax.while_loop driver:
same iterates (the math is identical), same iteration counts, same
residual history.
"""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

CAVITY = """
subsection simulation control
  set method = {method}
  set time step = 0.05
  set time end = {tend}
  set output frequency = 0
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
  set tolerance = 1e-9
  set max iterations = 10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-12
  set preconditioner = {precond}
end
"""


def _run(monkeypatch, chunked, method="steady", tend=0.1,
         precond="block_jacobi"):
    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "1" if chunked else "0")
    prm = SimulationParameters.from_text(
        CAVITY.format(method=method, tend=tend, precond=precond), dim=2)
    s = GLSNavierStokesSolver(prm)
    if method == "steady":
        u, res = s.solve_steady()
        return np.asarray(u), res
    u = s.run_transient()
    return np.asarray(u), None


def test_chunked_matches_fused_steady(monkeypatch):
    u_f, res_f = _run(monkeypatch, chunked=False)
    u_c, res_c = _run(monkeypatch, chunked=True)
    assert int(res_c.n_iterations) == int(res_f.n_iterations)
    assert int(res_c.linear_iters) == int(res_f.linear_iters)
    hf = np.asarray(res_f.res_history)
    hc = np.asarray(res_c.res_history)
    # separate device programs reassociate reductions: agreement to
    # ~1e-6 relative on each residual norm, exact iterate counts
    np.testing.assert_allclose(hc[np.isfinite(hc)], hf[np.isfinite(hf)],
                               rtol=1e-5)
    np.testing.assert_allclose(u_c, u_f, atol=1e-10)


def test_chunked_matches_fused_steady_gmg(monkeypatch):
    u_f, res_f = _run(monkeypatch, chunked=False, precond="gmg")
    u_c, res_c = _run(monkeypatch, chunked=True, precond="gmg")
    assert int(res_c.n_iterations) == int(res_f.n_iterations)
    np.testing.assert_allclose(u_c, u_f, atol=1e-10)


def test_chunked_matches_fused_transient(monkeypatch):
    u_f, _ = _run(monkeypatch, chunked=False, method="bdf2", tend=0.15)
    u_c, _ = _run(monkeypatch, chunked=True, method="bdf2", tend=0.15)
    np.testing.assert_allclose(u_c, u_f, atol=1e-10)
