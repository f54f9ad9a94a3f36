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

pytestmark = pytest.mark.slow

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


def test_gmg_fallback_probation(monkeypatch):
    """Stagnation fallback is per-solve with one probation: a single
    budget-exhausted solve swaps GMG -> block-Jacobi for the REST of
    that solve only; GMG is restored at the next solve; a second
    stagnation makes the swap permanent.  (One impulsive first step
    must not doom a 700-step transient to block-Jacobi — GMG measures
    ~100x stronger on developed transient systems,
    scripts/diag_sphere_gmg.py CASE=cylinder DT=0.01.)"""
    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "1")
    deck = CAVITY.format(method="steady", tend=0.1, precond="gmg")
    deck = deck.replace(
        "set preconditioner = gmg",
        "set preconditioner = gmg\n  set max iters = 4\n"
        "  set max krylov vectors = 4")
    # refine 5: the structured hierarchy needs >=256 coarse elements
    deck = deck.replace("set initial refinement = 3",
                        "set initial refinement = 5")
    prm = SimulationParameters.from_text(deck, dim=2)
    prm.nonlinear_solver.max_iterations = 2
    s = GLSNavierStokesSolver(prm)
    assert s._mg_builder is not None

    s.solve_steady()                      # budget 4 iters: stagnates
    assert s._mg_builder is None
    assert s._gmg_strikes == 1
    assert s._gmg_stash is not None       # on probation, not permanent

    s.solve_steady()                      # probation: GMG restored,
    assert s._gmg_strikes == 2            # stagnates again ->
    assert s._mg_builder is None          # permanent fallback
    assert s._gmg_stash is not None

    s.solve_steady()                      # stays block-Jacobi
    assert s._gmg_strikes == 2
    assert s._mg_builder is None


def test_chunked_matches_fused_transient(monkeypatch):
    u_f, _ = _run(monkeypatch, chunked=False, method="bdf2", tend=0.15)
    u_c, _ = _run(monkeypatch, chunked=True, method="bdf2", tend=0.15)
    np.testing.assert_allclose(u_c, u_f, atol=1e-10)


def test_sharded_chunked_matches_fused(monkeypatch):
    """ShardedGLSSolver.solve_local_chunked computes the same solve as
    the fused sharded step (watchdog-bounded-runtime path, VERDICT r3:
    the 10M-DoF flagship runs sharded AND chunked)."""
    import jax
    import jax.numpy as jnp
    from softx_2020_200_tpu.core.bdf import bdf_coefficients
    from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver

    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "0")
    prm = SimulationParameters.from_text(
        CAVITY.format(method="steady", tend=0.1,
                      precond="block_jacobi"), dim=2)
    s = GLSNavierStokesSolver(prm)
    u0 = s.initial_condition()
    dt = 0.1
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * np.asarray(u0)[:, :2])

    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:4])
    u_f, hist_f, it_f, lin_f = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)

    u_loc = sh.to_local(np.asarray(u0))
    combo_loc = sh.to_local(combo)
    u_c, hist_c, it_c, lin_c = sh.solve_local_chunked(
        u_loc, combo_loc, t=dt, alpha0=float(alpha[0]), sdt=1.0 / dt)
    u_cg = sh.to_global(u_c)
    assert int(np.asarray(it_c)[0]) == int(it_f)
    assert int(np.asarray(lin_c)[0]) == int(lin_f)
    hc = np.asarray(hist_c)[0]
    np.testing.assert_allclose(hc[np.isfinite(hc)],
                               np.asarray(hist_f)[np.isfinite(
                                   np.asarray(hist_f))], rtol=1e-5)
    np.testing.assert_allclose(u_cg, u_f, atol=1e-10)


def test_sharded_bdf_step_chunked_dispatch(monkeypatch):
    """bdf_step under SOFTX_NEWTON_CHUNK=1 routes through the chunked
    driver and matches the fused transient step."""
    import jax
    import jax.numpy as jnp
    from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver

    prm = SimulationParameters.from_text(
        CAVITY.format(method="steady", tend=0.1,
                      precond="block_jacobi"), dim=2)
    s = GLSNavierStokesSolver(prm)
    u0 = s.initial_condition()
    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:4])
    u_loc = sh.to_local(np.asarray(u0))
    prevs = jnp.stack([u_loc, u_loc, u_loc])

    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "0")
    u_f, prevs_f, *_ = sh.bdf_step(u_loc, prevs, 0.1, [0.1], 1)
    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "1")
    u_c, prevs_c, *_ = sh.bdf_step(u_loc, prevs, 0.1, [0.1], 1)
    np.testing.assert_allclose(sh.to_global(u_c), sh.to_global(u_f),
                               atol=1e-10)
    np.testing.assert_allclose(sh.to_global(prevs_c[0]),
                               sh.to_global(prevs_f[0]), atol=1e-10)


def test_chunked_matches_fused_steady_bicgstab(monkeypatch):
    """Chunked-vs-fused parity for method = bicgstab.

    The chunked driver RESTARTS BiCGStab each cycle (rhat/rho
    recurrences re-seeded from the current iterate), which is only the
    same Krylov process as the fused driver's single bicgstab call when
    the solve finishes within one cycle — this deck's systems do, so the
    iterates must agree exactly; decks that need multiple cycles accept
    restarted-BiCGStab semantics (documented in newton_linear_cycle)."""
    deck = CAVITY.replace("set preconditioner = {precond}",
                          "set preconditioner = {precond}\n"
                          "  set method = bicgstab\n"
                          "  set max krylov vectors = 400")
    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "0")
    prm = SimulationParameters.from_text(
        deck.format(method="steady", tend=0.1,
                    precond="block_jacobi"), dim=2)
    s = GLSNavierStokesSolver(prm)
    u_f, res_f = s.solve_steady()
    monkeypatch.setenv("SOFTX_NEWTON_CHUNK", "1")
    prm = SimulationParameters.from_text(
        deck.format(method="steady", tend=0.1,
                    precond="block_jacobi"), dim=2)
    s = GLSNavierStokesSolver(prm)
    u_c, res_c = s.solve_steady()
    assert int(res_c.n_iterations) == int(res_f.n_iterations)
    # BiCGStab's coupled recurrences amplify the reduction
    # reassociation between separate device programs (GMRES is
    # least-squares stable, hence its tighter parity above); both
    # drivers converge the same Newton iterate to the linear tolerance
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_f),
                               atol=1e-6)
