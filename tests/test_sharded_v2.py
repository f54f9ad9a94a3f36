"""Round-2 sharded-solver features: sources, pallas kernel, GMG, and the
device-resident transient driver — all against single-device parity
(the reference's ``mpirun=N`` golden convention, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver
from softx_2020_200_tpu.core.bdf import bdf_coefficients

MMS_DECK = """
subsection simulation control
  set method        = bdf2
  set time step     = 0.1
  set time end      = 0.3
end
subsection physical properties
  set kinematic viscosity = 0.1
end
subsection FEM
  set velocity order = {order}
end
subsection mesh
  set type               = dealii
  set grid type          = hyper_cube
  set grid arguments     = 0 : 1 : true
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
  subsection uvwp
    set Function expression = exp(-t)*y*y; 0; exp(-t)*x
  end
end
subsection non-linear solver
  set verbosity      = quiet
  set tolerance      = 1e-10
  set max iterations = 8
end
subsection linear solver
  set verbosity         = quiet
  set relative residual = 1e-6
  set minimum residual  = 1e-13
end
subsection test
  set enable = true
end
"""


def make_mms_solver(refine=2, order=2):
    prm = SimulationParameters.from_text(
        MMS_DECK.format(refine=refine, order=order), dim=2)
    return GLSNavierStokesSolver(prm)


def _single_step(s, dt=0.1):
    """One single-device BDF1 step with the MMS source at t=dt."""
    u0 = s.initial_condition()
    u_ref, res = s.solve_transient_step(u0, [u0, u0, u0], dt, [dt], 1,
                                        verbose=False)
    return u0, u_ref, res


@pytest.mark.parametrize("kernel", ["xla", "pallas_interpret"])
def test_sharded_mms_source_parity(kernel):
    """1-vs-8 parity of one BDF1 step WITH the MMS forcing active —
    regression for the r1 fq-zeroing (parallel/sharded.py:261)."""
    # interpret-mode pallas costs ~10x per matvec: pin the same fq
    # plumbing (incl. the sl_perm element permutation) on the Q1
    # lattice kernel instead of Q2 rows — 271 s -> ~40 s
    order = 1 if kernel == "pallas_interpret" else 2
    s = make_mms_solver(order=order)
    dt = 0.1
    u0, u_ref, res = _single_step(s, dt)

    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:8],
                                      kernel=kernel)
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * u0[:, :2])
    u_par, hist, iters, lin = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    # pallas converges through the frozen-tau Jacobian (the reference's
    # Newton treatment): iterates differ, both residuals < 1e-10
    tol = 1e-8 if kernel == "xla" else 1e-6
    err = np.abs(u_par - np.asarray(u_ref)).max()
    assert err < tol, f"sharded source parity ({kernel}): {err}"
    if kernel != "xla":
        return   # the source-activity check below is kernel-independent
    # the solution must differ from the no-source answer (source active)
    sh_nosrc = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:8], stab=s.op.stab,
        newton=s.newton_cfg, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np)
    u_nos, *_ = sh_nosrc.solve(np.asarray(u0), uprev_combo_global=combo,
                               alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    assert np.abs(u_nos - u_par).max() > 1e-6


def test_sharded_gmg_parity_and_strength():
    """Sharded replicated-coarse GMG: parity with the single-device
    answer and a real iteration-count win over block-Jacobi."""
    from softx_2020_200_tpu.ops.multigrid import build_hierarchy
    s = make_mms_solver(refine=3, order=1)     # 8x8 lattice
    dt = 0.1
    u0, u_ref, res = _single_step(s, dt)
    mg = build_hierarchy(s, min_elems=2)
    assert len(mg[0]) >= 2, "test mesh should build a hierarchy"

    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:4],
                                      precond="gmg")
    # from_solver builds its own hierarchy when precond_kind says gmg;
    # here s.precond_kind is block_jacobi so pass mg explicitly
    sh = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="gmg", mg=mg,
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np)
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * u0[:, :2])
    u_par, hist, iters, lin_mg = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    # enclosed flow: pressure is defined up to a constant, and a
    # different preconditioner lands on a different constant — compare
    # velocity exactly and pressure mean-shifted
    d = s.dim
    err_v = np.abs(u_par[:, :d] - np.asarray(u_ref)[:, :d]).max()
    dp = u_par[:, d] - np.asarray(u_ref)[:, d]
    err_p = np.abs(dp - dp.mean()).max()
    assert err_v < 1e-9, f"sharded gmg velocity parity: {err_v}"
    assert err_p < 1e-9, f"sharded gmg pressure parity: {err_p}"

    sh_bj = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="block_jacobi",
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np)
    _, _, _, lin_bj = sh_bj.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    assert lin_mg < lin_bj, (lin_mg, lin_bj)

    # K-cycle (mg cycle = k): the root-wrapped coarse correction
    # (level_offset=1 in the sharded sub-hierarchy) reaches the same
    # solution in no more iterations than the V-shape
    sh_k = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="gmg", mg=mg, mg_cycle="k",
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np)
    u_k, _, _, lin_k = sh_k.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    err_vk = np.abs(u_k[:, :d] - np.asarray(u_ref)[:, :d]).max()
    assert err_vk < 1e-9, f"sharded k-cycle velocity parity: {err_vk}"
    assert lin_k <= lin_mg + 2, (lin_k, lin_mg)


def test_sharded_gmg_q2_pmg_krylov_parity():
    """Q2 sharded GMG with the p-coarsened hierarchy (Q1 level on the
    SAME lattice before h-coarsening) and the GMRES(m) krylov fine
    smooth — the sharded mirror of make_vcycle(smoother='krylov').
    Pins 1-vs-4 parity plus an iteration win over block-Jacobi (the
    measured Q2 fix, docs/VALIDATION.md round-4 table)."""
    from softx_2020_200_tpu.ops.multigrid import build_hierarchy
    s = make_mms_solver(refine=3, order=2)
    dt = 0.1
    u0, u_ref, res = _single_step(s, dt)
    mg = build_hierarchy(s, min_elems=2)
    # the p-level: degree drops to 1 on the SAME element lattice
    assert mg[0][1].space.degree == 1
    assert mg[0][1].space.n_elements == s.space.n_elements

    sh = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="gmg", mg=mg,
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np, mg_smoother="krylov")
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * u0[:, :2])
    u_par, hist, iters, lin_mg = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    d = s.dim
    err_v = np.abs(u_par[:, :d] - np.asarray(u_ref)[:, :d]).max()
    dp = u_par[:, d] - np.asarray(u_ref)[:, d]
    err_p = np.abs(dp - dp.mean()).max()
    assert err_v < 1e-9, f"sharded q2 pmg velocity parity: {err_v}"
    assert err_p < 1e-9, f"sharded q2 pmg pressure parity: {err_p}"

    sh_bj = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="block_jacobi",
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np)
    _, _, _, lin_bj = sh_bj.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    assert lin_mg < lin_bj, (lin_mg, lin_bj)


def make_adapted_mms_solver(refine=3, order=1, marks=(9, 36)):
    """MMS solver on a Kelly-style ADAPTED forest mesh (non-conforming
    faces -> hanging constraints).

    ``marks`` must be INTERIOR leaves: refining a boundary cell changes
    the interpolation of the Dirichlet data on that edge, and the
    all-Dirichlet system loses discrete mass compatibility (the net
    interpolated flux of y^2 no longer cancels) — the residual then has
    a component outside range(J) and every Newton variant stalls at the
    incompatibility level.  Same behavior as the reference; not a bug."""
    deck = MMS_DECK.replace(
        "subsection test",
        "subsection mesh adaptation\n"
        "  set type = kelly\n"
        "end\nsubsection test")
    prm = SimulationParameters.from_text(
        deck.format(refine=refine, order=order), dim=2)
    s = GLSNavierStokesSolver(prm)
    leaves = s.forest.all_leaves()
    s.forest.refine([leaves[i] for i in marks])
    s.forest.balance()
    mesh, elem_of, ncf = s.forest.build_mesh()
    s._elem_of = elem_of
    s.setup(mesh=mesh, nc_faces=ncf)
    assert s.hc.n > 0, "adapted mesh should have hanging nodes"
    return s


@pytest.mark.parametrize("order", [1, 2])
def test_sharded_adapted_mesh_parity(order):
    """1-vs-8 parity of a BDF1 step on an ADAPTED (hanging-node) mesh —
    the sharded step applies the localized constraint rows (VERDICT r2
    missing #2: sharded AMR)."""
    s = make_adapted_mms_solver(order=order)
    dt = 0.1
    u0, u_ref, res = _single_step(s, dt)
    # the single-device answer satisfies the constraints
    uc = s.hc.distribute(u_ref)
    assert float(jnp.abs(uc - u_ref).max()) < 1e-12

    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:8])
    assert sh.hc is not None
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * u0[:, :2])
    u_par, hist, iters, lin = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    err = np.abs(u_par - np.asarray(u_ref)).max()
    assert err < 1e-8, f"sharded adapted-mesh parity: {err}"


def test_sharded_adapted_gmg_parity():
    """Sharded GMG (forest hierarchy, interpolation injection + coarse
    hanging rows) on an adapted mesh: 1-vs-4 parity."""
    from softx_2020_200_tpu.ops.multigrid import build_hierarchy
    s = make_adapted_mms_solver(refine=3, order=1,
                                marks=(9, 18, 27, 36))
    dt = 0.1
    u0, u_ref, res = _single_step(s, dt)
    mg = build_hierarchy(s, min_elems=2)
    assert len(mg[0]) >= 2
    sh = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:4], stab=s.op.stab,
        newton=s.newton_cfg, precond="gmg", mg=mg,
        source_fn=s._mms_source, bc_exprs=s.bh.function_entries,
        bc_mask=s.bh.mask_np, hc=s.hc)
    alpha = bdf_coefficients(1, [dt])
    combo = np.asarray(alpha[1] * u0[:, :2])
    u_par, hist, iters, lin_mg = sh.solve(
        np.asarray(u0), uprev_combo_global=combo,
        alpha0=float(alpha[0]), sdt=1.0 / dt, t=dt)
    d = s.dim
    err_v = np.abs(u_par[:, :d] - np.asarray(u_ref)[:, :d]).max()
    dp = u_par[:, d] - np.asarray(u_ref)[:, d]
    err_p = np.abs(dp - dp.mean()).max()
    assert err_v < 1e-8, f"sharded adapted gmg velocity parity: {err_v}"
    assert err_p < 1e-7, f"sharded adapted gmg pressure parity: {err_p}"


def test_sharded_transient_driver_parity():
    """3 BDF2 steps (order ramp) through the device-resident sharded
    driver == the single-device time loop, with MMS source + moving
    Dirichlet values; state never leaves the device between steps."""
    s = make_mms_solver(refine=2, order=2)
    dt = 0.1
    u0 = s.initial_condition()

    # single-device loop (mirrors run_transient's ramp)
    u = u0
    previous = [u0, u0, u0]
    for k in range(3):
        t = (k + 1) * dt
        order = min(2, k + 1)
        u, _ = s.solve_transient_step(u, previous, t,
                                      [dt] * max(1, order), order,
                                      verbose=False)
        previous = [u] + previous[:2]

    sh = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:8])
    u_stack = sh.to_local(np.asarray(u0))
    u_fin = sh.run_transient(u_stack, dt, 3, order=2)
    u_par = sh.to_global(u_fin)
    err = np.abs(u_par - np.asarray(u)).max()
    assert err < 1e-8, f"sharded transient driver parity: {err}"

    # and the MMS solution is actually tracked
    ev, ep = s.l2_errors(jnp.asarray(u_par), 3 * dt)
    assert ev < 5e-3
