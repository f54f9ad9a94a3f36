"""Fused Pallas GLS kernel vs the XLA reference path (interpret mode).

The Pallas kernel (ops/pallas_gls.py) must reproduce the batched XLA
kernel exactly: primal residual (full tau) and the custom_jvp tangent
(frozen-tau linearization — the reference's Newton Jacobian treatment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.fem.mesh import hyper_cube
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.solvers.gls import GLSOperator, StabFlags
from softx_2020_200_tpu.ops.pallas_gls import PallasGLS
from softx_2020_200_tpu.ops.operators import gather_elements


@pytest.mark.parametrize("dim,refine", [
    (2, 2),                                            # fast smoke
    # refine 1 exercises every 3D term; interpret cost scales 8x per
    # refine and parity is mesh-size-independent (slow tier diet)
    pytest.param(3, 1, marks=pytest.mark.slow),
])
def test_pallas_matches_xla(dim, refine):
    mesh = hyper_cube(0.0, 1.0, colorize=True, dim=dim).refine_uniform(refine)
    space = FESpace(mesh, 1)
    nu = 0.05
    op = GLSOperator(space, nu=nu, dtype=jnp.float32)
    op_frozen = GLSOperator(space, nu=nu, stab=StabFlags(frozen_tau=True),
                            dtype=jnp.float32)
    pg = PallasGLS(space, nu=nu, interpret=True)
    N, c = space.n_nodes, dim + 1
    E = space.n_elements
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((N, c)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((N, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    fq = jnp.asarray(rng.standard_normal((E, op.n_q, dim)).astype(np.float32))
    a0, sdt = 2.0, 4.0

    C = op.consts()
    ue = gather_elements(u, C["elem_nodes"])
    upe = gather_elements(prev, C["elem_nodes"])
    r_xla = op._batched_kernel(
        jnp.transpose(ue, (1, 2, 0)), C["xe_soa"],
        jnp.transpose(upe, (1, 2, 0)), jnp.transpose(fq, (1, 2, 0)),
        a0, sdt)
    r_xla = jnp.transpose(r_xla, (2, 0, 1)).reshape(E, -1)

    ue2, up2, fq2 = pg.to_rows(ue), pg.to_rows(upe), pg.to_rows(fq)
    r_p = pg.from_rows(pg.residual_rows(ue2, up2, fq2, a0, sdt))
    scale = float(jnp.abs(r_xla).max())
    assert float(jnp.abs(r_p - r_xla).max()) / scale < 5e-6

    # tangent: frozen-tau linearization
    Cf = op_frozen.consts()
    due = gather_elements(v, Cf["elem_nodes"])
    f = lambda w: op_frozen._batched_kernel(
        w, Cf["xe_soa"], jnp.transpose(upe, (1, 2, 0)),
        jnp.transpose(fq, (1, 2, 0)), a0, sdt)
    dr_xla = jax.jvp(f, (jnp.transpose(ue, (1, 2, 0)),),
                     (jnp.transpose(due, (1, 2, 0)),))[1]
    dr_xla = jnp.transpose(dr_xla, (2, 0, 1)).reshape(E, -1)
    g = lambda w: pg.residual_rows(w, up2, fq2, a0, sdt)
    dr_p = pg.from_rows(jax.jvp(g, (ue2,), (pg.to_rows(due),))[1])
    scale = float(jnp.abs(dr_xla).max())
    assert float(jnp.abs(dr_p - dr_xla).max()) / scale < 5e-6


@pytest.mark.slow
def test_pallas_solver_path_couette():
    """enable_pallas() end-to-end on the Couette solve (interpret mode)."""
    from tests.test_gls_steady import make_solver, COUETTE_BCS
    s = make_solver(refine=2, extra=COUETTE_BCS)
    s.op.enable_pallas(interpret=True)
    s._solve_jit = jax.jit(s._solve_impl)
    u, res = s.solve_steady(verbose=False)
    ev, ep = s.l2_errors(u)
    assert ev < 1e-5   # f32 pallas path


@pytest.mark.slow
def test_pallas_solver_bf16_state_converges_same():
    """End-to-end Couette solve under 'jacobian state precision = bf16'
    (linear-solver deck option, parameters.py): the frozen Jacobian
    linearization state is stored bf16 and accumulated f32 on the MXU,
    while the primal residual stays f32 — so inexact Newton converges
    to the SAME solution as the f32-state run, only through a rounded
    Jacobian.  This is the production configuration measured by
    bench.py's headline matvec row."""
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from tests.test_gls_steady import make_solver, COUETTE_BCS

    prm = SimulationParameters.from_text(
        "subsection linear solver\n"
        "  set jacobian state precision = bf16\nend\n", dim=2)
    assert prm.linear_solver.jacobian_state_precision == "bf16"

    s = make_solver(refine=2, extra=COUETTE_BCS)
    s.op.enable_pallas(interpret=True, state_dtype=jnp.bfloat16)
    s._solve_jit = jax.jit(s._solve_impl)
    u, res = s.solve_steady(verbose=False)
    ev, ep = s.l2_errors(u)
    assert ev < 1e-5   # same bar as the f32-state pallas solve above


@pytest.mark.slow
def test_pallas_tangent_bf16_state():
    """bf16 linearization-state tangent (linear solver 'jacobian state
    precision = bf16'): same frozen-tau matvec with the FROZEN state
    rows stored bf16 and cast to f32 in VMEM — a rounded-coefficient
    Jacobian.  Must track the f32 tangent to bf16 coefficient accuracy
    (~1e-2 relative) while the primal residual stays bitwise f32."""
    dim, refine = 2, 2
    mesh = hyper_cube(0.0, 1.0, colorize=True, dim=dim).refine_uniform(refine)
    space = FESpace(mesh, 1)
    nu = 0.05
    op = GLSOperator(space, nu=nu, dtype=jnp.float32)
    pg32 = PallasGLS(space, nu=nu, interpret=True)
    pg16 = PallasGLS(space, nu=nu, interpret=True,
                     state_dtype=jnp.bfloat16)
    N, c = space.n_nodes, dim + 1
    E = space.n_elements
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((N, c)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((N, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    fq = jnp.asarray(rng.standard_normal(
        (E, op.n_q, dim)).astype(np.float32))
    a0, sdt = 2.0, 4.0
    C = op.consts()
    ue = gather_elements(u, C["elem_nodes"])
    upe = gather_elements(prev, C["elem_nodes"])
    due = gather_elements(v, C["elem_nodes"])
    ue2, up2, fq2 = pg32.to_rows(ue), pg32.to_rows(upe), pg32.to_rows(fq)
    due2 = pg32.to_rows(due)

    # primal residual identical (bf16 applies to the tangent state only)
    r32 = pg32.from_rows(pg32.residual_rows(ue2, up2, fq2, a0, sdt))
    r16 = pg16.from_rows(pg16.residual_rows(ue2, up2, fq2, a0, sdt))
    np.testing.assert_array_equal(np.asarray(r32), np.asarray(r16))

    g32 = lambda w: pg32.residual_rows(w, up2, fq2, a0, sdt)
    g16 = lambda w: pg16.residual_rows(w, up2, fq2, a0, sdt)
    d32 = pg32.from_rows(jax.jvp(g32, (ue2,), (due2,))[1])
    d16 = pg16.from_rows(jax.jvp(g16, (ue2,), (due2,))[1])
    scale = float(jnp.abs(d32).max())
    rel = float(jnp.abs(d16 - d32).max()) / scale
    assert rel < 2e-2, rel          # bf16 coefficient rounding
    assert rel > 1e-7, rel          # and it actually took effect
