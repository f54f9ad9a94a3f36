"""Parity: the GD affine-lattice Pallas kernel (interpret mode) must
reproduce the SoA einsum path — primal residual and exact-Jacobian
tangent — on uniform 2D/3D lattices (reference physics:
source/solvers/gd_navier_stokes.cc weak form, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
from softx_2020_200_tpu.solvers.gd import GDOperator


def _make_op(dim, n):
    mesh = subdivided_hyper_rectangle([0.0] * dim, [1.0] * dim,
                                      [n] * dim, colorize=True)
    return GDOperator(mesh, degree_pressure=1, nu=0.01, gamma=0.7,
                      dtype=jnp.float64)


@pytest.mark.parametrize("dim,n", [(2, 5), (3, 3)])
def test_gd_lattice_parity(dim, n):
    op = _make_op(dim, n)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(op.n_dofs) * 0.3)
    vprev = jnp.asarray(rng.standard_normal((op.Nv, dim)) * 0.1)
    fq = jnp.asarray(rng.standard_normal(
        (op.space_v.n_elements, op.n_q, dim)) * 0.05)
    alpha0, sdt = 1.7, 0.0

    r_ref = op.residual_free(x, vprev, fq, alpha0, sdt)
    assert op.enable_pallas(interpret=True)
    r_pal = op.residual_free(x, vprev, fq, alpha0, sdt)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("dim,n", [(2, 4), (3, 3)])
def test_gd_lattice_tangent_parity(dim, n):
    op = _make_op(dim, n)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(op.n_dofs) * 0.3)
    dx = jnp.asarray(rng.standard_normal(op.n_dofs))
    vprev = jnp.asarray(rng.standard_normal((op.Nv, dim)) * 0.1)
    fq = jnp.zeros((op.space_v.n_elements, op.n_q, dim))
    alpha0, sdt = 2.3, 0.0

    def f_ref(w):
        return op.residual_free(w, vprev, fq, alpha0, sdt)

    t_ref = jax.jvp(f_ref, (x,), (dx,))[1]
    assert op.enable_pallas(interpret=True)

    def f_pal(w):
        return op.residual_free(w, vprev, fq, alpha0, sdt)

    t_pal = jax.jvp(f_pal, (x,), (dx,))[1]
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=1e-10, atol=1e-12)
