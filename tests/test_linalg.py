"""Krylov solver unit tests (reference: Trilinos GMRES/BiCGStab slot,
SURVEY.md §3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.ops.linalg import gmres, bicgstab


def make_system(n=60, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) / np.sqrt(n)
    if spd:
        A = A @ A.T + 2 * np.eye(n)
    else:
        A = A + 3 * np.eye(n)       # well-conditioned nonsymmetric
    x_true = rng.standard_normal(n)
    b = A @ x_true
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(x_true)


def test_gmres_nonsymmetric():
    A, b, x_true = make_system()
    x, rnorm, iters = gmres(lambda v: A @ v, b, m=30, max_restarts=10,
                            atol=1e-10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-6, atol=1e-8)
    assert float(rnorm) < 1e-9


def test_gmres_under_jit_and_restart():
    A, b, x_true = make_system(n=80, seed=1)

    @jax.jit
    def solve(b):
        return gmres(lambda v: A @ v, b, m=10, max_restarts=40, atol=1e-9)

    x, rnorm, iters = solve(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-5, atol=1e-6)
    assert int(iters) > 10   # forced through restarts


def test_gmres_with_preconditioner_converges_faster():
    A, b, x_true = make_system(n=100, seed=2, spd=True)
    # scale rows to make Jacobi meaningful
    D = jnp.asarray(np.geomspace(1, 1000, 100))
    A = A * D[:, None]
    b = A @ x_true
    x1, r1, it1 = gmres(lambda v: A @ v, b, m=50, max_restarts=20, atol=1e-8)
    diag = jnp.diagonal(A)
    x2, r2, it2 = gmres(lambda v: A @ v, b, precond=lambda v: v / diag,
                        m=50, max_restarts=20, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_true),
                               rtol=1e-4, atol=1e-5)
    assert int(it2) < int(it1)


def test_gmres_zero_rhs():
    A, b, x_true = make_system()
    x, rnorm, iters = gmres(lambda v: A @ v, jnp.zeros_like(b), atol=1e-12)
    assert float(jnp.max(jnp.abs(x))) == 0.0
    assert int(iters) == 0


def test_bicgstab():
    A, b, x_true = make_system(n=50, seed=3)
    x, rnorm, iters = bicgstab(lambda v: A @ v, b, atol=1e-10,
                               max_iters=500)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-6, atol=1e-7)


def test_newton_stops_at_noise_floor():
    """Floor-stagnation guard (NewtonConfig.stall_rate): a residual with
    an O(eps) non-smooth noise term stalls at ||R|| ~ eps; the driver
    must stop after `stall_iterations` no-progress steps instead of
    burning max_iterations (measured flagship behavior, f32 floor —
    scripts/diag_newton_rate.py)."""
    from softx_2020_200_tpu.solvers.newton import (NewtonConfig,
                                                   newton_solve)

    eps = 1e-6
    b = jnp.asarray(np.linspace(0.7, 1.3, 8))[:, None]

    @jax.custom_jvp
    def residual(u):
        # smooth part solves to u = b; the sin term is an O(eps)
        # noise floor.  Its derivative is NOT in the tangent (like f32
        # roundoff noise, it is invisible to the linearization).
        return (u - b) + eps * jnp.sin(u / eps)

    @residual.defjvp
    def _jvp(primals, tangents):
        (u,), (du,) = primals, tangents
        return residual(u), du

    cfg = NewtonConfig(tolerance=1e-12, max_iterations=60,
                       relative_residual=1e-6)
    res = newton_solve(residual, jnp.zeros_like(b),
                       precond_builder=lambda u: (lambda v: v),
                       config=cfg)
    rn = float(res.res_history[res.n_iterations])
    assert rn < 50 * eps                       # reached the floor
    assert int(res.n_iterations) < 45          # stopped there, did not
    #                                            grind to max_iterations
    # best-iterate guarantee: the returned u is (at least) as good as
    # every iterate the walk visited
    rn_ret = float(jnp.sqrt(jnp.sum(residual(res.u) ** 2)))
    assert rn_ret <= 1.001 * float(jnp.nanmin(res.res_history))


def test_newton_stall_guard_does_not_fire_on_healthy_solve():
    """The guard must not clip a normally converging Newton: smooth
    problem reaches `tolerance` exactly as before."""
    from softx_2020_200_tpu.solvers.newton import (NewtonConfig,
                                                   newton_solve)

    b = jnp.asarray(np.linspace(0.5, 1.5, 6))[:, None]

    def residual(u):
        return u ** 3 + u - b

    cfg = NewtonConfig(tolerance=1e-10, max_iterations=30,
                       relative_residual=1e-10)
    res = newton_solve(residual, jnp.zeros_like(b),
                       precond_builder=lambda u: (lambda v: v),
                       config=cfg)
    assert float(res.res_history[res.n_iterations]) <= 1e-10
