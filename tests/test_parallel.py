"""Distributed-solve tests on the 8-virtual-device CPU mesh.

The TPU-native analogue of the reference's ``mpirun=2`` golden variants
(SURVEY.md §4): the same problem solved on 1 device and on N shards must
agree to solver tolerance — this exercises partitioning, ghost exchange,
distributed reductions, and the sharded preconditioner.
"""

import jax
import numpy as np
import pytest

from softx_2020_200_tpu.parallel.partition import (
    morton_order, partition_space)
from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver
from softx_2020_200_tpu.solvers.newton import NewtonConfig


def test_morton_order_locality():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, size=(256, 2))
    order = morton_order(pts)
    # successive elements along the curve are spatially close on average
    d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1)
    d_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert d.mean() < 0.5 * d_rand.mean()


def couette_setup(refine=3):
    from tests.test_gls_steady import make_solver, COUETTE_BCS
    s = make_solver(refine=refine, extra=COUETTE_BCS)
    return s


def test_partition_covers_everything():
    s = couette_setup()
    lay = partition_space(s.space, 8)
    # every element exactly once
    assert int(lay.elem_valid.sum()) == s.space.n_elements
    # every node owned exactly once
    own_g = lay.l2g[lay.owned_mask > 0]
    assert own_g.size == s.space.n_nodes
    assert np.unique(own_g).size == s.space.n_nodes
    # round trip
    rng = np.random.default_rng(1)
    u = rng.standard_normal((s.space.n_nodes, 3))
    np.testing.assert_array_equal(lay.to_global(lay.to_local(u)), u)


@pytest.mark.parametrize("n_shards", [
    pytest.param(2, marks=pytest.mark.slow),
    8,
])
def test_sharded_matches_single_device(n_shards):
    """1-vs-N device golden parity on the steady Couette solve."""
    s = couette_setup()
    u_ref, res = s.solve_steady(verbose=False)

    sh = ShardedGLSSolver(
        s.space, nu=s.op.nu, devices=jax.devices()[:n_shards],
        stab=s.op.stab, newton=s.newton_cfg)
    u0 = np.zeros((s.space.n_nodes, 3))
    mask = np.asarray(s.bh.mask)
    vals = np.asarray(s.bh.values(0.0))
    u_par, hist, iters, lin = sh.solve(u0, mask, vals)

    # same physics to solver tolerance
    err = np.abs(u_par - np.asarray(u_ref)).max()
    assert err < 5e-8, f"1-vs-{n_shards} device mismatch {err}"
    assert iters <= int(res.n_iterations) + 2


@pytest.mark.slow
def test_sharded_transient_step_matches_single_device():
    """One BDF1 step sharded over 4 devices == single-device step."""
    import jax.numpy as jnp
    s = couette_setup(refine=2)
    u0 = s.initial_condition()
    dt = 0.05
    u_ref, res = s.solve_transient_step(
        u0, [u0, u0, u0], dt, [dt], 1, verbose=False)

    sh = ShardedGLSSolver(s.space, nu=s.op.nu,
                          devices=jax.devices()[:4], stab=s.op.stab,
                          newton=s.newton_cfg)
    from softx_2020_200_tpu.core.bdf import bdf_coefficients
    alpha = bdf_coefficients(1, [dt])
    combo = alpha[1] * u0[:, :2]
    u_par, hist, iters, lin = sh.solve(
        np.asarray(u0), np.asarray(s.bh.mask),
        np.asarray(s.bh.values(dt)), np.asarray(combo),
        alpha0=float(alpha[0]), sdt=1.0 / dt)
    err = np.abs(u_par - np.asarray(u_ref)).max()
    assert err < 5e-8, f"transient sharded mismatch {err}"


@pytest.mark.slow
def test_sharded_exact_linear_solution():
    """The sharded solve reproduces the exact Couette field."""
    s = couette_setup(refine=2)
    sh = ShardedGLSSolver(s.space, nu=s.op.nu, stab=s.op.stab,
                          newton=s.newton_cfg)
    u0 = np.zeros((s.space.n_nodes, 3))
    u_par, hist, iters, lin = sh.solve(
        u0, np.asarray(s.bh.mask), np.asarray(s.bh.values(0.0)))
    exact_u = s.space.nodes[:, 1]
    np.testing.assert_allclose(u_par[:, 0], exact_u, atol=1e-8)
    np.testing.assert_allclose(u_par[:, 1], 0.0, atol=1e-8)
