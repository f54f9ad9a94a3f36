"""StructuredLayout gather/scatter: adjointness and round-trips.

Regression tests for the periodic fold-back (the wrapped halo is exactly
one layer; degree>=2 must not broadcast it onto k layers) and for basic
consistency of the strided-window path against the general gather/scatter
(ops/operators.py) it replaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.ops.structured import StructuredLayout
from softx_2020_200_tpu.ops.operators import (gather_elements,
                                              scatter_add_elements)


def _make(dim, degree, periodic_axes, n=4):
    mesh = subdivided_hyper_rectangle([0.0] * dim, [1.0] * dim, n,
                                      colorize=True, dim=dim)
    for a in periodic_axes:
        mesh.periodic.append((2 * a, 2 * a + 1, a))
    space = FESpace(mesh, degree)
    return space, StructuredLayout(space)


@pytest.mark.parametrize("dim,degree,paxes", [
    (2, 1, ()), (2, 2, ()), (2, 1, (0,)), (2, 2, (0,)),
    (2, 2, (0, 1)), (2, 3, (1,)), (3, 2, (0, 2)),
])
def test_gather_scatter_adjointness(dim, degree, paxes):
    """<gather(u), r> == <u, scatter(r)> for every (dim, degree, periodic)."""
    space, sl = _make(dim, degree, paxes)
    c = dim + 1
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, c)))
    rows = [jnp.asarray(rng.standard_normal(sl.E)) for _ in range(sl.nn * c)]

    g = sl.gather_rows_list(u)
    lhs = sum(float(jnp.vdot(gi, ri)) for gi, ri in zip(g, rows))
    s = sl.scatter_rows_list(rows, c)
    rhs = float(jnp.vdot(u, s))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))


@pytest.mark.parametrize("dim,degree,paxes", [
    (2, 2, (0,)), (2, 2, (0, 1)), (3, 2, (1,)),
])
def test_matches_general_gather_scatter(dim, degree, paxes):
    """Strided path == index-based gather/scatter on the same space."""
    space, sl = _make(dim, degree, paxes)
    c = dim + 1
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, c)))

    # gather: reorder the general result into the layout's element order
    # by matching element node coordinates
    ue_gen = gather_elements(u, jnp.asarray(space.elem_nodes))  # [E, nn, c]
    rows = sl.gather_rows_list(u)
    # build the element permutation: layout element order vs space order
    xg = sl.elem_coords_grid_order()          # [E, nn, dim] layout order
    xs = space.element_coords()               # [E, nn, dim] space order
    key_g = np.round(xg.mean(axis=1) * 1e9).astype(np.int64)
    key_s = np.round(xs.mean(axis=1) * 1e9).astype(np.int64)
    og = np.lexsort(key_g.T)
    os_ = np.lexsort(key_s.T)
    perm = np.empty(sl.E, dtype=np.int64)     # layout idx -> space idx
    perm[og] = os_
    for n in range(sl.nn):
        for i in range(c):
            got = np.asarray(rows[n * c + i])
            want = np.asarray(ue_gen[perm, n, i])
            assert np.allclose(got, want, atol=1e-12), (n, i)

    # scatter: random element rows through both paths
    re = jnp.asarray(rng.standard_normal((sl.E, sl.nn, c)))
    rows_in = [re[:, n, i] for n in range(sl.nn) for i in range(c)]
    got = np.asarray(sl.scatter_rows_list(rows_in, c))
    want = np.asarray(scatter_add_elements(
        jnp.asarray(np.asarray(re)[perm]),
        jnp.asarray(space.elem_nodes), space.n_nodes))
    assert np.allclose(got, want, atol=1e-10)


def test_structured_pallas_source_ordering():
    """residual_free on the structured Pallas path must consume fq in the
    SPACE element order (same as qpts_phys) — regression for the grid/space
    element-order mix-up with active source terms."""
    import jax.numpy as jnp
    from softx_2020_200_tpu.solvers.gls import GLSOperator

    space, _ = _make(2, 1, (), n=4)
    nu = 0.1
    op_ref = GLSOperator(space, nu=nu, dtype=jnp.float64)
    op_sl = GLSOperator(space, nu=nu, dtype=jnp.float64)
    op_sl.enable_pallas(interpret=True, structured=True)

    rng = np.random.default_rng(11)
    N, c, E = space.n_nodes, 3, space.n_elements
    u = jnp.asarray(rng.standard_normal((N, c)) * 0.2)
    prev = jnp.asarray(rng.standard_normal((N, 2)) * 0.1)
    # a source that VARIES ACROSS ELEMENTS (constant one would hide the bug)
    fq = jnp.asarray(rng.standard_normal((E, op_ref.n_q, 2)))

    r_ref = op_ref.residual_free(u, prev, fq, 1.0, 2.0)
    r_sl = op_sl.residual_free(u, prev, fq, 1.0, 2.0, C=op_sl.consts())
    assert float(jnp.abs(r_sl - r_ref).max()) < 1e-10 * float(
        jnp.abs(r_ref).max() + 1.0)
