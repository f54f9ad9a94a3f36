"""Rotated base-cell adjacency in the forest (VERDICT r1 #2).

A two-cell base mesh whose second cell's local frame is rotated 90
degrees exercises the face-transform machinery: neighbor lookup, 2:1
balancing across the seam, and hanging constraints that reproduce
linear fields exactly.  The cylinder O-ring mesh (2 rotated pairs at
the seam) must now build a forest and adapt.
"""

import numpy as np
import pytest

from softx_2020_200_tpu.fem.mesh import Mesh
from softx_2020_200_tpu.fem.forest import Forest
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.fem.constraints import build_hanging_constraints


def rotated_two_cell_mesh():
    """[0,1]^2 + [1,2]x[0,1]; the right cell's local frame is rotated:
    (xi, eta) -> (1 + eta, 1 - xi), det = +1."""
    verts = np.array([
        [0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],   # cell A
        [2.0, 0.0], [2.0, 1.0],                           # cell B extras
    ])
    cells = np.array([
        [0, 1, 2, 3],
        [3, 1, 5, 4],     # corners at local (0,0),(1,0),(0,1),(1,1)
    ])
    bfaces = []  # no boundary ids needed for these tests
    return Mesh(dim=2, vertices=verts, cells=cells,
                boundary_faces=np.asarray(bfaces,
                                          dtype=np.int64).reshape(-1, 3))


def test_rotated_adjacency_transform():
    f = Forest(rotated_two_cell_mesh())
    entry = f._adjacency[(0, 1)]
    b2, f2, perm, flip = entry
    assert (b2, f2) == (1, 2)
    # A's tangent axis y maps to B's axis 0, flipped
    assert perm[1] == 0 and flip[1] is True
    # neighbor lookup round-trips geometrically: refine both cells once,
    # the A-leaf at (1, 1, y) borders the B-leaf whose physical box
    # touches it
    f.refine(f.all_leaves())
    got = f._neighbor(0, (1, 1, 0), 1)       # A leaf x+ face, y=0 row
    assert got is not None
    b2, leaf2, face2, perm2, flip2 = got
    assert b2 == 1 and face2 == 2
    # A leaf (1,1,0) covers y in [0, 0.5]; in B, y = 1 - xi so xi in
    # [0.5, 1] -> i0 = 1; eta = x - 1 = 0 -> i1 = 0
    assert leaf2 == (1, 1, 0)


def test_balance_across_rotated_seam():
    f = Forest(rotated_two_cell_mesh())
    # refine cell B hard near the seam (eta = 0 edge of B)
    f.refine([(1, (0, 0, 0))])
    f.refine([(1, (1, 0, 0)), (1, (1, 1, 0))])
    f.refine([(1, (2, 0, 0))])
    f.balance()
    # cell A must have been refined at the seam: no level-0 leaf left
    assert (0, 0, 0) not in f.leaves[0]
    mesh, elem_of, ncf = f.build_mesh()
    # every interior face is conforming or 2:1
    assert len(ncf) > 0


@pytest.mark.parametrize("degree", [1, 2])
def test_hanging_constraints_rotated_linear_exact(degree):
    """A linear field interpolated on the adapted rotated mesh must be
    reproduced exactly by the hanging constraints (the coarse trace of
    a linear function is linear)."""
    f = Forest(rotated_two_cell_mesh())
    f.refine([(0, (0, 0, 0))])       # refine A once -> seam hangs
    f.balance()
    mesh, elem_of, ncf = f.build_mesh()
    assert len(ncf) > 0
    space = FESpace(mesh, degree)
    hc = build_hanging_constraints(space, ncf)
    assert hc.n > 0
    import jax.numpy as jnp
    x = space.nodes
    u = jnp.asarray((1.5 * x[:, 0] - 0.7 * x[:, 1] + 0.3)[:, None])
    v = hc.distribute(u)
    err = float(jnp.abs(v - u).max())
    assert err < 1e-12, err
    if degree == 2:
        uq = jnp.asarray((x[:, 0] * x[:, 1] + x[:, 1] ** 2)[:, None])
        vq = hc.distribute(uq)
        assert float(jnp.abs(vq - uq).max()) < 1e-12


def test_cylinder_mesh_forest_builds_and_adapts():
    """The flagship cylinder O-ring mesh (2 rotated seam pairs) now
    builds a forest, refines at the cylinder, balances, and produces
    valid hanging constraints."""
    from softx_2020_200_tpu.fem.mesh import channel_with_cylinder
    base = channel_with_cylinder()
    f = Forest(base)
    # refine the cells nearest the cylinder (smallest elements)
    mesh0, elem_of0, _ = f.build_mesh()
    cent = mesh0.vertices[mesh0.cells].mean(axis=1)
    r = np.linalg.norm(cent - np.array([0.2, 0.2]), axis=1)
    order = f.all_leaves()
    marked = [order[i] for i in np.argsort(r)[:8]]
    f.refine(marked)
    f.balance()
    mesh, elem_of, ncf = f.build_mesh()
    assert mesh.n_cells > base.n_cells
    space = FESpace(mesh, 1)
    hc = build_hanging_constraints(space, ncf)
    # linear reproduction across every hanging face, incl. any at the
    # rotated seam
    import jax.numpy as jnp
    x = space.nodes
    u = jnp.asarray((0.8 * x[:, 0] + 2.0 * x[:, 1] - 1.0)[:, None])
    v = hc.distribute(u)
    assert float(jnp.abs(v - u).max()) < 1e-12


def test_kelly_nonconforming_and_rotated():
    """Kelly on an adapted mesh: a smooth field's estimator must be
    finite and SMALL on non-conforming faces for fields the coarse
    space reproduces (linear); a kinked field must flag the kink cells,
    including across the rotated seam."""
    import jax.numpy as jnp
    from softx_2020_200_tpu.solvers.kelly import kelly_estimate
    from softx_2020_200_tpu.solvers.gls import GLSOperator

    f = Forest(rotated_two_cell_mesh())
    f.refine([(0, (0, 0, 0))])
    f.balance()
    mesh, elem_of, ncf = f.build_mesh()
    space = FESpace(mesh, 1)
    op = GLSOperator(space, nu=1.0)
    x = space.nodes

    # linear field: zero jumps everywhere (incl. nc + rotated faces)
    u_lin = jnp.asarray(np.stack(
        [x[:, 0] + 2 * x[:, 1], 0 * x[:, 0], 0 * x[:, 0]], axis=-1))
    eta = kelly_estimate(op, u_lin, nc_faces=ncf)
    assert float(np.max(eta)) < 1e-10

    # kinked field |x - 1|: gradient jumps at the rotated seam x = 1
    u_kink = jnp.asarray(np.stack(
        [np.abs(x[:, 0] - 1.0), 0 * x[:, 0], 0 * x[:, 0]], axis=-1))
    eta2 = kelly_estimate(op, u_kink, nc_faces=ncf)
    cent = mesh.vertices[mesh.cells].mean(axis=1)
    at_seam = np.abs(cent[:, 0] - 1.0) < 0.6
    assert eta2[at_seam].max() > 1e-3
    # cells away from the seam see (almost) no jump
    assert eta2[~at_seam].max() < 1e-10 + 0.0 * eta2.max()
