"""FEM core unit tests: quadrature exactness, basis correctness, mesh
generation/refinement, Qk DoF elevation, geometric mappings.

Mirrors the reference's tests/core tier (SURVEY.md §4): pure-function
checks against analytic values.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from softx_2020_200_tpu.fem.quadrature import (
    gauss_legendre_1d, gauss_lobatto_1d, tensor_quadrature)
from softx_2020_200_tpu.fem.basis import LagrangeBasis1D, TensorBasis
from softx_2020_200_tpu.fem.mesh import (
    hyper_cube, subdivided_hyper_rectangle, hyper_shell, generate_mesh)
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.fem.geometry import (
    mapping_jacobian, det_and_inv, face_measure_and_normal)


# ---------------------------------------------------------------- quadrature

@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_gauss_legendre_exactness(n):
    x, w = gauss_legendre_1d(n)
    for deg in range(2 * n):
        exact = 1.0 / (deg + 1)
        assert np.dot(w, x ** deg) == pytest.approx(exact, rel=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_gauss_lobatto(n):
    x, w = gauss_lobatto_1d(n)
    assert x[0] == pytest.approx(0.0, abs=1e-14)
    assert x[-1] == pytest.approx(1.0, abs=1e-14)
    for deg in range(2 * n - 3):
        assert np.dot(w, x ** deg) == pytest.approx(1.0 / (deg + 1), rel=1e-10)


def test_tensor_quadrature_ordering():
    pts, wts = tensor_quadrature(2, 2)
    assert pts.shape == (4, 2)
    # axis 0 fastest
    assert pts[0, 0] != pts[1, 0]
    assert pts[0, 1] == pts[1, 1]
    assert wts.sum() == pytest.approx(1.0)


# --------------------------------------------------------------------- basis

@pytest.mark.parametrize("deg", [1, 2, 3])
def test_lagrange_1d_cardinal(deg):
    b = LagrangeBasis1D(deg)
    V = b.eval(b.points)
    np.testing.assert_allclose(V, np.eye(deg + 1), atol=1e-12)


@pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_tensor_basis_partition_of_unity(dim, deg):
    basis = TensorBasis(dim, deg)
    pts = np.random.default_rng(1).uniform(0, 1, size=(7, dim))
    B, G, H = basis.tabulate(pts)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(G.sum(axis=1), 0.0, atol=1e-10)
    np.testing.assert_allclose(H.sum(axis=1), 0.0, atol=1e-9)


@pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 2)])
def test_tensor_basis_polynomial_exactness(dim, deg):
    """Qk interpolation reproduces any polynomial with per-axis degree<=k,
    including its gradient and Hessian."""
    basis = TensorBasis(dim, deg)
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, size=(5, dim))
    B, G, H = basis.tabulate(pts)

    def f(x):
        out = np.ones(x.shape[0])
        for d in range(dim):
            out *= (1.0 + x[:, d]) ** deg
        return out

    u = f(basis.nodes)
    # values
    np.testing.assert_allclose(B @ u, f(pts), rtol=1e-10)
    # gradient (finite-difference check)
    eps = 1e-6
    for d in range(dim):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += eps
        pm[:, d] -= eps
        fd = (f(pp) - f(pm)) / (2 * eps)
        np.testing.assert_allclose(G[:, :, d] @ u, fd, rtol=1e-5)
    # Hessian diagonal (larger step: second-difference cancellation noise)
    eps2 = 1e-4
    for d in range(dim):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += eps2
        pm[:, d] -= eps2
        fd2 = (f(pp) - 2 * f(pts) + f(pm)) / eps2 ** 2
        np.testing.assert_allclose(H[:, :, d, d] @ u, fd2,
                                   rtol=1e-3, atol=1e-4)


def test_face_nodes_and_quadrature():
    basis = TensorBasis(2, 2)
    # face 3 = y=1
    fn = basis.face_nodes(3)
    assert np.all(basis.nodes[fn][:, 1] == 1.0)
    fpts, fwts, B, G, H = basis.face_quadrature(3, 3)
    assert np.all(fpts[:, 1] == 1.0)
    assert fwts.sum() == pytest.approx(1.0)


# ---------------------------------------------------------------------- mesh

def test_hyper_cube_counts():
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2)
    assert m.n_cells == 1 and m.n_vertices == 4
    assert m.boundary_faces.shape == (4, 3)
    m3 = m.refine_uniform(3)
    assert m3.n_cells == 64
    assert m3.n_vertices == 81
    assert m3.boundary_faces.shape[0] == 4 * 8


def test_hyper_cube_3d_refine():
    m = hyper_cube(0.0, 1.0, colorize=True, dim=3).refine_uniform(2)
    assert m.n_cells == 64
    assert m.n_vertices == 125
    # boundary face count: 6 faces * 16 child faces
    assert m.boundary_faces.shape[0] == 96


def test_subdivided_rectangle_colorize_ids():
    m = subdivided_hyper_rectangle([0, 0], [2, 1], [4, 2], colorize=True)
    assert m.n_cells == 8
    assert m.n_vertices == 15
    bids = set(m.boundary_faces[:, 2].tolist())
    assert bids == {0, 1, 2, 3}


def test_hyper_shell_is_closed():
    m = hyper_shell([0, 0], 0.25, 1.0, n_cells=12)
    assert m.n_cells == 12
    assert m.n_vertices == 24           # theta direction shares vertices
    bids = set(m.boundary_faces[:, 2].tolist())
    assert bids == {0, 1}
    r = np.linalg.norm(m.vertices, axis=1)
    assert set(np.round(r, 10)) == {0.25, 1.0}


def test_generate_mesh_from_deck_strings():
    m = generate_mesh("hyper_cube", "0 : 1 : true", dim=2,
                      initial_refinement=2)
    assert m.n_cells == 16
    m2 = generate_mesh("subdivided_hyper_rectangle",
                       "2, 2 : 0, 0 : 1, 1 : true", dim=2)
    assert m2.n_cells == 4


# ----------------------------------------------------------------------- dof

@pytest.mark.parametrize("deg,r", [(1, 2), (2, 2), (3, 1)])
def test_fespace_node_count_structured(deg, r):
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2).refine_uniform(r)
    sp = FESpace(m, deg)
    n1 = deg * (2 ** r) + 1
    assert sp.n_nodes == n1 * n1
    assert sp.elem_nodes.shape == (4 ** r, (deg + 1) ** 2)
    # boundary node counts
    for bid in range(4):
        assert sp.boundary_nodes[bid].shape[0] == n1


def test_fespace_3d_q2():
    m = hyper_cube(0.0, 1.0, colorize=True, dim=3).refine_uniform(1)
    sp = FESpace(m, 2)
    assert sp.n_nodes == 5 ** 3


def test_fespace_shell_theta_closed_q2():
    m = hyper_shell([0, 0], 0.25, 1.0, n_cells=8)
    sp = FESpace(m, 2)
    # radial: 2*1+1 = 3 layers; theta: 2*8 = 16 (closed)
    assert sp.n_nodes == 3 * 16
    # all Q2 nodes on circles: inner boundary nodes at r=0.25 exactly
    rin = np.linalg.norm(sp.nodes[sp.boundary_nodes[0]], axis=1)
    np.testing.assert_allclose(rin, 0.25, rtol=1e-12)
    # mid-edge nodes on the curved boundary lie ON the circle (manifold)
    assert sp.boundary_nodes[0].shape[0] == 16


def test_fespace_periodic_fusion():
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2).refine_uniform(2)
    m.periodic.append((0, 1, 0))   # left-right periodic in x
    sp = FESpace(m, 1)
    assert sp.n_nodes == 4 * 5     # 4 unique columns x 5 rows


# ------------------------------------------------------------------ geometry

def test_mapping_affine_rectangle():
    m = subdivided_hyper_rectangle([0, 0], [2, 1], [2, 1], colorize=True)
    sp = FESpace(m, 1)
    xe = jnp.asarray(sp.element_coords())
    pts, wts, B, G, H = sp.basis.quadrature(2)
    J = mapping_jacobian(xe, jnp.asarray(G))
    det, Jinv = det_and_inv(J)
    np.testing.assert_allclose(np.asarray(det), 1.0, rtol=1e-6)
    vol = float(jnp.sum(det * jnp.asarray(wts)[None, :]))
    assert vol == pytest.approx(2.0, rel=1e-6)


def test_mapping_shell_volume_q2():
    """Curved Q2 mapping integrates the annulus area to high accuracy."""
    m = hyper_shell([0, 0], 0.5, 1.0, n_cells=16).refine_uniform(1)
    sp = FESpace(m, 2)
    xe = jnp.asarray(sp.element_coords())
    pts, wts, B, G, H = sp.basis.quadrature(3)
    J = mapping_jacobian(xe, jnp.asarray(G))
    det, _ = det_and_inv(J)
    vol = float(jnp.sum(det * jnp.asarray(wts)[None, :]))
    exact = np.pi * (1.0 - 0.25)
    # Q2 polynomial arcs approximate the circle: O(h^4) geometric error
    assert vol == pytest.approx(exact, rel=1e-3)


def test_face_normals_unit_square():
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2)
    sp = FESpace(m, 1)
    xe = jnp.asarray(sp.element_coords())
    expected = {0: [-1, 0], 1: [1, 0], 2: [0, -1], 3: [0, 1]}
    for face in range(4):
        fpts, fwts, B, G, H = sp.basis.face_quadrature(face, 2)
        J = mapping_jacobian(xe, jnp.asarray(G))
        meas, n = face_measure_and_normal(J, face)
        np.testing.assert_allclose(np.asarray(meas), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(n)[0, 0], expected[face],
                                   atol=1e-6)
        # perimeter contribution
        assert float(jnp.sum(meas * jnp.asarray(fwts)[None, :])) == \
            pytest.approx(1.0, rel=1e-6)


def test_face_normals_3d():
    m = hyper_cube(0.0, 2.0, colorize=True, dim=3)
    sp = FESpace(m, 1)
    xe = jnp.asarray(sp.element_coords())
    for face, exp in [(0, [-1, 0, 0]), (5, [0, 0, 1])]:
        fpts, fwts, B, G, H = sp.basis.face_quadrature(face, 2)
        J = mapping_jacobian(xe, jnp.asarray(G))
        meas, n = face_measure_and_normal(J, face)
        np.testing.assert_allclose(np.asarray(n)[0, 0], exp, atol=1e-6)
        area = float(jnp.sum(meas * jnp.asarray(fwts)[None, :]))
        assert area == pytest.approx(4.0, rel=1e-6)


def test_dedup_bin_straddle():
    """Coincident-intent nodes straddling a quantization-bin boundary must
    still merge (ADVICE r1: cracked meshes from inexact gmsh floats)."""
    from softx_2020_200_tpu.fem.mesh import _dedup_nodes
    tol = 1e-6
    eps = 1e-13
    # a pair straddling x = 0.5*tol, plus distinct far-away nodes
    pts = np.array([
        [0.5 * tol - eps, 0.25],
        [0.5 * tol + eps, 0.25],
        [1.0, 0.25],
        [0.0, 1.0],
    ])
    uniq, inv = _dedup_nodes(pts, tol)
    assert inv[0] == inv[1]
    assert len(uniq) == 3
    # distinct nodes stay distinct
    assert len({inv[0], inv[2], inv[3]}) == 3
