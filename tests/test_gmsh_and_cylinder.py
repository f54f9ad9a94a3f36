"""Gmsh reader + channel-with-cylinder multiblock mesh tests
(reference: GridIn::read_msh, cylinder benchmark geometry — SURVEY §2.1,
BASELINE config #3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from softx_2020_200_tpu.fem.gmsh_io import read_msh
from softx_2020_200_tpu.fem.mesh import channel_with_cylinder
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.fem.geometry import mapping_jacobian, det_and_inv

MSH22 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
9
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
7 0 2 0
8 1 2 0
9 2 2 0
$EndNodes
$Elements
12
1 3 2 1 1 1 2 5 4
2 3 2 1 1 2 3 6 5
3 3 2 1 1 4 5 8 7
4 3 2 1 1 5 6 9 8
5 1 2 10 1 1 2
6 1 2 10 1 2 3
7 1 2 11 2 3 6
8 1 2 11 2 6 9
9 1 2 12 3 9 8
10 1 2 12 3 8 7
11 1 2 13 4 7 4
12 1 2 13 4 4 1
$EndElements
"""


def test_read_msh_quads(tmp_path):
    p = tmp_path / "square.msh"
    p.write_text(MSH22)
    mesh = read_msh(str(p), dim=2)
    assert mesh.n_cells == 4
    assert mesh.n_vertices == 9
    bids = sorted(set(mesh.boundary_faces[:, 2].tolist()))
    assert bids == [10, 11, 12, 13]
    # lexicographic corner order: positive jacobians everywhere
    space = FESpace(mesh, 1)
    xe = jnp.asarray(space.element_coords())
    pts, wts, B, G, H = space.basis.quadrature(2)
    J = mapping_jacobian(xe, jnp.asarray(G))
    det, _ = det_and_inv(J)
    assert float(det.min()) > 0
    # solver runs on it end-to-end
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
    deck = f"""
subsection mesh
  set type = gmsh
  set file name = {p}
end
subsection physical properties
  set kinematic viscosity = 0.1
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 10
    set type = noslip
  end
  subsection bc 1
    set id = 11
    set type = noslip
  end
  subsection bc 2
    set id = 12
    set type = function
    subsection u
      set Function expression = 1
    end
  end
  subsection bc 3
    set id = 13
    set type = noslip
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-8
end
subsection linear solver
  set verbosity = quiet
end
"""
    prm = SimulationParameters.from_text(deck, dim=2)
    prm.mesh.initial_refinement = 1
    s = GLSNavierStokesSolver(prm)
    u, res = s.solve_steady(verbose=False)
    assert np.isfinite(np.asarray(u)).all()


def _msh41_quad4() -> str:
    """The same 2x2 unit-square mesh as MSH22, in MSH 4.1: one surface
    entity (physical 1), four curve entities (physical 10..13)."""
    return """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 4 1 0
1 0 0 0 2 0 0 1 10 2 1 -2
2 2 0 0 2 2 0 1 11 2 2 -3
3 0 2 0 2 2 0 1 12 2 3 -4
4 0 0 0 0 2 0 1 13 2 4 -1
1 0 0 0 2 2 0 1 1 4 1 2 3 4
$EndEntities
$Nodes
3 9 1 9
1 1 0 2
1
2
0 0 0
2 0 0
1 2 0 2
3
4
0 2 0
2 2 0
2 1 0 5
5
6
7
8
9
1 0 0
0 1 0
1 1 0
2 1 0
1 2 0
$EndNodes
$Elements
5 12 1 12
1 1 1 2
1 1 5
2 5 2
1 2 1 2
3 2 8
4 8 4
1 3 1 2
5 4 9
6 9 3
1 4 1 2
7 3 6
8 6 1
2 1 3 4
9 1 5 7 6
10 5 2 8 7
11 6 7 9 3
12 7 8 4 9
$EndElements
"""


def test_read_msh41_quads(tmp_path):
    """MSH 4.x first-order: same mesh/boundary ids as the 2.2 reader."""
    p = tmp_path / "m41.msh"
    p.write_text(_msh41_quad4())
    mesh = read_msh(str(p), 2)
    assert mesh.n_cells == 4
    assert mesh.n_vertices == 9
    bids = sorted(set(mesh.boundary_faces[:, 2].tolist()))
    assert bids == [10, 11, 12, 13]
    assert mesh.boundary_faces.shape[0] == 8
    # unit-square area
    space = FESpace(mesh, 1)
    xe = jnp.asarray(space.element_coords())
    pts, wts, B, G, H = space.basis.quadrature(2)
    det, _ = det_and_inv(mapping_jacobian(xe, jnp.asarray(G)))
    assert float(jnp.sum(det * jnp.asarray(wts)[None, :])) == \
        pytest.approx(4.0, rel=1e-12)


def _msh41_quad9_annulus() -> str:
    """One SECOND-ORDER quad9 covering the quarter annulus r in [1,2],
    theta in [0, pi/2]: lattice nodes placed exactly on the polar map
    (gmsh canonical quad9 ordering: corners ccw, edge mids, center)."""
    import math

    def pt(r, th):
        return (r * math.cos(th), r * math.sin(th))

    h = math.pi / 2
    # gmsh quad9: v0..v3 corners ccw, e4=(01) e5=(12) e6=(23) e7=(30), c8
    pts = [pt(1, 0), pt(2, 0), pt(2, h), pt(1, h),
           pt(1.5, 0), pt(2, h / 2), pt(1.5, h), pt(1, h / 2),
           pt(1.5, h / 2)]
    nodes = "\n".join(f"{x:.16g} {y:.16g} 0" for x, y in pts)
    tags = "\n".join(str(k + 1) for k in range(9))
    return f"""$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 1 1 0
1 1 0 0 2 0 0 1 7 2 1 -2
1 0 0 0 2 2 0 1 1 1 1
$EndEntities
$Nodes
1 9 1 9
2 1 0 9
{tags}
{nodes}
$EndNodes
$Elements
2 2 1 2
1 1 8 1
1 1 2 5
2 1 10 1
2 1 2 3 4 5 6 7 8 9
$EndElements
"""


def test_read_msh41_quad9_curved(tmp_path):
    """Second-order (curved) cells: geometry lands in geom_nodes, the
    Q2 isoparametric map reproduces the annulus area to the quadratic-
    geometry error, and uniform refinement keeps nodes on the curve."""
    p = tmp_path / "annulus.msh"
    p.write_text(_msh41_quad9_annulus())
    mesh = read_msh(str(p), 2)
    assert mesh.n_cells == 1
    assert mesh.geom_nodes is not None
    assert mesh.geom_nodes.shape == (1, 9, 2)
    # inner-arc boundary id from the curve entity's physical tag
    assert 7 in set(mesh.boundary_faces[:, 2].tolist())

    exact = 3 * np.pi / 4          # quarter annulus, r 1..2
    space = FESpace(mesh, 2)
    pts, wts, B, G, H = space.basis.quadrature(4)
    xe = jnp.asarray(space.element_coords())
    det, _ = det_and_inv(mapping_jacobian(xe, jnp.asarray(G)))
    vol = float(jnp.sum(det * jnp.asarray(wts)[None, :]))
    # the quadratic interpolant of a 90-degree arc under-sweeps the
    # area by ~1.2% on this one-cell patch — that's the geometry-order
    # error, not a reader bug
    assert vol == pytest.approx(exact, rel=1.5e-2)

    # refinement evaluates the parent quadratic map: area error shrinks
    # and new boundary corners stay ON the quadratic curve
    fine = mesh.refine_uniform(1)
    assert fine.geom_nodes is not None and fine.geom_nodes.shape[0] == 4
    space_f = FESpace(fine, 2)
    xe_f = jnp.asarray(space_f.element_coords())
    det_f, _ = det_and_inv(mapping_jacobian(xe_f, jnp.asarray(G)))
    vol_f = float(jnp.sum(det_f * jnp.asarray(wts)[None, :]))
    assert vol_f == pytest.approx(vol, rel=1e-6)


def test_channel_with_cylinder_mesh():
    mesh = channel_with_cylinder()
    # all four boundary ids present
    bids = sorted(set(mesh.boundary_faces[:, 2].tolist()))
    assert bids == [0, 1, 2, 3]
    refined = mesh.refine_uniform(2)
    space = FESpace(refined, 2)
    # cylinder-surface nodes sit exactly on the circle (manifold)
    cyl = space.boundary_nodes[3]
    r = np.linalg.norm(space.nodes[cyl] - [0.2, 0.2], axis=1)
    np.testing.assert_allclose(r, 0.05, rtol=1e-10)
    # positive jacobians everywhere (valid curved cells)
    xe = jnp.asarray(space.element_coords())
    pts, wts, B, G, H = space.basis.quadrature(3)
    J = mapping_jacobian(xe, jnp.asarray(G))
    det, _ = det_and_inv(J)
    assert float(det.min()) > 0
    # channel area minus cylinder area
    vol = float(jnp.sum(det * jnp.asarray(wts)[None, :]))
    exact = 2.2 * 0.41 - np.pi * 0.05 ** 2
    assert vol == pytest.approx(exact, rel=2e-4)


def test_cylinder_steady_stokes_flow():
    """Slow steady flow past the cylinder: converges, forces finite,
    drag positive (full Re=100 benchmark runs in the acceptance suite)."""
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
    from softx_2020_200_tpu.solvers import postprocessing as post
    deck = """
subsection mesh
  set type = dealii
  set grid type = channel_with_cylinder
  set grid arguments = 2.2, 0.41 : 0.2, 0.2 : 0.05
  set initial refinement = 1
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 4*1.5*y*(0.41-y)/(0.41*0.41)
    end
  end
  subsection bc 1
    set id = 1
    set type = outlet
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = noslip
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-8
  set max iterations = 12
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set max iters = 3000
end
"""
    prm = SimulationParameters.from_text(deck, dim=2)
    s = GLSNavierStokesSolver(prm)
    u, res = s.solve_steady(verbose=False)
    assert np.isfinite(np.asarray(u)).all()
    f = np.asarray(post.forces_on_boundary(s.op, u,
                                           s.space.boundary_faces[3]))
    assert np.isfinite(f).all()
    assert f[0] > 0, f"drag should be positive, got {f}"


@pytest.mark.slow
def test_cylinder_kelly_adaptation_keeps_cells_valid():
    """Transient Kelly adaptation on the O-ring cylinder mesh: every
    adapted mesh keeps strictly positive jacobians.  Regression: leaf
    sub-lattices placed from the base cell used face-only manifold
    projection, so leaves thinner than the chord sag INVERTED after the
    first adaptation (transfinite blending in place_nodes fixes it)."""
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
    prm = SimulationParameters.from_file(
        "examples/cylinder_re100.prm", dim=2)
    prm.simulation_control.output_frequency = 0
    prm.simulation_control.time_end = 0.04
    prm.simulation_control.dt = 0.01
    prm.mesh.initial_refinement = 2
    prm.mesh_adaptation.frequency = 2
    prm.forces.calculate_forces = False
    prm.restart.checkpoint = False
    prm.test.enable = True
    s = GLSNavierStokesSolver(prm)
    min_dets = []

    def check(sv, u, t):
        xe = jnp.asarray(sv.space.element_coords())
        pts, wts, B, G, H = sv.space.basis.quadrature(2)
        det, _ = det_and_inv(mapping_jacobian(xe, jnp.asarray(G)))
        min_dets.append(float(np.asarray(det).min()))
        assert not np.isnan(np.asarray(u)).any()

    s.run_transient(on_step=check, verbose=False)
    assert len(min_dets) >= 3
    assert s.space.n_elements > 432          # adaptation actually ran
    assert min(min_dets) > 0, f"inverted cells: {min_dets}"
