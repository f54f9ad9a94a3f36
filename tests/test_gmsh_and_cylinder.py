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
