"""Adaptive mesh refinement tests (reference: refine_mesh_kelly +
SolutionTransfer + hanging-node constraints — SURVEY.md §2.2, §2.5,
hard parts #1/#4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from softx_2020_200_tpu.fem.mesh import hyper_cube, generate_mesh
from softx_2020_200_tpu.fem.forest import Forest
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.fem.constraints import build_hanging_constraints
from softx_2020_200_tpu.fem.transfer import transfer_solution
from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
from softx_2020_200_tpu.solvers.kelly import (
    kelly_estimate, flag_cells, conforming_face_pairs)


def make_forest(dim=2, initial=1):
    base = hyper_cube(0.0, 1.0, colorize=True, dim=dim)
    f = Forest(base)
    for _ in range(initial):
        f.refine(f.all_leaves())
    return f


def test_forest_refine_counts():
    f = make_forest(dim=2, initial=2)
    assert f.n_leaves() == 16
    # refine one leaf -> 16 - 1 + 4
    leaf = f.all_leaves()[0]
    f.refine([leaf])
    assert f.n_leaves() == 19
    f.coarsen([ (leaf[0], ch) for ch in Forest.children(leaf[1], 2)])
    assert f.n_leaves() == 16


def test_forest_balance_2to1():
    f = make_forest(dim=2, initial=1)     # 4 leaves at level 1
    # refine one corner leaf twice -> neighbor at level 1 violates 2:1
    corner = (0, (1, 0, 0))
    f.refine([corner])
    f.refine([(0, (2, 0, 0))])
    f.balance()
    levels = [leaf[0] for b, leaf in f.all_leaves()]
    # no leaf pair across a face differs by more than 1 level: the level-1
    # neighbors of the refined corner must have been split
    assert max(levels) == 3
    for b, leaf in f.all_leaves():
        for face in range(4):
            assert not f._violates_2to1(b, leaf, face)


def test_build_mesh_and_hanging_constraints_exactness():
    """A linear field interpolated on a non-conforming mesh must be
    reproduced EXACTLY once hanging constraints are applied."""
    f = make_forest(dim=2, initial=1)
    f.refine([(0, (1, 0, 0))])            # one refined quadrant
    mesh, elem_of, ncf = f.build_mesh()
    # one entry per FINE face: 2 coarse neighbors x 2 fine faces each
    assert len(ncf) == 4
    space = FESpace(mesh, 1)
    hc = build_hanging_constraints(space, ncf)
    assert hc.n == 2                       # two hanging vertices (2D Q1)
    # linear field evaluated at nodes
    g = jnp.asarray(space.nodes @ np.array([2.0, -3.0]) + 1.0)[:, None]
    u = jnp.concatenate([g, 2 * g, 0 * g], axis=1)
    # wipe the hanging values; distribute must restore them exactly
    u_bad = u.at[hc.ids].set(-999.0)
    u_fixed = hc.distribute(u_bad)
    np.testing.assert_allclose(np.asarray(u_fixed), np.asarray(u),
                               atol=1e-12)
    # transpose moves residuals onto masters and zeroes constrained rows
    R = jnp.ones_like(u)
    Rt = hc.distribute_transpose(R)
    assert float(jnp.abs(Rt[hc.ids]).max()) == 0.0
    # total "mass" is conserved (weights sum to 1 per row)
    np.testing.assert_allclose(float(jnp.sum(Rt)), float(jnp.sum(R)),
                               rtol=1e-12)


def test_q2_hanging_constraints():
    f = make_forest(dim=2, initial=1)
    f.refine([(0, (1, 1, 1))])
    mesh, elem_of, ncf = f.build_mesh()
    space = FESpace(mesh, 2)
    hc = build_hanging_constraints(space, ncf)
    assert hc.n > 0
    # quadratic field must be restored exactly by Q2 constraints
    x, y = space.nodes[:, 0], space.nodes[:, 1]
    g = jnp.asarray(x * x - 2 * x * y + 0.5 * y * y + x - 3)[:, None]
    u = jnp.concatenate([g, g, g], axis=1)
    u_fixed = hc.distribute(u.at[hc.ids].set(123.0))
    np.testing.assert_allclose(np.asarray(u_fixed), np.asarray(u),
                               atol=1e-10)


def test_solution_transfer_exact_for_fe_fields():
    """Transfer must be exact for fields inside the FE space, both on
    refinement and (for still-representable fields) coarsening."""
    f1 = make_forest(dim=2, initial=1)
    mesh1, eo1, _ = f1.build_mesh()
    s1 = FESpace(mesh1, 1)
    x, y = s1.nodes[:, 0], s1.nodes[:, 1]
    u1 = jnp.stack([jnp.asarray(1 + 2*x - y), jnp.asarray(x),
                    jnp.asarray(y)], axis=1)

    f2 = make_forest(dim=2, initial=1)
    f2.refine([(0, (1, 0, 1)), (0, (1, 1, 0))])
    f2.balance()
    mesh2, eo2, _ = f2.build_mesh()
    s2 = FESpace(mesh2, 1)
    (u2,) = transfer_solution(s1, f1, eo1, s2, f2, eo2, [u1])
    x2, y2 = s2.nodes[:, 0], s2.nodes[:, 1]
    expect = np.stack([1 + 2*x2 - y2, x2, y2], axis=1)
    np.testing.assert_allclose(np.asarray(u2), expect, atol=1e-12)


def test_kelly_estimator_flags_sharp_region():
    """A field with a steep interior layer must put the largest
    indicators on the layer cells."""
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2).refine_uniform(3)
    space = FESpace(m, 1)
    from softx_2020_200_tpu.solvers.gls import GLSOperator
    op = GLSOperator(space, nu=0.1)
    x = space.nodes[:, 0]
    steep = np.tanh((x - 0.5) * 50.0)
    u = jnp.asarray(np.stack([steep, 0 * x, 0 * x], axis=1))
    eta = kelly_estimate(op, u)
    centers = space.element_coords().mean(axis=1)
    top = np.argsort(eta)[-8:]
    assert np.all(np.abs(centers[top, 0] - 0.5) < 0.2), \
        "largest indicators should hug the layer"
    rmask, cmask = flag_cells(eta, refine_fraction=0.1,
                              coarsen_fraction=0.1)
    assert rmask.sum() == round(0.1 * space.n_elements)


@pytest.mark.slow
def test_steady_amr_cycles_couette():
    """Steady kelly cycles on an exact-solution problem stay exact and
    the hanging-node solve converges."""
    from tests.test_gls_steady import BASE, COUETTE_BCS
    deck = BASE.format(nu=0.1, order=1, refine=2, precond="block_jacobi",
                       extra=COUETTE_BCS)
    deck += """
subsection mesh adaptation
  set type = kelly
  set variable = velocity
  set fraction refinement = 0.2
  set fraction coarsening = 0
end
"""
    prm = SimulationParameters.from_text(deck, dim=2)
    prm.simulation_control.number_mesh_adaptation = 2
    prm.simulation_control.output_frequency = 0
    s = GLSNavierStokesSolver(prm)
    u = s.solve()
    assert s.hc.n > 0 or s.space.n_elements == 16  # adapted (or flat field)
    ev, ep = s.l2_errors(u)
    assert ev < 1e-7, f"velocity error {ev} on adapted mesh"
    assert len(s.tables["L2"]) == 3


@pytest.mark.slow
def test_steady_amr_refines_cavity_corners():
    """Kelly on the lid-driven cavity refines near the lid corners."""
    deck = """
subsection simulation control
  set method = steady
  set number mesh adapt = 1
  set output frequency = 0
end
subsection physical properties
  set kinematic viscosity = 0.01
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 3
end
subsection mesh adaptation
  set type = kelly
  set fraction refinement = 0.15
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = noslip
  end
  subsection bc 1
    set id = 1
    set type = noslip
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = 1
    end
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-8
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
end
"""
    prm = SimulationParameters.from_text(deck, dim=2)
    s = GLSNavierStokesSolver(prm)
    u = s.solve()
    assert s.space.n_elements > 64          # refined somewhere
    assert s.hc.n > 0                       # non-conforming faces exist
    # refined cells cluster near the lid (y=1): max level cells
    levels = np.array([leaf[0] for b, leaf in s.forest.all_leaves()])
    centers = s.space.element_coords().mean(axis=1)
    top_cells = centers[levels == levels.max()]
    assert top_cells[:, 1].mean() > 0.6
    # solution stays bounded and Newton converged
    assert float(jnp.abs(u[:, :2]).max()) <= 1.0 + 1e-6


CYLINDER_KELLY_DECK = """
subsection simulation control
  set method    = bdf2
  set time step = 0.05
  set time end  = 0.3
end
subsection physical properties
  set kinematic viscosity = 0.01
end
subsection mesh
  set type               = dealii
  set grid type          = channel_with_cylinder
  set grid arguments     = 2.2, 0.41 : 0.2, 0.2 : 0.05
  set initial refinement = 1
end
subsection mesh adaptation
  set type                 = kelly
  set variable             = velocity
  set frequency            = 2
  set fraction refinement  = 0.15
  set fraction coarsening  = 0.0
  set max number elements  = 2000
  set max refinement level = 4
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id   = 0
    set type = function
    subsection u
      set Function expression = 4*1.5*y*(0.41-y)/(0.41*0.41)
    end
  end
  subsection bc 1
    set id   = 1
    set type = outlet
  end
  subsection bc 2
    set id   = 2
    set type = noslip
  end
  subsection bc 3
    set id   = 3
    set type = noslip
  end
end
subsection forces
  set calculate forces      = true
  set calculation frequency = 1
  set verbosity             = quiet
end
subsection non-linear solver
  set verbosity      = quiet
  set tolerance      = 1e-6
  set max iterations = 6
end
subsection linear solver
  set verbosity         = quiet
  set relative residual = 1e-3
  set minimum residual  = 1e-9
  set max iters         = 1000
end
subsection test
  set enable = true
end
"""


@pytest.mark.slow
def test_cylinder_transient_kelly_amr():
    """Config #3 machinery end-to-end: transient BDF2 on the cylinder
    O-ring mesh (rotated seam) with Kelly adaptation mid-run, BDF
    history transferred, forces finite every step."""
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
    from softx_2020_200_tpu.solvers import postprocessing as post

    prm = SimulationParameters.from_text(CYLINDER_KELLY_DECK, dim=2)
    s = GLSNavierStokesSolver(prm)
    assert s.forest is not None
    e0 = s.space.n_elements

    forces = []

    def on_step(solver, u, t):
        f = np.asarray(post.forces_on_boundary(
            solver.op, u, solver.space.boundary_faces[3]))
        assert np.isfinite(f).all()
        forces.append((t, *f))

    u = s.run_transient(on_step=on_step, verbose=False)
    assert np.isfinite(np.asarray(u)).all()
    # the mesh actually adapted (grew toward the cylinder wake)
    assert s.space.n_elements > e0
    # refinement concentrated near the cylinder: smallest cells at wall
    mesh = s.space.mesh
    cent = mesh.vertices[mesh.cells].mean(axis=1)
    r = np.linalg.norm(cent - np.array([0.2, 0.2]), axis=1)
    areas = []
    for e in range(mesh.n_cells):
        v = mesh.vertices[mesh.cells[e]]
        a, b = v[1] - v[0], v[2] - v[0]
        areas.append(abs(a[0] * b[1] - a[1] * b[0]))
    areas = np.asarray(areas)
    near = r < 0.15
    assert near.any()
    assert areas[near].mean() < areas[~near].mean()
    # drag is positive and O(1)
    fx = np.array([f[1] for f in forces])
    assert fx[-1] > 0
