"""Grad-div Taylor-Hood solver tests (reference GDNavierStokesSolver —
SURVEY.md §2.2)."""

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.gd import GDNavierStokesSolver

pytestmark = pytest.mark.slow  # physics tier: run with -m slow / full suite

BASE = """
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = {nu}
end
subsection FEM
  set pressure order = 1
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = {refine}
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
  set max iterations = 12
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-12
end
{extra}
"""


def test_gd_poiseuille_exact():
    """Q2-Q1 contains the parabolic/linear exact solution exactly."""
    nu = 0.05
    extra = """
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
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
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = 4*y*(1-y); 0; -8*%s*x
  end
end
""" % nu
    prm = SimulationParameters.from_text(
        BASE.format(nu=nu, refine=2, extra=extra), dim=2)
    s = GDNavierStokesSolver(prm)
    x, res = s.solve_steady()
    ev, ep = s.l2_errors(x)
    assert int(res.n_iterations) <= 8
    assert ev < 1e-8, f"GD velocity error {ev}"
    assert ep < 1e-6, f"GD pressure error {ep}"


def test_gd_mms_spatial_convergence():
    """Q2-Q1 velocity converges at ~3rd order on the trig MMS."""
    extra = """
subsection boundary conditions
  set number = 4
  subsection bc {i}
    set id = {i}
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
end
"""
    bcs = "subsection boundary conditions\n  set number = 4\n"
    for i in range(4):
        bcs += f"""  subsection bc {i}
    set id = {i}
    set type = function
    subsection u
      set Function expression = sin(pi*x)^2 * sin(2*pi*y)
    end
    subsection v
      set Function expression = -sin(2*pi*x) * sin(pi*y)^2
    end
  end
"""
    bcs += "end\n"
    extra = bcs + """
subsection source term
  set enable = true
  subsection xyz
    set Function expression = mms
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = sin(pi*x)^2 * sin(2*pi*y); -sin(2*pi*x) * sin(pi*y)^2; x^4 - y^4
  end
end
"""
    errs = []
    for refine in (2, 3):
        prm = SimulationParameters.from_text(
            BASE.format(nu=1.0, refine=refine, extra=extra), dim=2)
        s = GDNavierStokesSolver(prm)
        x, res = s.solve_steady()
        ev, ep = s.l2_errors(x)
        errs.append(ev)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.6, f"GD Q2 velocity rate {rate} ({errs})"


GD_TRANSIENT_DECK = """
subsection simulation control
  set method        = {method}
  set time step     = {dt}
  set time end      = {tend}
  set output frequency = 0
  set output path   = {outdir}/
end
subsection physical properties
  set kinematic viscosity = 0.1
end
subsection FEM
  set pressure order = 1
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 2
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 2
    set id = 2
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
end
subsection initial conditions
  set type = nodal
  subsection uvwp
    set Function expression = y*y; 0; x
  end
end
subsection source term
  set enable = true
  subsection xyz
    set Function expression = mms
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = exp(-t)*y*y; 0; exp(-t)*x
  end
end
subsection forces
  set calculate forces = true
end
subsection post-processing
  set calculate kinetic energy = true
end
subsection restart
  set checkpoint = {checkpoint}
  set frequency  = 2
  set restart    = {restart}
  set filename   = {outdir}/gdrestart
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-10
  set max iterations = 12
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-6
  set minimum residual = 1e-13
end
subsection test
  set enable = true
end
"""


def test_gd_transient_loop_and_tables(tmp_path):
    """Full GD BDF2 time loop through solve(): MMS accuracy holds at
    every step and the forces/KE tables land on disk."""
    prm = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=0.2,
                                 outdir=tmp_path, checkpoint="false",
                                 restart="false"), dim=2)
    s = GDNavierStokesSolver(prm)
    x = s.solve()
    ev, ep = s.l2_errors(x, t=0.2)
    assert ev < 2e-4, f"GD transient MMS error {ev}"
    assert (tmp_path / "force.0.dat").exists()
    assert (tmp_path / "kinetic_energy.dat").exists()


def test_gd_checkpoint_restart(tmp_path):
    """GD restart continues the transient bitwise-close to an
    uninterrupted run (mirrors the GLS golden-restart test)."""
    full = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=0.2,
                                 outdir=tmp_path, checkpoint="false",
                                 restart="false"), dim=2)
    s_full = GDNavierStokesSolver(full)
    x_full = s_full.solve()

    first = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=0.1,
                                 outdir=tmp_path, checkpoint="true",
                                 restart="false"), dim=2)
    s1 = GDNavierStokesSolver(first)
    s1.solve()
    second = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=0.2,
                                 outdir=tmp_path, checkpoint="true",
                                 restart="true"), dim=2)
    s2 = GDNavierStokesSolver(second)
    x2 = s2.solve()
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_full),
                               atol=1e-9)


def test_gd_periodic_channel():
    """Periodic-in-x channel driven by a body force: the GD pair
    reproduces Poiseuille u = G/(2 nu) y (1-y) exactly (Q2 contains it)."""
    nu, G = 0.1, 1.0
    extra = f"""
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = periodic
    set periodic_id = 1
    set periodic_direction = 0
  end
  subsection bc 1
    set id = 1
    set type = periodic
    set periodic_id = 0
    set periodic_direction = 0
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
subsection source term
  set enable = true
  subsection xyz
    set Function expression = {G}; 0; 0
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = {G / (2 * nu)}*y*(1-y); 0; 0
  end
end
"""
    prm = SimulationParameters.from_text(
        BASE.format(nu=nu, refine=2, extra=extra), dim=2)
    s = GDNavierStokesSolver(prm)
    assert len(s._mesh.periodic) >= 1   # wiring reached the mesh
    x, res = s.solve_steady()
    ev, ep = s.l2_errors(x)
    assert ev < 1e-8, f"GD periodic Poiseuille velocity error {ev}"


def test_gd_sdirk_step():
    """SDIRK22 through the GD stage sequencing: 2nd-order decay."""
    prm = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="sdirk2", dt=0.05, tend=0.2,
                                 outdir="/tmp", checkpoint="false",
                                 restart="false"), dim=2)
    prm.simulation_control.output_frequency = 0
    prm.forces.calculate_forces = False
    prm.post_processing.calculate_kinetic_energy = False
    s = GDNavierStokesSolver(prm)
    x = s.solve()
    ev, ep = s.l2_errors(x, t=0.2)
    assert ev < 2e-4, f"GD SDIRK22 MMS error {ev}"


def test_gd_transient_step():
    """One BDF1 step on the decaying space-exact field runs and stays
    close to the exact decay."""
    extra = """
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 2
    set id = 2
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = exp(-t)*y*y
    end
  end
end
subsection initial conditions
  set type = nodal
  subsection uvwp
    set Function expression = y*y; 0; x
  end
end
subsection source term
  set enable = true
  subsection xyz
    set Function expression = mms
  end
end
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = exp(-t)*y*y; 0; exp(-t)*x
  end
end
"""
    prm = SimulationParameters.from_text(
        BASE.format(nu=0.1, refine=2, extra=extra), dim=2)
    s = GDNavierStokesSolver(prm)
    x0 = s.initial_condition()
    dt = 0.05
    x1, res = s.solve_transient_step(x0, [x0, x0, x0], dt, [dt], 1)
    ev, ep = s.l2_errors(x1, t=dt)
    assert ev < 5e-3, f"GD BDF1 step error {ev}"


def test_gd_kelly_steady_cycles():
    """GD steady Kelly cycles: forest path, hanging constraints on both
    spaces, exact Poiseuille stays exact across adaptation (Q2-Q1
    contains it, so hanging-row wiring errors would show immediately)."""
    nu = 0.05
    extra = """
subsection mesh adaptation
  set type = kelly
  set fraction type = number
  set fraction refinement = 0.25
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
  end
  subsection bc 1
    set id = 1
    set type = function
    subsection u
      set Function expression = 4*y*(1-y)
    end
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
subsection analytical solution
  set enable = true
  subsection uvwp
    set Function expression = 4*y*(1-y); 0; -8*%s*x
  end
end
subsection test
  set enable = true
end
""" % nu
    prm = SimulationParameters.from_text(
        BASE.format(nu=nu, refine=2, extra=extra), dim=2)
    prm.simulation_control.number_mesh_adaptation = 2
    prm.simulation_control.output_frequency = 0
    s = GDNavierStokesSolver(prm)
    assert s.forest is not None
    x = s.solve()
    assert s._nc_faces, "kelly cycles should create hanging faces"
    assert s.hc_v.n > 0 and s.hc_p.n > 0
    ev, ep = s.l2_errors(x)
    assert ev < 1e-8, f"GD kelly-adapted Poiseuille error {ev}"


def test_gd_kelly_transient_adaptation(tmp_path):
    """GD transient with mid-run Kelly adaptation: MMS accuracy holds
    through the solution+history transfer."""
    prm = SimulationParameters.from_text(
        GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=0.2,
                                 outdir=tmp_path, checkpoint="false",
                                 restart="false"), dim=2)
    prm.mesh_adaptation.type = "kelly"
    prm.mesh_adaptation.frequency = 2
    prm.mesh_adaptation.fraction_refinement = 0.2
    prm.forces.calculate_forces = False
    prm.post_processing.calculate_kinetic_energy = False
    s = GDNavierStokesSolver(prm)
    x = s.solve()
    ev, ep = s.l2_errors(x, t=0.2)
    assert ev < 5e-4, f"GD transient+AMR MMS error {ev}"


def test_gd_kelly_checkpoint_restart(tmp_path):
    """GD AMR + restart: a Kelly-adapted transient checkpoints its
    forest and restarts bitwise-close to the uninterrupted run."""
    def make(tend, checkpoint, restart):
        prm = SimulationParameters.from_text(
            GD_TRANSIENT_DECK.format(method="bdf2", dt=0.05, tend=tend,
                                     outdir=tmp_path,
                                     checkpoint=checkpoint,
                                     restart=restart), dim=2)
        prm.mesh_adaptation.type = "kelly"
        prm.mesh_adaptation.frequency = 2
        prm.mesh_adaptation.fraction_refinement = 0.2
        prm.forces.calculate_forces = False
        prm.post_processing.calculate_kinetic_energy = False
        return GDNavierStokesSolver(prm)

    x_full = make(0.2, "false", "false").solve()
    make(0.1, "true", "false").solve()
    s2 = make(0.2, "true", "true")
    x2 = s2.solve()
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_full),
                               atol=1e-8)


GD_CAVITY = """
subsection simulation control
  set method = steady
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection FEM
  set pressure order = 1
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = {refine}
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
  set max iterations = 10
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-11
  set max krylov vectors = 100
  set preconditioner = {precond}
end
"""


def test_gd_gmg_beats_block_jacobi():
    """Velocity-block GMG inside the block-triangular Schur
    preconditioner (the reference BlockSchurPreconditioner's ILU/AMG
    slot, SURVEY.md section 2.2 gd row) wins on iteration count over
    node-block Jacobi and reaches the same solution."""
    results = {}
    for precond in ("block_jacobi", "gmg"):
        prm = SimulationParameters.from_text(
            GD_CAVITY.format(refine=4, precond=precond), dim=2)
        s = GDNavierStokesSolver(prm)
        if precond == "gmg":
            assert s.precond_kind == "gmg", "hierarchy should build"
            assert len(s._mg_levels) >= 2
        x, res = s.solve_steady()
        results[precond] = (np.asarray(x), int(res.linear_iters))
    x_bj, it_bj = results["block_jacobi"]
    x_mg, it_mg = results["gmg"]
    assert it_mg * 2 <= it_bj, (it_mg, it_bj)
    # same nonlinear solution up to the pressure constant: compare
    # velocity dofs only
    nv = s.op.Nv * 2
    dv = np.abs(x_mg[:nv] - x_bj[:nv]).max()
    assert dv < 1e-6, dv


def test_gd_gmg_mixed_side_boundary_remap():
    """A geometric side carrying TWO boundary ids (wall + outlet) must
    not leave colorize defaults on the coarse levels: each coarse face
    takes the id of the nearest fine boundary face, so an outlet patch
    is never swallowed by a coarse Dirichlet mask
    (reference: ML-AMG inherits BCs from the assembled matrix)."""
    prm = SimulationParameters.from_text(BASE.format(
        nu=1.0, refine=4, extra="""
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = noslip
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
  subsection bc 4
    set id = 4
    set type = noslip
  end
end
subsection linear solver
  set preconditioner = gmg
end
"""), dim=2)
    s = GDNavierStokesSolver(prm)
    # split the right side (id 1): faces with center y > 0.5 -> id 4
    mesh = s.op.space_v.mesh
    for row in mesh.boundary_faces:
        if int(row[1]) == 1:
            e = int(row[0])
            yc = mesh.vertices[mesh.cells[e]][:, 1].mean()
            if yc > 0.5:
                row[2] = 4
    s.setup()
    assert s.precond_kind == "gmg" and len(s._mg_levels) >= 2
    cmesh = s._mg_levels[1].space.mesh
    right = [r for r in cmesh.boundary_faces if int(r[1]) == 1]
    assert right, "coarse level lost the right side"
    for r in right:
        e = int(r[0])
        yc = cmesh.vertices[cmesh.cells[e]][:, 1].mean()
        assert int(r[2]) == (4 if yc > 0.5 else 1), (yc, int(r[2]))
