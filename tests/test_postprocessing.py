"""Post-processing tests: forces, torques, KE, enstrophy, derived fields,
VTU output, checkpoint/restart, CLI apps (reference parity — SURVEY §2.2,
§3.4, §5.4, §5.5)."""

import os

import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import (
    SimulationParameters, declare_template)
from softx_2020_200_tpu.core.prm import parse_prm
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
from softx_2020_200_tpu.solvers import postprocessing as post


def couette_solver(nu=0.1, refine=3):
    from tests.test_gls_steady import make_solver, COUETTE_BCS
    return make_solver(nu=nu, refine=refine, extra=COUETTE_BCS)


def test_wall_shear_force_couette():
    """u = (y, 0): traction on the bottom wall is (nu, 0) per unit length;
    force ON the wall must come out +x with magnitude nu.  The pressure
    gauge (arbitrary constant in an enclosed flow) is zeroed first, since
    it contributes a uniform wall-normal force."""
    import jax.numpy as jnp
    nu = 0.1
    s = couette_solver(nu=nu)
    u, _ = s.solve_steady()
    u = u.at[:, 2].add(-jnp.mean(u[:, 2]))
    f_bottom = np.asarray(post.forces_on_boundary(
        s.op, u, s.space.boundary_faces[2]))
    np.testing.assert_allclose(f_bottom, [nu, 0.0], atol=1e-6)
    # top wall (fluid below moving slower): force -x on the lid
    f_top = np.asarray(post.forces_on_boundary(
        s.op, u, s.space.boundary_faces[3]))
    np.testing.assert_allclose(f_top, [-nu, 0.0], atol=1e-6)


def test_taylor_couette_torque():
    """Exact torque on the inner cylinder: |T| = 4 pi nu B,
    B = omega ri^2 ro^2 / (ro^2 - ri^2)."""
    from tests.test_mms_convergence import TC_DECK
    prm = SimulationParameters.from_text(TC_DECK.format(refine=2), dim=2)
    s = GLSNavierStokesSolver(prm)
    u, _ = s.solve_steady()
    T = float(np.asarray(post.torques_on_boundary(
        s.op, u, s.space.boundary_faces[0], center=[0.0, 0.0]))[0])
    T_out = float(np.asarray(post.torques_on_boundary(
        s.op, u, s.space.boundary_faces[1], center=[0.0, 0.0]))[0])
    B = 0.25**2 * 1.0**2 / (1.0**2 - 0.25**2)
    T_exact = 4 * np.pi * 1.0 * B
    # inner cylinder rotates +z; fluid resists: torque on cylinder is -z
    # (coarse-mesh boundary-flux error ~7%; tightens under refinement)
    assert T == pytest.approx(-T_exact, rel=7e-2)
    # angular-momentum balance: outer wall carries the opposite torque
    # (discrete balance is up to the stabilization/quadrature error)
    assert T_out == pytest.approx(-T, rel=1.2e-1)


def test_kinetic_energy_and_enstrophy_couette():
    """u=(y,0): KE = (1/V) int y^2/2 = 1/6; omega = -1 -> enstrophy = 1/2."""
    s = couette_solver()
    u, _ = s.solve_steady()
    ke = float(post.kinetic_energy(s.op, u))
    assert ke == pytest.approx(1.0 / 6.0, rel=1e-8)
    en = float(post.enstrophy(s.op, u))
    assert en == pytest.approx(0.5, rel=1e-8)


def test_vorticity_and_q_criterion_fields():
    s = couette_solver()
    u, _ = s.solve_steady()
    om = np.asarray(post.vorticity_field(s.op, u))
    np.testing.assert_allclose(om, -1.0, atol=1e-8)
    q = np.asarray(post.q_criterion_field(s.op, u))
    # pure shear: |S| = |Omega| -> Q = 0
    np.testing.assert_allclose(q, 0.0, atol=1e-8)


def test_vtu_output_and_pvd(tmp_path):
    s = couette_solver()
    u, _ = s.solve_steady()
    s.prm.simulation_control.output_path = str(tmp_path)
    s.write_output(u, 0.0)
    vtu = tmp_path / "out.00000.vtu"
    assert vtu.exists()
    text = vtu.read_text()
    assert "velocity" in text and "pressure" in text
    assert "vorticity" in text and "q_criterion" in text
    pvd = tmp_path / "out.pvd"
    assert pvd.exists() and "out.00000.vtu" in pvd.read_text()


def test_vtu_subdivision_patches(tmp_path):
    """deck `subdivision = 3`: per-element (s+1)^dim patches, linear
    fields reproduced exactly at the sample points."""
    from softx_2020_200_tpu.utils.vtu import subdivide_patches
    s = couette_solver()
    u, _ = s.solve_steady()
    un = np.asarray(u)
    pts, cells, data = subdivide_patches(
        s.space, {"velocity": un[:, :2]}, 3)
    E = s.space.n_elements
    assert pts.shape == (E * 16, 2) and cells.shape == (E * 9, 4)
    # Couette u = (y, 0) is linear: interpolation at patch points exact
    np.testing.assert_allclose(data["velocity"][:, 0], pts[:, 1],
                               atol=1e-10)
    # engine path writes the patched file
    s.prm.simulation_control.output_path = str(tmp_path)
    s.prm.simulation_control.subdivision = 3
    s.write_output(u, 0.0)
    assert (tmp_path / "out.00000.vtu").exists()


def test_grouped_pvtu_output(tmp_path):
    """deck `group files = 2`: two .vtu pieces + a .pvtu master, with
    every cell present exactly once across the pieces."""
    s = couette_solver()
    u, _ = s.solve_steady()
    s.prm.simulation_control.output_path = str(tmp_path)
    s.prm.simulation_control.group_files = 2
    s.write_output(u, 0.0)
    master = tmp_path / "out.00000.pvtu"
    assert master.exists()
    text = master.read_text()
    assert "out.00000.0.vtu" in text and "out.00000.1.vtu" in text
    assert (tmp_path / "out.00000.0.vtu").exists()
    assert (tmp_path / "out.00000.1.vtu").exists()
    # the PVD time series points at the master
    assert "out.00000.pvtu" in (tmp_path / "out.pvd").read_text()


def test_torque_center_of_rotation():
    """Torque about a shifted center picks up the r x F moment arm:
    T(c) = T(0) - c x F exactly (2D)."""
    import jax.numpy as jnp
    s = couette_solver(nu=0.1)
    u, _ = s.solve_steady()
    u = u.at[:, 2].add(-jnp.mean(u[:, 2]))
    faces = s.space.boundary_faces[2]
    F = np.asarray(post.forces_on_boundary(s.op, u, faces))
    T0 = float(np.asarray(post.torques_on_boundary(
        s.op, u, faces, center=[0.0, 0.0]))[0])
    c = np.array([0.3, -0.2])
    Tc = float(np.asarray(post.torques_on_boundary(
        s.op, u, faces, center=c))[0])
    assert Tc == pytest.approx(T0 - (c[0] * F[1] - c[1] * F[0]),
                               abs=1e-10)
    # deck wiring: `cor x/y` keys reach the per-boundary center
    deck = parse_prm("""
subsection boundary conditions
  set number = 1
  subsection bc 0
    set id = 2
    set type = noslip
    set cor x = 0.3
    set cor y = -0.2
  end
end
""")
    from softx_2020_200_tpu.core.parameters import BoundaryConditionsParams
    bcp = BoundaryConditionsParams()
    bcp.parse(deck)
    assert bcp.bcs[0].center_of_rotation(2) == [0.3, -0.2]


@pytest.mark.slow
def test_checkpoint_restart_roundtrip(tmp_path):
    """Transient restart reproduces the uninterrupted run bitwise-close
    (reference §3.4: golden restart tests)."""
    from tests.test_mms_convergence import TRANSIENT_MMS_DECK
    text = TRANSIENT_MMS_DECK.format(method="bdf2", dt=0.1, tend=0.4,
                                     refine=2)
    text += f"""
subsection restart
  set checkpoint = true
  set frequency = 2
  set filename = restart_test
end
"""
    # full run
    prm = SimulationParameters.from_text(text, dim=2)
    prm.simulation_control.output_path = str(tmp_path)
    prm.simulation_control.output_frequency = 0
    s1 = GLSNavierStokesSolver(prm)
    u_full = s1.run_transient(verbose=False)

    # interrupted run: stop at t=0.2 (checkpoint written there)
    prm2 = SimulationParameters.from_text(text, dim=2)
    prm2.simulation_control.output_path = str(tmp_path)
    prm2.simulation_control.output_frequency = 0
    prm2.simulation_control.time_end = 0.2
    s2 = GLSNavierStokesSolver(prm2)
    s2.run_transient(verbose=False)

    # resumed run
    prm3 = SimulationParameters.from_text(text, dim=2)
    prm3.simulation_control.output_path = str(tmp_path)
    prm3.simulation_control.output_frequency = 0
    prm3.restart.restart = True
    s3 = GLSNavierStokesSolver(prm3)
    u_resumed = s3.run_transient(verbose=False)

    assert s3.control.time == pytest.approx(0.4)
    np.testing.assert_allclose(np.asarray(u_resumed), np.asarray(u_full),
                               atol=1e-10)


def test_parameter_template_roundtrips():
    text = declare_template(2)
    deck = parse_prm(text)
    prm = SimulationParameters(dim=2).parse(deck)
    assert prm.fem.velocity_order == 1


def test_cli_app(tmp_path):
    """The 2D application runs a tiny steady deck end to end."""
    from softx_2020_200_tpu.apps.gls_navier_stokes_2d import main
    from tests.test_gls_steady import BASE, COUETTE_BCS
    deck = BASE.format(nu=0.1, order=1, refine=2, precond="block_jacobi",
                       extra=COUETTE_BCS)
    deck += f"""
subsection test
  set enable = true
end
"""
    p = tmp_path / "couette.prm"
    p.write_text(deck)
    prm_path = str(p)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main([prm_path])
    finally:
        os.chdir(cwd)
    assert rc == 0
    assert (tmp_path / "out.00000.vtu").exists()
