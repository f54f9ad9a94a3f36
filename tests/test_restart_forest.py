"""Checkpoint/restart with forest topology (VERDICT r1 #3) and
adaptive-dt continuation (weak #10), plus sharded restore onto a
different device count.

The reference serializes the p4est triangulation + SolutionTransfer +
SimulationControl so an AMR transient resumes exactly (SURVEY §3.4);
these tests demand the same: a restarted run's remaining steps match an
uninterrupted run to float-roundoff.
"""

import os

import jax
import numpy as np
import pytest

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

KELLY_DECK = """
subsection simulation control
  set method    = bdf2
  set time step = 0.05
  set time end  = {t_end}
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection mesh
  set type               = dealii
  set grid type          = hyper_cube
  set grid arguments     = 0 : 1 : true
  set initial refinement = 2
end
subsection mesh adaptation
  set type                 = kelly
  set variable             = velocity
  set frequency            = 3
  set fraction refinement  = 0.2
  set fraction coarsening  = 0.05
  set max number elements  = 400
  set max refinement level = 4
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
      set Function expression = sin(pi*x)*sin(pi*x)
    end
  end
end
subsection restart
  set checkpoint = {checkpoint}
  set restart    = {restart}
  set frequency  = 4
  set filename   = {fname}
end
subsection simulation control
  set output path = {outdir}/
end
subsection non-linear solver
  set verbosity      = quiet
  set tolerance      = 1e-9
  set max iterations = 6
end
subsection linear solver
  set verbosity         = quiet
  set relative residual = 1e-5
  set minimum residual  = 1e-12
end
subsection test
  set enable = true
end
"""


def _mk(outdir, t_end, checkpoint, restart, fname="ck"):
    prm = SimulationParameters.from_text(
        KELLY_DECK.format(t_end=t_end,
                          checkpoint="true" if checkpoint else "false",
                          restart="true" if restart else "false",
                          outdir=outdir, fname=fname), dim=2)
    return GLSNavierStokesSolver(prm)


@pytest.mark.slow
def test_kelly_restart_matches_uninterrupted(tmp_path):
    """Run 10 steps with AMR (checkpoint at step 8), then restart a
    FRESH solver from the checkpoint and continue — steps 9-10 must
    match the uninterrupted run to roundoff, including the adapted
    mesh topology."""
    out = str(tmp_path)
    s_full = _mk(out, t_end=0.5, checkpoint=True, restart=False)
    u_full = s_full.run_transient(verbose=False)
    n_el_full = s_full.space.n_elements
    assert s_full.forest is not None
    # the mesh adapted at least once before the checkpoint
    assert os.path.exists(os.path.join(out, "ck.npz"))

    s_rest = _mk(out, t_end=0.5, checkpoint=False, restart=True)
    # before restoring, the fresh solver sits on the UNadapted mesh
    u_rest = s_rest.run_transient(verbose=False)
    assert s_rest.space.n_elements == n_el_full
    err = float(np.abs(np.asarray(u_rest) - np.asarray(u_full)).max())
    assert err < 1e-12, f"restart continuation differs: {err}"
    assert s_rest.control.iteration == s_full.control.iteration
    assert abs(s_rest.control.time - s_full.control.time) < 1e-14


@pytest.mark.slow
def test_restart_rejects_wrong_deck(tmp_path):
    out = str(tmp_path)
    s_full = _mk(out, t_end=0.4, checkpoint=True, restart=False)
    s_full.run_transient(verbose=False)
    # a non-adaptive deck cannot restore a forest checkpoint
    from softx_2020_200_tpu.core.parameters import SimulationParameters
    deck = KELLY_DECK.format(t_end=0.5, checkpoint="false",
                             restart="true", outdir=out, fname="ck")
    deck = deck.replace("set type                 = kelly",
                        "set type                 = none")
    prm = SimulationParameters.from_text(deck, dim=2)
    s_bad = GLSNavierStokesSolver(prm)
    with pytest.raises(ValueError):
        s_bad.run_transient(verbose=False)


ADAPTIVE_DT_DECK = """
subsection simulation control
  set method                       = bdf2
  set time step                    = 0.02
  set time end                     = {t_end}
  set adapt                        = true
  set max cfl                      = 2.0
  set adaptative time step scaling = 1.1
  set output path                  = {outdir}/
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection mesh
  set type               = dealii
  set grid type          = hyper_cube
  set grid arguments     = 0 : 1 : true
  set initial refinement = 2
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
subsection restart
  set checkpoint = {checkpoint}
  set restart    = {restart}
  set frequency  = 4
  set filename   = adt
end
subsection non-linear solver
  set verbosity      = quiet
  set tolerance      = 1e-9
  set max iterations = 6
end
subsection linear solver
  set verbosity         = quiet
  set relative residual = 1e-5
  set minimum residual  = 1e-12
end
subsection test
  set enable = true
end
"""


def test_adaptive_dt_restart_bitwise(tmp_path):
    """CFL-adaptive dt: the restarted run continues the same dt
    sequence and solution (reference's restart tests cover this —
    SURVEY §4)."""
    out = str(tmp_path)

    def run(checkpoint, restart, freq=7):
        prm = SimulationParameters.from_text(ADAPTIVE_DT_DECK.format(
            t_end=0.3, checkpoint=checkpoint, restart=restart,
            outdir=out), dim=2)
        prm.restart.frequency = freq
        s = GLSNavierStokesSolver(prm)
        dts = []
        u = s.run_transient(
            on_step=lambda sv, uu, tt: dts.append(sv.control.dt),
            verbose=False)
        return s, u, dts

    # full run writes an INTERMEDIATE checkpoint (last multiple of 7
    # before the end); the restart resumes there and must replay the
    # remaining dt sequence and solution exactly
    s_full, u_full, dts_full = run("true", "false")
    n = len(dts_full)
    k = (n // 7) * 7
    assert 0 < k < n, f"pick a different frequency (n={n})"
    s_rest, u_rest, dts_rest = run("false", "true")
    assert dts_full[-1] != dts_full[0]        # dt actually varied
    assert len(dts_rest) == n - k
    assert np.allclose(dts_full[k:], dts_rest, rtol=0, atol=1e-15)
    err = float(np.abs(np.asarray(u_rest) - np.asarray(u_full)).max())
    assert err < 1e-12, err


@pytest.mark.slow
def test_sharded_checkpoint_cross_device_count(tmp_path):
    """Distributed checkpoint written from a 4-shard run restores onto
    an 8-shard solver and continues identically (re-partition restore,
    SURVEY §5.4)."""
    from tests.test_sharded_v2 import make_mms_solver
    from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver
    s = make_mms_solver(refine=2, order=1)
    dt = 0.1
    u0 = np.asarray(s.initial_condition())

    path = str(tmp_path / "shck")
    sh4 = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:4])
    u_st = sh4.to_local(u0)
    u_st = sh4.run_transient(u_st, dt, 2, order=2)
    import jax.numpy as jnp
    prevs = jnp.stack([u_st, u_st, u_st])   # synthetic history snapshot
    sh4.write_checkpoint(path, u_st, prevs, t=2 * dt, step=2)

    sh8 = ShardedGLSSolver.from_solver(s, devices=jax.devices()[:8])
    u8, prevs8, t8, step8 = sh8.read_checkpoint(path)
    assert t8 == 2 * dt and step8 == 2
    # same global state
    np.testing.assert_allclose(sh8.to_global(u8), sh4.to_global(u_st),
                               atol=0, rtol=0)
    # continue one step on both partitionings -> identical physics
    u4b = sh4.run_transient(u_st, dt, 1, order=1, t0=2 * dt)
    u8b = sh8.run_transient(u8, dt, 1, order=1, t0=2 * dt)
    err = np.abs(sh4.to_global(u4b) - sh8.to_global(u8b)).max()
    assert err < 1e-9, err
