"""Shared CLI driver for the solver applications.

Usage parity with the reference's ``mpirun -np N app deck.prm``
(SURVEY.md §4): an optional second argument selects the number of
devices to shard over — ``gls_navier_stokes_2d deck.prm 8`` runs the
distributed (shard_map) solver over the first 8 jax devices.
"""

from __future__ import annotations

import sys

from ..core.parameters import SimulationParameters
from ..solvers.base import GLSNavierStokesSolver


def run_app(dim: int, argv: list[str] | None = None,
            solver_cls=GLSNavierStokesSolver) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) not in (1, 2):
        prog = f"gls_navier_stokes_{dim}d"
        print(f"Usage: {prog} <parameter-file.prm> [n_devices]",
              file=sys.stderr)
        return 1
    n_shards = int(argv[1]) if len(argv) == 2 else 1
    prm = SimulationParameters.from_file(argv[0], dim=dim)
    solver = solver_cls(prm)
    if n_shards > 1:
        if not isinstance(solver, GLSNavierStokesSolver):
            print("multi-device sharding is available for the GLS apps",
                  file=sys.stderr)
            return 1
        return _run_sharded(solver, n_shards)
    solver.solve()
    return 0


def _run_sharded(s: GLSNavierStokesSolver, n_shards: int) -> int:
    """Distributed CLI path: same deck, same outputs, N-way shard_map."""
    import jax
    import numpy as np
    from ..parallel.sharded import ShardedGLSSolver

    devices = jax.devices()[:n_shards]
    if len(devices) < n_shards:
        print(f"need {n_shards} devices, have {len(jax.devices())}",
              file=sys.stderr)
        return 1
    sh = ShardedGLSSolver.from_solver(s, devices=devices)
    ctrl = s.control
    prm = s.prm
    u0 = s.initial_condition()
    if ctrl.is_steady():
        u, hist, iters, lin = sh.solve(np.asarray(u0))
        if s.exact is not None:
            ev, ep = s.l2_errors(u)
            prec = prm.simulation_control.log_precision
            print(f"L2 error velocity : {ev:.{prec}e}  "
                  f"L2 error pressure: {ep:.{prec}e}")
        s.postprocess(u, 0.0)
        if prm.simulation_control.output_frequency > 0:
            s.write_output(u, 0.0)
        s.write_tables()
        return 0

    # transient: device-resident stepping, host hooks only at
    # postprocess/output iterations (SURVEY §2.6/§5.8 production path)
    order = max(ctrl.method.bdf_order, 1)
    dt = ctrl.dt
    n_steps = int(round((prm.simulation_control.time_end - ctrl.time)
                        / dt))

    def on_step(k, t, u_stack, iters, lin):
        ctrl.iteration = k + 1
        ctrl.time = t
        needs_host = (
            (s.exact is not None and prm.test.enable)
            or prm.forces.calculate_forces
            or prm.forces.calculate_torques
            or prm.post_processing.calculate_kinetic_energy
            or prm.post_processing.calculate_enstrophy
            or ctrl.is_output_iteration())
        if not needs_host:
            return
        u = sh.to_global(u_stack)
        if not prm.test.enable:
            prec = prm.simulation_control.log_precision
            print(f"*** Time step : {ctrl.iteration}  "
                  f"time = {t:.{prec}g}  dt = {dt:.{prec}g} ***")
        s.postprocess(u, t)
        if s.exact is not None and prm.test.enable:
            ev, ep = s.l2_errors(u, t)
            prec = prm.simulation_control.log_precision
            print(f"L2 error velocity : {ev:.{prec}e}")
        if ctrl.is_output_iteration():
            s.write_output(u, t)

    u_stack = sh.to_local(np.asarray(u0))
    sh.run_transient(
        u_stack, dt, n_steps, order=order, t0=ctrl.time,
        on_step=on_step,
        startup_scaling=prm.simulation_control.startup_timestep_scaling)
    s.write_tables()
    return 0
