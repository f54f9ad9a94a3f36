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
        if isinstance(solver, GLSNavierStokesSolver):
            return _run_sharded(solver, n_shards)
        return _run_sharded_gd(solver, n_shards)
    solver.solve()
    return 0


def _run_sharded_gd(s, n_shards: int) -> int:
    """Distributed gd_navier_stokes_* path (``mpirun -np N`` parity).

    The GD engine's full orchestration (time loop, startup, SDIRK,
    Kelly adaptation, checkpoint/restart, post-processing, tables)
    already runs on global state; sharding swaps the INNER nonlinear
    solve for the shard_map program via the ``_sharded_hook`` —
    identical deck, identical outputs.  The hook re-wires itself
    whenever adaptation rebuilds the operator."""
    import jax
    from ..parallel.sharded_gd import ShardedGDSolver

    devices = jax.devices()[:n_shards]
    if len(devices) < n_shards:
        print(f"need {n_shards} devices, have {len(jax.devices())}",
              file=sys.stderr)
        return 1
    cache: dict = {}

    def hook(x0, combo, t, alpha0, sdt):
        if cache.get("op") is not s.op:
            cache["op"] = s.op
            cache["sh"] = ShardedGDSolver.from_solver(s,
                                                      devices=devices)
        return cache["sh"].solve(x0, combo, t=float(t),
                                 alpha0=float(alpha0), sdt=float(sdt))

    s._sharded_hook = hook
    s.solve()
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

    # transient: device-resident stepping with the FULL reference
    # feature set (SURVEY §2.3 `mpirun -np N` parity): CFL-adaptive dt,
    # BDF startup sub-stepping, SDIRK, Kelly adaptation (sharded solver
    # rebuilt on the adapted forest), checkpoint/restart.  Host hooks
    # gather state only at postprocess/output/adaptation iterations.
    import jax.numpy as jnp

    sdirk_order = (int(ctrl.method.value[-1])
                   if ctrl.method.is_sdirk else 0)
    target_order = max(ctrl.method.bdf_order, 1)
    prec = prm.simulation_control.log_precision

    if prm.restart.restart:
        # read_checkpoint rebuilds the single-device solver on the
        # checkpointed (possibly adapted) forest; re-wire the sharded
        # solver against the restored space
        u_g, previous_g = s.read_checkpoint()
        sh = ShardedGLSSolver.from_solver(s, devices=devices)
        if u_g is None:
            # manifest-only checkpoint: fields live in per-shard files
            # (written under ANY device count — reassembled through
            # this run's layout)
            import os as _os
            ck = _os.path.join(prm.simulation_control.output_path,
                               prm.restart.filename)
            u_np, prevs_np = ShardedGLSSolver.read_checkpoint_shards(
                ck, sh.layout, sh.dtype)
            u = jnp.asarray(u_np)
            prevs = jnp.asarray(prevs_np)
        else:
            u = sh.to_local(np.asarray(u_g))
            prevs = jnp.stack([sh.to_local(np.asarray(p))
                               for p in previous_g])
    else:
        u = sh.to_local(np.asarray(u0))
        prevs = jnp.stack([u, u, u])

    s_scale = prm.simulation_control.startup_timestep_scaling
    startup_left = 0
    if (target_order >= 2 and not sdirk_order and 0.0 < s_scale < 1.0
            and not prm.restart.restart):
        startup_left = target_order - 1

    from ..core.parameters import Verbosity

    def host_hooks(u_stack, t):
        # same print condition as the single-device transient loop
        # (analytical verbosity OR test mode) — digit-for-digit parity
        print_l2 = (s.exact is not None
                    and (prm.analytical_solution.verbosity
                         is Verbosity.verbose or prm.test.enable))
        needs_host = (
            print_l2
            or prm.forces.calculate_forces
            or prm.forces.calculate_torques
            or prm.post_processing.calculate_kinetic_energy
            or prm.post_processing.calculate_enstrophy
            or ctrl.is_output_iteration())
        if not needs_host:
            return
        ug = jnp.asarray(sh.to_global(u_stack))
        s.postprocess(ug, t)
        if print_l2:
            ev, ep = s.l2_errors(ug, t)
            print(f"L2 error velocity : {ev:.{prec}e}")
        if ctrl.is_output_iteration():
            s.write_output(ug, t)

    while not ctrl.is_at_end():
        ctrl.integrate()
        t = ctrl.time
        if not prm.test.enable:
            print(f"*** Time step : {ctrl.iteration}  "
                  f"time = {t:.{prec}g}  dt = {ctrl.dt:.{prec}g} ***")
        if startup_left > 0:
            k = target_order - startup_left
            dt_full = ctrl.dt_history[0]
            dt_a = s_scale * dt_full
            dt_b = dt_full - dt_a
            dts_a = [dt_a] + ctrl.dt_history[1:]
            u, prevs, hist, iters, lin = sh.bdf_step(
                u, prevs, t - dt_b, dts_a, min(k, len(dts_a)))
            dts_b = [dt_b, dt_a] + ctrl.dt_history[1:]
            u, prevs, hist, iters, lin = sh.bdf_step(
                u, prevs, t, dts_b, min(k + 1, len(dts_b)))
            ctrl.dt_history = ([dt_b, dt_a] + ctrl.dt_history[1:])[:4]
            startup_left -= 1
        elif sdirk_order:
            u, hist, iters, lin = sh.sdirk_step(
                u, t - ctrl.dt, ctrl.dt, sdirk_order)
            prevs = jnp.stack([u, prevs[0], prevs[1]])
        else:
            u, prevs, hist, iters, lin = sh.bdf_step(
                u, prevs, t, ctrl.dts(), ctrl.effective_bdf_order())
        ctrl.cfl = sh.cfl(u, ctrl.dt)
        host_hooks(u, t)
        if (prm.mesh_adaptation.type == "kelly"
                and prm.mesh_adaptation.frequency > 0
                and ctrl.iteration % prm.mesh_adaptation.frequency == 0):
            # gather -> host Kelly/forest adaptation + history transfer
            # -> rebuild the sharded solver on the new space
            fields = [jnp.asarray(sh.to_global(u))] + [
                jnp.asarray(sh.to_global(prevs[i])) for i in range(3)]
            out = s.refine_mesh_kelly(fields)
            sh = ShardedGLSSolver.from_solver(s, devices=devices)
            u = sh.to_local(np.asarray(out[0]))
            prevs = jnp.stack([sh.to_local(np.asarray(p))
                               for p in out[1:]])
        if prm.restart.checkpoint and \
                ctrl.iteration % prm.restart.frequency == 0:
            # manifest (forest/control/pvd) + per-shard field files:
            # no host gather of the global state (reference §5.4)
            import os as _os
            s.write_checkpoint(None, None)
            ck = _os.path.join(prm.simulation_control.output_path,
                               prm.restart.filename)
            sh.write_checkpoint_shards(ck, u, prevs)
    s.write_tables()
    if prm.timer.type == "end":
        print(s.timer.report())
    return 0
